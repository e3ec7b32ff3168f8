package graft.pipeline

import org.apache.spark.sql.SparkSession

/** DuckDB → Spark SQL dialect shim (SURVEY.md §2.D).
  *
  * Model SQL in the reference is DuckDB dialect; the examples exercise two
  * DuckDB-isms Spark rejects (/root/reference/examples/basic SQL models):
  *   1. zero-arg count()            → count with star argument
  *   2. read_parquet('path')        → parquet.`path` file-format table
  *      (likewise read_csv / read_csv_auto / read_json / read_json_auto)
  * Plus the forms DuckDB users reach for next:
  *   3. read_parquet(['a','b',…])   → (SELECT * FROM parquet.`a`
  *                                     UNION ALL SELECT * FROM parquet.`b`)
  *      — list args for any read_* fn. Globs need no rewrite: Spark's
  *      file-format tables already expand patterns like `part-*.parquet`.
  *   4. read_csv('p', header=true, delim='|', …) — keyword options. No
  *      inline OPTIONS syntax exists for file tables in Spark SQL, so the
  *      session-aware overload registers a deterministic temp view via
  *      DataFrameReader options and substitutes its name. Only the
  *      documented option keys rewrite; a call with an unsupported kwarg
  *      is left verbatim, failing at execution with the SQL + model path
  *      attached, matching the reference (src/node.rs:198-202).
  *
  * Token-aware (string literals preserved); a parser-injection seam
  * (SparkSessionExtensions.injectParser) is the upgrade path if the shim
  * grows beyond these rewrites.
  */
object DialectShim {

  private val fnNames = "read_parquet|read_csv_auto|read_csv|read_json_auto|read_json"
  private val readFn =
    s"""(?i)\\b($fnNames)\\s*\\(\\s*'([^']*)'\\s*\\)""".r
  private val readFnList =
    s"""(?i)\\b($fnNames)\\s*\\(\\s*\\[([^\\]]*)\\]\\s*\\)""".r
  private val readFnKwargs =
    s"""(?i)\\b(read_csv_auto|read_csv|read_json_auto|read_json)\\s*\\(\\s*'([^']*)'\\s*,\\s*([^()\\[\\]]*)\\)""".r
  private val pathLit = """'([^']*)'""".r
  private val bareCount = """(?i)\bcount\s*\(\s*\)""".r

  private def fmtOf(fn: String): String = fn.toLowerCase match {
    case "read_parquet"               => "parquet"
    case "read_csv" | "read_csv_auto" => "csv"
    case _                            => "json"
  }

  // DuckDB kwarg → Spark DataFrameReader option; unsupported keys abort
  // the rewrite (the call is left for execution to reject).
  private val kwargKeys = Map(
    "header" -> "header", "delim" -> "sep", "sep" -> "sep",
    "quote" -> "quote", "escape" -> "escape", "nullstr" -> "nullValue",
    "compression" -> "compression")

  // DuckDB → Spark function renames that are semantically 1:1 (argument
  // shapes and null behavior match); anything not exactly equivalent
  // (strftime's %-codes, len's string/list overload, …) is deliberately
  // NOT mapped — it fails at execution with the original name visible.
  private val fnRenames = Seq(
    "list_contains" -> "array_contains",
    "list_has_any" -> "arrays_overlap",
    "regexp_matches" -> "regexp_like", // both are find-anywhere semantics
    "epoch_ms" -> "unix_millis")
    .map { case (from, to) => (s"(?i)\\b$from\\s*\\(").r -> (to + "(") }

  // string_split's separator is a LITERAL; Spark split takes a regex —
  // rewrite only the quoted-literal form and regex-escape the separator.
  // first arg: any run of non-paren/comma chars and/or quoted literals
  // (covers columns, simple exprs, and TIMESTAMP '…' literals)
  private val stringSplitFn =
    """(?i)\b(?:string_split|str_split)\s*\(((?:[^,()']|'[^']*')+),\s*'([^']*)'\s*\)""".r
  private def regexEscapeForSqlLiteral(sep: String): String =
    sep.flatMap { c =>
      // \ must double once for the regex engine and again for Spark's
      // string-literal escape handling
      if ("\\^$.|?*+()[]{}".contains(c)) s"\\\\$c" else c.toString
    }

  // strftime's %-codes → Spark's date_format (JDK DateTimeFormatter)
  // pattern letters. Only formats built ENTIRELY from these codes and
  // pattern-inert literal chars rewrite; anything else (locale-dependent
  // %a/%b, unknown codes, embedded letters that Java would interpret as
  // pattern fields) is left verbatim for execution to reject with the
  // original name visible.
  private val strftimeFn =
    """(?i)\bstrftime\s*\(((?:[^,()']|'[^']*')+),\s*'([^']*)'\s*\)""".r
  private val strftimeCodes = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd",
    'H' -> "HH", 'M' -> "mm", 'S' -> "ss", 'j' -> "DDD", '%' -> "%")
  private def translateStrftime(fmt: String): Option[String] = {
    val out = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      fmt(i) match {
        case '%' if i + 1 < fmt.length =>
          strftimeCodes.get(fmt(i + 1)) match {
            case Some(p) => out.append(p); i += 2
            case None    => return None
          }
        case c if c.isLetter => return None // Java would treat as a field
        case '\'' => return None            // quoting rules differ; bail
        case c => out.append(c); i += 1
      }
    }
    Some(out.toString)
  }

  /** Lexical-only rewrite (no session): count(), single-literal and
    * list-literal read_* forms.
    */
  def rewrite(sql: String): String = rewriteImpl(sql, None)

  /** Session-aware rewrite: everything above plus kwarg read_csv/json via
    * temp-view registration.
    */
  def rewrite(sql: String, spark: SparkSession): String =
    rewriteImpl(sql, Some(spark))

  private def rewriteImpl(sql: String, spark: Option[SparkSession]): String = {
    val afterList = readFnList.replaceAllIn(sql, m => {
      val fmt = fmtOf(m.group(1))
      val paths = pathLit.findAllMatchIn(m.group(2)).map(_.group(1)).toSeq
      val rewritten =
        if (paths.isEmpty) m.matched // malformed; let execution report it
        else if (paths.size == 1) s"$fmt.`${paths.head}`"
        else paths.map(p => s"SELECT * FROM $fmt.`$p`")
          .mkString("(", " UNION ALL ", ")")
      java.util.regex.Matcher.quoteReplacement(rewritten)
    })
    val afterKwargs = spark match {
      case None => afterList
      case Some(s) => readFnKwargs.replaceAllIn(afterList, m => {
        java.util.regex.Matcher.quoteReplacement(
          rewriteKwargCall(s, m.group(1), m.group(2), m.group(3))
            .getOrElse(m.matched))
      })
    }
    val afterRead = readFn.replaceAllIn(afterKwargs, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"${fmtOf(m.group(1))}.`${m.group(2)}`"))
    // string_split/strftime carry their own quoted literal, so (like
    // read_*) they anchor on it and run against the full statement
    val afterSplit = stringSplitFn.replaceAllIn(afterRead, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"split(${m.group(1)}, '${regexEscapeForSqlLiteral(m.group(2))}')"))
    val afterStrftime = strftimeFn.replaceAllIn(afterSplit, m =>
      java.util.regex.Matcher.quoteReplacement(
        translateStrftime(m.group(2))
          .map(p => s"date_format(${m.group(1)}, '$p')")
          .getOrElse(m.matched)))
    replaceOutsideLiterals(afterStrftime)
  }

  /** One kwarg call → Some(viewName) if every option maps, else None.
    * The view name is a hash of (fn, path, options), so repeated rewrites
    * of the same call reuse one registration and stay deterministic.
    */
  private def rewriteKwargCall(spark: SparkSession, fn: String, path: String,
                               kwargText: String): Option[String] = {
    val kwarg = """(?i)\s*([a-z_]+)\s*=\s*(?:'([^']*)'|([^,\s]+))\s*""".r
    val parsed = kwargText.split(",").toSeq.map {
      case kwarg(k, strV, rawV) =>
        kwargKeys.get(k.toLowerCase)
          .map(_ -> Option(strV).getOrElse(rawV))
      case _ => None
    }
    if (parsed.exists(_.isEmpty)) return None
    val opts = parsed.flatten.toMap ++
      // the *_auto variants infer types, like DuckDB's sniffer
      (if (fn.toLowerCase.endsWith("_auto")) Map("inferSchema" -> "true")
       else Map.empty)
    val fmt = fmtOf(fn)
    val name = "__graft_read_" + java.security.MessageDigest.getInstance("MD5")
      .digest(s"$fmt|$path|${opts.toSeq.sorted}".getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString
    if (!spark.catalog.tableExists(name)) {
      val r = spark.read.options(opts)
      val df = fmt match {
        case "csv"  => r.csv(path)
        case "json" => r.json(path)
        case _      => r.parquet(path)
      }
      df.createOrReplaceTempView(name)
    }
    Some(name)
  }

  private def replaceOutsideLiterals(sql: String): String = {
    var inSingle = false
    val result = new StringBuilder
    val segs = Seq.newBuilder[(String, Boolean)] // (text, isLiteral)
    val cur = new StringBuilder
    sql.foreach { c =>
      if (inSingle) { cur.append(c); if (c == '\'') { segs += ((cur.toString, true)); cur.clear(); inSingle = false } }
      else if (c == '\'') { segs += ((cur.toString, false)); cur.clear(); cur.append(c); inSingle = true }
      else cur.append(c)
    }
    segs += ((cur.toString, inSingle))
    segs.result().foreach { case (text, isLit) =>
      result.append(if (isLit) text else rewriteFunctions(text))
    }
    result.toString
  }

  private def rewriteFunctions(sql: String): String = {
    val counted = bareCount.replaceAllIn(sql, "count(*)")
    val renamed = fnRenames.foldLeft(counted) { case (s, (re, repl)) =>
      re.replaceAllIn(s, java.util.regex.Matcher.quoteReplacement(repl))
    }
    // string_split spans the literal-segment boundary (its separator IS a
    // literal), so it is handled on the full statement in rewriteImpl —
    // nothing to do here.
    renamed
  }
}
