package graft.pipeline

/** DuckDB → Spark SQL dialect shim (SURVEY.md §2.D).
  *
  * Model SQL in the reference is DuckDB dialect; the examples exercise two
  * DuckDB-isms Spark rejects (/root/reference/examples/basic SQL models):
  *   1. zero-arg count()            → count with star argument
  *   2. read_parquet('path')        → parquet.`path` file-format table
  *      (likewise read_csv / read_csv_auto / read_json / read_json_auto)
  * Everything else passes through verbatim; unknown constructs fail at
  * execution with a StatementExecutionError carrying the SQL + model path,
  * matching the reference (src/node.rs:198-202).
  *
  * Token-aware (string literals preserved); a parser-injection seam
  * (SparkSessionExtensions.injectParser) is the upgrade path if the shim
  * grows beyond lexical rewrites.
  */
object DialectShim {

  private val readFn =
    """(?i)\b(read_parquet|read_csv_auto|read_csv|read_json_auto|read_json)\s*\(\s*'([^']*)'\s*\)""".r
  private val bareCount = """(?i)\bcount\s*\(\s*\)""".r

  def rewrite(sql: String): String = {
    // Process outside string literals for count(); read_* carries its own
    // quoted literal so the regex anchors on it directly.
    val afterRead = readFn.replaceAllIn(sql, m => {
      val fmt = m.group(1).toLowerCase match {
        case "read_parquet"                  => "parquet"
        case "read_csv" | "read_csv_auto"    => "csv"
        case _                               => "json"
      }
      java.util.regex.Matcher.quoteReplacement(s"$fmt.`${m.group(2)}`")
    })
    replaceOutsideLiterals(afterRead)
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
      result.append(if (isLit) text else bareCount.replaceAllIn(text, "count(*)"))
    }
    result.toString
  }
}
