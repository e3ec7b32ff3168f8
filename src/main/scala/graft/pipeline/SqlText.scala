package graft.pipeline

/** Text-level SQL utilities: comment stripping, statement splitting, and the
  * record-producing test. Behavior matches the reference
  * (/root/reference/src/node.rs:67-77, :112-131).
  */
object SqlText {

  /** Drop `--` line comments and slash-star block comments, preserving
    * string literals (a '…' literal may contain comment markers). The
    * reference strips comments before dependency parsing so refs in comments
    * don't create edges (src/node.rs:67-77); we additionally respect quoted
    * strings.
    */
  def stripComments(sql: String): String = {
    val out = new StringBuilder(sql.length)
    var i = 0
    val n = sql.length
    // quote tracking covers single quotes (SQL strings), DOUBLE quotes
    // (DuckDB identifiers / Spark string literals — `"a--b"` is data, not
    // a comment), and backticks (Spark identifiers)
    var quote: Char = 0
    while (i < n) {
      val c = sql.charAt(i)
      if (quote != 0) {
        out.append(c)
        if (c == quote) quote = 0
        i += 1
      } else if (c == '\'' || c == '"' || c == '`') {
        quote = c; out.append(c); i += 1
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        while (i < n && sql.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
        i = math.min(i + 2, n)
      } else {
        out.append(c); i += 1
      }
    }
    out.toString
  }

  /** Split on `;` outside quoted regions (single/double/backtick), trim,
    * drop empties (src/node.rs:125-131 splits naively; we are quote-safe).
    */
  def splitStatements(sql: String): Seq[String] = {
    val stmts = Seq.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    sql.foreach { c =>
      if (quote != 0) { cur.append(c); if (c == quote) quote = 0 }
      else if (c == '\'' || c == '"' || c == '`') { quote = c; cur.append(c) }
      else if (c == ';') { stmts += cur.toString; cur.clear() }
      else cur.append(c)
    }
    stmts += cur.toString
    stmts.result().map(_.trim).filter(_.nonEmpty)
  }

  /** A statement "produces records" iff its first ≤50 chars, uppercased,
    * start with SELECT or WITH (src/node.rs:112-123). Parity: DuckDB's
    * `FROM x` shorthand and VALUES are intentionally NOT treated as
    * record-producing.
    */
  def producesRecords(stmt: String): Boolean = {
    val head = stmt.trim.take(50).toUpperCase
    head.startsWith("SELECT") || head.startsWith("WITH")
  }
}
