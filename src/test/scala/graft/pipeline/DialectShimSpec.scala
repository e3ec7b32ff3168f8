package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class DialectShimSpec extends AnyFunSuite {

  test("zero-arg count() becomes count(*)") {
    assert(DialectShim.rewrite("SELECT product, count() AS n FROM t") ==
      "SELECT product, count(*) AS n FROM t")
    assert(DialectShim.rewrite("SELECT COUNT( ) FROM t") ==
      "SELECT count(*) FROM t")
  }

  test("count(col) untouched") {
    val sql = "SELECT count(x), count(DISTINCT y) FROM t"
    assert(DialectShim.rewrite(sql) == sql)
  }

  test("count() inside a string literal untouched") {
    val sql = "SELECT 'count()' FROM t"
    assert(DialectShim.rewrite(sql) == sql)
  }

  test("read_parquet rewrites to file-format table syntax") {
    assert(DialectShim.rewrite("SELECT * FROM read_parquet('/data/x.parquet')") ==
      "SELECT * FROM parquet.`/data/x.parquet`")
  }

  test("read_csv / read_json variants") {
    assert(DialectShim.rewrite("FROM read_csv_auto('f.csv')").contains("csv.`f.csv`"))
    assert(DialectShim.rewrite("FROM read_csv('f.csv')").contains("csv.`f.csv`"))
    assert(DialectShim.rewrite("FROM read_json_auto('f.json')").contains("json.`f.json`"))
  }

  test("plain SQL passes through verbatim") {
    val sql = "SELECT a, sum(b) FROM t WHERE c > 1 GROUP BY a ORDER BY a"
    assert(DialectShim.rewrite(sql) == sql)
  }

  test("read_parquet with a list of paths becomes a UNION ALL table") {
    assert(DialectShim.rewrite(
      "SELECT * FROM read_parquet(['/d/a.parquet', '/d/b.parquet'])") ==
      "SELECT * FROM (SELECT * FROM parquet.`/d/a.parquet` " +
        "UNION ALL SELECT * FROM parquet.`/d/b.parquet`)")
    // one-element list degrades to the plain table form
    assert(DialectShim.rewrite("FROM read_csv(['only.csv'])") ==
      "FROM csv.`only.csv`")
  }

  test("glob paths pass through into the file-format table") {
    assert(DialectShim.rewrite("FROM read_parquet('/d/part-*.parquet')") ==
      "FROM parquet.`/d/part-*.parquet`")
  }

  test("read_csv kwargs register a temp view with mapped options") {
    val spark = graft.SparkTestSession.spark
    val dir = java.nio.file.Files.createTempDirectory("graft-shim-csv")
    val f = dir.resolve("t.csv")
    java.nio.file.Files.writeString(f, "id|name\n1|alpha\n2|beta\n")
    val sql = s"SELECT * FROM read_csv('$f', header=true, delim='|')"
    val rewritten = DialectShim.rewrite(sql, spark)
    assert(rewritten.matches("SELECT \\* FROM __graft_read_[0-9a-f]{12}"),
      rewritten)
    val rows = spark.sql(rewritten).orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(1)).toSeq == Seq("alpha", "beta"))
    // deterministic: the same call rewrites to the same view, no re-register
    assert(DialectShim.rewrite(sql, spark) == rewritten)
  }

  test("unsupported kwargs are left verbatim for execution to reject") {
    val spark = graft.SparkTestSession.spark
    val sql = "SELECT * FROM read_csv('f.csv', sample_size=100)"
    assert(DialectShim.rewrite(sql, spark) == sql)
  }

  test("1:1 function renames apply outside string literals only") {
    assert(DialectShim.rewrite("SELECT list_contains(arr, 'x') FROM t") ==
      "SELECT array_contains(arr, 'x') FROM t")
    assert(DialectShim.rewrite("SELECT regexp_matches(s, 'a+'), epoch_ms(ts)," +
      " list_has_any(a, b) FROM t") ==
      "SELECT regexp_like(s, 'a+'), unix_millis(ts), arrays_overlap(a, b) FROM t")
    // inside a literal → untouched
    assert(DialectShim.rewrite("SELECT 'list_contains(arr)' FROM t") ==
      "SELECT 'list_contains(arr)' FROM t")
  }

  test("string_split literal separators become escaped split() regexes") {
    val spark = graft.SparkTestSession.spark
    assert(DialectShim.rewrite("SELECT string_split(s, ',') FROM t") ==
      "SELECT split(s, ',') FROM t")
    // regex metachars in the separator are escaped for Spark's regex split
    val piped = DialectShim.rewrite("SELECT str_split(s, '|') FROM t")
    assert(piped == "SELECT split(s, '\\\\|') FROM t", piped)
    // end-to-end: '|'-separated value really splits on the pipe character
    val r = spark.sql(DialectShim.rewrite(
      "SELECT size(string_split('a|b|c', '|')) AS n")).head.getInt(0)
    assert(r == 3)
    // non-literal separator → untouched (fails at execution, name visible)
    val dyn = "SELECT string_split(s, sep_col) FROM t"
    assert(DialectShim.rewrite(dyn) == dyn)
  }

  test("strftime %-codes translate to date_format patterns") {
    assert(DialectShim.rewrite("SELECT strftime(ts, '%Y-%m-%d') FROM t") ==
      "SELECT date_format(ts, 'yyyy-MM-dd') FROM t")
    assert(DialectShim.rewrite("SELECT strftime(ts, '%H:%M:%S') FROM t") ==
      "SELECT date_format(ts, 'HH:mm:ss') FROM t")
    // locale-dependent / unknown codes stay verbatim
    val monthName = "SELECT strftime(ts, '%b %Y') FROM t"
    assert(DialectShim.rewrite(monthName) == monthName)
    // literal letters would become Java pattern fields — stay verbatim
    val letters = "SELECT strftime(ts, 'at %H') FROM t"
    assert(DialectShim.rewrite(letters) == letters)
    // end-to-end on a real session
    val spark = graft.SparkTestSession.spark
    val r = spark.sql(DialectShim.rewrite(
      "SELECT strftime(TIMESTAMP '2024-03-05 07:08:09', '%Y-%m-%d %H:%M:%S') AS s"))
      .head.getString(0)
    assert(r == "2024-03-05 07:08:09")
  }
}
