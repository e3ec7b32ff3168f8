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
}
