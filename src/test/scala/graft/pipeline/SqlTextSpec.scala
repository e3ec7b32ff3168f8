package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class SqlTextSpec extends AnyFunSuite {

  test("strips line comments") {
    val out = SqlText.stripComments("SELECT a -- comment FROM fake\nFROM t")
    assert(!out.contains("fake"))
    assert(out.contains("FROM t"))
  }

  test("strips block comments") {
    val out = SqlText.stripComments("SELECT a /* FROM fake */ FROM t")
    assert(!out.contains("fake"))
    assert(out.contains("FROM t"))
  }

  test("preserves comment markers inside string literals") {
    val sql = "SELECT '--not a comment', 'a /* b */ c' FROM t"
    assert(SqlText.stripComments(sql) == sql)
  }

  test("splits statements on semicolons outside literals") {
    val stmts = SqlText.splitStatements("SET a=1; SELECT 'x;y' FROM t;  ;")
    assert(stmts == Seq("SET a=1", "SELECT 'x;y' FROM t"))
  }

  test("double-quoted and backticked tokens are quote regions too") {
    // a DuckDB double-quoted identifier (or Spark double-quoted string)
    // containing -- or ; is data, not a comment / statement boundary
    val ident = """SELECT "a--b", `c;d` FROM t"""
    assert(SqlText.stripComments(ident) == ident)
    assert(SqlText.splitStatements("""SELECT "x;y" FROM t; SET a=1""") ==
      Seq("""SELECT "x;y" FROM t""", "SET a=1"))
  }

  test("record-producing detection matches reference semantics") {
    assert(SqlText.producesRecords("SELECT 1"))
    assert(SqlText.producesRecords("  with x as (select 1) select * from x"))
    assert(!SqlText.producesRecords("CREATE TABLE t AS SELECT 1"))
    assert(!SqlText.producesRecords("VALUES (1)")) // parity: not wrapped
    assert(!SqlText.producesRecords("SET a = 1"))
  }
}
