package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class DepExtractorSpec extends AnyFunSuite {

  // Ports of the reference's two unit tests (src/node.rs:274-295)
  test("get_ref: single FROM") {
    assert(DepExtractor.tableRefs("SELECT * FROM abc") == Set("abc"))
  }

  test("get_ref_subtable: subquery + comma join") {
    val sql =
      """SELECT * FROM (SELECT a, b FROM my_sub_table), my_table
        |WHERE my_table.a > 1""".stripMargin
    assert(DepExtractor.tableRefs(sql) == Set("my_sub_table", "my_table"))
  }

  // Divergence tests: cases the reference's walker misses (SURVEY.md §2.A A5)
  test("refs inside UNION arms are found (reference misses these)") {
    val sql = "SELECT a FROM t1 UNION ALL SELECT a FROM t2"
    assert(DepExtractor.tableRefs(sql) == Set("t1", "t2"))
  }

  test("refs inside WHERE subqueries are found") {
    val sql = "SELECT a FROM t1 WHERE a IN (SELECT b FROM t2)"
    assert(DepExtractor.tableRefs(sql) == Set("t1", "t2"))
  }

  test("joins inside CTEs are found; CTE name itself is not a dep") {
    val sql =
      """WITH c AS (SELECT * FROM x JOIN y ON x.id = y.id)
        |SELECT * FROM c""".stripMargin
    assert(DepExtractor.tableRefs(sql) == Set("x", "y"))
  }

  test("modelRefs filters to known ids") {
    assert(DepExtractor.modelRefs(
      "SELECT * FROM model_a JOIN external_tbl USING (id)",
      Set("model_a", "model_b")) == Set("model_a"))
  }

  test("unparseable SQL yields empty set") {
    assert(DepExtractor.tableRefs("THIS IS NOT ((( SQL") == Set.empty)
  }
}
