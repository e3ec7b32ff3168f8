package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: entry() smoke (rows > 0 on sf0.001 — the
  * driver's own check, pinned here so a broken flagship fails the build
  * before the round does) and queries↔oracleSql key consistency (an
  * oracle keyed to a missing query dumps nothing and FAILs the driver's
  * correctness record with "no spark output" — catch the typo here).
  */
class SparkEntrySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("entry() returns rows on sf0.001 (the driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a registered query, and names collide " +
      "nowhere across the two query files") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val orphans = o -- q
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
    // both maps are built by ++ — a duplicate key would silently shadow
    // one file's definition with the other's
    val rq = graft.queries.RelationalQueries.queries.keySet
    val eq = graft.queries.ExtensionQueries.queries.keySet
    assert((rq & eq).isEmpty, s"duplicate query names: ${rq & eq}")
    // EVERY query is oracled — q46's registered result is its
    // engine-independent decision layer, oracled like any other row
    val unoracled = q -- o
    assert(unoracled.isEmpty,
      s"unexpected oracle-less queries: $unoracled")
  }
}
