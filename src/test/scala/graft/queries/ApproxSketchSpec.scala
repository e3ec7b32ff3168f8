package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q46's raw sketch estimates are engine-specific (no cross-engine value
  * oracle is possible), so their correctness bar lives here: the HLL
  * cardinality and KLL-style quantile must land within their published
  * error bounds of the exact values computed on the same data. The
  * REGISTERED q46 carries these comparisons as in-plan decision columns
  * and is fully DuckDB-oracled (every verdict must be true).
  */
class ApproxSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("q46: approx_count_distinct within 5% of exact per group") {
    val approx = RelationalQueries.approxSketchEstimates(spark, dir)
      .select("event_type", "approx_users").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.load(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n) <= math.max(1L, (n * 0.05).toLong),
        s"group $k: approx $a vs exact $n")
    }
  }

  test("q46 approx values sit within sketch error of q61's exact values") {
    // the registered queries themselves cross-check: q61 is the fully
    // DuckDB-oracled exact half, so chaining q46→q61 anchors the sketch
    // output to an oracle-verified number (VERDICT r6 task #4)
    val approx = RelationalQueries.approxSketchEstimates(spark, dir)
      .select("event_type", "approx_users", "p50_approx", "n").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    val exact = SparkEntry.queries("q61_sketch_exact")(spark, dir)
      .select("event_type", "n_users", "p50", "n").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(approx.keySet == exact.keySet)
    // exact percentile band around the median: percentile_approx at
    // accuracy 1000 promises rank error <= n/1000, far inside +/-2 ranks
    val band = Tables.load(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.48)").as("lo"),
        expr("percentile(value, 0.52)").as("hi")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (nUsers, p50, n)) =>
      val (aUsers, aP50, aN) = approx(k)
      assert(aN == n, s"group $k: row counts disagree ($aN vs $n)")
      assert(math.abs(aUsers - nUsers) <= math.max(1L, (nUsers * 0.05).toLong),
        s"group $k: approx_users $aUsers vs exact $nUsers")
      val (lo, hi) = band(k)
      assert(p50 >= lo - 0.01 && p50 <= hi + 0.01,
        s"group $k: q61 median $p50 outside its own band [$lo, $hi]")
      assert(aP50 >= lo - 0.01 && aP50 <= hi + 0.01,
        s"group $k: approx median $aP50 outside exact band [$lo, $hi]")
    }
  }

  test("q46: approximate median within 2 percentile ranks of exact") {
    val approx = RelationalQueries.approxSketchEstimates(spark, dir)
      .select("event_type", "p50_approx").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val bounds = Tables.load(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.48)").as("lo"),
        expr("percentile(value, 0.52)").as("hi")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    bounds.foreach { case (k, (lo, hi)) =>
      val a = approx(k)
      assert(a >= lo - 0.01 && a <= hi + 0.01,
        s"group $k: approx median $a outside exact [$lo, $hi]")
    }
  }

  test("q46 registered decisions: every group's verdict columns are true " +
      "(what the DuckDB oracle now pins)") {
    val rows = SparkEntry.queries("q46_approx_sketch")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("users_within_5pct"), r.toString)
      assert(r.getAs[Boolean]("p50_within_5pct"), r.toString)
    }
  }
}
