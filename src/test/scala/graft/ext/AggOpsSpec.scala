package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AggOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("saltedSumCount equals direct groupBy exactly") {
    val df = (1 to 1000).map(i => (s"k${i % 3}", (i % 7).toDouble))
      .toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val salted = AggOps.saltedSumCount(df, Seq("k"), "v", saltFactor = 16)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(salted.toSeq == direct.toSeq)
  }

  test("both exact-quantile variants match the built-in percentile") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
    val probs = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9,
      "mn" -> 0.0, "mx" -> 1.0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("l_returnflag").collect()
        .map(r => (r.getString(0),
          probs.indices.map(i => math.rint(r.getDouble(i + 1) * 100) / 100)))
    val expected = rows(li.groupBy(col("l_returnflag")).agg(
      expr("percentile(l_extendedprice, 0.25)").as("p25"),
      expr("percentile(l_extendedprice, 0.5)").as("p50"),
      expr("percentile(l_extendedprice, 0.9)").as("p90"),
      min(col("l_extendedprice")).cast("double").as("mn"),
      max(col("l_extendedprice")).cast("double").as("mx")))
    val sorted = rows(AggOps.exactQuantiles(
      li, Seq("l_returnflag"), "l_extendedprice", probs))
    val selected = rows(AggOps.exactQuantilesBySelection(
      li, Seq("l_returnflag"), "l_extendedprice", probs, numBuckets = 8))
    assert(sorted.toSeq == expected.toSeq)
    assert(selected.toSeq == expected.toSeq)
  }

  test("exact quantiles ignore NULL values like quantile_cont") {
    import org.apache.spark.sql.functions._
    // [NULL, 1, 2, 3]: quantile_cont p50 = 2; counting/ranking the NULL
    // (nulls sort first) would interpolate 1.5 instead
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", None)).toDF("k", "v")
    val probs = Seq("p0" -> 0.0, "p50" -> 0.5)
    Seq(AggOps.exactQuantiles(df, Seq("k"), "v", probs),
        AggOps.exactQuantilesBySelection(df, Seq("k"), "v", probs,
          numBuckets = 4))
      .foreach { out =>
        val r = out.collect().head
        assert(r.getDouble(r.fieldIndex("p0")) == 1.0)  // min skips NULL
        assert(r.getDouble(r.fieldIndex("p50")) == 2.0)
      }
    // invalid bucket count fails at the call, not deep in plan building
    val e = intercept[IllegalArgumentException](
      AggOps.exactQuantilesBySelection(df, Seq("k"), "v", probs,
        numBuckets = 1))
    assert(e.getMessage.contains("numBuckets"))
  }

  test("exact quantiles keep the NULL group like SQL GROUP BY") {
    // GROUP BY treats NULL as a real group; the join back on group keys
    // must be null-safe or the NULL group's rows silently vanish
    val df = Seq((Some("a"), 1.0), (Some("a"), 3.0),
      (None, 10.0), (None, 20.0)).toDF("k", "v")
    val probs = Seq("p50" -> 0.5)
    Seq(AggOps.exactQuantiles(df, Seq("k"), "v", probs),
        AggOps.exactQuantilesBySelection(df, Seq("k"), "v", probs,
          numBuckets = 4))
      .foreach { out =>
        val rows = out.collect()
        assert(rows.length == 2, s"NULL group dropped: ${rows.toSeq}")
        val byKey = rows.map(r =>
          (if (r.isNullAt(0)) null else r.getString(0)) ->
            r.getDouble(r.fieldIndex("p50"))).toMap
        assert(byKey("a") == 2.0)
        assert(byKey(null) == 15.0)
      }
  }

  test("salted plan has two aggregation exchanges (salt then key)") {
    val df = Seq(("a", 1.0)).toDF("k", "v")
    val plan = AggOps.saltedSumCount(df, Seq("k"), "v", 4)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt") || plan.contains("pmod"))
  }
}
