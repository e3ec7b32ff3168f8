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

  test("salted plan has two aggregation exchanges (salt then key)") {
    val df = Seq(("a", 1.0)).toDF("k", "v")
    val plan = AggOps.saltedSumCount(df, Seq("k"), "v", 4)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt") || plan.contains("pmod"))
  }
}
