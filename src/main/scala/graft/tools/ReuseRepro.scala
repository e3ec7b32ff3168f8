package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/** Minimal repro for the runtime exchange-reuse question (VERDICT r19
  * item 5): every hot multi-branch query in this repo measured reused=0
  * with [[ExecDump]], i.e. canonically-identical aggregate branches
  * re-executed instead of sharing one exchange. This tool runs a ladder
  * of progressively closer-to-the-repo shapes and prints, for each, the
  * EXECUTED census (scans / shuffles / ReusedExchange stubs), so the
  * finding is adjudicable from one run:
  *
  *   1. range → agg, self-union of two filters (the textbook reuse case)
  *   2. the same aggregate consumed under two DIFFERENT join keys
  *      (the lmScoreBackoff `uni` shape)
  *   3. parquet scan → agg, self-union (adds the file source)
  *   4. parquet scan → tokenize/explode (graft native fns) → agg,
  *      self-union (adds the repo's expression kernels)
  *   5. shape 1 with AQE OFF (isolates AQE's stage-reuse path from the
  *      static ReuseExchange rule)
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ReuseRepro"
  */
object ReuseRepro {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.register(spark)

    def walk(p: SparkPlan)(pred: SparkPlan => Boolean): Int = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)(pred)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan)(pred)
      case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => 0
      case other =>
        (if (pred(other)) 1 else 0) + other.children.map(walk(_)(pred)).sum
    }

    def census(label: String, df: DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      val exec = df.queryExecution.executedPlan
      val scans = walk(exec) {
        case _: org.apache.spark.sql.execution.FileSourceScanExec => true
        case _: org.apache.spark.sql.execution.RangeExec => true
        case _ => false
      }
      val shuffles = walk(exec) {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
          true
        case _ => false
      }
      val reused = exec.toString
        .linesIterator.count(_.contains("ReusedExchange"))
      println(f"REUSE $label%-28s scans=$scans shuffles=$shuffles " +
        s"reused=$reused")
    }

    // 1. the textbook case: one aggregate, two filter consumers, union
    val base = spark.range(0L, 1000000L, 1L, cpus.toInt)
      .selectExpr("id % 1000 as k", "id as v")
    val agg1 = base.groupBy("k").agg(sum("v").as("s"))
    census("range_agg_union",
      agg1.filter(col("k") < 500).unionAll(agg1.filter(col("k") >= 500)))

    // 2. one aggregate, two join keys (the lmScoreBackoff `uni` shape)
    val probe = spark.range(0L, 1000L, 1L, cpus.toInt)
      .selectExpr("id as a", "(id + 1) % 1000 as b")
    census("range_agg_two_join_keys",
      probe
        .join(agg1.select(col("k").as("a"), col("s").as("sa")), Seq("a"))
        .join(agg1.select(col("k").as("b"), col("s").as("sb")), Seq("b")))

    // 3. the same union shape over a parquet scan
    val docs = spark.read.parquet(s"$dir/documents")
    val agg3 = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"),
      sum(length(col("text"))).as("bytes"))
    census("parquet_agg_union",
      agg3.filter(col("n") > 10).unionAll(agg3.filter(col("n") <= 10)))

    // 4. with the repo's native tokenize kernel in the lineage
    val toks = docs.select(col("doc_id"),
        explode(graft.ext.TextOps.tokens(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    census("parquet_tokens_agg_union",
      toks.filter(col("c") > 5).unionAll(toks.filter(col("c") <= 5)))

    // 5. shape 1 with AQE off: the static ReuseExchange rule alone
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val agg5 = base.groupBy("k").agg(sum("v").as("s"))
    census("range_agg_union_noAQE",
      agg5.filter(col("k") < 500).unionAll(agg5.filter(col("k") >= 500)))
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    spark.stop()
  }
}
