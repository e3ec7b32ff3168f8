package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** Census of the EXECUTED adaptive plan — the runtime companion of
  * [[PlanDump]]. The formatted pre-AQE plan prints every consumer's copy
  * of a shared subtree, so its scan/exchange counts overstate queries
  * whose duplicated subtrees Spark deduplicates at runtime through
  * ReuseExchange. This tool RUNS each query (noop-sink materialization,
  * the bench's own action) and walks the final adaptive plan, counting
  * only work that actually executed: a ReusedExchange is a stub, not a
  * re-execution, and its subtree is skipped. These are the numbers an
  * optimization round must read BEFORE believing a compile-time census
  * (guide §1: measure first, §7.2: the SQL tab shows the final
  * re-optimised plan).
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ExecDump q196 q185"
  */
object ExecDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExecDump <query-substring> ...")
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
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => args.exists(n.contains))
    require(names.nonEmpty, s"no query matches ${args.mkString(",")}")

    def walk(p: SparkPlan)(pred: SparkPlan => Boolean): Int = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)(pred)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan)(pred)
      case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => 0
      case s: org.apache.spark.sql.execution.SubqueryExec =>
        walk(s.child)(pred)
      case other =>
        val self = if (pred(other)) 1 else 0
        // count subqueries' executed work too (scalar subquery plans
        // hang off expressions, not children)
        val subs = other.expressions.flatMap(_.collect {
          case ss: org.apache.spark.sql.execution.ScalarSubquery =>
            walk(ss.plan)(pred)
          case is: org.apache.spark.sql.execution.InSubqueryExec =>
            walk(is.plan)(pred)
        }).sum
        self + subs + other.children.map(walk(_)(pred)).sum
    }

    for (name <- names) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val exec = df.queryExecution.executedPlan
      val scans = walk(exec) {
        case _: org.apache.spark.sql.execution.FileSourceScanExec => true
        case _ => false
      }
      val shuffles = walk(exec) {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
          true
        case _ => false
      }
      val bcasts = walk(exec) {
        case _: org.apache.spark.sql.execution.exchange
          .BroadcastExchangeLike => true
        case _ => false
      }
      val gens = walk(exec) {
        case _: org.apache.spark.sql.execution.GenerateExec => true
        case _ => false
      }
      val reused = exec.toString
        .linesIterator.count(_.contains("ReusedExchange"))
      println(f"EXEC $name%-36s secs=$secs%7.3f scans=$scans " +
        s"shuffles=$shuffles bcasts=$bcasts generates=$gens reused=$reused")
    }
    spark.stop()
  }
}
