package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump the formatted physical plan of one or more registered queries —
  * the iterate-on-the-plan loop the build methodology calls for, and the
  * tool behind plan-equality adjudications (e.g. the round-10 q27 watch
  * item: diff two PlanDump outputs across refactors).
  *
  *   sbt "runMain graft.tools.PlanDump q109 [q27 ...]"   # substring match
  *
  * Prints each matching query's plan plus a one-line shuffle/scan/join
  * census (the numbers the QueryPlanSpec assertions pin).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <query-substring> ...")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
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
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => args.exists(n.contains))
    require(names.nonEmpty, s"no query matches ${args.mkString(",")}")
    for (name <- names) {
      val p = graft.SparkEntry.queries(name)(spark, dir).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      println(s"===== $name =====")
      println(s"census: scans=${"Location:".r.findAllIn(p).size} " +
        s"exchanges=${"""\(\d+\) Exchange""".r.findAllIn(p).size} " +
        s"hashpart=${"hashpartitioning".r.findAllIn(p).size} " +
        s"smj=${"SortMergeJoin".r.findAllIn(p).size} " +
        s"bhj=${"BroadcastHashJoin".r.findAllIn(p).size} " +
        s"bnlj=${"BroadcastNestedLoopJoin".r.findAllIn(p).size} " +
        s"window=${"""\(\d+\) Window""".r.findAllIn(p).size}")
      println(p)
    }
    spark.stop()
  }
}
