package graft.ext

import java.nio.file.Files
import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SinkOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("writePartitionedParquet: hive layout, pruning-ready, lossless") {
    val out = Files.createTempDirectory("graft-sink").toString
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    SinkOps.writePartitionedParquet(events, out,
      partitionCols = Seq("event_type"), sortCols = Seq("ts"))

    // hive-style directories per event_type
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("event_type=")))

    // read back: lossless (row count + value checksum)
    val back = spark.read.parquet(out)
    assert(back.count() == events.count())
    val s0 = events.agg(round(sum("value"), 2)).head.getDouble(0)
    val s1 = back.agg(round(sum("value"), 2)).head.getDouble(0)
    assert(s0 == s1)

    // a partition-pruned scan reads only the matching directory
    val one = back.filter(col("event_type") === dirs.head.split("=")(1))
    val scan = one.queryExecution.executedPlan.toString
    assert(!scan.contains("PushedFilters: [IsNotNull(event_type)"),
      "partition filter must prune, not push into the data scan")
    assert(one.count() ==
      events.filter(col("event_type") === dirs.head.split("=")(1)).count())
  }
}
