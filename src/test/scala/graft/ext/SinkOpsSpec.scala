package graft.ext

import java.nio.file.Files
import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SinkOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("writeWithFileStats + readPrunedRange: zone pruning reads fewer " +
      "files, result identical to a full-scan filter, nulls exact") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-zonemap").resolve("t").toString
    val df = ((1L to 400L).map(k => (Option(k), s"v$k")) ++
      Seq((Option.empty[Long], "vnull"))).toDF("k", "v")
    SinkOps.writeWithFileStats(spark, out, Seq("k"), nFiles = 4)(df)
    val total = spark.read.parquet(out).inputFiles.length
    assert(total >= 3, s"expected multiple files, got $total")

    // a narrow range maps to a strict subset of files
    val pruned = SinkOps.readPrunedRange(spark, out, "k", 10L, 20L)
    assert(pruned.inputFiles.length < total)
    val want = df.filter(col("k") >= 10L && col("k") <= 20L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq == want)

    // the null row is excluded by range semantics on BOTH paths
    val full = SinkOps.readPrunedRange(spark, out, "k", 1L, 400L)
    assert(full.count() == 400L)

    // an out-of-range scan selects zero files and yields zero rows with
    // the schema intact
    val none = SinkOps.readPrunedRange(spark, out, "k", 1000L, 2000L)
    assert(none.count() == 0L)
    assert(none.columns.toSeq == Seq("k", "v"))

    // write-once: a second call must not recompute or rewrite (the
    // _SUCCESS-gated publish contract) — the sidecar is read back as-is
    SinkOps.writeWithFileStats(spark, out, Seq("k"), nFiles = 4)(
      sys.error("must not recompute a published layout"))
  }

  test("appendWithFileStats: appended files are pruned correctly; the " +
      "crash window (data landed, sidecar not) degrades to reading the " +
      "new files, never to missing them") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-zoneapp").resolve("t").toString
    SinkOps.writeWithFileStats(spark, out, Seq("k"), nFiles = 4)(
      (1L to 400L).map(k => (k, s"v$k")).toDF("k", "v"))
    val baseFiles = spark.read.parquet(out).inputFiles.length
    // append a later key range: zones must merge into the sidecar
    val n = SinkOps.appendWithFileStats(spark, out, Seq("k"), nFiles = 2)(
      (401L to 600L).map(k => (k, s"v$k")).toDF("k", "v"))
    assert(n == 2, s"expected 2 appended files, got $n")
    // a range inside the APPENDED keys prunes away all base files
    val highOnly = SinkOps.readPrunedRange(spark, out, "k", 450L, 460L)
    assert(highOnly.inputFiles.length <= 2,
      s"appended-range scan read ${highOnly.inputFiles.length} files")
    assert(highOnly.collect().map(_.getLong(0)).sorted.toSeq ==
      (450L to 460L))
    // a base-range scan prunes away the appended files
    val lowOnly = SinkOps.readPrunedRange(spark, out, "k", 10L, 20L)
    assert(lowOnly.inputFiles.length < baseFiles)
    assert(lowOnly.count() == 11L)
    // full range sees everything across base + append
    assert(SinkOps.readPrunedRange(spark, out, "k", 1L, 600L).count() == 600L)

    // the crash window: data file present, sidecar not yet swapped — a
    // sidecar-unknown file must ALWAYS be scanned
    val stray = (9999L to 9999L).map(k => (k, s"v$k")).toDF("k", "v")
    stray.coalesce(1).write.mode("append").parquet(out)
    val afterCrash = SinkOps.readPrunedRange(spark, out, "k", 9999L, 9999L)
    assert(afterCrash.count() == 1L,
      "a sidecar-unknown data file was pruned away")
    // and the next append merges it is NOT claimed — it simply stays
    // unknown (always-scanned) until a rewrite; correctness holds
    assert(SinkOps.readPrunedRange(spark, out, "k", 1L, 10000L)
      .count() == 601L)

    // appending to an unpublished layout refuses loudly
    val e = intercept[IllegalArgumentException](
      SinkOps.appendWithFileStats(spark,
        Files.createTempDirectory("graft-nozone").resolve("x").toString,
        Seq("k"), 1)(stray))
    assert(e.getMessage.contains("no published zone-mapped layout"))
  }

  test("readPruned: multi-column predicates prune the zone intersection; " +
      "a missing sidecar falls back to a plain full-scan filter") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-zonemc").resolve("t").toString
    // k ranges 1..400; g = k/100 → g-zones align with k-zones under the
    // k-range clustering, so a (k, g) conjunction prunes tighter than
    // either column alone would admit
    val df = (1L to 400L).map(k => (k, k / 100L, s"v$k")).toDF("k", "g", "v")
    SinkOps.writeWithFileStats(spark, out, Seq("k", "g"), nFiles = 4)(df)
    val total = spark.read.parquet(out).inputFiles.length
    val both = SinkOps.readPruned(spark, out,
      Seq(("k", 10L, 380L), ("g", 3L, 3L)))
    // the k-range alone admits every file; the g-range cuts to the last
    assert(both.inputFiles.length < total,
      s"intersection did not prune: ${both.inputFiles.length} of $total")
    val want = df.filter(col("k").between(10L, 380L) && col("g") === 3L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(both.collect().map(_.getLong(0)).sorted.toSeq == want)

    // no sidecar at all → full-scan fallback, result-identical
    val bare = Files.createTempDirectory("graft-zonebare").resolve("t").toString
    df.coalesce(2).write.parquet(bare)
    val fb = SinkOps.readPruned(spark, bare, Seq(("k", 10L, 20L)))
    assert(fb.collect().map(_.getLong(0)).sorted.toSeq == (10L to 20L))
  }

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

  test("writeBucketedTable: co-bucketed join plans with zero exchanges") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_totalprice")
    val lineitem = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_quantity")
    SinkOps.writeBucketedTable(orders, "bkt_orders",
      Seq("o_orderkey"), nBuckets = 8, sortCols = Seq("o_orderkey"))
    SinkOps.writeBucketedTable(lineitem, "bkt_lineitem",
      Seq("l_orderkey"), nBuckets = 8, sortCols = Seq("l_orderkey"))
    // one file per bucket: task/bucket boundaries were aligned pre-write
    val files = spark.table("bkt_orders").inputFiles
    assert(files.length == 8, s"expected 8 bucket files, got ${files.length}")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_lineitem").join(spark.table("bkt_orders"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle either side:\n$plan")
      // and it still computes the right thing
      val expect = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    }
  }

  test("ViewStore.restore keeps bucketing: zero-exchange join in a new session") {
    import java.nio.file.{Files => JFiles, Path, Paths}
    import scala.jdk.CollectionConverters._
    def copyTree(src: Path, dst: Path): Unit = {
      val s = JFiles.walk(src)
      try s.iterator().asScala.foreach { p =>
        val t = dst.resolve(src.relativize(p).toString)
        if (JFiles.isDirectory(p)) JFiles.createDirectories(t)
        else { JFiles.createDirectories(t.getParent); JFiles.copy(p, t) }
      } finally s.close()
    }
    val db = Files.createTempDirectory("graft-sink-db").toString
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_totalprice")
    val lineitem = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_quantity")
    SinkOps.writeBucketedTable(orders, "bktr_orders",
      Seq("o_orderkey"), nBuckets = 8, sortCols = Seq("o_orderkey"),
      dbPath = Some(db))
    SinkOps.writeBucketedTable(lineitem, "bktr_lineitem",
      Seq("l_orderkey"), nBuckets = 8, sortCols = Seq("l_orderkey"),
      dbPath = Some(db))

    // simulate a fresh JVM over the same warehouse: stash the managed data,
    // DROP (which deletes it from the in-memory catalog AND disk), put the
    // data back, then let restore re-register from the manifest
    val whConf = spark.conf.get("spark.sql.warehouse.dir")
    val wh = if (whConf.startsWith("file:"))
      Paths.get(new java.net.URI(whConf)) else Paths.get(whConf)
    val stash = Files.createTempDirectory("graft-sink-stash")
    Seq("bktr_orders", "bktr_lineitem").foreach { t =>
      copyTree(wh.resolve(t), stash.resolve(t))
      spark.sql(s"DROP TABLE $t")
    }
    Seq("bktr_orders", "bktr_lineitem").foreach { t =>
      copyTree(stash.resolve(t), wh.resolve(t))
    }

    val s2 = spark.newSession()
    assert(graft.pipeline.ViewStore.restore(s2, db) == 2)
    val prevThreshold = s2.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = s2.table("bktr_lineitem").join(s2.table("bktr_orders"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"restored co-bucketed join must not shuffle either side:\n$plan")
      val expect = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expect)
    } finally {
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s2.sql("DROP TABLE IF EXISTS bktr_orders")
      s2.sql("DROP TABLE IF EXISTS bktr_lineitem")
    }
  }
}
