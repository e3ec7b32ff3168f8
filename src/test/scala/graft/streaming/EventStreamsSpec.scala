package graft.streaming

import java.sql.Timestamp

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def ev(minute: Int, user: Long, v: Double) =
    EventStreams.Event(ts(minute), user, "click", v)

  test("windowedCounts finalizes windows as the watermark advances") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.windowedCounts(mem.toDF(), "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append).start()
    try {
      // hour-0 events, then an event far enough ahead to close hour 0
      mem.addData(ev(5, 1, 1.0), ev(20, 1, 2.0), ev(59, 2, 3.0))
      q.processAllAvailable()
      mem.addData(ev(135, 1, 9.0)) // watermark → 02:15-10min > 01:00
      q.processAllAvailable()
      val rows = spark.table("win_out").collect()
      assert(rows.length == 1) // only hour 0 finalized
      val r = rows.head
      assert(r.getAs[Timestamp]("w_start") == ts(0))
      assert(r.getAs[Long]("n") == 3L)
      assert(r.getAs[Double]("total") == 6.0)
    } finally q.stop()
  }

  test("sessionize closes sessions on gap timeout with correct aggregates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionize(spark, mem.toDF(), "5 minutes", gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: events at 0,10,20 (one session); user 2: event at 15
      mem.addData(ev(0, 1, 1.0), ev(10, 1, 2.0), ev(20, 1, 3.5))
      mem.addData(ev(15, 2, 7.0))
      q.processAllAvailable()
      // push watermark far past 20+30 → both sessions time out
      mem.addData(ev(600, 9, 0.0))
      q.processAllAvailable()
      val rows = spark.table("sess_out").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getInt(3), r.getDouble(4)))
        .sortBy(_._1)
      assert(rows.length == 2)
      assert(rows(0) == ((1L, ts(0), 3, 6.5)))
      assert(rows(1) == ((2L, ts(15), 1, 7.0)))
    } finally q.stop()
  }

  test("sessionize splits in-batch gaps, closing only at the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionize(spark, mem.toDF(), "5 minutes", gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_split")
      .outputMode(OutputMode.Append).start()
    try {
      // two bursts 90 minutes apart in ONE batch: the batch itself pushes
      // the watermark to 90 (5-min delay), past the first burst's
      // last+gap=35 but not the second's 125 — so exactly the first burst
      // emits (in the watermark-confirmed follow-up batch, never eagerly
      // within the data batch)
      mem.addData(ev(0, 1, 1.0), ev(5, 1, 1.0), ev(95, 1, 2.0))
      q.processAllAvailable()
      val confirmed = spark.table("sess_split").collect()
      assert(confirmed.length == 1)
      assert(confirmed.head.getInt(3) == 2) // first burst: 2 events
      // watermark past 95+30 → the second burst emits too, split kept
      mem.addData(ev(600, 9, 0.0))
      q.processAllAvailable()
      val rows = spark.table("sess_split").collect()
        .map(r => (r.getInt(3), r.getDouble(4))).sortBy(_._1)
      assert(rows.toSeq == Seq((1, 2.0), (2, 2.0)))
    } finally q.stop()
  }

  test("sessionize merges a late-but-admissible event into the session it " +
      "touches (batch session_window parity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    // 2h watermark: events up to 2h late are admissible and must land in
    // the right session — including one that arrives after a LATER
    // session has already opened
    val q = EventStreams.sessionize(spark, mem.toDF(), "2 hours", gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_late")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(ev(0, 1, 1.0), ev(5, 1, 1.0), ev(95, 1, 2.0))
      q.processAllAvailable()
      // late event at 20: within the gap of the FIRST burst (20-5 < 30),
      // not the second (95-20 > 30) — a single-session state would have
      // silently folded it into the 95 session or dropped the split
      mem.addData(ev(20, 1, 4.0))
      q.processAllAvailable()
      mem.addData(ev(600, 9, 0.0)) // advance the watermark → close both
      q.processAllAvailable()
      val rows = spark.table("sess_late").collect()
        .map(r => (r.getTimestamp(1), r.getTimestamp(2), r.getInt(3), r.getDouble(4)))
        .sortBy(_._1.getTime)
      assert(rows.length == 2)
      assert(rows(0) == ((ts(0), ts(20), 3, 6.0)))  // 0,5 + late 20
      assert(rows(1) == ((ts(95), ts(95), 1, 2.0)))
    } finally q.stop()
  }

  test("file source end-to-end: parquet dir -> watermarked agg -> parquet " +
      "sink, resuming from the checkpoint") {
    import spark.implicits._
    def at(s: String, v: Double, user: Long = 1L) =
      EventStreams.Event(Timestamp.valueOf(s), user, "click", v)
    val root = java.nio.file.Files.createTempDirectory("graft-stream-e2e")
    val evDir = root.resolve("events.parquet").toString
    val out = root.resolve("out").toString
    val chk = root.resolve("chk").toString
    // two files → two micro-batches under maxFilesPerTrigger=1; the day-2
    // event pushes the watermark (1h) past day 1, finalizing its window
    Seq(at("2024-01-01 00:05:00", 1.0), at("2024-01-01 10:00:00", 2.0),
        at("2024-01-01 23:00:00", 3.0, user = 2L))
      .toDF().write.mode("append").parquet(evDir)
    Seq(at("2024-01-02 02:00:00", 9.0)).toDF().write.mode("append").parquet(evDir)
    val q1 = EventStreams.runWindowedPipeline(spark, root.toString, out, chk)
    try q1.processAllAvailable() finally q1.stop()
    val first = spark.read.parquet(out).collect()
    assert(first.length == 1) // only the day-1 window is final
    assert(first.head.getAs[Timestamp]("w_start") ==
      Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(first.head.getAs[Long]("n") == 3L)
    assert(first.head.getAs[Double]("total") == 6.0)

    // a NEW query on the same checkpoint resumes: the day-3 file closes
    // day 2 without re-emitting day 1 (exactly-once from the file sink)
    Seq(at("2024-01-03 02:00:00", 0.5)).toDF().write.mode("append").parquet(evDir)
    val q2 = EventStreams.runWindowedPipeline(spark, root.toString, out, chk)
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Timestamp]("w_start"), r.getAs[Long]("n"),
        r.getAs[Double]("total"))).sortBy(_._1.getTime)
    assert(rows.length == 2, s"expected day-1 + day-2 windows, got ${rows.toSeq}")
    assert(rows(1) == ((Timestamp.valueOf("2024-01-02 00:00:00"), 1L, 9.0)))
  }

  test("readEventStream normalizes the real parquet's ts to a watermarkable " +
      "TimestampType with the batch wall clock") {
    // The ts CONTRACT (DIALECT.md "Timestamps"): the fixtures store ts as
    // parquet timestamp[us] with isAdjustedToUTC=false → batch reads
    // TimestampNTZType (≙ DuckDB naive TIMESTAMP); watermarks REQUIRE
    // TimestampType, so the streaming read casts NTZ→TIMESTAMP (wall-clock
    // preserving under the pinned UTC session). A nanos fixture would
    // arrive as LongType under nanosAsLong and be normalized the same way.
    val dir = "/root/testdata/sf0.001"
    val stream = EventStreams.readEventStream(spark, dir)
    assert(stream.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    // wall-clock parity with the batch read on the same fixture: min/max
    // of the cast streaming column must equal the batch column's, cast the
    // same way (a no-op if batch were already TIMESTAMP)
    import org.apache.spark.sql.functions.{col, max, min}
    val batch = graft.Tables.load(spark, dir, "events")
      .select(col("ts").cast("timestamp").as("ts"))
    val Array(bLo, bHi) =
      batch.agg(min("ts"), max("ts")).collect().head.toSeq.toArray
    val staticStream = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val Array(sLo, sHi) =
      staticStream.agg(min("ts"), max("ts")).collect().head.toSeq.toArray
    assert(bLo == sLo && bHi == sHi)
    val q = EventStreams.windowedCounts(stream, "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("real_win_out")
      .outputMode(OutputMode.Append).start()
    try q.processAllAvailable() // would fail here on a Long ts
    finally q.stop()
  }

  test("sessionize drops NULL-ts events like batch session_window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionize(spark, mem.toDF(), "5 minutes",
      gapMinutes = 30)
      .writeStream.format("memory").queryName("nullts_out")
      .outputMode(OutputMode.Append).start()
    try {
      // the NULL-ts event passes the watermark filter (NULL < wm is NULL,
      // not true) — unfiltered it would NPE in the state function and kill
      // the query; batch session_window drops such rows
      mem.addData(ev(10, 1, 1.0), EventStreams.Event(null, 1L, "click", 9.0))
      q.processAllAvailable()
      mem.addData(ev(300, 1, 2.0)) // close user 1's first session
      q.processAllAvailable()
      val rows = spark.table("nullts_out").collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[Int]("n_events") == 1) // NULL-ts event absent
      assert(rows.head.getAs[Double]("total") == 1.0)
    } finally q.stop()
  }

  test("followWithinJoin pairs events within the window, not outside it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[EventStreams.Event]
    val clicks = MemoryStream[EventStreams.Event]
    val q = EventStreams.followWithinJoin(
        views.toDF(), clicks.toDF(), "user_id",
        leftWatermark = "10 minutes", rightWatermark = "10 minutes",
        within = "10 minutes")
      .writeStream.format("memory").queryName("follow_out")
      .outputMode(OutputMode.Append).start()
    try {
      views.addData(
        EventStreams.Event(ts(0), 1, "view", 1.0),
        EventStreams.Event(ts(0), 2, "view", 2.0))
      clicks.addData(
        EventStreams.Event(ts(5), 1, "click", 10.0),  // within 10m → joins
        EventStreams.Event(ts(30), 2, "click", 20.0), // 30m later → no
        EventStreams.Event(ts(3), 3, "click", 30.0))  // no matching view
      q.processAllAvailable()
      val rows = spark.table("follow_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("l_value"),
          r.getAs[Double]("r_value")))
      assert(rows.toSeq == Seq((1L, 1.0, 10.0)))
    } finally q.stop()
  }

  test("dedupWithinWatermark drops in-horizon duplicates, keeps the rest") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams
      .dedupWithinWatermark(mem.toDF(), "30 minutes", Seq("user_id", "value"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      // duplicate (user 1, value 1.0) within the horizon → dropped;
      // distinct value and distinct user pass through
      mem.addData(ev(0, 1, 1.0), ev(5, 1, 1.0), ev(10, 1, 2.0), ev(10, 2, 1.0))
      q.processAllAvailable()
      // advance the watermark past the horizon (evicts batch-1 state)...
      mem.addData(ev(300, 9, 0.0))
      q.processAllAvailable()
      // ...then the same key again → treated as new
      mem.addData(ev(600, 1, 1.0))
      q.processAllAvailable()
      val rows = spark.table("dedup_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("ts"),
          r.getAs[Double]("value"))).sortBy(r => (r._1, r._2.getTime))
      assert(rows.length == 5) // incl. the watermark-advancing event
      assert(rows.count(_._1 == 1L) == 3) // 1@0 v1, 1@10 v2, 1@600 v1
      assert(rows.contains((2L, ts(10), 1.0)))
    } finally q.stop()
  }

  test("runIngestDedup: micro-batches flag against the store AND against " +
      "earlier accepted micro-batches; decisions land in the sink") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ext.DedupOps
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import spark.implicits._

    val tmp = java.nio.file.Files.createTempDirectory("graft-ingest")
    val store = tmp.resolve("store").toString
    val out = tmp.resolve("decisions").toString
    val ckpt = tmp.resolve("ckpt").toString
    val corpusText = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet"
    DedupOps.signatureStore(spark,
      Seq((1L, corpusText)).toDF("doc_id", "text"), store, 3, 8, 2)

    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.runIngestDedup(
      mem.toDF().toDF("doc_id", "text"), store, out, ckpt)
    try {
      // batch 1: one corpus clone, one genuinely new doc
      mem.addData((10L, corpusText),
        (11L, "the quick brown fox jumps over the lazy dog tonight"))
      q.processAllAvailable()
      // batch 2: clones the doc batch 1 ACCEPTED — only the append can
      // catch it
      mem.addData(
        (20L, "the quick brown fox jumps over the lazy dog tonight"))
      q.processAllAvailable()
    } finally q.stop()

    val decisions = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("dup")).toMap
    assert(decisions == Map(10L -> true, 11L -> false, 20L -> true))
    // the store grew by exactly the accepted doc
    val storeIds = spark.read.parquet(store).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(storeIds == Set(1L, 11L))

    // replay: a fresh checkpoint re-delivers batch 0, but its marker
    // exists — the batch is skipped wholesale, so decisions don't
    // duplicate and the store doesn't grow
    val mem2 = MemoryStream[(Long, String)]
    val q2 = EventStreams.runIngestDedup(
      mem2.toDF().toDF("doc_id", "text"), store, out,
      tmp.resolve("ckpt2").toString)
    try {
      mem2.addData((10L, corpusText),
        (11L, "the quick brown fox jumps over the lazy dog tonight"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.parquet(out).count() == 3)
    assert(spark.read.parquet(store).count() == 2)
  }

  test("runSemanticIngestDedup: stream ≡ batch on the embeddings fixture; " +
      "a later micro-batch dedups against an earlier one's accepted rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ext.SimilarityOps
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import spark.implicits._

    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .drop("label")
    val cents = graft.ext.IvfCentroids.centroids
    val minSim = 0.3
    val corpus = e.filter(col("vec_id") % 3 =!= 0)
    val ingest = e.filter(col("vec_id") % 3 === 0)
    // two micro-batches, split down the middle of the id space
    val cut = 250L
    val tmp = java.nio.file.Files.createTempDirectory("graft-semingest")

    // -- batch reference: the q106 trio applied sequentially ------------
    val storeB = tmp.resolve("storeB").toString
    SimilarityOps.embeddingStore(spark, corpus, storeB, cents)
    def batchStep(b: org.apache.spark.sql.DataFrame) = {
      // decisions MUST materialize before the append: the append's
      // refreshByPath drops any cached plan over the store path, so a
      // lazy (even persisted) flags would silently recompute against the
      // post-append store and self-match every accepted row — the exact
      // hazard the foreachBatch loop avoids by sinking decisions to
      // parquet before appending
      val out = SimilarityOps.incrementalSemanticDupFlags(b,
          spark.read.parquet(storeB), cents, minSim).collect()
        .map(r => r.getAs[Long]("vec_id") ->
          ((r.getAs[Long]("n_dups"), r.getAs[Boolean]("dup")))).toMap
      val acceptedIds = out.collect { case (id, (_, false)) => id }.toSeq
      val accepted = b.filter(col("vec_id").isin(acceptedIds: _*))
      SimilarityOps.appendToEmbeddingStore(spark, accepted, storeB, cents)
      out
    }
    val refDecisions = batchStep(ingest.filter(col("vec_id") < cut)) ++
      batchStep(ingest.filter(col("vec_id") >= cut))

    // -- stream side -----------------------------------------------------
    val storeS = tmp.resolve("storeS").toString
    SimilarityOps.embeddingStore(spark, corpus, storeS, cents)
    val out = tmp.resolve("decisions").toString
    val rows = ingest.select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = EventStreams.runSemanticIngestDedup(
      mem.toDF().toDF("vec_id", "embedding"), storeS, out,
      tmp.resolve("ckpt").toString, cents, minSim)
    try {
      mem.addData(rows.filter(_._1 < cut).toIndexedSeq)
      q.processAllAvailable()
      mem.addData(rows.filter(_._1 >= cut).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("n_dups"), r.getAs[Boolean]("dup")))).toMap
    assert(got == refDecisions, "stream decisions diverge from batch")
    // both stores hold corpus + the same accepted set
    def ids(p: String) = spark.read.parquet(p).select("vec_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(storeS) == ids(storeB))

    // replay with a fresh checkpoint: markers skip both batches wholesale
    val mem2 = MemoryStream[(Long, Seq[Float])]
    val q2 = EventStreams.runSemanticIngestDedup(
      mem2.toDF().toDF("vec_id", "embedding"), storeS, out,
      tmp.resolve("ckpt2").toString, cents, minSim)
    try {
      mem2.addData(rows.filter(_._1 < cut).toIndexedSeq)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(ids(storeS) == ids(storeB), "replay must not grow the store")
  }

  test("runLexicalStatsIngest: the streamed stats store answers BM25 " +
      "exactly like a batch-built one; replay is a marker-skipped no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ext.RetrievalOps
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import spark.implicits._

    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id") < 120)
    val tmp = java.nio.file.Files.createTempDirectory("graft-lexstream")

    // batch reference
    val statsB = tmp.resolve("statsB").toString
    RetrievalOps.lexicalStatsStore(spark, d, statsB, "doc_id", "text",
      nBuckets = 16)

    // stream side: store bootstraps ABSENT, fills over two micro-batches
    val statsS = tmp.resolve("statsS").toString
    val rows = d.collect().map(r => (r.getLong(0), r.getString(1)))
    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.runLexicalStatsIngest(
      mem.toDF().toDF("doc_id", "text"), statsS,
      tmp.resolve("ckpt").toString, "doc_id", "text", nBuckets = 16)
    try {
      mem.addData(rows.filter(_._1 < 60).toIndexedSeq)
      q.processAllAvailable()
      mem.addData(rows.filter(_._1 >= 60).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    val probe = Seq((1, "join"), (1, "merge"), (2, "scan"))
      .toDF("query_id", "term")
    def answer(p: String) = RetrievalOps.bm25PerQueryFromStore(
        RetrievalOps.readLexicalStats(spark, p), probe,
        "query_id", "term", "doc_id", k = 5, nBuckets = 16)
      .orderBy("query_id", "rank").collect().toSeq
    assert(answer(statsS) == answer(statsB))
    assert(answer(statsS).nonEmpty)
    // the stores are row-identical, not just answer-identical
    def termRows(p: String) = RetrievalOps.readLexicalStats(spark, p)
      .terms.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(termRows(statsS) == termRows(statsB))

    // replay with a fresh checkpoint: marker-skipped, store unchanged
    val before = spark.read.parquet(s"$statsS/docs").count()
    val mem2 = MemoryStream[(Long, String)]
    val q2 = EventStreams.runLexicalStatsIngest(
      mem2.toDF().toDF("doc_id", "text"), statsS,
      tmp.resolve("ckpt2").toString, "doc_id", "text", nBuckets = 16)
    try {
      mem2.addData(rows.filter(_._1 < 60).toIndexedSeq)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.parquet(s"$statsS/docs").count() == before,
      "replay must not grow the store")
  }

  test("runAnnIndexIngest: the streamed index answers queries exactly " +
      "like a batch-built one; replay with a fresh checkpoint is a " +
      "marker-skipped no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ext.SimilarityOps
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import spark.implicits._

    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .drop("label")
    val cents = graft.ext.IvfCentroids.centroids
    val cbs = graft.ext.PqCodebooks.codebooks
    val tmp = java.nio.file.Files.createTempDirectory("graft-annstream")
    val corpus = e.filter(col("vec_id") < 300)
    val probes = e.filter(col("vec_id") < 5)

    // batch reference: build the whole index in one shot
    val idxB = tmp.resolve("idxB").toString
    SimilarityOps.annIndexStore(spark, corpus, idxB, cents, cbs)

    // stream side: index bootstraps ABSENT, fills over two micro-batches
    val idxS = tmp.resolve("idxS").toString
    val rows = corpus.select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = EventStreams.runAnnIndexIngest(
      mem.toDF().toDF("vec_id", "embedding"), idxS,
      tmp.resolve("ckpt").toString, cents, cbs)
    try {
      mem.addData(rows.filter(_._1 < 150).toIndexedSeq)
      q.processAllAvailable()
      mem.addData(rows.filter(_._1 >= 150).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    def answer(p: String) = SimilarityOps.ivfPqTopKFromStore(probes,
        SimilarityOps.readAnnIndexStore(spark, p), corpus, cents, cbs,
        k = 5, nprobe = 3, refineFactor = 4)
      .orderBy("probe_id", "rk").collect().toSeq
    assert(answer(idxS) == answer(idxB))
    assert(answer(idxS).nonEmpty)

    // replay with a fresh checkpoint: both batches marker-skip wholesale
    val before = spark.read.parquet(idxS).count()
    val mem2 = MemoryStream[(Long, Seq[Float])]
    val q2 = EventStreams.runAnnIndexIngest(
      mem2.toDF().toDF("vec_id", "embedding"), idxS,
      tmp.resolve("ckpt2").toString, cents, cbs)
    try {
      mem2.addData(rows.filter(_._1 < 150).toIndexedSeq)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.parquet(idxS).count() == before,
      "replay must not grow the index")

    // glue with the q138 monitor: a store the stream kept current
    // reports ZERO staleness against the corpus it ingested — and the
    // same monitor run against a corpus that moved on (50 rows the
    // stream never saw) attributes exactly those as missing
    val clean = SimilarityOps.annIndexStaleness(corpus,
        SimilarityOps.readAnnIndexStore(spark, idxS), cents)
      .agg(org.apache.spark.sql.functions.sum("n_missing"),
        org.apache.spark.sql.functions.sum("n_orphaned"),
        org.apache.spark.sql.functions.sum("n_cell_mismatch")).head
    assert((clean.getLong(0), clean.getLong(1), clean.getLong(2)) ==
      ((0L, 0L, 0L)))
    val grown = e.filter(col("vec_id") < 350)
    val lag = SimilarityOps.annIndexStaleness(grown,
        SimilarityOps.readAnnIndexStore(spark, idxS), cents)
      .agg(org.apache.spark.sql.functions.sum("n_missing")).head.getLong(0)
    assert(lag == 50L)
  }

  test("runVectorServingIngest: BOTH stores (IVF-PQ index + refine-side " +
      "vector store) stream-built over two micro-batches are " +
      "row-identical to batch-built ones and the fully store-served " +
      "ivfPqTopKFromStores answers identically; replay marker-skips " +
      "both appends; absent stores bootstrap") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ext.SimilarityOps
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import spark.implicits._

    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .drop("label")
    val cents = graft.ext.IvfCentroids.centroids
    val cbs = graft.ext.PqCodebooks.codebooks
    val tmp = java.nio.file.Files.createTempDirectory("graft-vecserve")
    val corpus = e.filter(col("vec_id") < 300)
    val probes = e.filter(col("vec_id") < 5)

    // batch reference: both stores built in one shot
    val idxB = tmp.resolve("idxB").toString
    val vecB = tmp.resolve("vecB").toString
    SimilarityOps.annIndexStore(spark, corpus, idxB, cents, cbs)
    SimilarityOps.vectorStore(spark, corpus, vecB, nBuckets = 16)

    // stream side: both stores bootstrap ABSENT, fill over two batches
    val idxS = tmp.resolve("idxS").toString
    val vecS = tmp.resolve("vecS").toString
    val rows = corpus.select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = EventStreams.runVectorServingIngest(
      mem.toDF().toDF("vec_id", "embedding"), idxS, vecS,
      tmp.resolve("ckpt").toString, cents, cbs, nBuckets = 16)
    try {
      mem.addData(rows.filter(_._1 < 150).toIndexedSeq)
      q.processAllAvailable()
      mem.addData(rows.filter(_._1 >= 150).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    // the SERVING shape: every input store-resident, encode-free
    def answer(idx: String, vec: String) =
      SimilarityOps.ivfPqTopKFromStores(probes,
          SimilarityOps.readAnnIndexStore(spark, idx),
          SimilarityOps.readVectorStore(spark, vec), 16, cents, cbs,
          k = 5, nprobe = 3, refineFactor = 4)
        .orderBy("probe_id", "rk").collect().toSeq
    assert(answer(idxS, vecS) == answer(idxB, vecB))
    assert(answer(idxS, vecS).nonEmpty)
    // row-identical stores, not just answer-identical
    def idxRows(p: String) = spark.read.parquet(p)
      .select("cand_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(idxRows(idxS) == idxRows(idxB))
    def vecRows(p: String) = SimilarityOps.readVectorStore(spark, p)
      .select("cand_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(vecRows(vecS) == vecRows(vecB))

    // replay with a fresh checkpoint: ONE marker gates BOTH appends
    val beforeIdx = spark.read.parquet(idxS).count()
    val beforeVec = spark.read.parquet(vecS).count()
    val mem2 = MemoryStream[(Long, Seq[Float])]
    val q2 = EventStreams.runVectorServingIngest(
      mem2.toDF().toDF("vec_id", "embedding"), idxS, vecS,
      tmp.resolve("ckpt2").toString, cents, cbs, nBuckets = 16)
    try {
      mem2.addData(rows.filter(_._1 < 150).toIndexedSeq)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.parquet(idxS).count() == beforeIdx,
      "replay must not grow the index")
    assert(spark.read.parquet(vecS).count() == beforeVec,
      "replay must not grow the vector store")
  }

  test("runSemanticIngestDedup bootstraps from an ABSENT store: the first " +
      "batch publishes an explicit empty store, then seeds it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import spark.implicits._
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val tmp = java.nio.file.Files.createTempDirectory("graft-semboot")
    val store = tmp.resolve("store").toString // never created beforehand
    val out = tmp.resolve("decisions").toString
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = EventStreams.runSemanticIngestDedup(
      mem.toDF().toDF("vec_id", "embedding"), store, out,
      tmp.resolve("ckpt").toString, cents, minSim = 0.97)
    try {
      mem.addData((1L, Seq(1f, 0f)))
      q.processAllAvailable() // batch 0 against an empty world
      mem.addData((2L, Seq(1f, 0f))) // clones batch 0's accepted vector
      q.processAllAvailable()
    } finally q.stop()
    val decisions = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("dup")).toMap
    assert(decisions == Map(1L -> false, 2L -> true))
  }

  test("runIngestDedup bootstraps from an ABSENT store: a fresh crawl " +
      "needs no out-of-band setup, and in-batch order still dedups " +
      "across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import spark.implicits._

    val tmp = java.nio.file.Files.createTempDirectory("graft-ingest-boot")
    val store = tmp.resolve("store").toString // never created beforehand
    val out = tmp.resolve("decisions").toString
    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.runIngestDedup(
      mem.toDF().toDF("doc_id", "text"), store, out,
      tmp.resolve("ckpt").toString)
    try {
      mem.addData((1L, "november oscar papa quebec romeo sierra tango"))
      q.processAllAvailable() // batch 0 against an empty world
      mem.addData((2L, "november oscar papa quebec romeo sierra tango"))
      q.processAllAvailable() // batch 1 clones batch 0's accepted doc
    } finally q.stop()
    val decisions = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("dup")).toMap
    assert(decisions == Map(1L -> false, 2L -> true))
  }

  test("runDriftMonitor: per-batch drift rows equal the batch operator " +
      "on the same prefix split; replay with a fresh checkpoint is a " +
      "marker-skipped no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ext.SimilarityOps
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import spark.implicits._
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .drop("label").filter(col("vec_id") < 150)
    val cents = graft.ext.IvfCentroids.centroids
    val tmp = java.nio.file.Files.createTempDirectory("graft-driftmon")
    val out = tmp.resolve("drift").toString
    val rows = e.select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val cuts = Seq(0L, 50L, 100L, 150L)
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = EventStreams.runDriftMonitor(
      mem.toDF().toDF("vec_id", "embedding"), "embedding", cents,
      tmp.resolve("state").toString, out, tmp.resolve("ckpt").toString)
    try {
      for (Seq(lo, hi) <- cuts.sliding(2)) {
        mem.addData(rows.filter(r => r._1 >= lo && r._1 < hi).toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val drift = spark.read.parquet(out).collect()
      .groupBy(_.getAs[Long]("batch_id"))
    assert(drift.keySet == Set(0L, 1L, 2L))
    // batch k's rows must equal the BATCH operator on (prefix, prefix+k)
    for ((bid, cut) <- Seq((0L, 50L), (1L, 100L), (2L, 150L))) {
      val before = e.filter(col("vec_id") < lit(cut - 50))
      val after = e.filter(col("vec_id") < lit(cut))
      val ref = SimilarityOps.embeddingDriftReport(before, after,
          "embedding", cents).collect()
        .map(r => r.getInt(0) -> r).toMap
      val got = drift(bid).map(r => r.getAs[Int]("cell") -> r).toMap
      assert(got.keySet == ref.keySet, s"batch $bid cells")
      for ((c, g) <- got; rr = ref(c)) {
        assert(Option(g.get(2)) == Option(rr.get(1)), s"n_before b$bid c$c")
        assert(g.getAs[Long]("n_after") == rr.getAs[Long]("n_after"))
        for ((gc, rc) <- Seq(4 -> 3, 5 -> 4, 6 -> 5, 7 -> 6, 8 -> 7)) {
          val gv = Option(g.get(gc)).map(_.asInstanceOf[Double])
          val rv = Option(rr.get(rc)).map(_.asInstanceOf[Double])
          assert(gv.isDefined == rv.isDefined, s"null split b$bid c$c i$gc")
          for (a <- gv; b <- rv)
            assert(math.abs(a - b) < 1e-6, s"b$bid c$c col$gc: $a vs $b")
        }
      }
    }
    // replay with a fresh checkpoint: all three batches marker-skip
    val n0 = spark.read.parquet(out).count()
    val mem2 = MemoryStream[(Long, Seq[Float])]
    val q2 = EventStreams.runDriftMonitor(
      mem2.toDF().toDF("vec_id", "embedding"), "embedding", cents,
      tmp.resolve("state").toString, out, tmp.resolve("ckpt2").toString)
    try {
      mem2.addData(rows.filter(_._1 < 50).toIndexedSeq)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.parquet(out).count() == n0,
      "replay must not re-emit drift rows")
  }
}
