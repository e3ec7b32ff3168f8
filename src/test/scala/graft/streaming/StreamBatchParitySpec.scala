package graft.streaming

import java.sql.Timestamp

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Differential (batch-equivalence) oracle for the streaming surface —
  * VERDICT r7 task #2. Every other component is checked against DuckDB;
  * streaming can't be (DuckDB has no streams), so its oracle is Spark's own
  * unified model: the SAME aggregation run in batch over the SAME fixture
  * must produce the SAME rows. This is exactly the class of test that
  * catches contract drift between `Tables.load` and `readEventStream`
  * (e.g. the r7 ts-type divergence).
  */
class StreamBatchParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Batch view of the fixture with the streaming ts contract applied
    * (NTZ → TIMESTAMP, wall-clock-preserving under the UTC session).
    */
  private def batchEvents: DataFrame =
    Tables.load(spark, dir, "events")
      .withColumn("ts", col("ts").cast("timestamp"))

  test("windowedCounts (Complete mode) equals the batch q19-shape window " +
      "aggregation on the real fixture") {
    // Complete mode emits EVERY window each trigger, finalized or not, so
    // after processAllAvailable the sink holds the full aggregate — directly
    // comparable to batch. (Append mode would hold only watermark-closed
    // windows; that subset is covered by EventStreamsSpec.)
    val q = EventStreams
      .windowedCounts(EventStreams.readEventStream(spark, dir),
        watermark = "1 hour", windowLen = "1 day")
      .writeStream.format("memory").queryName("parity_win")
      .outputMode(OutputMode.Complete).start()
    val streamed =
      try { q.processAllAvailable(); spark.table("parity_win").collect() }
      finally q.stop()

    val batch = batchEvents
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"),
        col("total"))
      .collect()

    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Timestamp]("w_start").getTime, r.getAs[String]("event_type"))
    val s = streamed.map(r => key(r) -> (r.getAs[Long]("n"),
      r.getAs[Double]("total"))).toMap
    val b = batch.map(r => key(r) -> (r.getAs[Long]("n"),
      r.getAs[Double]("total"))).toMap
    assert(s.nonEmpty)
    assert(s == b)
  }

  test("sessionize equals the batch session_window aggregation once the " +
      "watermark closes every session") {
    // flatMapGroupsWithState is Append-only, so sessions surface only when
    // the watermark passes last+gap. Stage the fixture as file 1 and a
    // far-future sentinel event as file 2: under maxFilesPerTrigger=1 the
    // sentinel micro-batch pushes the watermark past every real session,
    // flushing them all. The sentinel's own session stays open (never
    // emitted) under a distinct user id, so no filtering of the output is
    // even needed — but assert its absence explicitly.
    val root = java.nio.file.Files.createTempDirectory("graft-parity")
    val evDir = root.resolve("events.parquet").toString
    val real = batchEvents.select("ts", "user_id", "event_type", "value")
    real.write.mode("append").parquet(evDir)
    import spark.implicits._
    val maxTs = real.agg(max("ts")).collect().head.getTimestamp(0)
    val sentinel = new Timestamp(maxTs.getTime + 90L * 24 * 3600 * 1000)
    Seq(EventStreams.Event(sentinel, -1L, "sentinel", 0.0))
      .toDF().write.mode("append").parquet(evDir)

    val gapMin = 30
    val q = EventStreams
      .sessionize(spark, EventStreams.readEventStream(spark, root.toString),
        watermark = "1 minute", gapMinutes = gapMin)
      .writeStream.format("memory").queryName("parity_sess")
      .outputMode(OutputMode.Append).start()
    val streamed =
      try { q.processAllAvailable(); spark.table("parity_sess").collect() }
      finally q.stop()

    // batch twin: THE shared definition q88 registers against DuckDB
    // (EventStreams.sessionizeBatch) — this equality plus q88's oracle is
    // what transitively DuckDB-checks the streaming sessionizer
    val batch = EventStreams.sessionizeBatch(real, gapMin).collect()

    val s = streamed.map(r => (r.getAs[Long]("user_id"),
      r.getAs[Timestamp]("sess_start").getTime,
      r.getAs[Timestamp]("sess_end").getTime,
      r.getAs[Int]("n_events").toLong, r.getAs[Double]("total"))).sorted
    val b = batch.map(r => (r.getAs[Long]("user_id"),
      r.getAs[Timestamp]("sess_start").getTime,
      r.getAs[Timestamp]("sess_end").getTime,
      r.getAs[Long]("n_events"), r.getAs[Double]("total"))).sorted
    assert(s.nonEmpty)
    assert(!s.exists(_._1 == -1L), "sentinel session must never emit")
    assert(s.toSeq == b.toSeq)
  }

  test("followWithinJoin equals the batch time-range equi-join on the " +
      "real fixture") {
    // The streaming state-store join must admit exactly the pairs the
    // declarative batch join admits. Both sides watermark far past the
    // fixture's 30-day span so nothing is dropped as late; Append emits a
    // joined row as soon as both inputs have it, so after
    // processAllAvailable the sink holds the complete join.
    val ev = batchEvents.limit(300) // bound the pair count, not the logic
    val root = java.nio.file.Files.createTempDirectory("graft-parity-join")
    val evDir = root.resolve("events.parquet").toString
    ev.write.mode("overwrite").parquet(evDir)
    val stream = EventStreams.readEventStream(spark, root.toString)
    val q = EventStreams.followWithinJoin(stream, stream, "user_id",
        leftWatermark = "40 days", rightWatermark = "40 days",
        within = "2 hours")
      .writeStream.format("memory").queryName("parity_follow")
      .outputMode(OutputMode.Append).start()
    val streamed =
      try { q.processAllAvailable(); spark.table("parity_follow").collect() }
      finally q.stop()

    val l = ev.select(col("user_id"), col("ts").as("l_ts"),
      col("event_type").as("l_type"), col("value").as("l_value"))
    val r = ev.select(col("user_id").as("__rk"), col("ts").as("r_ts"),
      col("event_type").as("r_type"), col("value").as("r_value"))
    val batch = l.join(r,
        col("user_id") === col("__rk") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr("INTERVAL 2 hours"))
      .drop("__rk").collect()

    def key(rw: org.apache.spark.sql.Row) =
      (rw.getAs[Long]("user_id"), rw.getAs[Timestamp]("l_ts").getTime,
        rw.getAs[Timestamp]("r_ts").getTime, rw.getAs[String]("l_type"),
        rw.getAs[String]("r_type"), rw.getAs[Double]("l_value"),
        rw.getAs[Double]("r_value"))
    val s = streamed.map(key).sorted.toSeq
    val b = batch.map(key).sorted.toSeq
    assert(s.nonEmpty)
    assert(s == b)
  }

  test("dedupWithinWatermark equals batch dropDuplicates when every " +
      "duplicate is inside the horizon") {
    // With a watermark spanning the whole fixture no state is evicted, so
    // the streaming dedup keeps exactly one row per key — the same SET of
    // keys batch dropDuplicates keeps. (Which physical row survives may
    // differ: batch keeps an arbitrary first, streaming keeps the first
    // seen; compare on the key set.)
    val q = EventStreams.dedupWithinWatermark(
        EventStreams.readEventStream(spark, dir), "40 days",
        Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("parity_dedup")
      .outputMode(OutputMode.Append).start()
    val streamed =
      try { q.processAllAvailable(); spark.table("parity_dedup").collect() }
      finally q.stop()
    val batch = batchEvents.dropDuplicates(Seq("user_id", "event_type"))
      .select(col("user_id"), col("event_type")).collect()
    def key(rw: org.apache.spark.sql.Row) =
      (rw.getAs[Long]("user_id"), rw.getAs[String]("event_type"))
    val s = streamed.map(key).toSet
    val b = batch.map(key).toSet
    assert(streamed.length == s.size, "streaming emitted a duplicate key")
    assert(s.nonEmpty)
    assert(s == b)
  }

  test("contaminationGate on a document stream equals the batch gate, " +
      "and flags every truly contaminated document") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ext.TextOps
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import spark.implicits._

    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val evalDocs = docs.filter(col("doc_id") % 50 === 0)
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val bloom = TextOps.bannedGramBloom(evalDocs, "text", k = 3)

    val batchGate = TextOps.contaminationGate(train, "text", 3, bloom)
      .select(col("doc_id"), col("n_candidate_grams"), col("flagged"))
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap

    val mem = MemoryStream[(Long, String)]
    mem.addData(train.collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq: _*)
    val q = TextOps.contaminationGate(
        mem.toDF().toDF("doc_id", "text"), "text", 3, bloom)
      .writeStream.format("memory").queryName("parity_gate")
      .outputMode(OutputMode.Append).start()
    val streamed =
      try { q.processAllAvailable(); spark.table("parity_gate").collect() }
      finally q.stop()
    val s = streamed
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_candidate_grams"), r.getAs[Boolean]("flagged"))).toMap

    assert(s.nonEmpty)
    assert(s == batchGate) // the same map-only expressions, both modes

    // no false negatives: everything the EXACT operator calls
    // contaminated must be flagged by the gate (the converse — a few
    // over-flagged clean docs at the fpp rate — is the design)
    val trulyContaminated = TextOps.contaminationFlags(
        train, evalDocs, "doc_id", "text", 3)
      .filter(col("contaminated")).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(trulyContaminated.nonEmpty, "fixture should carry contamination")
    assert(trulyContaminated.forall(id => s(id)._2),
      "gate missed a truly contaminated document")
  }

  test("the LEARNED stack is stream-safe: classifier score, subword " +
      "pricing, language-ID-with-CALIBRATED-reject, the calibrated " +
      "quality probability, and the per-language gate score a " +
      "document stream IDENTICALLY to batch — every serving path " +
      "(r18/r19 calibration and per-lang dispatch included) is a " +
      "stateless map-only expression, so a streaming curation gate " +
      "needs no extra machinery") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ext.{CalibrationMaps, LangIdWeights, TextOps}
    import graft.queries.ExtensionQueries
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    import spark.implicits._

    val docs = Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    def gate(df: DataFrame): DataFrame = {
      val scores = org.apache.spark.sql.graft.SubwordFunctions
        .hashedGramScoreVec(col("text"),
          LangIdWeights.weights.map(_.toIndexedSeq),
          LangIdWeights.biases)
      df.select(col("doc_id"), col("text"),
          round(TextOps.qualityLrScore(col("text")), 6).as("quality"),
          TextOps.subwordTokenCount(col("text")).as("n_tok"),
          scores.as("__s"))
        .withColumn("__best",
          ExtensionQueries.langIdBest(LangIdWeights.langs, col("__s")))
        .withColumn("pred_lang",
          ExtensionQueries.langIdPredictedOrUnd(col("__best")))
        // the r17 per-language pricing rides the same stateless path
        .withColumn("n_tok_lang",
          TextOps.subwordTokenCountByLang(col("text"), col("pred_lang")))
        // r18/r19: the committed isotonic correction (q184's serving
        // path) and the per-language gate dispatch are array lookups —
        // stateless too
        .withColumn("quality_cal_u", ExtensionQueries.calMicro(
          col("quality"), CalibrationMaps.qualityCalMicro))
        .withColumn("gate_lang",
          round(ExtensionQueries.qualityLrScoreByLang(col("text"),
            col("pred_lang")), 6) >= CalibrationMaps.perLangGateRawCut)
        .select(col("doc_id"), col("quality"), col("n_tok"),
          col("pred_lang"), col("n_tok_lang"), col("quality_cal_u"),
          col("gate_lang"))
    }
    def toMapOf(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap

    val batch = toMapOf(gate(docs).collect())
    val mem = MemoryStream[(Long, String)]
    mem.addData(docs.collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq: _*)
    val q = gate(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("parity_learned_gate")
      .outputMode(OutputMode.Append).start()
    val streamed =
      try {
        q.processAllAvailable()
        toMapOf(spark.table("parity_learned_gate").collect())
      } finally q.stop()
    assert(streamed.nonEmpty)
    assert(streamed == batch)
    // the stream really exercised the reject path too, and the
    // per-language pricing genuinely repriced something (global vs
    // per-lang token counts differ somewhere)
    assert(streamed.values.exists(_._3 == "und"))
    assert(streamed.values.exists(_._3 != "und"))
    assert(streamed.values.exists(v => v._2 != v._4))
    // the calibration genuinely corrected something (raw micro !=
    // calibrated micro somewhere) and the per-lang gate split the
    // corpus (both verdicts occur)
    assert(streamed.values.exists(v =>
      math.round(v._1 * 1000000) != v._5))
    assert(streamed.values.exists(_._6) && streamed.values.exists(!_._6))
  }
}
