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

    // batch twin: session_window's window.end is last_event + gap, so
    // sess_end ≡ sw.end - gap; same rounding as sessionize's emit
    val batch = real
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMin minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total"))
      .select(col("user_id"), col("sw.start").as("sess_start"),
        (col("sw.end") - expr(s"INTERVAL $gapMin MINUTES")).as("sess_end"),
        col("n_events"), col("total"))
      .collect()

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
}
