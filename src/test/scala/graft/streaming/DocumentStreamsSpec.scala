package graft.streaming

import java.sql.Timestamp

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class DocumentStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  // long, stopword-rich prose scores high; "!!! ??? !!!" scores low
  private val goodText =
    "the quick brown fox jumps over the lazy dog and it is a fine day " +
      "for all of the animals in the big green field to run and play"

  test("cleanIngest quality-filters and dedups a document stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocumentStreams.Doc]
    val q = DocumentStreams.cleanIngest(mem.toDF(), "10 minutes",
        minQuality = 0.5)
      .writeStream.format("memory").queryName("clean_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        DocumentStreams.Doc(ts(1), 1L, "en", goodText),
        DocumentStreams.Doc(ts(2), 2L, "en", "!!! ??? !!!"),   // low quality
        DocumentStreams.Doc(ts(3), 3L, "en", goodText))        // duplicate of 1
      q.processAllAvailable()
      // a later batch: new doc kept, in-horizon duplicate still dropped
      mem.addData(
        DocumentStreams.Doc(ts(5), 4L, "en", goodText + " extra words"),
        DocumentStreams.Doc(ts(6), 5L, "en", goodText))
      q.processAllAvailable()
      val kept = spark.table("clean_out").collect().map(_.getAs[Long]("doc_id"))
      assert(kept.sorted.toSeq == Seq(1L, 4L))
      val quality = spark.table("clean_out").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
      assert(quality.values.forall(_ >= 0.5))
    } finally q.stop()
  }

  test("cleanIngest repetition gate drops degenerate docs statelessly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocumentStreams.Doc]
    // "the is ... the is" repeated: quality is fine (stopword-rich), but
    // nearly every 2-gram is a duplicate
    val repetitive = Seq.fill(30)("the is a of and to in it").mkString(" ")
    val q = DocumentStreams.cleanIngest(mem.toDF(), "10 minutes",
        minQuality = 0.3, maxDup2Frac = 0.5)
      .writeStream.format("memory").queryName("gate_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        DocumentStreams.Doc(ts(1), 1L, "en", goodText),
        DocumentStreams.Doc(ts(2), 2L, "en", repetitive))
      q.processAllAvailable()
      val kept = spark.table("gate_out").collect().map(_.getAs[Long]("doc_id"))
      assert(kept.toSeq == Seq(1L))
    } finally q.stop()
  }
}
