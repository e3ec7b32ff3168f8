package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Video near-dup as frame-fingerprint SET similarity, and the
  * generalized set-MinHash operator underneath it.
  */
class VideoNearDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("setNearDupPairs: identical sets score 1.0, disjoint sets never " +
      "pair, duplicate elements collapse (set semantics)") {
    val elems = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (2L, "c"), (2L, "c"), (2L, "a"), // dups collapse
      (3L, "x"), (3L, "y"), (3L, "z")
    ).toDF("id", "e")
    val pairs = DedupOps.setNearDupPairs(elems, "id", "e",
        numBands = 8, rowsPerBand = 2, minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("setNearDupPairs agrees with the text MinHash chain when elements " +
      "ARE the shingles (one family, one code path)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "utterly different material about spark physical plans")
    ).toDF("doc_id", "text")
    val viaText = DedupOps.minHashLshPairs(docs, k = 3, numBands = 8,
        rowsPerBand = 2, minJaccard = 0.8, portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // hand-exploded shingle elements through the generalized operator
    val elems = docs
      .select(col("doc_id"), explode(TextOps.shingles(
        TextOps.tokens(col("text")), 3)).as("e"))
    val viaSets = DedupOps.setNearDupPairs(elems, "doc_id", "e",
        numBands = 8, rowsPerBand = 2, minJaccard = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaText == viaSets && viaText.nonEmpty)
  }

  test("videoFrameNearDupPairs: same-group clips (shared frames) pair, " +
      "cross-group clips don't, frame-less media drops out") {
    val ids = (0L until 80L).toDF("doc_id") // groups 0..39, 2 members each
    val media = MultimodalOps.syntheticVideos(spark, ids, groups = 40).toDF()
      .union(Seq(MultimodalOps.MediaRecord(900L, "video/x-synthetic", 3L,
        Array[Byte](1, 2, 3))).toDF()) // < 100 bytes: zero frames
    val pairs = MultimodalOps.videoFrameNearDupPairs(spark, media, everyN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.nonEmpty)
    // every surfaced pair is same-group; the estimate respects minJaccard
    pairs.foreach { case (a, b, j) =>
      assert(a % 40 == b % 40, s"cross-group pair ($a,$b) surfaced")
      assert(j >= 0.4)
      assert(a < 900L && b < 900L)
    }
    // most groups produce their pair (signature estimate is noisy but
    // true Jaccard ~0.75 sits far above the 0.4 threshold)
    assert(pairs.length >= 30, s"only ${pairs.length}/40 groups paired")
  }

  test("videoFrameNearDupPairs honors the frame-sampling stride") {
    // with everyN = 24 only frame 0 is sampled: videos collide iff frame 0
    // matches, which holds exactly for same-group ids whose frame 0 is
    // group-keyed ((id*31 + 0) % 8 != 0)
    val ids = (0L until 80L).toDF("doc_id")
    val media = MultimodalOps.syntheticVideos(spark, ids, groups = 40).toDF()
    val pairs = MultimodalOps.videoFrameNearDupPairs(spark, media,
        everyN = 24, minJaccard = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(a % 40 == b % 40)
      assert((a * 31) % 8 != 0 && (b * 31) % 8 != 0,
        s"($a,$b): an id-unique frame 0 cannot match anything")
    }
  }
}
