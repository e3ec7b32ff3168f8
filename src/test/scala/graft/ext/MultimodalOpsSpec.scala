package graft.ext

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("packDocuments produces the binary-payload schema contract") {
    val docs = Seq((1L, "hello"), (2L, "wörld")).toDF("doc_id", "text")
    val media = MultimodalOps.packDocuments(docs)
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "mime", "n_bytes", "payload"))
    assert(media.schema("payload").dataType.typeName == "binary")
    val r = media.orderBy("media_id").collect()
    assert(r(0).getLong(2) == 5L)
    assert(r(1).getLong(2) == 6L)  // ö is 2 bytes in utf-8
  }

  test("extractFeatures is deterministic and partition-local") {
    val docs = (1L to 100L).map(i => (i, s"document number $i with text"))
      .toDF("doc_id", "text").repartition(7)
    val media = MultimodalOps.packDocuments(docs)
    val f1 = MultimodalOps.extractFeatures(spark, media)
    // plumbing: mapPartitions must not introduce a shuffle
    assert(f1.rdd.getNumPartitions == 7)
    val a = f1.collect().sortBy(_.media_id)
    val b = MultimodalOps.extractFeatures(spark, media).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    // features derive from payload deterministically
    val one = a.find(_.media_id == 1L).get
    assert(one.width == (one.n_bytes % 640).toInt)
    assert(one.checksum != 0L)
  }

  test("sampleFrames slices every Nth 100-byte frame, no shuffle") {
    val docs = Seq((1L, "x" * 250), (2L, "y" * 99), (3L, "z" * 900))
      .toDF("doc_id", "text").repartition(3)
    val media = MultimodalOps.packDocuments(docs)
    val frames = MultimodalOps.sampleFrames(spark, media, everyN = 4)
    assert(frames.rdd.getNumPartitions == 3) // partition-local fan-out
    val rows = frames.collect().sortBy(f => (f.media_id, f.frame_idx))
    // doc1: 2 frames → sample idx 0; doc2: 0 frames; doc3: 9 → idx 0,4,8
    assert(rows.map(f => (f.media_id, f.frame_idx)).toSeq ==
      Seq((1L, 0), (3L, 0), (3L, 4), (3L, 8)))
    assert(rows.forall(_.frame_bytes.length == 100))
    assert(rows.find(f => f.media_id == 3L && f.frame_idx == 4)
      .get.frame_bytes.forall(_ == 'z'.toByte))
  }

  test("resizeFit aspect-fits without upscaling") {
    val feats = Seq((1L, 640, 240), (2L, 100, 50), (3L, 320, 480))
      .toDF("media_id", "width", "height")
    val out = MultimodalOps.resizeFit(feats, 320, 240).orderBy("media_id")
      .select("media_id", "out_w", "out_h").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out(0) == ((1L, 320, 120))) // scale 0.5 on width
    assert(out(1) == ((2L, 100, 50))) // never upscale
    assert(out(2) == ((3L, 160, 240))) // scale 0.5 on height
  }

  test("decodeStub checksum distinguishes payloads") {
    val r1 = MultimodalOps.decodeStub(
      MultimodalOps.MediaRecord(1, "text/plain", 3, Array[Byte](1, 2, 3)))
    val r2 = MultimodalOps.decodeStub(
      MultimodalOps.MediaRecord(2, "text/plain", 3, Array[Byte](1, 2, 4)))
    assert(r1.checksum != r2.checksum)
  }
}
