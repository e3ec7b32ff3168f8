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

  test("decodeStub checksum distinguishes payloads") {
    val r1 = MultimodalOps.decodeStub(
      MultimodalOps.MediaRecord(1, "text/plain", 3, Array[Byte](1, 2, 3)))
    val r2 = MultimodalOps.decodeStub(
      MultimodalOps.MediaRecord(2, "text/plain", 3, Array[Byte](1, 2, 4)))
    assert(r1.checksum != r2.checksum)
  }
}
