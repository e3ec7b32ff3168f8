package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Perceptual audio near-dup: the energy-envelope difference hash over
  * decoded PCM and its pairing through the shared Hamming banding — the
  * audio sibling of ImageDHashSpec. Pins concrete hash values, the
  * volume-scale and naive-upsample invariances that make the hash
  * perceptual, and a Spark-free differential model of the full pipeline.
  */
class AudioHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val NFrames = 65 * 32

  private def wavBytes(samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => b.putShort(s.toShort))
    b.array()
  }

  private def samplesOf(id: Long): Array[Int] =
    Array.tabulate(NFrames)(t => MultimodalOps.syntheticSample(id, t, 50))

  private def rec(id: Long, bytes: Array[Byte]): MultimodalOps.MediaRecord =
    MultimodalOps.MediaRecord(id, "audio/wav", bytes.length.toLong, bytes)

  private def ahashOf(r: MultimodalOps.MediaRecord): Long = {
    val w = MultimodalOps.wavPcm(r.payload).get
    MultimodalOps.audioEnvHash64(r.payload, w).get
  }

  test("audio hash values are pinned for the synthetic fixtures") {
    assert(ahashOf(rec(0L, wavBytes(samplesOf(0L)))) == 4760595360953942544L)
    assert(ahashOf(rec(1L, wavBytes(samplesOf(1L)))) == -8916526855687486430L)
    val far = java.lang.Long.bitCount(
      ahashOf(rec(0L, wavBytes(samplesOf(0L)))) ^
      ahashOf(rec(1L, wavBytes(samplesOf(1L)))))
    assert(far == 26, s"cross-group distance drifted: $far")
  }

  test("uniform volume scaling hashes IDENTICALLY (envelope slopes are " +
      "scale-invariant) — including a REAL 2x-amplified byte stream") {
    val base = samplesOf(7L)
    val loud = base.map(_ * 2) // still < 2^15 by the formula's headroom
    assert(ahashOf(rec(1L, wavBytes(base))) == ahashOf(rec(2L, wavBytes(loud))))
    // and the fixture's own scale classes: ids 7, 57, 107 share group 7
    // at volumes 1x/2x/3x
    assert(ahashOf(rec(7L, wavBytes(samplesOf(7L)))) ==
           ahashOf(rec(57L, wavBytes(samplesOf(57L)))))
    assert(ahashOf(rec(7L, wavBytes(samplesOf(7L)))) ==
           ahashOf(rec(107L, wavBytes(samplesOf(107L)))))
  }

  test("a naive 2x upsample (frame duplication) hashes IDENTICALLY " +
      "(box means are invariant to replication)") {
    val base = samplesOf(3L)
    val up = base.flatMap(s => Array(s, s))
    assert(ahashOf(rec(1L, wavBytes(base))) == ahashOf(rec(2L, wavBytes(up))))
  }

  test("the exact checksum CANNOT see a volume-scaled copy — the gap the " +
      "envelope hash closes") {
    val base = samplesOf(7L)
    val loud = base.map(_ * 2)
    val csA = MultimodalOps.decodeWav(rec(1L, wavBytes(base))).checksum
    val csB = MultimodalOps.decodeWav(rec(2L, wavBytes(loud))).checksum
    assert(csA != csB)
  }

  test("audioNearDupPairs matches a Spark-free differential model and " +
      "excludes undecodable records") {
    val ids = (0L until 60L).toSeq
    val good = ids.map(id => rec(id, wavBytes(samplesOf(id))))
    val junk = Seq(
      MultimodalOps.MediaRecord(900L, "audio/wav", 8L,
        "RIFFbrok".getBytes("US-ASCII")),
      MultimodalOps.MediaRecord(901L, "text/plain", 3L,
        Array[Byte]('a', 'b', 'c')))
    val media = (good ++ junk).toDF().repartition(7)
    val got = MultimodalOps.audioNearDupPairs(spark, media, maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    val hs = ids.map(id => id -> ahashOf(rec(id, wavBytes(samplesOf(id))))).toMap
    val expected = (for {
      a <- ids; b <- ids if a < b
      ham = java.lang.Long.bitCount(hs(a) ^ hs(b))
      if ham <= 10
      if (0 until 4).exists(i => ((hs(a) >> (i * 16)) & 0xFFFF) ==
                                 ((hs(b) >> (i * 16)) & 0xFFFF))
    } yield (a, b, ham)).toSet
    assert(got == expected)
    assert(expected.nonEmpty, "fixture must actually produce near-dups")
    assert(!got.exists(p => p._1 >= 900L || p._2 >= 900L))
  }

  test("audioEnvHashes quarantines non-PCM and non-audio rows as " +
      "n_frames = -1; 8-bit PCM is supported") {
    // 8-bit mono: one byte per frame, centered at 128
    val dataLen = 130
    val b8 = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b8.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b8.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000)
      .putShort(1).putShort(8)
    b8.put("data".getBytes("US-ASCII")).putInt(dataLen)
    (0 until dataLen).foreach(t => b8.put(((t * 7) % 256).toByte))
    val rows = Seq(
      rec(1L, wavBytes(samplesOf(0L))),
      MultimodalOps.MediaRecord(2L, "audio/wav", 44 + dataLen.toLong,
        b8.array()),
      MultimodalOps.MediaRecord(3L, "audio/wav", 8L,
        "RIFFbrok".getBytes("US-ASCII")),
      MultimodalOps.MediaRecord(4L, "image/png", 3L, Array[Byte](1, 2, 3)))
    val out = MultimodalOps.audioEnvHashes(spark, rows.toDF())
      .collect().sortBy(_.media_id)
    assert(out(0).n_frames == NFrames)
    assert(out(1).n_frames == dataLen) // 8-bit mono: 1 byte per frame
    assert(out(2).n_frames == -1 && out(2).ahash == 0L)
    assert(out(3).n_frames == -1)
  }
}
