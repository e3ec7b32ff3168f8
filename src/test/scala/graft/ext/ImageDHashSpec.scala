package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Perceptual image near-dup (VERDICT r9 #1): the dHash kernel over the
  * existing decoders' RGB output, and its pairing through the shared
  * Hamming banding. Pins concrete hash values for the synthetic fixtures
  * (so any drift in decoder, luma, grid, or bit order is loud), the
  * invariances that make the hash "perceptual" (lossless re-encode,
  * nearest-neighbor resize), and a Spark-free differential model of the
  * full pairing pipeline.
  */
class ImageDHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val W = 18; private val H = 16

  private def ppmOf(id: Long, scale: Int = 1): MultimodalOps.MediaRecord = {
    val w = W * scale; val h = H * scale
    val hdr = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      // nearest-neighbor upscale of the base image when scale > 1
      val v = MultimodalOps.syntheticPixel(id, x / scale, y / scale, 50)
      val o = (y * w + x) * 3
      px(o) = v.toByte; px(o + 1) = v.toByte; px(o + 2) = v.toByte
    }
    MultimodalOps.MediaRecord(id, "image/x-portable-pixmap",
      (hdr.length + px.length).toLong, hdr ++ px)
  }

  private def dhashOf(r: MultimodalOps.MediaRecord): Long = {
    val Some((w, h, rgb)) = MultimodalOps.rgbOf(r)
    MultimodalOps.dhash64(w, h, rgb)
  }

  test("dhash values are pinned for the synthetic fixtures (and equal " +
      "within a group)") {
    assert(dhashOf(ppmOf(0L)) == -577165676964741698L)
    assert(dhashOf(ppmOf(1L)) == -288582288734961953L)
    // ids 0 and 50 share the base pattern (group = id % 50); their sparse
    // brightness bumps differ but no gradient sign flips
    assert(dhashOf(ppmOf(50L)) == dhashOf(ppmOf(0L)))
  }

  test("a 2x nearest-neighbor upscale hashes IDENTICALLY (box means are " +
      "invariant to pixel replication)") {
    assert(dhashOf(ppmOf(0L, scale = 2)) == dhashOf(ppmOf(0L)))
    assert(dhashOf(ppmOf(7L, scale = 2)) == dhashOf(ppmOf(7L)))
  }

  test("a lossless PNG re-encode hashes IDENTICALLY through the ImageIO " +
      "decode path") {
    val base = ppmOf(3L)
    val img = new java.awt.image.BufferedImage(
      W, H, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until H; x <- 0 until W) {
      val v = MultimodalOps.syntheticPixel(3L, x, y, 50)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bo = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bo))
    val png = MultimodalOps.MediaRecord(99L, "image/png",
      bo.size().toLong, bo.toByteArray)
    assert(dhashOf(png) == dhashOf(base))
  }

  test("a LOSSY JPEG re-encode stays within a small Hamming distance " +
      "while the exact checksum diverges — the gap dHash exists to close") {
    val id = 3L
    val img = new java.awt.image.BufferedImage(
      W, H, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until H; x <- 0 until W) {
      val v = MultimodalOps.syntheticPixel(id, x, y, 50)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bo = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bo), "no jpg writer")
    val jpg = MultimodalOps.MediaRecord(77L, "image/jpeg",
      bo.size().toLong, bo.toByteArray)
    val base = ppmOf(id)
    val ham = java.lang.Long.bitCount(dhashOf(jpg) ^ dhashOf(base))
    assert(ham <= 10, s"lossy re-encode drifted to hamming $ham — " +
      "gradient signs should survive JPEG quantization")
    // the checksum path (exact dedup) CANNOT see this pair: lossy bytes
    val csJpg = MultimodalOps.decode(jpg).checksum
    val csPpm = MultimodalOps.decode(base).checksum
    assert(csJpg != csPpm, "JPEG is lossy; identical checksums would mean " +
      "the fixture stopped exercising the near-dup (vs exact) distinction")
  }

  test("perturbed copies land near, different images land far") {
    val base = ppmOf(0L)
    // brighten a single 2x2 grid block: at most a couple of gradient
    // signs can flip
    val bumped = {
      val p = base.payload.clone()
      val hdrLen = p.length - W * H * 3
      for (y <- 4 until 6; x <- 6 until 8; c <- 0 until 3) {
        val o = hdrLen + (y * W + x) * 3 + c
        p(o) = math.min(255, (p(o) & 0xFF) + 60).toByte
      }
      MultimodalOps.MediaRecord(1000L, "image/x-portable-pixmap",
        p.length.toLong, p)
    }
    val hBase = dhashOf(base); val hBumped = dhashOf(bumped)
    val near = java.lang.Long.bitCount(hBase ^ hBumped)
    assert(near <= 6, s"perturbed copy drifted to hamming $near")
    val far = java.lang.Long.bitCount(hBase ^ dhashOf(ppmOf(1L)))
    assert(far > 10, s"distinct images too close: hamming $far")
  }

  test("imageNearDupPairs matches a Spark-free differential model of " +
      "hash → band → hamming, and excludes undecodable records") {
    val ids = (0L until 60L).toSeq
    val good = ids.map(ppmOf(_))
    val junk = Seq(
      MultimodalOps.MediaRecord(900L, "image/x-portable-pixmap", 4L,
        Array[Byte]('P', '6', 0, 1)), // corrupt raster
      MultimodalOps.MediaRecord(901L, "text/plain", 3L,
        Array[Byte]('a', 'b', 'c'))) // not an image mime
    val media = (good ++ junk).toDF().repartition(7)
    val got = MultimodalOps.imageNearDupPairs(spark, media, maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    // independent model: plain Scala, no Spark
    val hs = ids.map(id => id -> dhashOf(ppmOf(id))).toMap
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

  test("imageDHashes quarantines undecodable rows as width = -1") {
    val rows = Seq(
      ppmOf(0L),
      MultimodalOps.MediaRecord(900L, "image/x-portable-pixmap", 4L,
        Array[Byte]('P', '6', 0, 1)))
    val out = MultimodalOps.imageDHashes(spark, rows.toDF())
      .collect().sortBy(_.media_id)
    assert(out(0).width == W && out(0).height == H)
    assert(out(1).width == -1 && out(1).dhash == 0L)
  }

  test("tiny images (narrower than the 9-wide grid) still hash " +
      "deterministically via in-row borrow") {
    val w = 4; val h = 3
    val hdr = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val px = Array.tabulate(w * h * 3)(i => ((i * 29) % 256).toByte)
    val r = MultimodalOps.MediaRecord(1L, "image/x-portable-pixmap",
      (hdr.length + px.length).toLong, hdr ++ px)
    assert(dhashOf(r) == dhashOf(r)) // total, deterministic, no throw
  }
}
