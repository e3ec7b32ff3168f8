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

  // --- real image decode: cross-format differential -----------------------

  /** Deterministic synthetic RGB image, row-major top-down. */
  private def pixel(x: Int, y: Int): (Int, Int, Int) =
    ((x * 7 + y * 13) % 256, (x * 3 + y * 5 + 17) % 256, (x + y * 29 + 91) % 256)

  private def ppmBytes(w: Int, h: Int): Array[Byte] = {
    val hdr = s"P6\n# synthetic fixture\n$w $h\n255\n".getBytes("US-ASCII")
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pixel(x, y)
      val o = (y * w + x) * 3
      px(o) = r.toByte; px(o + 1) = g.toByte; px(o + 2) = b.toByte
    }
    hdr ++ px
  }

  /** 24-bit uncompressed BMP; bottomUp = the standard positive-height
    * layout with 4-byte row padding, else the top-down negative-height
    * variant.
    */
  private def bmpBytes(w: Int, h: Int, bottomUp: Boolean): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val size = 54 + stride * h
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(if (bottomUp) h else -h)
      .putShort(1).putShort(24).putInt(0).putInt(stride * h)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (row <- 0 until h) {
      val y = if (bottomUp) h - 1 - row else row // stored-row → visual-row
      for (x <- 0 until w) {
        val (r, g, bl) = pixel(x, y)
        b.put(bl.toByte).put(g.toByte).put(r.toByte) // BGR on disk
      }
      for (_ <- w * 3 until stride) b.put(0.toByte)
    }
    b.array()
  }

  test("PPM and BMP decoders agree bit-for-bit on the same image, through " +
      "the distributed extractFeatures pass") {
    val (w, h) = (13, 7) // odd width → nonzero BMP row padding
    val png = { // same pixels through the ImageIO decode path, in-executor
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = pixel(x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val bo = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bo)
      bo.toByteArray
    }
    val rows = Seq(
      MultimodalOps.MediaRecord(1L, "image/x-portable-pixmap",
        ppmBytes(w, h).length.toLong, ppmBytes(w, h)),
      MultimodalOps.MediaRecord(2L, "image/bmp",
        bmpBytes(w, h, bottomUp = true).length.toLong, bmpBytes(w, h, bottomUp = true)),
      MultimodalOps.MediaRecord(3L, "image/bmp",
        bmpBytes(w, h, bottomUp = false).length.toLong, bmpBytes(w, h, bottomUp = false)),
      MultimodalOps.MediaRecord(4L, "image/png", png.length.toLong, png))
    val out = MultimodalOps
      .extractFeatures(spark, rows.toDF().repartition(4))
      .collect().sortBy(_.media_id)
    assert(out.forall(f => f.width == w && f.height == h && f.n_frames == 1))
    // same pixels → same checksum, regardless of container format, row
    // order (BMP bottom-up AND top-down), or decode path (hand parser vs
    // ImageIO inside executor threads)
    assert(out(0).checksum == out(1).checksum)
    assert(out(0).checksum == out(2).checksum)
    assert(out(0).checksum == out(3).checksum)
  }

  test("malformed image payloads quarantine instead of killing the job") {
    val bad = Seq(
      // truncated raster: header claims more pixels than the payload holds
      MultimodalOps.MediaRecord(1L, "image/x-portable-pixmap", 20L,
        "P6\n100 100\n255\nxx".getBytes("US-ASCII")),
      // not a BMP at all
      MultimodalOps.MediaRecord(2L, "image/bmp", 4L, Array[Byte](1, 2, 3, 4)),
      // BMP with an unsupported bpp (8-bit) — header valid otherwise
      MultimodalOps.MediaRecord(3L, "image/bmp", 60L, {
        val a = bmpBytes(2, 2, bottomUp = true)
        a(28) = 8; a
      }))
    val out = MultimodalOps.extractFeatures(spark, bad.toDF())
      .collect().sortBy(_.media_id)
    assert(out.forall(f => f.width == -1 && f.height == -1 && f.n_frames == 0))
  }

  test("MIME dispatch, not magic sniffing: text that starts with P6 keeps " +
      "its stub features") {
    val textPayload = "P6 is a pixmap magic number".getBytes("UTF-8")
    val r = MultimodalOps.MediaRecord(1L, "text/plain",
      textPayload.length.toLong, textPayload)
    assert(MultimodalOps.decode(r) == MultimodalOps.decodeStub(r))
  }

  /** Minimal PCM WAV: RIFF/WAVE + fmt (PCM) + an extra LIST chunk with an
    * ODD size (exercises the even-padding rule) + data.
    */
  private def wavBytes(channels: Int, bits: Int, nFrames: Int): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val data = Array.tabulate(nFrames * blockAlign)(i => ((i * 37) % 251).toByte)
    val odd = Array[Byte]('x', 'y', 'z') // 3-byte chunk → 1 pad byte
    val size = 4 + (8 + 16) + (8 + odd.length + 1) + (8 + data.length)
    val b = java.nio.ByteBuffer.allocate(8 + size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(size)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort)
      .putInt(8000).putInt(8000 * blockAlign)
      .putShort(blockAlign.toShort).putShort(bits.toShort)
    b.put("LIST".getBytes("US-ASCII")).putInt(odd.length).put(odd)
      .put(0.toByte) // RIFF even padding
    b.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    b.array()
  }

  test("decodeWav parses PCM WAV with odd-sized chunks; non-PCM quarantines") {
    val p = wavBytes(channels = 2, bits = 16, nFrames = 50)
    val f = MultimodalOps.decode(
      MultimodalOps.MediaRecord(1L, "audio/wav", p.length.toLong, p))
    assert(f.width == 2)      // channels
    assert(f.height == 16)    // bits per sample
    assert(f.n_frames == 50)  // sample frames
    // same samples, different container junk ahead → same checksum path
    val f2 = MultimodalOps.decode(
      MultimodalOps.MediaRecord(2L, "audio/x-wav", p.length.toLong, p))
    assert(f.checksum == f2.checksum)
    // audioFormat != 1 (e.g. float PCM) is not parseable here → quarantine
    val nonPcm = p.clone(); nonPcm(20) = 3
    val q = MultimodalOps.decode(
      MultimodalOps.MediaRecord(3L, "audio/wav", nonPcm.length.toLong, nonPcm))
    assert(q.width == -1 && q.n_frames == 0)
  }

  // --- ImageIO formats (JPEG/PNG/GIF) --------------------------------------

  private def syntheticImage(w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pixel(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def encode(img: java.awt.image.BufferedImage,
                     fmt: String): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bo), s"no $fmt writer")
    bo.toByteArray
  }

  test("PNG (ImageIO) and BMP (hand parser) decode the same image to the " +
      "same checksum — the cross-decoder differential") {
    val (w, h) = (13, 7)
    val png = encode(syntheticImage(w, h), "png") // PNG is lossless
    val fp = MultimodalOps.decode(
      MultimodalOps.MediaRecord(1L, "image/png", png.length.toLong, png))
    val bmp = bmpBytes(w, h, bottomUp = true)
    val fb = MultimodalOps.decode(
      MultimodalOps.MediaRecord(2L, "image/bmp", bmp.length.toLong, bmp))
    assert(fp.width == w && fp.height == h && fp.n_frames == 1)
    assert(fp.checksum == fb.checksum,
      "ImageIO path must emit the same top-down RGB checksum stream")
  }

  test("GIF decodes losslessly for a palette image and agrees with PNG") {
    // two-color palette → the GIF writer cannot quantize lossily
    val (w, h) = (9, 5)
    val cmap = Array(0xFF000000, 0xFFFFFFFF)
    val icm = new java.awt.image.IndexColorModel(
      1, 2, cmap, 0, false, -1, java.awt.image.DataBuffer.TYPE_BYTE)
    val gifImg = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_BINARY, icm)
    val rgbImg = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val on = (x + y) % 2 == 0
      gifImg.setRGB(x, y, if (on) 0xFFFFFF else 0x000000)
      rgbImg.setRGB(x, y, if (on) 0xFFFFFF else 0x000000)
    }
    val gif = encode(gifImg, "gif")
    val png = encode(rgbImg, "png")
    val fg = MultimodalOps.decode(
      MultimodalOps.MediaRecord(1L, "image/gif", gif.length.toLong, gif))
    val fp = MultimodalOps.decode(
      MultimodalOps.MediaRecord(2L, "image/png", png.length.toLong, png))
    assert(fg.width == w && fg.height == h && fg.n_frames == 1)
    assert(fg.checksum == fp.checksum)
  }

  test("animated GIF reports its frame count in n_frames") {
    val (w, h) = (6, 4)
    val bo = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bo)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until 3) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if ((x + y + f) % 2 == 0) 0xFFFFFF else 0x000000)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    val gif = bo.toByteArray
    val feat = MultimodalOps.decode(
      MultimodalOps.MediaRecord(1L, "image/gif", gif.length.toLong, gif))
    assert(feat.width == w && feat.height == h)
    assert(feat.n_frames == 3)
  }

  test("JPEG decodes real dimensions; truncated payloads quarantine") {
    val (w, h) = (32, 24)
    val jpg = encode(syntheticImage(w, h), "jpg")
    val f = MultimodalOps.decode(
      MultimodalOps.MediaRecord(1L, "image/jpeg", jpg.length.toLong, jpg))
    assert(f.width == w && f.height == h && f.n_frames == 1)
    // lossy, so no cross-format pixel equality — but decode is
    // deterministic for fixed bytes
    val f2 = MultimodalOps.decode(
      MultimodalOps.MediaRecord(9L, "image/jpeg", jpg.length.toLong, jpg))
    assert(f.checksum == f2.checksum)
    for ((mime, bytes) <- Seq(
        "image/jpeg" -> jpg.take(jpg.length / 2),       // truncated stream
        "image/png"  -> "not a png at all".getBytes("UTF-8"),
        "image/gif"  -> Array[Byte](1, 2, 3))) {
      val q = MultimodalOps.decode(
        MultimodalOps.MediaRecord(3L, mime, bytes.length.toLong, bytes))
      assert(q.width == -1 && q.height == -1 && q.n_frames == 0,
        s"$mime with malformed bytes must quarantine")
    }
  }

  test("WAV chunk walk survives a near-2^31 declared chunk size " +
      "(quarantines, no index crash)") {
    // RIFF/WAVE then one chunk declaring ~Int.MaxValue bytes: an Int
    // offset walk wraps negative and crashes; the Long walk must exit
    // and quarantine (fmt/data never found)
    val b = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(56)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("JUNK".getBytes("US-ASCII")).putInt(0x7FFFFFF8)
    val p = b.array()
    val q = MultimodalOps.decode(
      MultimodalOps.MediaRecord(1L, "audio/wav", p.length.toLong, p))
    assert(q.width == -1 && q.n_frames == 0)
  }

  test("WAV with two data chunks and a late fmt uses the FIRST data chunk " +
      "for both size and bytes") {
    val d1 = Array.tabulate(40)(i => (i % 100).toByte)         // 10 frames
    val d2 = Array.tabulate(80)(i => ((i * 3) % 100).toByte)   // different
    val size = 4 + (8 + d1.length) + (8 + 16) + (8 + d2.length)
    val b = java.nio.ByteBuffer.allocate(8 + size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(size)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("data".getBytes("US-ASCII")).putInt(d1.length).put(d1)
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(8000).putInt(8000 * 4)
      .putShort(4).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(d2.length).put(d2)
    val p = b.array()
    val f = MultimodalOps.decode(
      MultimodalOps.MediaRecord(1L, "audio/wav", p.length.toLong, p))
    assert(f.width == 2 && f.height == 16)
    assert(f.n_frames == 10, "frame count must come from the FIRST data chunk")
    // checksum over d1's bytes exactly: rebuild the expected stream
    var cs = 1125899906842597L
    d1.foreach(x => cs = cs * 31 + (x & 0xFF))
    assert(f.checksum == cs)
  }

  test("decompressPayloads inflates +gzip records, passes others through, " +
      "quarantines corrupt streams") {
    def gz(s: String): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(s.getBytes("UTF-8")); g.close()
      bo.toByteArray
    }
    val text = "the quick brown fox " * 50
    val gzBytes = gz(text)
    val corrupt = gzBytes.take(gzBytes.length - 4) ++ Array[Byte](0, 0, 0, 0)
    val plain = "already plain".getBytes("UTF-8")
    val rows = Seq(
      MultimodalOps.MediaRecord(1L, "text/plain+gzip", gzBytes.length.toLong, gzBytes),
      MultimodalOps.MediaRecord(2L, "application/gzip", gzBytes.length.toLong, gzBytes),
      MultimodalOps.MediaRecord(3L, "text/plain", plain.length.toLong, plain),
      MultimodalOps.MediaRecord(4L, "text/plain+gzip", corrupt.length.toLong, corrupt))
    val out = MultimodalOps.decompressPayloads(spark, rows.toDF())
      .collect().sortBy(_.media_id)
    assert(out(0).mime == "text/plain" &&
      new String(out(0).payload, "UTF-8") == text &&
      out(0).n_bytes == text.getBytes("UTF-8").length)
    assert(out(1).mime == "application/octet-stream" &&
      new String(out(1).payload, "UTF-8") == text)
    assert(out(2).mime == "text/plain" && (out(2).payload sameElements plain))
    // corrupt: marked, original payload kept for triage
    assert(out(3).mime == "application/x-corrupt-gzip" &&
      (out(3).payload sameElements corrupt))
  }
}
