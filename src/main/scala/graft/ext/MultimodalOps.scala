package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.C): media as opaque `binary`
  * columns travelling next to typed metadata, with decode / feature-extract
  * as partition-local batch functions.
  *
  * Decode is REAL for the formats a bare JVM can handle: PPM P6
  * ([[decodePpm]]), uncompressed 24-bit BMP ([[decodeBmp]]) and PCM WAV
  * ([[decodeWav]]) parsed from their public specs with plain byte
  * arithmetic, and JPEG/PNG/GIF through the JDK's own `javax.imageio`
  * readers ([[decodeImageIo]]) — all dispatched by MIME. Formats beyond
  * that (video, compressed audio) need native libs this environment
  * doesn't ship and are STUBBED: [[decodeStub]] derives deterministic
  * fake features from the raw bytes. Everything else — the
  * schema contract, the typed `Dataset[MediaRecord]` boundary, the
  * mapPartitions batching (one codec init per partition, not per row),
  * and the feature schema — is the real production shape: swap the stub
  * for a JNI/codec call and nothing else changes. On a real cluster the
  * binary column stays columnar-compressed in parquet and is only
  * materialized per-partition, never on the driver.
  *
  * A malformed payload of a claimed-image MIME decodes to a QUARANTINE
  * row (width = height = −1, n_frames = 0, checksum of the raw bytes) —
  * at 100 TB one corrupt blob must mark itself for triage, not kill the
  * job.
  */
object MultimodalOps {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRecord(media_id: Long, mime: String, n_bytes: Long,
                         payload: Array[Byte])

  /** Extracted features; `width`/`n_frames` are what a real decoder would
    * emit (fake-derived here, deterministically, from payload length).
    */
  case class MediaFeatures(media_id: Long, mime: String, n_bytes: Long,
                           width: Int, height: Int, n_frames: Int,
                           checksum: Long)

  /** Pack documents into media records: utf-8 bytes as the opaque payload.
    * Stand-in for reading image/audio blobs from parquet binary columns.
    */
  def packDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("mime"),
      octet_length(encode(col("text"), "utf-8")).cast("long").as("n_bytes"),
      encode(col("text"), "utf-8").as("payload"))

  /** Deterministic fake decode: features from byte length + a rolling
    * checksum over the payload. Kept as the clearly-marked (???) stub
    * seam the design called for — [[decode]] now dispatches REAL codecs
    * (PPM/BMP/WAV byte parsers, JPEG/PNG/GIF via javax.imageio) for the
    * formats this container can exercise; this stub remains the
    * deterministic fallback for mimes without a bundled codec and for
    * specs that need format-independent features.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    var cs = 1125899906842597L
    var i = 0
    while (i < r.payload.length) { cs = cs * 31 + (r.payload(i) & 0xFF); i += 1 }
    MediaFeatures(
      media_id = r.media_id, mime = r.mime, n_bytes = r.n_bytes,
      width = (r.n_bytes % 640).toInt,
      height = (r.n_bytes % 480).toInt,
      n_frames = (r.n_bytes / 100).toInt,
      checksum = cs)
  }

  // --- real decoders (pure byte arithmetic, no codec libraries) ----------

  /** Pixel-checksum accumulator shared by both image decoders: row-major,
    * top-down, R then G then B per pixel — so the SAME image stored as PPM
    * and as BMP (bottom-up, BGR, padded rows) checksums identically, which
    * is the cross-format differential property MultimodalOpsSpec pins.
    */
  private def pixelChecksum(rgbTopDown: Iterator[Int]): Long = {
    var cs = 1125899906842597L
    while (rgbTopDown.hasNext) cs = cs * 31 + (rgbTopDown.next() & 0xFF)
    cs
  }

  private def quarantine(r: MediaRecord): MediaFeatures = {
    var cs = 1125899906842597L
    var i = 0
    while (i < r.payload.length) { cs = cs * 31 + (r.payload(i) & 0xFF); i += 1 }
    MediaFeatures(r.media_id, r.mime, r.n_bytes,
      width = -1, height = -1, n_frames = 0, checksum = cs)
  }

  /** PPM P6 (netpbm spec): ASCII header `P6 <w> <h> <maxval>` with
    * `#`-comments, one whitespace byte, then w×h binary RGB triples
    * (maxval ≤ 255 → 1 byte/channel). Returns the top-down row-major RGB
    * channel stream, or None on any malformed header/raster.
    */
  private[ext] def ppmRgb(p: Array[Byte]): Option[(Int, Int, Iterator[Int])] = {
    var i = 2 // past "P6"
    def skipWs(): Unit = {
      var done = false
      while (!done && i < p.length) {
        val c = p(i).toChar
        if (c == '#') { while (i < p.length && p(i) != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else done = true
      }
    }
    def int(): Long = {
      skipWs()
      var v = -1L
      while (i < p.length && p(i) >= '0' && p(i) <= '9') {
        v = math.max(0L, v) * 10 + (p(i) - '0'); i += 1
      }
      v
    }
    val w = int(); val h = int(); val maxv = int()
    i += 1 // exactly one whitespace byte before the raster
    if (p.length < 2 || p(0) != 'P' || p(1) != '6' ||
        w <= 0 || h <= 0 || maxv <= 0 || maxv > 255 ||
        w > (1 << 20) || h > (1 << 20) ||
        p.length - i < w * h * 3) return None
    val start = i
    Some((w.toInt, h.toInt,
      Iterator.range(0, (w * h * 3).toInt).map(k => p(start + k).toInt)))
  }

  def decodePpm(r: MediaRecord): MediaFeatures = ppmRgb(r.payload) match {
    case Some((w, h, rgb)) =>
      MediaFeatures(r.media_id, r.mime, r.n_bytes,
        width = w, height = h, n_frames = 1, checksum = pixelChecksum(rgb))
    case None => quarantine(r)
  }

  /** Uncompressed 24-bit BMP (Windows BITMAPINFOHEADER): `BM`, pixel-array
    * offset at byte 10, width/height (signed — negative height = top-down)
    * at 18/22, bpp at 28, compression 0 at 30; rows are BGR, padded to 4
    * bytes, stored bottom-up unless top-down. Normalized to the same
    * top-down RGB checksum stream as [[decodePpm]].
    */
  private[ext] def bmpRgb(p: Array[Byte]): Option[(Int, Int, Iterator[Int])] = {
    def u16(o: Int): Int = (p(o) & 0xFF) | ((p(o + 1) & 0xFF) << 8)
    def i32(o: Int): Int = (p(o) & 0xFF) | ((p(o + 1) & 0xFF) << 8) |
      ((p(o + 2) & 0xFF) << 16) | ((p(o + 3) & 0xFF) << 24)
    if (p.length < 54 || p(0) != 'B' || p(1) != 'M') return None
    val off = i32(10); val w = i32(18); val hRaw = i32(22)
    val bpp = u16(28); val comp = i32(30)
    val topDown = hRaw < 0
    val h = math.abs(hRaw.toLong)
    val stride = ((w.toLong * 3 + 3) / 4) * 4
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20) ||
        bpp != 24 || comp != 0 || off < 54 ||
        off.toLong + stride * h > p.length) return None
    val rgb = for {
      y <- Iterator.range(0, h.toInt)
      row = if (topDown) y else h.toInt - 1 - y
      x <- Iterator.range(0, w)
      c <- Iterator(2, 1, 0) // stored BGR → emit RGB
    } yield p(off + row * stride.toInt + x * 3 + c).toInt
    Some((w, h.toInt, rgb))
  }

  def decodeBmp(r: MediaRecord): MediaFeatures = bmpRgb(r.payload) match {
    case Some((w, h, rgb)) =>
      MediaFeatures(r.media_id, r.mime, r.n_bytes,
        width = w, height = h, n_frames = 1, checksum = pixelChecksum(rgb))
    case None => quarantine(r)
  }

  /** PCM WAV (RIFF spec): `RIFF….WAVE`, then even-aligned chunks; `fmt `
    * must declare audioFormat 1 (PCM), `data` carries the samples. The
    * image-shaped feature schema is reused with a documented mapping:
    * width = channels, height = bits per sample, n_frames = sample frames
    * (data bytes / block align), checksum over the PCM bytes.
    */
  def decodeWav(r: MediaRecord): MediaFeatures = {
    wavPcm(r.payload) match {
      case Some(w) =>
        MediaFeatures(r.media_id, r.mime, r.n_bytes,
          width = w.channels, height = w.bits,
          n_frames = (w.dataLen / w.blockAlign).toInt,
          checksum = pixelChecksum(
            Iterator.range(0, w.dataLen.toInt)
              .map(k => r.payload(w.dataOff + k).toInt)))
      case None => quarantine(r)
    }
  }

  /** Parsed PCM WAV layout: the `fmt ` declaration plus the first `data`
    * chunk's byte window into the payload.
    */
  private[ext] final case class WavPcm(channels: Int, bits: Int,
                                       blockAlign: Int, dataOff: Int,
                                       dataLen: Long)

  /** The RIFF chunk walk shared by [[decodeWav]] and the audio-hash path;
    * None on anything that isn't well-formed PCM (the quarantine cases
    * MultimodalOpsSpec pins: non-PCM format codes, missing chunks,
    * truncated headers).
    */
  private[ext] def wavPcm(p: Array[Byte]): Option[WavPcm] = {
    def u16(o: Int): Int = (p(o) & 0xFF) | ((p(o + 1) & 0xFF) << 8)
    def u32(o: Int): Long = (u16(o).toLong) | (u16(o + 2).toLong << 16)
    def tag(o: Int): String =
      new String(p, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (p.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE")
      return None
    // chunk offsets walk in Long: a declared size near 2^31 would wrap an
    // Int offset negative and crash the index instead of quarantining
    var o = 12L
    var channels, bits, blockAlign = 0
    var pcm = false
    var dataLen = -1L
    var dataOff = -1L // recorded on FIRST sighting — a second `data`
                      // chunk must not mix its size with this one's bytes
    while (o + 8 <= p.length && (dataLen < 0 || !pcm)) {
      val oi = o.toInt // safe: o + 8 <= p.length <= Int.MaxValue
      val id = tag(oi); val size = u32(oi + 4)
      if (id == "fmt " && size >= 16 && o + 24 <= p.length) {
        pcm = u16(oi + 8) == 1
        channels = u16(oi + 10)
        blockAlign = u16(oi + 20)
        bits = u16(oi + 22)
      } else if (id == "data" && dataOff < 0) {
        dataOff = o + 8
        dataLen = math.min(size, p.length - o - 8)
      }
      o += 8 + size + (size & 1) // RIFF chunks pad to even
    }
    if (!pcm || channels <= 0 || bits <= 0 || blockAlign <= 0 ||
        dataLen < 0 || dataOff < 0) None
    else Some(WavPcm(channels, bits, blockAlign, dataOff.toInt, dataLen))
    // dataOff + dataLen <= p.length by the min above
  }

  /** JPEG/PNG/GIF via `javax.imageio` — the JDK's built-in readers, zero
    * external deps (VERDICT r8 #2). Emits the same feature mapping as the
    * hand-written image decoders: width/height from the decoded raster,
    * `n_frames` from the container's image count (animated GIF > 1), and
    * the checksum over the SAME top-down row-major RGB stream as
    * [[decodePpm]]/[[decodeBmp]] — so a lossless round-trip of one image
    * through PNG and BMP checksums identically across the two decode
    * paths (the differential property MultimodalOpsSpec pins). Any
    * malformed/truncated payload, or one no reader claims, quarantines.
    */
  /** ImageIO decode to the shared top-down RGB stream, plus the
    * container's image count. The returned iterator reads from the
    * fully-decoded in-memory BufferedImage, so it stays valid after the
    * reader/stream are disposed; malformed input throws (IOException or
    * unchecked on hostile headers) — callers map that to quarantine.
    */
  private[ext] def imageIoRgb(p: Array[Byte]): Option[(Int, Int, Int, Iterator[Int])] = {
    // memory-backed stream, NOT ImageIO.createImageInputStream: the
    // payload is already a byte array, and the factory's default
    // (useCache=true) FileCacheImageInputStream would create, write, and
    // delete a temp file on executor-local disk for EVERY media row of
    // the corpus scan
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(p))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, false, true)
        val n = try math.max(reader.getNumImages(true), 1)
                catch { case _: java.io.IOException => 1 }
        val img = reader.read(0)
        if (img == null) return None
        val w = img.getWidth; val h = img.getHeight
        // fetch pixels a ROW at a time: per-pixel getRGB(x, y) pays a
        // ColorModel conversion + bounds check per call (w·h calls; ~8M
        // for a 4K frame) on the corpus hot path
        val rowBuf = new Array[Int](w)
        val rgb = for {
          y <- Iterator.range(0, h)
          _ = img.getRGB(0, y, w, 1, rowBuf, 0, w)
          x <- Iterator.range(0, w)
          argb = rowBuf(x)
          c <- Iterator((argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF)
        } yield c
        Some((w, h, n, rgb))
      } finally reader.dispose()
    } finally if (iis != null) iis.close()
  }

  def decodeImageIo(r: MediaRecord): MediaFeatures = {
    try {
      imageIoRgb(r.payload) match {
        case Some((w, h, n, rgb)) =>
          MediaFeatures(r.media_id, r.mime, r.n_bytes,
            width = w, height = h, n_frames = n,
            checksum = pixelChecksum(rgb))
        case None => quarantine(r)
      }
    } catch {
      // ImageIO surfaces corrupt input as IOException or unchecked
      // (IllegalArgument/ArrayIndex/NegativeArraySize on hostile headers)
      case _: java.io.IOException  => quarantine(r)
      case _: RuntimeException     => quarantine(r)
    }
  }

  /** MIME-dispatched decode. Dispatch is on the DECLARED type, never on
    * magic-byte sniffing: a text document that happens to start with "P6"
    * must keep its stub features (the q32/q51 oracles depend on it), and a
    * mislabeled payload surfaces as a quarantine row rather than being
    * silently decoded as the wrong thing.
    */
  def decode(r: MediaRecord): MediaFeatures = r.mime match {
    case "image/x-portable-pixmap"      => decodePpm(r)
    case "image/bmp"                    => decodeBmp(r)
    case "image/jpeg" | "image/png" | "image/gif" => decodeImageIo(r)
    case "audio/wav" | "audio/x-wav"    => decodeWav(r)
    case _                              => decodeStub(r)
  }

  // --- perceptual image hashing (near-dup dedup over image columns) ------

  /** Decoded RGB stream for the image mimes, None for non-image mimes or
    * undecodable payloads. The dHash path shares the EXACT decoders the
    * checksum path uses — same dispatch-on-declared-MIME rule as
    * [[decode]].
    */
  private[ext] def rgbOf(r: MediaRecord): Option[(Int, Int, Iterator[Int])] =
    r.mime match {
      case "image/x-portable-pixmap" => ppmRgb(r.payload)
      case "image/bmp"               => bmpRgb(r.payload)
      case "image/jpeg" | "image/png" | "image/gif" =>
        try imageIoRgb(r.payload).map { case (w, h, _, it) => (w, h, it) }
        catch {
          case _: java.io.IOException => None
          case _: RuntimeException    => None
        }
      case _ => None
    }

  /** 64-bit difference hash (dHash) of an image: box-average the luma
    * into a 9-wide × 8-tall grid, then bit (gy·8+gx) = 1 iff
    * grid(gy,gx) > grid(gy,gx+1) — 8 horizontal gradient signs per row.
    * Gradient SIGNS survive re-encoding and (aspect-preserving) resizing,
    * which byte checksums don't: a JPEG→PNG round-trip or a 2× downscale
    * keeps nearly every bit, so near-dup copies land within a small
    * Hamming distance and [[DedupOps.bandedHammingPairs]] surfaces them.
    *
    * Streaming: one pass over the channel stream, O(72) state — no
    * pixel buffer, so a 4K frame hashes in constant memory. Luma is
    * integer ITU-R 601 ((299r+587g+114b)/1000): grayscale inputs
    * (r=g=b=v) hash on exactly v, which is what lets the q99 oracle
    * re-derive the hash in SQL. Box edges use gx = x·9/w (integer
    * division), so any w,h that are exact multiples of 9 and 8 average
    * equal-size blocks — and a k× nearest-neighbor upscale of such an
    * image hashes IDENTICALLY (each block's mean is unchanged).
    * Images narrower/shorter than the grid fill empty cells from the
    * nearest populated cell in the same row (left, then right).
    */
  def dhash64(w: Int, h: Int, rgbTopDown: Iterator[Int]): Long = {
    val GW = 9; val GH = 8
    val sums = new Array[Long](GW * GH)
    val counts = new Array[Long](GW * GH)
    var x = 0; var y = 0
    while (y < h && rgbTopDown.hasNext) {
      // & 0xFF: the byte-parser decoders emit sign-extended byte values
      // (their checksum consumer masks internally); ImageIO emits 0..255
      val r = rgbTopDown.next() & 0xFF
      val g = (if (rgbTopDown.hasNext) rgbTopDown.next() else r) & 0xFF
      val b = (if (rgbTopDown.hasNext) rgbTopDown.next() else g) & 0xFF
      val luma = (299 * r + 587 * g + 114 * b) / 1000
      val cell = (y.toLong * GH / h).toInt * GW + (x.toLong * GW / w).toInt
      sums(cell) += luma; counts(cell) += 1
      x += 1; if (x == w) { x = 0; y += 1 }
    }
    val grid = new Array[Double](GW * GH)
    var gy = 0
    while (gy < GH) {
      var gx = 0
      while (gx < GW) {
        val c = gy * GW + gx
        if (counts(c) > 0) grid(c) = sums(c).toDouble / counts(c)
        else { // tiny image: borrow nearest populated cell in-row
          var d = 1; var v = 0.0; var found = false
          while (!found && d < GW) {
            if (gx - d >= 0 && counts(gy * GW + gx - d) > 0) {
              v = sums(gy * GW + gx - d).toDouble / counts(gy * GW + gx - d)
              found = true
            } else if (gx + d < GW && counts(gy * GW + gx + d) > 0) {
              v = sums(gy * GW + gx + d).toDouble / counts(gy * GW + gx + d)
              found = true
            } else d += 1
          }
          grid(c) = v
        }
        gx += 1
      }
      gy += 1
    }
    var hash = 0L
    gy = 0
    while (gy < GH) {
      var gx = 0
      while (gx < 8) {
        if (grid(gy * GW + gx) > grid(gy * GW + gx + 1))
          hash |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    hash
  }

  /** Per-image perceptual hash row; width = height = −1 marks an
    * undecodable/non-image record (the quarantine convention), with
    * dhash 0 — callers filter `width > 0` before pairing.
    */
  case class MediaHash(media_id: Long, mime: String, width: Int,
                       height: Int, dhash: Long)

  /** Map-only dHash extraction: decode + hash fused in one partition-local
    * pass, streaming — the corpus-scale posture is identical to
    * [[extractFeatures]] (binary column stays columnar until the executor
    * task touches it; nothing ever collects to the driver).
    */
  def imageDHashes(spark: SparkSession, media: DataFrame): Dataset[MediaHash] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { iter =>
      iter.map { r =>
        rgbOf(r) match {
          case Some((w, h, rgb)) =>
            try MediaHash(r.media_id, r.mime, w, h, dhash64(w, h, rgb))
            catch { // a raster that lies about its size mid-stream
              case _: RuntimeException => MediaHash(r.media_id, r.mime, -1, -1, 0L)
            }
          case None => MediaHash(r.media_id, r.mime, -1, -1, 0L)
        }
      }
    }
  }

  /** Perceptual near-dup candidate pairs over an image corpus: dHash each
    * decodable image (map-only), then Hamming-band the 64-bit hashes with
    * the SAME LSH banding machinery text SimHash uses
    * ([[DedupOps.bandedHammingPairs]]) — re-encoded/resized copies
    * surface as pairs within `maxHamming`. Emits (id_a, id_b, hamming);
    * undecodable records are excluded (they can't be perceptually
    * compared — exact dedup via [[decode]]'s checksum still covers them).
    */
  def imageNearDupPairs(spark: SparkSession, media: DataFrame,
                        maxHamming: Int): DataFrame =
    DedupOps.bandedHammingPairs(
      imageDHashes(spark, media).filter(col("width") > 0).toDF(),
      "media_id", "dhash", maxHamming)

  /** Deterministic synthetic image corpus for exercising the perceptual
    * path end-to-end: one 18×16 grayscale PPM per input id, where ids
    * sharing `id % groups` render the same base pattern and each id adds
    * a sparse per-id brightness bump — so same-group images are near-dups
    * (small Hamming distance) and cross-group images are far. The pixel
    * formula is pure integer arithmetic on (id, x, y), which is what lets
    * the q99 oracle rebuild the exact grid, hash, and banding in SQL —
    * the whole decode→hash→band→pair chain gets a full DuckDB oracle
    * even though DuckDB cannot decode images.
    */
  def syntheticPpmImages(spark: SparkSession, ids: DataFrame,
                         groups: Int = 50): Dataset[MediaRecord] = {
    import spark.implicits._
    val w = 18; val h = 16
    ids.select(col("doc_id").cast("long")).as[Long].mapPartitions { iter =>
      iter.map { id =>
        val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
        val body = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = syntheticPixel(id, x, y, groups)
            val o = (y * w + x) * 3
            body(o) = v.toByte; body(o + 1) = v.toByte; body(o + 2) = v.toByte
            x += 1
          }
          y += 1
        }
        MediaRecord(id, "image/x-portable-pixmap",
          (header.length + body.length).toLong, header ++ body)
      }
    }
  }

  /** The q99 pixel formula — mirrored verbatim by the oracle SQL. */
  private[ext] def syntheticPixel(id: Long, x: Int, y: Int, groups: Int): Int = {
    val base = (((id % groups) * 37 + x * 11 + y * 23) * 17 % 256).toInt
    val bump = if ((id * 131 + x * 7 + y * 3) % 997 < 30) 40 else 0
    math.min(255, base + bump)
  }

  // --- perceptual audio hashing (near-dup dedup over audio columns) ------

  /** 64-bit energy-envelope difference hash for PCM audio — the audio
    * sibling of [[dhash64]]: box-average the per-frame amplitude
    * (|channel-0 sample|) into a 65-slot envelope, bit i = 1 iff
    * env(i) > env(i+1). Comparing envelope SLOPES makes the hash
    * invariant to uniform volume scaling (every window scales by the
    * same factor) and robust to re-sampling (box means, the dhash
    * resize argument) — the two transforms audio copies actually
    * undergo — while byte checksums see every re-encode as a new file.
    * Streaming over the payload: O(65) state, one pass, no sample
    * buffer. 16-bit little-endian and 8-bit (unsigned, centered at 128)
    * PCM supported; anything else → None (quarantine).
    */
  private[ext] def audioEnvHash64(p: Array[Byte], w: WavPcm): Option[Long] = {
    val EW = 65
    val nFrames = (w.dataLen / w.blockAlign).toInt
    if (nFrames < 1 || (w.bits != 16 && w.bits != 8)) return None
    val sums = new Array[Long](EW)
    val counts = new Array[Long](EW)
    var f = 0
    while (f < nFrames) {
      val off = w.dataOff + f * w.blockAlign
      val amp =
        if (w.bits == 16)
          math.abs((((p(off + 1).toInt << 8) | (p(off) & 0xFF)).toShort).toInt)
        else math.abs((p(off) & 0xFF) - 128)
      val wi = (f.toLong * EW / nFrames).toInt
      sums(wi) += amp; counts(wi) += 1
      f += 1
    }
    val env = new Array[Double](EW)
    var i = 0
    while (i < EW) {
      if (counts(i) > 0) env(i) = sums(i).toDouble / counts(i)
      else { // clip shorter than 65 frames: borrow nearest populated slot
        var d = 1; var v = 0.0; var found = false
        while (!found && d < EW) {
          if (i - d >= 0 && counts(i - d) > 0) {
            v = sums(i - d).toDouble / counts(i - d); found = true
          } else if (i + d < EW && counts(i + d) > 0) {
            v = sums(i + d).toDouble / counts(i + d); found = true
          } else d += 1
        }
        env(i) = v
      }
      i += 1
    }
    var h = 0L
    i = 0
    while (i < 64) { if (env(i) > env(i + 1)) h |= 1L << i; i += 1 }
    Some(h)
  }

  /** Per-clip hash row; n_frames = −1 marks undecodable/unsupported
    * records (quarantine convention) — callers filter `n_frames > 0`.
    */
  case class AudioHash(media_id: Long, mime: String, n_frames: Int,
                       ahash: Long)

  /** Map-only audio-envelope hashing: RIFF walk + hash fused in one
    * partition-local streaming pass, same posture as [[imageDHashes]].
    */
  def audioEnvHashes(spark: SparkSession, media: DataFrame): Dataset[AudioHash] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { iter =>
      iter.map { r =>
        val hashed = r.mime match {
          case "audio/wav" | "audio/x-wav" =>
            wavPcm(r.payload).flatMap(w => audioEnvHash64(r.payload, w)
              .map(h => ((w.dataLen / w.blockAlign).toInt, h)))
          case _ => None
        }
        hashed match {
          case Some((n, h)) => AudioHash(r.media_id, r.mime, n, h)
          case None         => AudioHash(r.media_id, r.mime, -1, 0L)
        }
      }
    }
  }

  /** Perceptual near-dup candidate pairs over an audio corpus — the
    * [[imageNearDupPairs]] shape with the envelope hash; pairing is the
    * SAME [[DedupOps.bandedHammingPairs]] banding. Volume-scaled and
    * re-encoded copies surface within `maxHamming`; undecodable records
    * are excluded (exact dedup via [[decodeWav]]'s checksum covers them).
    */
  def audioNearDupPairs(spark: SparkSession, media: DataFrame,
                        maxHamming: Int): DataFrame =
    DedupOps.bandedHammingPairs(
      audioEnvHashes(spark, media).filter(col("n_frames") > 0).toDF(),
      "media_id", "ahash", maxHamming)

  /** Deterministic synthetic audio corpus: one mono 16-bit PCM WAV
    * (65×32 = 2080 frames) per id. Ids sharing `id % groups` play the
    * same group-keyed amplitude-modulated pattern; `1 + (id/groups) % 3`
    * scales the VOLUME — so a group's members are volume-scaled copies
    * (identical envelope hash, the invariance [[audioEnvHash64]]
    * promises) plus a sparse additive bump. Pure integer arithmetic on
    * (id, t): the q101 oracle rebuilds sample, envelope, hash, bands,
    * and pairs in SQL — DuckDB cannot parse WAV, but it never has to.
    */
  def syntheticWavs(spark: SparkSession, ids: DataFrame,
                    groups: Int = 50): Dataset[MediaRecord] = {
    import spark.implicits._
    val nFrames = 65 * 32
    ids.select(col("doc_id").cast("long")).as[Long].mapPartitions { iter =>
      iter.map { id =>
        val dataLen = nFrames * 2
        val b = java.nio.ByteBuffer.allocate(44 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
          .put("WAVE".getBytes("US-ASCII"))
        b.put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1) // PCM, mono
          .putInt(8000).putInt(16000) // sample rate, byte rate
          .putShort(2).putShort(16) // block align, bits
        b.put("data".getBytes("US-ASCII")).putInt(dataLen)
        var t = 0
        while (t < nFrames) {
          b.putShort(syntheticSample(id, t, groups).toShort)
          t += 1
        }
        val bytes = b.array()
        MediaRecord(id, "audio/wav", bytes.length.toLong, bytes)
      }
    }
  }

  /** The q101 sample formula — mirrored verbatim by the oracle SQL.
    * osc: period-3 carrier; amp: group-keyed per-window modulation with a
    * group-dependent slope (decorrelates groups); scale: the volume
    * class; bump: sparse additive noise. |sample| ≤ 29,700 < 2^15.
    */
  private[ext] def syntheticSample(id: Long, t: Int, groups: Int): Int = {
    val g = (id % groups).toInt
    val w = t / 32
    val osc = (t * 7 % 21) - 10
    val amp = 100 + ((g * 37 + w * (11 + g % 13)) * 17 % 900)
    val scale = (1 + (id / groups) % 3).toInt
    val bump = if ((id * 131 + t * 17) % 997 < 20) 500 else 0
    osc * amp * scale + bump
  }

  // --- perceptual video near-dup (frame-fingerprint set similarity) ------

  /** Video near-dup as frame-SET similarity — the shape production video
    * dedup takes at scale: fingerprint each sampled frame, then compare
    * videos by the Jaccard similarity of their fingerprint sets (re-cut /
    * re-muxed copies share most frames; ordering and container bytes
    * don't matter). Frames come from [[sampleFrames]] (the codec seam —
    * with a real decoder the fingerprint would be [[dhash64]] of the
    * decoded frame; here it is the md5 of the frame bytes, which is the
    * correct fingerprint for the byte-slice stub and keeps the whole
    * chain DuckDB-oracle-able). Pairing is
    * [[DedupOps.setNearDupPairs]] — the text MinHash-LSH machinery minus
    * its tokenizer, one code path for document shingles, video frames,
    * or any other element set.
    *
    * Scale shape: sampling+fingerprint is partition-local map work; the
    * MinHash chain shuffles one (id, fp) stream (uniform keys), then
    * fixed-width signatures — never the frame bytes.
    */
  def videoFrameNearDupPairs(spark: SparkSession, media: DataFrame,
                             everyN: Int, numBands: Int = 8,
                             rowsPerBand: Int = 2,
                             minJaccard: Double = 0.4): DataFrame = {
    import spark.implicits._
    val frames = sampleFrames(spark, media, everyN).toDF()
    DedupOps.setNearDupPairs(
      frames.select(col("media_id"), md5(col("frame_bytes")).as("fp")),
      "media_id", "fp", numBands, rowsPerBand, minJaccard)
  }

  /** Deterministic synthetic video corpus: one 24-frame clip per id,
    * each frame exactly 100 bytes — an ASCII key right-padded with 'x'.
    * Ids sharing `id % groups` share their GROUP-keyed frames; every
    * `(id·31 + f) % 8 == 0` frame is id-UNIQUE — so same-group videos
    * share ~3/4 of their frames (near-dups under set Jaccard) and
    * cross-group videos share none. Frame content is a pure string
    * formula on (id, f): the q102 oracle rebuilds frame → md5 → MinHash
    * → bands → pairs in SQL without ever touching a byte payload.
    */
  def syntheticVideos(spark: SparkSession, ids: DataFrame,
                      groups: Int = 40): Dataset[MediaRecord] = {
    import spark.implicits._
    val nFrames = 24
    ids.select(col("doc_id").cast("long")).as[Long].mapPartitions { iter =>
      iter.map { id =>
        val sb = new StringBuilder(nFrames * 100)
        var f = 0
        while (f < nFrames) {
          val key =
            if ((id * 31 + f) % 8 == 0) s"id$id-f$f"
            else s"g${id % groups}-f$f"
          sb.append(key).append("x" * (100 - key.length))
          f += 1
        }
        val bytes = sb.toString.getBytes("US-ASCII")
        MediaRecord(id, "video/x-synthetic", bytes.length.toLong, bytes)
      }
    }
  }

  /** Gzip ingest: inflate `<inner>+gzip` payloads partition-locally (JDK
    * Inflater via GZIPInputStream — no external codec), pass every other
    * record through untouched. The MIME convention carries the inner type
    * (`text/plain+gzip` → `text/plain`; bare `application/gzip` →
    * `application/octet-stream`). A corrupt stream quarantines as
    * `application/x-corrupt-gzip` with the ORIGINAL payload kept for
    * triage, and inflation is capped (default 1 GiB) so a zip bomb marks
    * itself instead of OOMing the executor. This is the WARC/web-corpus
    * ingest shape: decompress once, keep the corpus columnar after.
    */
  def decompressPayloads(spark: SparkSession, media: DataFrame,
                         maxBytes: Long = 1L << 30): Dataset[MediaRecord] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { iter =>
      iter.map { r =>
        val isGz = r.mime == "application/gzip" || r.mime.endsWith("+gzip")
        if (!isGz) r
        else try {
          val in = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          val out = new java.io.ByteArrayOutputStream(
            math.min(r.payload.length.toLong * 4, 1L << 20).toInt)
          val buf = new Array[Byte](64 * 1024)
          var n = in.read(buf)
          var total = 0L
          while (n >= 0 && total <= maxBytes) {
            out.write(buf, 0, n); total += n; n = in.read(buf)
          }
          if (total > maxBytes)
            MediaRecord(r.media_id, "application/x-corrupt-gzip",
              r.n_bytes, r.payload)
          else {
            val inner =
              if (r.mime == "application/gzip") "application/octet-stream"
              else r.mime.stripSuffix("+gzip")
            val bytes = out.toByteArray
            MediaRecord(r.media_id, inner, bytes.length.toLong, bytes)
          }
        } catch {
          case _: java.io.IOException =>
            MediaRecord(r.media_id, "application/x-corrupt-gzip",
              r.n_bytes, r.payload)
        }
      }
    }
  }

  /** The batch feature-extraction pass: partition-local, codec initialized
    * once per partition (the `iter => ...` closure is where a real pipeline
    * opens its decoder), rows streamed — constant memory per partition.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { iter =>
      // real pipeline for codec formats: val codec = Codec.open() — once
      // per partition; PPM/BMP need no init
      iter.map(decode)
    }
  }

  /** Resize stub: aspect-fit the decoded dimensions into maxW×maxH (never
    * upscale). Pure column arithmetic — a real resize would keep exactly
    * this metadata path and add a payload re-encode inside mapPartitions.
    */
  def resizeFit(feats: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / greatest(col("width"), lit(1)),
      lit(maxH.toDouble) / greatest(col("height"), lit(1)),
      lit(1.0))
    feats
      .withColumn("out_w", floor(col("width") * scale).cast("int"))
      .withColumn("out_h", floor(col("height") * scale).cast("int"))
  }

  /** One sampled frame: payload slice + index. */
  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Frame sampling: every `everyN`-th 100-byte "frame" of the payload
    * becomes its own row — the fan-out a video pipeline does before
    * per-frame models. Partition-local and streamed (flatMap over the
    * row iterator): the full frame set of one media item never
    * materializes at once, and output rows inherit the input
    * partitioning — no shuffle until a downstream op asks for one.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, everyN: Int): Dataset[Frame] = {
    import spark.implicits._
    require(everyN >= 1, s"sampleFrames: everyN must be >= 1, got $everyN")
    media.as[MediaRecord].mapPartitions { iter =>
      iter.flatMap { r =>
        // frame count comes from the PAYLOAD, the ground truth — trusting
        // the n_bytes metadata would read past (or zero-pad) the buffer on
        // any record whose metadata drifted from its bytes
        val nFrames = r.payload.length / 100
        (0 until nFrames by everyN).iterator.map { f =>
          val start = f * 100
          Frame(r.media_id, f,
            java.util.Arrays.copyOfRange(r.payload, start, start + 100))
        }
      }
    }
  }
}
