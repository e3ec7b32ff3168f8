package graft.ext

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Independent-model differentials for the two perceptual hash kernels —
  * the foundation q99/q101/q103 stand on. Each model is plain Scala
  * written straight from the documented algorithm (integer luma, box
  * grids via the gx = x·GW/w integer mapping, gradient-sign bits) with
  * no shared code: a drift in either the streaming kernel or the model
  * fails the property. Invariance properties (pixel-replication
  * upscale, uniform volume scaling) are fuzzed over RANDOM content, not
  * just the fixtures the specs pin.
  */
object PerceptualHashModelProps extends Properties("PerceptualHashDiff") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  // --- image model (random-access, nested loops — NOT the streaming code)

  private def modelDhash(w: Int, h: Int, rgb: Array[Int]): Long = {
    val GW = 9; val GH = 8
    def luma(x: Int, y: Int): Int = {
      val o = (y * w + x) * 3
      (299 * (rgb(o) & 0xFF) + 587 * (rgb(o + 1) & 0xFF) +
        114 * (rgb(o + 2) & 0xFF)) / 1000
    }
    val sums = Array.ofDim[Long](GH, GW)
    val cnts = Array.ofDim[Long](GH, GW)
    for (y <- 0 until h; x <- 0 until w) {
      val gx = (x.toLong * GW / w).toInt; val gy = (y.toLong * GH / h).toInt
      sums(gy)(gx) += luma(x, y); cnts(gy)(gx) += 1
    }
    val grid = Array.ofDim[Double](GH, GW)
    for (gy <- 0 until GH; gx <- 0 until GW)
      grid(gy)(gx) =
        if (cnts(gy)(gx) > 0) sums(gy)(gx).toDouble / cnts(gy)(gx)
        else { // nearest populated in-row, left preferred — the doc'd rule
          val d = (1 until GW).find(d =>
            (gx - d >= 0 && cnts(gy)(gx - d) > 0) ||
            (gx + d < GW && cnts(gy)(gx + d) > 0))
          d.map { d =>
            if (gx - d >= 0 && cnts(gy)(gx - d) > 0)
              sums(gy)(gx - d).toDouble / cnts(gy)(gx - d)
            else sums(gy)(gx + d).toDouble / cnts(gy)(gx + d)
          }.getOrElse(0.0)
        }
    var hash = 0L
    for (gy <- 0 until GH; gx <- 0 until 8)
      if (grid(gy)(gx) > grid(gy)(gx + 1)) hash |= 1L << (gy * 8 + gx)
    hash
  }

  private val genImage: Gen[(Int, Int, Array[Int])] = for {
    w <- Gen.chooseNum(1, 40)
    h <- Gen.chooseNum(1, 30)
    seed <- Gen.chooseNum(0L, Long.MaxValue - 1)
  } yield {
    val r = new scala.util.Random(seed)
    (w, h, Array.fill(w * h * 3)(r.nextInt(256)))
  }

  property("dhash64 equals the nested-loop model on random images " +
      "(including tiny ones narrower than the grid)") =
    Prop.forAll(genImage) { case (w, h, rgb) =>
      // feed the kernel SIGNED byte values, as the byte-parser decoders do
      val signedIter = rgb.iterator.map(v => v.toByte.toInt)
      MultimodalOps.dhash64(w, h, signedIter) == modelDhash(w, h, rgb)
    }

  property("dhash64 is invariant under k-fold pixel replication when " +
      "w,h are multiples of the grid (the resize-collision contract)") =
    Prop.forAll(
      Gen.zip(Gen.chooseNum(0L, Long.MaxValue - 1), Gen.chooseNum(2, 3))) {
      case (seed, k) =>
        val r = new scala.util.Random(seed)
        val (w, h) = (18, 16)
        val rgb = Array.fill(w * h * 3)(r.nextInt(256))
        val up = Array.ofDim[Int](w * k * h * k * 3)
        for (y <- 0 until h * k; x <- 0 until w * k; c <- 0 until 3)
          up((y * w * k + x) * 3 + c) = rgb(((y / k) * w + x / k) * 3 + c)
        MultimodalOps.dhash64(w, h, rgb.iterator) ==
          MultimodalOps.dhash64(w * k, h * k, up.iterator)
    }

  // --- audio model --------------------------------------------------------

  private def wavOf(samples: Array[Int]): (Array[Byte], MultimodalOps.WavPcm) = {
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
    val p = b.array()
    (p, MultimodalOps.wavPcm(p).get)
  }

  private def modelEnvHash(samples: Array[Int]): Long = {
    val EW = 65
    val n = samples.length
    val sums = new Array[Long](EW); val cnts = new Array[Long](EW)
    for (f <- 0 until n) {
      val w = (f.toLong * EW / n).toInt
      sums(w) += math.abs(samples(f)); cnts(w) += 1
    }
    val env = (0 until EW).map { i =>
      if (cnts(i) > 0) sums(i).toDouble / cnts(i)
      else {
        val d = (1 until EW).find(d =>
          (i - d >= 0 && cnts(i - d) > 0) || (i + d < EW && cnts(i + d) > 0))
        d.map { d =>
          if (i - d >= 0 && cnts(i - d) > 0) sums(i - d).toDouble / cnts(i - d)
          else sums(i + d).toDouble / cnts(i + d)
        }.getOrElse(0.0)
      }
    }
    (0 until 64).foldLeft(0L)((h, i) =>
      if (env(i) > env(i + 1)) h | (1L << i) else h)
  }

  private val genClip: Gen[Array[Int]] = for {
    n <- Gen.chooseNum(1, 400)
    seed <- Gen.chooseNum(0L, Long.MaxValue - 1)
  } yield {
    val r = new scala.util.Random(seed)
    Array.fill(n)(r.nextInt(20001) - 10000)
  }

  property("audioEnvHash64 equals the model on random PCM (including " +
      "clips shorter than the 65-slot envelope)") =
    Prop.forAll(genClip) { samples =>
      val (p, w) = wavOf(samples)
      MultimodalOps.audioEnvHash64(p, w).get == modelEnvHash(samples)
    }

  property("audioEnvHash64 is invariant under uniform volume scaling") =
    Prop.forAll(Gen.zip(genClip, Gen.chooseNum(2, 3))) { case (samples, k) =>
      val scaled = samples.map(_ * k) // |s| <= 10000, k <= 3: no clipping
      val (p1, w1) = wavOf(samples)
      val (p2, w2) = wavOf(scaled)
      MultimodalOps.audioEnvHash64(p1, w1).get ==
        MultimodalOps.audioEnvHash64(p2, w2).get
    }
}
