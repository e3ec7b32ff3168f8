package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{ProfileOps, TextOps}

/** One-time CALIBRATION fit for both committed classifiers (VERDICT r17
  * task 1): q175/q183 proved the quality gate and the language ID
  * miscalibrated (langid under-confident in every bucket, ECE 0.144;
  * quality ECE 0.0965) while every downstream threshold/budget consumed
  * the raw scores. This tool closes that loop the way q138→q143 closes
  * ANN staleness: it reads the SAME reliability buckets the registered
  * reports produce ([[ProfileOps.calibrationReport]], integer micro
  * arithmetic), fits a monotone per-bucket correction (pool-adjacent-
  * violators — isotonic regression on the bucket histogram, weights =
  * bucket counts, all arithmetic in exact Long micro-units), and commits
  * the result as literals (graft/ext/CalibrationMaps.scala, the
  * LangIdWeights discipline) that [[graft.queries.ExtensionQueries]]
  * serves map-only and every oracle rebuilds as SQL CASE arms.
  *
  * It also re-derives the two decision thresholds ON CALIBRATED scores:
  *   - langid reject: 'und' when calibrated P(argmax correct) < 0.5 —
  *     the prediction is more likely wrong than right (the old raw 0.30
  *     cut was sized on scores PROVEN under-confident by q183);
  *   - quality gate: keep when calibrated P(quality) ≥ 0.5; since the
  *     correction is per-bucket constant, that is exactly `raw ≥ b/10`
  *     for the first bucket b whose calibrated value reaches 0.5 — the
  *     tool emits that raw cut so the gate stays one comparison.
  *
  * Run manually when regenerating the fixture (AFTER FitQualityLr /
  * FitLangId, whose committed weights produce the scores calibrated
  * here):
  *   sbt "runMain graft.tools.FitCalibration [sfDir] [scalaOut]"
  */
object FitCalibration {

  /** Pool-adjacent-violators on a bucket histogram: (n, n_pos) per
    * bucket in bucket order → non-decreasing calibrated values in
    * micro-units (round-half-up at the very end, ONE rounding per
    * pooled block — the q170/q172 integer discipline). Empty buckets
    * carry the nearest preceding non-empty block's value (leading
    * empties take the first block's) so serving-time scores that land
    * in a bucket the fit never saw still map monotonically.
    */
  private[graft] def pavMicro(hist: Seq[(Long, Long)]): Seq[Long] = {
    require(hist.exists(_._1 > 0), "pavMicro: all buckets empty")
    // blocks of (sum_n, sum_pos) over the NON-EMPTY buckets, pooled
    // until non-decreasing in pos-rate (compare a/b ≤ c/d as a*d ≤ c*b —
    // exact in Long at bucket scales)
    case class Block(n: Long, pos: Long, span: Int)
    val nonEmpty = hist.zipWithIndex.filter(_._1._1 > 0)
    val blocks = scala.collection.mutable.ArrayBuffer.empty[Block]
    nonEmpty.foreach { case ((n, pos), _) =>
      var b = Block(n, pos, 1)
      while (blocks.nonEmpty &&
          blocks.last.pos * b.n >= b.pos * blocks.last.n) {
        val p = blocks.remove(blocks.length - 1)
        b = Block(p.n + b.n, p.pos + b.pos, p.span + b.span)
      }
      blocks += b
    }
    // expand pooled values back over the non-empty buckets, then fill
    // empty buckets from the preceding value
    val pooledVals = blocks.flatMap { b =>
      val v = (2L * 1000000L * b.pos + b.n) / (2L * b.n)
      Seq.fill(b.span)(v)
    }
    val byBucket = nonEmpty.map(_._2).zip(pooledVals).toMap
    val out = Array.fill(hist.length)(-1L)
    var last = byBucket(nonEmpty.head._2) // leading empties → first block
    hist.indices.foreach { i =>
      byBucket.get(i).foreach(last = _)
      out(i) = last
    }
    out.toSeq
  }

  /** The (n, n_pos) histogram + pre-calibration ECE (micro) from a
    * registered-shape reliability report.
    */
  private def histogram(report: DataFrame,
                        nBuckets: Int): (Seq[(Long, Long)], Double) = {
    val rows = report.collect()
    val per = rows.filter(_.getInt(0) >= 0)
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val hist = (0 until nBuckets).map(b => per.getOrElse(b, (0L, 0L)))
    val ece = rows.find(_.getInt(0) == -1).get.getDouble(5)
    (hist, ece)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val scalaOut = if (args.length > 1) args(1)
      else "src/main/scala/graft/ext/CalibrationMaps.scala"
    val nBuckets = 10
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = graft.Tables.load(spark, sfDir, "documents")
      .filter(col("text").isNotNull).persist()
    // md5-parity held-out split (VERDICT r18 task 1): the PAV fit sees
    // ONLY the train half; the eval half exists so the committed
    // artifact's ECE can be reported out-of-sample (q192) instead of on
    // the very buckets the correction was fit to.
    val isEval = graft.queries.ExtensionQueries.holdoutEval(col("doc_id"))
    val dTrain = d.filter(!isEval)

    // -- quality classifier (q175's exact report shape) -----------------
    val qScore = round(TextOps.qualityLrScore(col("text")), 6)
    val qLabel = col("lang") === "en"
    val (qHist, qEce) = histogram(
      ProfileOps.calibrationReport(dTrain, qScore, qLabel, nBuckets),
      nBuckets)
    val qCal = pavMicro(qHist)

    // -- language ID (q183's exact report shape: judged BEFORE reject) --
    val scored = graft.queries.ExtensionQueries.langIdScored(d).persist()
    val sTrain = scored.filter(!isEval)
    val lScore = col("__best").getField("sc")
    val lLabel = col("__best").getField("l") === col("lang")
    val (lHist, lEce) = histogram(
      ProfileOps.calibrationReport(
        sTrain.filter(col("lang").isNotNull), lScore, lLabel, nBuckets),
      nBuckets)
    val lCal = pavMicro(lHist)

    // -- per-language gate dispatch (q189's exact report shape: the
    // full serving population incl. the und slice, labeled by the
    // heuristic seed the gates were fit against) ------------------------
    val dispatched = scored.withColumn("pred_lang",
      graft.queries.ExtensionQueries.langIdPredictedOrUnd(col("__best")))
      .persist()
    val plScore = round(graft.queries.ExtensionQueries
      .qualityLrScoreByLang(col("text"), col("pred_lang")), 6)
    val plLabel = TextOps.qualityScore(col("text")) >= 0.5
    val (gHist, gEce) = histogram(
      ProfileOps.calibrationReport(dispatched.filter(!isEval),
        plScore, plLabel, nBuckets), nBuckets)
    val gCal = pavMicro(gHist)

    // post-calibration ECE: re-bucket the CALIBRATED score with the same
    // report (the spec re-asserts this; printed here as the fit record)
    def postEce(df: DataFrame, score: org.apache.spark.sql.Column,
                label: org.apache.spark.sql.Column,
                cal: Seq[Long]): Double = {
      val b = least(lit((nBuckets - 1).toLong),
        greatest(lit(0L), floor(score * nBuckets))).cast("int")
      val calScore =
        element_at(typedLit(cal), b + 1).cast("double") / 1000000.0
      ProfileOps.calibrationReport(df, calScore, label, nBuckets)
        .filter(col("bucket") === -1).collect()(0).getDouble(5)
    }
    val qPost = postEce(dTrain, qScore, qLabel, qCal)
    val lPost = postEce(sTrain.filter(col("lang").isNotNull),
      lScore, lLabel, lCal)
    val gPost = postEce(dispatched.filter(!isEval), plScore, plLabel, gCal)
    // the honest numbers: residual ECE of the train-fit map on the
    // HELD-OUT half (what q192 registers per-round)
    val qHeld = postEce(d.filter(isEval), qScore, qLabel, qCal)
    val lHeld = postEce(
      scored.filter(isEval && col("lang").isNotNull), lScore, lLabel, lCal)
    val gHeld = postEce(dispatched.filter(isEval), plScore, plLabel, gCal)

    // re-derived thresholds on calibrated scores
    val gateBucket = qCal.indexWhere(_ >= 500000L)
    require(gateBucket >= 0, "quality calibration never reaches 0.5 — " +
      "no gate cut is derivable; inspect the classifier first")
    val plGateBucket = gCal.indexWhere(_ >= 500000L)
    require(plGateBucket >= 0, "per-lang gate calibration never " +
      "reaches 0.5 — no gate cut is derivable; inspect the gates first")
    println(s"quality: hist=$qHist cal=$qCal " +
      f"ece $qEce%.6f -> $qPost%.6f (held-out $qHeld%.6f) " +
      s"gateBucket=$gateBucket")
    println(s"langid:  hist=$lHist cal=$lCal " +
      f"ece $lEce%.6f -> $lPost%.6f (held-out $lHeld%.6f) " +
      s"rejectBuckets=${lCal.takeWhile(_ < 500000L).length}")
    println(s"perlang: hist=$gHist cal=$gCal " +
      f"ece $gEce%.6f -> $gPost%.6f (held-out $gHeld%.6f) " +
      s"gateBucket=$plGateBucket")

    def seqLit(xs: Seq[Long]) = xs.map(_ + "L").mkString(", ")
    val src =
      s"""package graft.ext
         |
         |// GENERATED by graft.tools.FitCalibration from $sfDir — do not
         |// edit by hand; regenerate (after FitQualityLr / FitLangId) with:
         |//   sbt "runMain graft.tools.FitCalibration"
         |
         |/** Committed per-bucket monotone calibration for both committed
         |  * classifiers — isotonic (pool-adjacent-violators) corrections
         |  * fit on the SAME reliability buckets the registered reports
         |  * produce (q175 for the quality gate, q183 for language ID),
         |  * in exact Long micro-units. A raw rounded score s maps to
         |  * bucket floor(s·10) clamped to [0, 9]; the bucket's entry is
         |  * the calibrated P(label | score) in micro-units. Served
         |  * map-only (one array lookup); every consuming oracle rebuilds
         |  * the lookup as SQL CASE arms from these same literals.
         |  *
         |  * Fit on the md5-parity TRAIN half only (holdoutEval=false);
         |  * the held-out column is the residual ECE of this committed map
         |  * on the eval half the fit never saw (q192 re-measures it
         |  * per-round).
         |  *
         |  * Fit record ($sfDir):
         |  *   quality ECE ${f"$qEce%.6f"} -> ${f"$qPost%.6f"} (train) / ${f"$qHeld%.6f"} (held-out)
         |  *   langid  ECE ${f"$lEce%.6f"} -> ${f"$lPost%.6f"} (train) / ${f"$lHeld%.6f"} (held-out)
         |  *   perlang ECE ${f"$gEce%.6f"} -> ${f"$gPost%.6f"} (train) / ${f"$gHeld%.6f"} (held-out)
         |  */
         |object CalibrationMaps {
         |  val nBuckets: Int = $nBuckets
         |
         |  /** P(argmax correct | best-score bucket), isotonic, micro. */
         |  val langIdCalMicro: Seq[Long] = Seq(${seqLit(lCal)})
         |
         |  /** P(lang='en' seed | quality-score bucket), isotonic, micro. */
         |  val qualityCalMicro: Seq[Long] = Seq(${seqLit(qCal)})
         |
         |  /** P(heuristic-quality seed | per-language gate dispatch
         |    * bucket — q189's exact population, und's global fallback
         |    * included), isotonic, micro.
         |    */
         |  val perLangGateCalMicro: Seq[Long] = Seq(${seqLit(gCal)})
         |
         |  /** The re-derived reject rule: 'und' when the CALIBRATED
         |    * P(argmax correct) is below 1/2 — the prediction is more
         |    * likely wrong than right. Replaces the raw 0.30 cut, which
         |    * q183 proved was sized on under-confident scores. Integer
         |    * compare: calibrated micro < this.
         |    */
         |  val undCalCutMicro: Long = 500000L
         |
         |  /** The re-derived quality gate: keep when calibrated
         |    * P(quality) ≥ 1/2. The correction is per-bucket constant,
         |    * so the gate is exactly `raw score ≥ gateRawCut` (first
         |    * bucket whose calibrated value reaches 0.5 = bucket
         |    * $gateBucket) — one comparison, carried as the same literal
         |    * in every consuming oracle.
         |    */
         |  val gateRawCut: Double = ${gateBucket / 10.0}
         |
         |  /** The per-language gate's cut, same derivation on ITS
         |    * calibration (first bucket reaching 1/2 = bucket
         |    * $plGateBucket) — consumed by the q186/q188 selections.
         |    */
         |  val perLangGateRawCut: Double = ${plGateBucket / 10.0}
         |}
         |""".stripMargin
    val w = new java.io.PrintWriter(new java.io.File(scalaOut), "UTF-8")
    try w.print(src) finally w.close()
    println(s"wrote $scalaOut")
    spark.stop()
  }
}
