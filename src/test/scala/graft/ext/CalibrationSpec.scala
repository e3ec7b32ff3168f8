package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.queries.ExtensionQueries
import graft.tools.FitCalibration

/** The calibration loop (VERDICT r17 task 1): the committed isotonic
  * corrections in [[CalibrationMaps]] — fit provenance, monotonicity,
  * the post-calibration ECE actually dropping, and the PAV kernel's
  * edge cases.
  */
class CalibrationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("pavMicro: monotone input is identity (round-half-up micro)") {
    // rates 0/10, 5/10, 9/10 — already isotonic
    val v = FitCalibration.pavMicro(
      Seq((10L, 0L), (10L, 5L), (10L, 9L)))
    assert(v == Seq(0L, 500000L, 900000L))
  }

  test("pavMicro: a violator pools with its neighbor, weighted") {
    // rates .8 then .2 with weights 10/30 → pooled (8+6)/40 = .35
    val v = FitCalibration.pavMicro(Seq((10L, 8L), (30L, 6L)))
    assert(v == Seq(350000L, 350000L))
    // cascading: .9, .8, .1 (equal weights) → all pool to .6
    val v2 = FitCalibration.pavMicro(
      Seq((10L, 9L), (10L, 8L), (10L, 1L)))
    assert(v2 == Seq(600000L, 600000L, 600000L))
  }

  test("pavMicro: empty buckets carry the neighboring block's value") {
    val v = FitCalibration.pavMicro(
      Seq((0L, 0L), (10L, 2L), (0L, 0L), (10L, 8L), (0L, 0L)))
    assert(v == Seq(200000L, 200000L, 200000L, 800000L, 800000L))
  }

  test("committed maps are monotone and the thresholds derive from them") {
    assert(CalibrationMaps.langIdCalMicro.size == CalibrationMaps.nBuckets)
    assert(CalibrationMaps.qualityCalMicro.size == CalibrationMaps.nBuckets)
    Seq(CalibrationMaps.langIdCalMicro,
        CalibrationMaps.qualityCalMicro,
        CalibrationMaps.perLangGateCalMicro).foreach { m =>
      assert(m.size == CalibrationMaps.nBuckets)
      assert(m.zip(m.tail).forall { case (a, b) => a <= b }, m)
      assert(m.forall(v => v >= 0L && v <= 1000000L), m)
    }
    // each committed gate cut IS the first bucket reaching 1/2 of ITS map
    val gb = CalibrationMaps.qualityCalMicro.indexWhere(_ >= 500000L)
    assert(CalibrationMaps.gateRawCut ==
      gb.toDouble / CalibrationMaps.nBuckets)
    val pgb = CalibrationMaps.perLangGateCalMicro.indexWhere(_ >= 500000L)
    assert(CalibrationMaps.perLangGateRawCut ==
      pgb.toDouble / CalibrationMaps.nBuckets)
  }

  test("committed maps regenerate from the fit dir (artifact drift guard)") {
    // the SAME reliability buckets the registered q175/q183 reports
    // produce, restricted to the md5-parity TRAIN half the fit tool
    // uses (r19), through the SAME PAV — byte-equal to the committed
    // Seqs
    val isEval = ExtensionQueries.holdoutEval(col("doc_id"))
    val d = graft.Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull)
    def hist(rep: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = {
      val per = rep.collect().filter(_.getInt(0) >= 0)
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      (0 until CalibrationMaps.nBuckets).map(b =>
        per.getOrElse(b, (0L, 0L)))
    }
    val q = hist(ProfileOps.calibrationReport(d.filter(!isEval),
      round(TextOps.qualityLrScore(col("text")), 6),
      col("lang") === "en", CalibrationMaps.nBuckets))
    assert(FitCalibration.pavMicro(q) == CalibrationMaps.qualityCalMicro)
    val scored = ExtensionQueries.langIdScored(d)
      .filter(col("lang").isNotNull && !isEval)
    val l = hist(ProfileOps.calibrationReport(scored,
      col("__best").getField("sc"),
      col("__best").getField("l") === col("lang"),
      CalibrationMaps.nBuckets))
    assert(FitCalibration.pavMicro(l) == CalibrationMaps.langIdCalMicro)
    // the per-language gate map regenerates from q189's exact
    // population (the per-slice committed arms + fallbacks, heuristic
    // seed label), train half only
    val dispatched = ExtensionQueries.langIdScored(d)
      .filter(!isEval)
      .withColumn("pred_lang",
        ExtensionQueries.langIdPredictedOrUnd(col("__best")))
    val g = hist(ProfileOps.calibrationReport(dispatched,
      round(ExtensionQueries.qualityLrScoreByLang(col("text"),
        col("pred_lang")), 6),
      TextOps.qualityScore(col("text")) >= 0.5,
      CalibrationMaps.nBuckets))
    assert(FitCalibration.pavMicro(g) ==
      CalibrationMaps.perLangGateCalMicro)
  }

  test("post-calibration ECE: ~0 on the train half, and the honest " +
      "held-out residual also improves on the raw scores") {
    val isEval = ExtensionQueries.holdoutEval(col("doc_id"))
    val d = graft.Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull)
    def ece(rep: org.apache.spark.sql.DataFrame): Double =
      rep.filter(col("bucket") === -1).collect()(0).getDouble(5)
    def calScore(score: org.apache.spark.sql.Column,
                 m: Seq[Long]): org.apache.spark.sql.Column =
      ExtensionQueries.calMicro(score, m).cast("double") / 1000000.0

    val qRaw = round(TextOps.qualityLrScore(col("text")), 6)
    val qLabel = col("lang") === "en"
    val scored = ExtensionQueries.langIdScored(d)
      .filter(col("lang").isNotNull)
    val lRaw = col("__best").getField("sc")
    val lLabel = col("__best").getField("l") === col("lang")
    val dispatched = ExtensionQueries.langIdScored(d)
      .withColumn("pred_lang",
        ExtensionQueries.langIdPredictedOrUnd(col("__best")))
    val gRaw = round(ExtensionQueries.qualityLrScoreByLang(col("text"),
      col("pred_lang")), 6)
    val gLabel = TextOps.qualityScore(col("text")) >= 0.5

    def triple(df: org.apache.spark.sql.DataFrame,
               raw: org.apache.spark.sql.Column,
               label: org.apache.spark.sql.Column, m: Seq[Long],
               tag: String): Double = {
      // train half: PAV fit these very buckets — residual must be ~0
      val trPost = ece(ProfileOps.calibrationReport(df.filter(!isEval),
        calScore(raw, m), label))
      assert(trPost <= 0.01, s"$tag train-half post ECE $trPost")
      // eval half: the committed map NEVER saw these docs — the
      // residual is the honest number. No direction is asserted: at
      // ~250-doc train halves the per-bucket correction itself can
      // overfit (quality reads 0.064 raw -> 0.085 calibrated held-out
      // at r19's fit), and pinning a wished-for improvement would be
      // exactly the in-sample self-deception the split exists to end.
      // What IS pinned: the residual is q192's registered number.
      ece(ProfileOps.calibrationReport(df.filter(isEval),
        calScore(raw, m), label))
    }
    val qEv = triple(d, qRaw, qLabel, CalibrationMaps.qualityCalMicro,
      "quality")
    val lEv = triple(scored, lRaw, lLabel, CalibrationMaps.langIdCalMicro,
      "langid")
    val gEv = triple(dispatched, gRaw, gLabel,
      CalibrationMaps.perLangGateCalMicro, "perlang")
    // the registered held-out report (q192) publishes EXACTLY these
    // residuals as its summary rows — the spec and the oracle-checked
    // query can never drift apart
    val q192 = ExtensionQueries
      .queries("q192_heldout_calibration")(spark, dir)
      .filter(col("bucket") === -1)
      .collect().map(r => r.getString(0) -> r.getDouble(6)).toMap
    assert(q192("quality") == qEv, s"q192 quality ${q192("quality")} != $qEv")
    assert(q192("langid") == lEv, s"q192 langid ${q192("langid")} != $lEv")
    assert(q192("perlang_gate") == gEv,
      s"q192 perlang ${q192("perlang_gate")} != $gEv")
  }

  test("staleness -> refit remediation closes the loop (q191's monitor " +
      "paired with a FitCalibration re-run — the q143 discipline)") {
    // simulate drift: the score DISTRIBUTION shifts (every raw best
    // score shrinks x0.6 — mass slides into low buckets) while the
    // labels stay put, so the COMMITTED map's per-bucket promises go
    // stale exactly the way q191 is built to catch
    val isEval = ExtensionQueries.holdoutEval(col("doc_id"))
    val d = graft.Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull)
    val drifted = ExtensionQueries.langIdScored(d)
      .filter(col("lang").isNotNull)
      .select(col("doc_id"),
        round(col("__best").getField("sc") * 0.6, 6).as("score"),
        (col("__best").getField("l") === col("lang")).as("lab"))
    def ece(rep: org.apache.spark.sql.DataFrame): Double =
      rep.filter(col("bucket") === -1).collect()(0).getDouble(5)
    def calScore(score: org.apache.spark.sql.Column,
                 m: Seq[Long]): org.apache.spark.sql.Column =
      ExtensionQueries.calMicro(score, m).cast("double") / 1000000.0
    // 1. the monitor fires: committed map on drifted data reads stale
    val stale = ece(ProfileOps.calibrationReport(drifted,
      calScore(col("score"), CalibrationMaps.langIdCalMicro),
      col("lab")))
    assert(stale > 0.05, s"drift must surface as residual ECE ($stale)")
    // 2. remediation: re-run the fit recipe on the drifted TRAIN half
    val per = ProfileOps.calibrationReport(drifted.filter(!isEval),
        col("score"), col("lab")).collect().filter(_.getInt(0) >= 0)
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val refit = FitCalibration.pavMicro(
      (0 until CalibrationMaps.nBuckets).map(b =>
        per.getOrElse(b, (0L, 0L))))
    // 3. post-refit: train-half residual ~0, held-out beats stale
    val post = ece(ProfileOps.calibrationReport(drifted.filter(!isEval),
      calScore(col("score"), refit), col("lab")))
    assert(post <= 0.01, s"post-refit residual ECE $post")
    val postEval = ece(ProfileOps.calibrationReport(
      drifted.filter(isEval), calScore(col("score"), refit), col("lab")))
    assert(postEval < stale,
      s"refit must generalize past the stale map: $stale -> $postEval")
  }

  test("q184 serves the committed lookup: cal_score is the bucket's " +
      "literal and the reject flips exactly at the calibrated cut") {
    val rows = ExtensionQueries
      .queries("q184_calibrated_selection")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    val byBucket = CalibrationMaps.langIdCalMicro.map(_ / 1e6)
    rows.foreach { r =>
      val sc = r.getDouble(2)
      val b = math.min(CalibrationMaps.nBuckets - 1,
        math.max(0, math.floor(sc * CalibrationMaps.nBuckets).toInt))
      assert(r.getDouble(3) == byBucket(b), s"doc ${r.getLong(0)}")
      val expectUnd =
        CalibrationMaps.langIdCalMicro(b) < CalibrationMaps.undCalCutMicro
      assert((r.getString(4) == "und") == expectUnd, s"doc ${r.getLong(0)}")
    }
    // both branches of the reject are exercised by the fixture
    assert(rows.exists(_.getString(4) == "und"))
    assert(rows.exists(_.getString(4) != "und"))
  }
}
