package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{QualityLr, TextOps}

/** One-time PER-LANGUAGE quality-gate FIT (VERDICT r17 task 5): the
  * committed [[graft.ext.QualityLrWeights]] is trained on the 'en' seed
  * yet gates five languages — its n-gram features are English surface
  * statistics, so fr/es/zh/de docs are scored by how English they look.
  * This tool fits one hashed-n-gram logistic regression PER
  * q157-predicted language slice (the [[FitBpePerLang]] slicing
  * pattern: the fit population is exactly the population the gate will
  * serve, produced by the committed language-ID scorer with its
  * committed calibrated reject), against the LANGUAGE-AGNOSTIC seed the
  * recipe chains already trust as ground truth: the heuristic quality
  * gate ([[TextOps.qualityScore]] ≥ 0.5 — q59/q129's gate). Each
  * language's LR thus distills the heuristic INTO that language's
  * n-gram distribution instead of borrowing English's.
  *
  * Round 19 (VERDICT r18 tasks 1+2): each slice now fits on the
  * md5-parity TRAIN half only, and per-slice agreement vs the seed is
  * reported on BOTH halves — the held-out column is the number q193
  * registers per-round. The 'und' slice — grown to a third of the
  * corpus by the calibrated reject — now gets its OWN fitted gate
  * when that gate beats the global EN fallback on the held-out und
  * half AND clears 0.6 (picked by measurement, not by fiat); the tool
  * prints both candidates' held-out agreement and commits the winner.
  *
  * Deterministic like every Fit tool (QualityLr.fit: fixed iterations,
  * zero init, no RNG). Run manually when regenerating the fixture:
  *   sbt "runMain graft.tools.FitQualityLrPerLang [sfDir] [scalaOut]"
  */
object FitQualityLrPerLang {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val scalaOut = if (args.length > 1) args(1)
      else "src/main/scala/graft/ext/QualityLrWeightsByLang.scala"
    val nBuckets = 256
    val iters = 800
    val lr = 300.0
    val lrBias = 5.0
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = graft.Tables.load(spark, sfDir, "documents")
    val isEval = graft.queries.ExtensionQueries.holdoutEval(col("doc_id"))
    val pred = graft.queries.ExtensionQueries.langIdScored(d)
      .withColumn("pred_lang", graft.queries.ExtensionQueries
        .langIdPredictedOrUnd(col("__best")))
      .select(col("doc_id"), col("pred_lang"), col("text"),
        isEval.as("is_eval"))
      .persist()

    // (lang, weights, bias, heldoutAgreePerLang, heldoutAgreeEn, nEval)
    val langs = graft.ext.LangIdWeights.langs :+ "und"
    val fitted = langs.map { l =>
      val slice = pred.filter(col("pred_lang") === l)
      val train = slice.filter(!col("is_eval"))
      val nTrain = train.count()
      val (w, b) = QualityLr.fit(train,
        TextOps.qualityScore(col("text")) >= 0.5, "doc_id", "text",
        nBuckets = nBuckets, iters = iters, lr = lr, lrBias = lrBias)
      // per-slice agreement vs the heuristic seed for BOTH gates, on
      // BOTH halves — held-out is the column that decides anything
      def agree(half: org.apache.spark.sql.DataFrame) = {
        val scored = half.select(
          (TextOps.qualityScore(col("text")) >= 0.5).as("label"),
          (org.apache.spark.sql.graft.SubwordFunctions
            .hashedGramScore(col("text"), w.toIndexedSeq, b) >= 0.5)
            .as("pl"),
          (round(TextOps.qualityLrScore(col("text")), 6) >=
            graft.ext.CalibrationMaps.gateRawCut).as("en"))
        val r = scored.agg(count(lit(1)),
          sum(when(col("pl") === col("label"), 1L).otherwise(0L)),
          sum(when(col("en") === col("label"), 1L).otherwise(0L)))
          .collect()(0)
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
      val (ntr, trPl, trEn) = agree(train)
      val (nev, evPl, evEn) = agree(slice.filter(col("is_eval")))
      println(s"fitted $l: n_train=$nTrain bias=$b " +
        s"train pl=$trPl/$ntr en=$trEn/$ntr | " +
        s"HELD-OUT pl=$evPl/$nev en=$evEn/$nev")
      (l, w, b, evPl, evEn, nev)
    }
    // pick EVERY arm by measurement (not just und): a slice's fitted
    // gate is committed only when it strictly beats the global
    // EN-fitted fallback on the HELD-OUT half of that slice — a gate
    // that wins on its own training docs but loses out-of-sample (the
    // tiny-slice overfit this split exposed: fr read 5/5 train, 0/9
    // held-out) must not serve. Slices without a committed arm keep
    // the global gate at every call site. At corpus scale each slice
    // has enough mass for its arm to qualify; at sf0.01 only the big
    // slices do — and the artifact records exactly which.
    val committed = fitted.filter(f => f._4 > f._5)
    fitted.foreach { f =>
      println(s"arm ${f._1}: heldout pl=${f._4}/${f._6} vs " +
        s"en=${f._5}/${f._6} -> " +
        (if (f._4 > f._5) "COMMIT" else "KEEP global fallback"))
    }
    val undWins = committed.exists(_._1 == "und")

    def wLit(w: Array[Double]) =
      "Array(" + w.grouped(4).map(g => "\n      " + g.mkString(", "))
        .mkString(",") + ")"
    val entries = committed.map { case (l, w, b, _, _, _) =>
      s"""    "$l" -> (($b, ${wLit(w)}))"""
    }.mkString(",\n")
    val heldoutDoc = fitted.map { case (l, _, _, evPl, evEn, nev) =>
      s"  *   $l: perlang $evPl/$nev vs en-baseline $evEn/$nev -> " +
        (if (evPl > evEn) "committed" else "NOT committed (global gate)")
    }.mkString("\n  ")
    val src =
      s"""package graft.ext
         |
         |// GENERATED by graft.tools.FitQualityLrPerLang from $sfDir — do not
         |// edit by hand; regenerate (after FitLangId / FitCalibration, whose
         |// committed artifacts define the fit slices) with:
         |//   sbt "runMain graft.tools.FitQualityLrPerLang"
         |
         |/** Committed PER-LANGUAGE quality gates: one hashed-n-gram logistic
         |  * regression per q157-predicted language (nBuckets=$nBuckets,
         |  * iters=$iters, lr=$lr/$lrBias — [[QualityLr.fit]]), each fit on ITS
         |  * predicted slice against the heuristic quality seed
         |  * ([[TextOps.qualityScore]] ≥ 0.5), so the learned gate stops
         |  * scoring every language by English surface statistics. Each
         |  * gate is fit on the md5-parity TRAIN half only, and an arm is
         |  * COMMITTED only where it strictly beats the global EN-fitted
         |  * fallback on the held-out half of its own slice (a gate that
         |  * wins in-sample but loses out-of-sample must not serve);
         |  * slices without an arm keep [[QualityLrWeights]]. Held-out
         |  * agreement per slice (the eval half the fit never saw —
         |  * q193's rows):
         |  $heldoutDoc
         |  * The und arm (VERDICT r18 task 2) is
         |  * ${if (undWins) "committed — the und slice is big enough to fit"
              else "not committed at this SF — unidentifiable docs keep"}
         |  * ${if (undWins) "its own gate even on half the data."
              else "the global gate, by the same measurement rule."}
         |  * Served by ONE fused
         |  * [[org.apache.spark.sql.graft.HashedGramScoreVec]] call (the
         |  * gram hashing is shared across classes, so the per-language
         |  * dispatch costs one array index, not rescans); q186's
         |  * DuckDB oracle rebuilds every dot product from these literals.
         |  */
         |object QualityLrWeightsByLang {
         |  val nBuckets: Int = $nBuckets
         |  val langs: Seq[String] =
         |    Seq(${committed.map(f => s""""${f._1}"""").mkString(", ")})
         |  val byLang: Map[String, (Double, Array[Double])] = Map(
         |$entries)
         |  def biases(l: String): Double = byLang(l)._1
         |  def weights(l: String): Array[Double] = byLang(l)._2
         |}
         |""".stripMargin
    val w = new java.io.PrintWriter(new java.io.File(scalaOut), "UTF-8")
    try w.print(src) finally w.close()
    println(s"wrote $scalaOut")
    spark.stop()
  }
}
