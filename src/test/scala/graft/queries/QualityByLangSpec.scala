package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ext.{QualityLrWeights, QualityLrWeightsByLang}

/** The per-language quality gate (VERDICT r17 task 5): the fused
  * dispatch serves each predicted language ITS committed weights and
  * 'und' the global fallback, and the measured per-language accuracy
  * beats the EN-only baseline on every fitted language.
  */
class QualityByLangSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("dispatch: each language gets its own committed dot product; " +
      "'und' and unknown labels get the global fallback") {
    import spark.implicits._
    val texts = Seq("the cat sat on the mat", "der hund ist gut",
      "el gato es bueno").toDF("text")
    QualityLrWeightsByLang.langs.foreach { l =>
      val direct = org.apache.spark.sql.graft.SubwordFunctions
        .hashedGramScore(col("text"),
          QualityLrWeightsByLang.weights(l).toIndexedSeq,
          QualityLrWeightsByLang.biases(l))
      val rows = texts.select(
        ExtensionQueries.qualityLrScoreByLang(col("text"), lit(l))
          .as("v"), direct.as("d")).collect()
      rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1), l))
    }
    Seq("und", "xx").foreach { l =>
      val rows = texts.select(
        ExtensionQueries.qualityLrScoreByLang(col("text"), lit(l)).as("v"),
        org.apache.spark.sql.graft.SubwordFunctions
          .hashedGramScore(col("text"),
            QualityLrWeights.weights.toIndexedSeq,
            QualityLrWeights.bias).as("d")).collect()
      rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1), l))
    }
  }

  test("q187: per-lang gates beat the EN-only baseline on every fitted " +
      "language; the und row's two gates are the SAME gate") {
    val rows = ExtensionQueries
      .queries("q187_gate_accuracy_by_lang")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val und = rows("und")
    assert(und._2 == und._3,
      "und falls back to the global gate on BOTH sides")
    QualityLrWeightsByLang.langs.filter(rows.contains).foreach { l =>
      val (n, pl, en) = rows(l)
      assert(n > 0 && pl >= en,
        s"$l: per-lang $pl/$n must not lose to EN-only $en/$n")
    }
    // and it genuinely WINS somewhere (not vacuous equality)
    assert(QualityLrWeightsByLang.langs.filter(rows.contains)
      .exists(l => rows(l)._2 > rows(l)._3))
  }

  test("q190: the gate delta is significant (the q185 discipline on the " +
      "round's own measurement), and its bound is the discordant set") {
    val r = ExtensionQueries
      .queries("q190_gate_delta_significance")(spark, dir).collect()(0)
    val (n, perms, delta, extreme, p) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getDouble(4))
    assert(perms == 256 && extreme <= perms)
    assert(p > 0.0 && p <= 1.0)
    // the per-lang win is real on the fixture: p at the 256-draw floor
    assert(p < 0.05, s"delta=$delta n=$n p=$p")
    // concordant docs (incl. the whole und slice — same gate on both
    // sides) never enter: the draw table is discordant-bounded
    assert(n < 500, s"n_discordant=$n must exclude concordant docs")
  }

  test("q188: the per-lang-scored mixture respects the global budget " +
      "and only selects docs the allocation funded") {
    import org.apache.spark.sql.functions._
    val out = ExtensionQueries
      .queries("q188_mixture_per_lang_scored")(spark, dir)
    val sums = out.groupBy(col("pred_lang"))
      .agg(sum(col("n_tokens")).as("t")).collect()
    assert(sums.nonEmpty)
    assert(sums.map(_.getLong(1)).sum <= 20000L)
  }
}
