package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measures SemDeDup's single approximation — a `>= minSim` pair whose
  * members land in DIFFERENT quantizer cells is never scored (VERDICT r10
  * task 7). Ground truth is the exact all-pairs edge set at the same
  * threshold; [[SimilarityOps.semanticDupPairs]] is a strict subset of it
  * by construction (within-cell scoring is exact at the same rounded
  * threshold), so recall is |within-cell| / |all|. The measured curve is
  * transcribed in SCALING.md §SemDeDup recall; the assertions below pin it
  * against silent regression.
  */
class SemDeDupRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val emb: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .drop("label").cache()

  private val minSim = 0.3

  /** Exact all-pairs edges at `minSim`, with their similarity — O(n²),
    * fine at the 500-vector fixture, and the same rounding as the operator
    * so set-inclusion is exact.
    */
  private lazy val exactSims: Map[(Long, Long), Double] = {
    val u = emb.select(col("vec_id"),
      org.apache.spark.sql.graft.VectorFunctions.normalize(col("embedding")).as("u"))
    val a = u.select(col("vec_id").as("id_a"), col("u").as("ua"))
    val b = u.select(col("vec_id").as("id_b"), col("u").as("ub"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(org.apache.spark.sql.graft.VectorFunctions
        .dotProduct(col("ua"), col("ub")), 6))
      .filter(col("sim") >= minSim)
      .select("id_a", "id_b", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
  }

  private lazy val exactPairs: Set[(Long, Long)] = exactSims.keySet

  private def semPairs(cents: Array[Array[Double]]): Set[(Long, Long)] =
    SimilarityOps.semanticDupPairs(emb, cents, minSim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("within-cell pairs are a strict subset of the exact edge set " +
       "(the approximation only MISSES, never invents)") {
    val sem = semPairs(graft.ext.IvfCentroids.centroids)
    assert(sem.subsetOf(exactPairs),
      s"invented pairs: ${(sem -- exactPairs).take(5)}")
    assert(exactPairs.nonEmpty, "fixture has no edges — test is vacuous")
  }

  test("recall at the committed 10-cell quantizer (q104's setting) " +
       "stays above the measured floor") {
    val sem = semPairs(graft.ext.IvfCentroids.centroids)
    val recall = sem.size.toDouble / exactPairs.size
    info(f"nCells=10 (committed): recall=$recall%.4f " +
      s"(${sem.size}/${exactPairs.size} edges)")
    // measured 2026-08: 0.2043 (188/920) — the fixture's random-ish
    // embeddings are the paper's worst case (most edges sit just above the
    // 0.3 threshold, where cell agreement is weakest; see SCALING.md for
    // the curve and the tuning rule). Pin well below to allow fixture
    // regeneration noise, well above 0 to catch an assignment bug that
    // empties the within-cell sets.
    assert(recall > 0.12, s"recall collapsed: $recall")
  }

  test("recall climbs with pair similarity — the miss mode is the " +
       "near-threshold pair, not the true near-duplicate") {
    // the raw fixture's 920 edges ALL sit in [0.3, 0.5) — borderline
    // pairs, the worst case. Plant true near-duplicates (the regime
    // SemDeDup is actually run in, paper threshold ~0.95): copy 100
    // vectors, deterministically jittered by mixing 2% of a fixed other
    // fixture vector, cos(orig, copy) ≈ 0.999
    import org.apache.spark.sql.graft.VectorFunctions.{dotProduct, normalize}
    val base = emb.filter(col("vec_id") < 100)
    val jit = emb.filter(col("vec_id") === 499)
      .select(col("embedding").as("jv"))
    val planted = base.crossJoin(broadcast(jit))
      .select((col("vec_id") + 10000).as("vec_id"),
        zip_with(col("embedding"), col("jv"),
          (a, b) => a * lit(0.98) + b * lit(0.02))
          .cast("array<float>").as("embedding"))
    val corpus = emb.select("vec_id", "embedding").union(planted)
    val sem = SimilarityOps.semanticDupPairs(
        corpus, graft.ext.IvfCentroids.centroids, minSim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plantedPairs = (0L until 100L).map(i => (i, i + 10000)).toSet
    // sanity: the planted pairs really are high-sim
    val u = corpus.select(col("vec_id"), normalize(col("embedding")).as("u"))
    val minPlantedSim = u.filter(col("vec_id") < 100)
      .join(u.select((col("vec_id") - 10000).as("vec_id"),
        col("u").as("u2")), Seq("vec_id"))
      .agg(min(round(dotProduct(col("u"), col("u2")), 6)))
      .head().getDouble(0)
    assert(minPlantedSim > 0.9, s"planting failed: min sim $minPlantedSim")
    val highRecall = (sem & plantedPairs).size.toDouble / plantedPairs.size
    val lowPairs = exactPairs
    val lowRecall = (sem & lowPairs).size.toDouble / lowPairs.size
    info(f"planted near-dups (sim>$minPlantedSim%.3f): recall=$highRecall%.4f")
    info(f"borderline [0.3,0.5) pairs:   recall=$lowRecall%.4f")
    assert(highRecall >= 0.95,
      s"true near-duplicates must co-assign: $highRecall")
    assert(highRecall > lowRecall,
      s"high-sim recall $highRecall not above borderline $lowRecall")
  }

  test("recall falls monotonically-ish as nCells grows — the documented " +
       "knob trade (finer cells = cheaper pairs = more boundary misses)") {
    val curve = Seq(2, 5, 10, 20).map { n =>
      val cents = SimilarityOps.fitCentroids(emb, "embedding", n)
      val r = semPairs(cents).size.toDouble / exactPairs.size
      info(f"nCells=$n%2d: recall=$r%.4f")
      n -> r
    }
    val byN = curve.toMap
    // pin the ends, not every step: k-means fit noise can wiggle the middle
    assert(byN(2) > byN(20),
      s"coarse quantizer should out-recall fine: $curve")
    assert(byN(2) > 0.5, s"2-cell recall should be high: ${byN(2)}")
  }
}
