package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hard-negative mining (q121/q122): band contract, false-negative
  * exclusion (the reason the ceiling exists), exact ≡ store-backed
  * degeneracy, and the plan contract (broadcast anchors; k pushed into
  * the per-anchor sort).
  */
class HardNegativesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .drop("label")

  test("band contract: every mined negative sits in [simLo, simHi), " +
      "never the anchor itself, ranks dense from 1") {
    val anchors = emb.filter(col("vec_id") < 10)
    val rows = SimilarityOps.hardNegatives(anchors, emb, k = 5,
        simLo = 0.15, simHi = 0.6)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, rk, n, s) =
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))
      assert(a != n, s"anchor $a mined itself")
      assert(s >= 0.15 && s < 0.6, s"sim $s outside the band")
      assert(rk >= 1 && rk <= 5)
    }
    // ranks are dense per anchor: rk 1..n with no gaps
    rows.groupBy(_.getLong(0)).foreach { case (a, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length),
        s"anchor $a has gapped ranks")
    }
  }

  test("the ceiling excludes false negatives: a planted near-duplicate " +
      "of the anchor is brute-force rank 1 but NEVER mined as a negative") {
    val anchors = emb.filter(col("vec_id") === 0)
    // plant an almost-copy of anchor 0 (sim ≈ 1.0) into the corpus
    val dupe = anchors
      .select(lit(900000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.0f + 1e-4f))
          .as("embedding"))
    val corpus = emb.unionByName(dupe)
    val brute = SimilarityOps.bruteForceTopK(anchors, corpus, k = 1)
      .select("cand_id").head().getLong(0)
    assert(brute == 900000L, "planted dup must dominate the exact ranking")
    val mined = SimilarityOps.hardNegatives(anchors, corpus, k = 5,
        simLo = 0.15, simHi = 0.6)
      .select("neg_id").collect().map(_.getLong(0)).toSet
    assert(mined.nonEmpty)
    assert(!mined.contains(900000L),
      "a near-duplicate (probable positive) was mined as a negative")
  }

  test("hardNegativesFromStore with nprobe = nCells and an exhaustive " +
      "over-fetch degenerates to exactly hardNegatives") {
    val cents = graft.ext.IvfCentroids.centroids
    val cbs = graft.ext.PqCodebooks.codebooks
    val anchors = emb.filter(col("vec_id") < 10)
    val n = emb.count().toInt
    val dir = java.nio.file.Files
      .createTempDirectory("graft-hardneg-idx").toString
    val index = SimilarityOps.annIndexStore(spark, emb, dir, cents, cbs)
    val store = SimilarityOps.hardNegativesFromStore(anchors, index, emb,
        cents, cbs, k = 5, kFetch = n, simLo = 0.15, simHi = 0.6,
        nprobe = cents.length, refineFactor = 1)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // refineFactor=1 with kFetch=n still shortlists n·1 = ALL candidates,
    // so the exact re-rank sees everything — no approximation survives
    val exact = SimilarityOps.hardNegatives(anchors, emb, k = 5,
        simLo = 0.15, simHi = 0.6)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(store == exact,
      "exhaustive store-backed mining must reproduce the exact form")
  }

  test("store-backed mining at the committed operating point: bounded " +
      "recall vs exact on the fixture") {
    val cents = graft.ext.IvfCentroids.centroids
    val cbs = graft.ext.PqCodebooks.codebooks
    val anchors = emb.filter(col("vec_id") < 10)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-hardneg-op").toString
    val index = SimilarityOps.annIndexStore(spark, emb, dir, cents, cbs)
    val got = SimilarityOps.hardNegativesFromStore(anchors, index, emb,
        cents, cbs, k = 5, kFetch = 40, simLo = 0.15, simHi = 0.6,
        nprobe = 3, refineFactor = 4)
      .select("anchor_id", "neg_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SimilarityOps.hardNegatives(anchors, emb, k = 5,
        simLo = 0.15, simHi = 0.6)
      .select("anchor_id", "neg_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    info(f"hard-negative recall vs exact at (kFetch=40, nprobe=3): $recall%.3f")
    // nprobe=3 of ${cents.length} cells bounds recall like every IVF op;
    // measured ~0.5-0.8 on the random fixture — floor sits under noise
    assert(recall >= 0.3, s"recall collapsed: $recall")
  }

  test("contrastiveTriples: planted near-copy becomes the positive, " +
      "negatives stay in band, anchors without a positive emit nothing") {
    val anchors = emb.filter(col("vec_id") < 10)
    // plant a near-copy of anchor 0 → its positive; anchors whose top-1
    // misses posMin drop out entirely
    val dupe = emb.filter(col("vec_id") === 0)
      .select(lit(900000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.0f + 1e-4f))
          .as("embedding"))
    val corpus = emb.unionByName(dupe)
    val rows = SimilarityOps.contrastiveTriples(anchors, corpus,
        posMin = 0.9, negLo = 0.15, negHi = 0.3, nNeg = 3)
      .collect()
    assert(rows.nonEmpty)
    // posMin=0.9: only anchor 0 (planted dup sim≈1.0) can have a positive
    assert(rows.map(_.getLong(0)).toSet == Set(0L))
    rows.foreach { r =>
      assert(r.getLong(1) == 900000L, "positive must be the planted copy")
      assert(r.getDouble(2) >= 0.9)
      val negSim = r.getDouble(5)
      assert(negSim >= 0.15 && negSim < 0.3, s"negative sim $negSim out of band")
      assert(r.getLong(4) != r.getLong(1), "negative equals the positive")
    }
    assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to rows.length),
      "negative ranks must be dense from 1")
  }

  test("contrastiveTriplesFromStore with nprobe = nCells and an " +
      "exhaustive over-fetch degenerates to exactly contrastiveTriples") {
    val cents = graft.ext.IvfCentroids.centroids
    val cbs = graft.ext.PqCodebooks.codebooks
    val anchors = emb.filter(col("vec_id") < 10)
    val n = emb.count().toInt
    val dir = java.nio.file.Files
      .createTempDirectory("graft-triples-idx").toString
    val index = SimilarityOps.annIndexStore(spark, emb, dir, cents, cbs)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3),
        r.getLong(4), r.getDouble(5))
    val store = SimilarityOps.contrastiveTriplesFromStore(anchors, index,
        emb, cents, cbs, posMin = 0.35, negLo = 0.15, negHi = 0.3,
        nNeg = 3, kFetch = n, nprobe = cents.length, refineFactor = 1)
      .collect().map(key).toSet
    val exact = SimilarityOps.contrastiveTriples(anchors, emb,
        posMin = 0.35, negLo = 0.15, negHi = 0.3, nNeg = 3)
      .collect().map(key).toSet
    assert(store.nonEmpty)
    assert(store == exact,
      "exhaustive store-backed triples must reproduce the exact form")
  }

  test("contrastiveTriplesFromStore rejects kFetch <= nNeg: the fetch " +
      "must carry the positive and the negatives") {
    intercept[IllegalArgumentException] {
      SimilarityOps.contrastiveTriplesFromStore(emb.limit(1), emb, emb,
        graft.ext.IvfCentroids.centroids, graft.ext.PqCodebooks.codebooks,
        posMin = 0.35, negLo = 0.15, negHi = 0.3, nNeg = 3, kFetch = 3,
        nprobe = 3)
    }
  }

  test("contrastiveTriples rejects an overlapping positive/negative band") {
    intercept[IllegalArgumentException] {
      SimilarityOps.contrastiveTriples(emb.limit(1), emb,
        posMin = 0.25, negLo = 0.15, negHi = 0.3, nNeg = 3)
    }
  }

  test("plan: exact mining broadcasts the anchors (corpus scan stays " +
      "map-side) and k pushes into the per-anchor sort") {
    val p = SimilarityOps.hardNegatives(emb.filter(col("vec_id") < 10),
        emb, k = 5, simLo = 0.15, simHi = 0.6)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastNestedLoopJoin"),
      "anchors must broadcast — a shuffle join here scans-and-shuffles " +
        "the corpus")
    assert(p.contains("WindowGroupLimit"),
      "top-k must push into the sort")
  }
}
