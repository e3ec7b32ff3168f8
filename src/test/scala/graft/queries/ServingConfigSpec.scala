package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ext.ServingConfig

/** The committed serving config (VERDICT r17 task 3): the tuned knobs
  * live in ONE artifact the store-served paths consume, and the config
  * object provably changes nothing but where the knobs live.
  */
class ServingConfigSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("the committed values are the measured winners") {
    // q176 grid: equal weights win, quality flat in kRrf → standard 60;
    // q182 sweep: λ=0.75 recovers most of MMR's relevance cost
    assert(ServingConfig.kRrf == 60)
    assert(ServingConfig.legWeights == Seq(1.0, 1.0))
    assert(ServingConfig.mmrLambda == 0.75)
    // λ must be exact-binary so the oracle literal round-trips
    assert(ServingConfig.mmrLambda == 3.0 / 4.0)
    // q139 grid: (3, 8) is the latency point — at nprobe 3, refine 32
    // buys ~nothing (0.66 -> 0.68); the upgrade path is nprobe
    assert(ServingConfig.annNprobe == 3)
    assert(ServingConfig.annRefineFactor == 8)
  }

  test("q166 config-driven ≡ explicit-param fusion") {
    val cfg = ExtensionQueries
      .queries("q166_hybrid_from_stores")(spark, dir).collect().toSeq
    val exp = ExtensionQueries
      .hybridFromStoresChain(spark, dir, kRrf = 60,
        weights = Seq(1.0, 1.0), nprobe = 3, refineFactor = 8)
      .collect().toSeq
    assert(cfg.nonEmpty && cfg == exp)
  }

  test("q167 config-driven ≡ explicit-λ walk") {
    val cfg = ExtensionQueries
      .queries("q167_mmr_from_store")(spark, dir).collect().toSeq
    val exp = ExtensionQueries
      .mmrFromStoreChain(spark, dir, lambda = 0.75, nprobe = 3,
        refineFactor = 8).collect().toSeq
    assert(cfg.nonEmpty && cfg == exp)
    // and the committed λ genuinely differs from the old hand default:
    // the walk at 0.5 must NOT be what serving runs (otherwise the
    // artifact would be decorative)
    val old = ExtensionQueries
      .mmrFromStoreChain(spark, dir, lambda = 0.5, nprobe = 3,
        refineFactor = 8).collect().toSeq
    assert(old != exp)
  }
}
