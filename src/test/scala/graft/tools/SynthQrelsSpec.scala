package graft.tools

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.queries.ExtensionQueries

/** Staleness gate for the SYNTHESIZED qrels fixtures (the q138→q143
  * discipline applied to judgment labels): the committed literals in
  * ExtensionQueries were pasted from a one-time tool run, so corpus or
  * operator drift would silently detach them from their documented
  * rules. Re-run each rule on the current corpus and require exact
  * equality with the committed rows — a failure here means "regenerate
  * the fixture with the Synth tool and re-verify the oracles", never
  * "loosen the assertion".
  */
class SynthQrelsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("committed synthFusionQrels equals the leg-balanced rule " +
      "re-run on the current corpus (queries 4-20)") {
    val regen = SynthFusionQrels.synthesize(spark, dir)
    val committed = ExtensionQueries.synthFusionQrels
    assert(regen.size == committed.size,
      s"row count drifted: rule=${regen.size} committed=${committed.size}")
    assert(regen.toSet == committed.toSet,
      "committed grades no longer match the leg-balanced rule — " +
        "regenerate with `runMain graft.tools.SynthFusionQrels`; " +
        s"rule-only=${(regen.toSet -- committed.toSet).take(5)} " +
        s"committed-only=${(committed.toSet -- regen.toSet).take(5)}")
  }

  test("committed mmrQrels probes 4-21 equal the exact-cosine rule " +
      "re-run on the current corpus") {
    val regen = SynthMmrQrels.synthesize(spark, dir)
      .map { case (p, cand, _, rel) => (p, cand, rel) }
    val committed = ExtensionQueries.mmrQrels
      .filter { case (p, _, _) => p >= 4L && p <= 21L }
    assert(regen.size == committed.size,
      s"row count drifted: rule=${regen.size} committed=${committed.size}")
    assert(regen.toSet == committed.toSet,
      "committed grades no longer match the exact-cosine rule — " +
        "regenerate with `runMain graft.tools.SynthMmrQrels`; " +
        s"rule-only=${(regen.toSet -- committed.toSet).take(5)} " +
        s"committed-only=${(committed.toSet -- regen.toSet).take(5)}")
  }
}
