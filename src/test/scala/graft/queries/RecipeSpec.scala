package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral invariants of the q129 pretraining-recipe chain on planted
  * fixtures (the DuckDB oracle proves exact semantics on the real
  * corpus; this guards each stage's contribution with named plants).
  */
class RecipeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // stopword-rich filler that clears the 0.5 quality gate; suffix token
  // keeps every doc's content distinct
  private def good(i: Int): String =
    s"the quick brown fox and the lazy dog of the hill is it for on " +
      s"a fine day to run in the sun unique$i"

  test("q129 chain: the gate, both dedups, decontamination, and the " +
      "budget each drop their planted doc; the kept set is a maximal " +
      "in-budget prefix") {
    val evalText = "alpha beta gamma delta epsilon shared secret phrase"
    val docs = Seq(
      (1L, good(1)),
      (2L, good(1)),                       // exact dup of 1 → dropped
      (3L, good(3)),
      (4L, good(3) + " extra"),            // near-dup of 3 → clustered out
      (5L, "$$$ %%% ^^^ &&& *** !!!"),     // punctuation soup → gate drop
      (6L, good(6) + " shared secret phrase"), // eval 3-gram → decontam
      (7L, good(7)), (8L, good(8)), (9L, good(9))
    ).toDF("doc_id", "text")
    val eval = Seq((100L, evalText)).toDF("doc_id", "text")
    // every good() doc is 20 tokens; budget 3 docs' worth + slack
    val kept = ExtensionQueries.pretrainRecipeChain(docs, eval)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val ids = kept.map(_._1).toSet
    assert(!ids.contains(2L), "exact dup must not survive")
    assert(!(ids.contains(3L) && ids.contains(4L)), "near-dup cluster " +
      "must keep at most one member")
    assert(!ids.contains(5L), "gate-failed doc must not survive")
    assert(!ids.contains(6L), "contaminated doc must not survive")
    assert(ids.nonEmpty && kept.map(_._2).sum <= ExtensionQueries.RecipeBudget)
  }

  test("q132 funnel agrees with the chain it audits: counters are " +
      "monotone non-increasing and the budget stage equals q129's output") {
    val docs = Seq(
      (1L, good(1)), (2L, good(1)), (3L, good(3)),
      (4L, good(3) + " extra"), (5L, "$$$ %%% ^^^ &&& *** !!!"),
      (6L, good(6) + " shared secret phrase"),
      (7L, good(7)), (8L, good(8)), (9L, good(9))
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "alpha beta gamma delta epsilon shared secret " +
      "phrase")).toDF("doc_id", "text")
    val f = ExtensionQueries.recipeFunnelReport(docs, eval).collect().head
    val n = (0 until 12 by 2).map(f.getLong) // n_input..n_budget
    val t = (1 until 12 by 2).map(f.getLong) // t_input..t_budget
    assert(n == n.sorted.reverse && t == t.sorted.reverse,
      s"funnel must shrink stage over stage: $n / $t")
    val chain = ExtensionQueries.pretrainRecipeChain(docs, eval).collect()
    assert(n.last == chain.length &&
      t.last == chain.map(_.getLong(2)).sum,
      "the funnel's budget stage must equal the recipe's actual output")
  }

  test("q149 calibration report conserves its inputs: deciles partition " +
      "the train slice, flag totals equal the flagging stages' own counts") {
    val dir = "/root/testdata/sf0.001"
    val rows = ExtensionQueries.queries("q149_quality_calibration")(
      spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val train = d.filter(col("doc_id") % 50 =!= 0)
    assert(rows.map(_._2).sum == train.count(),
      "deciles must partition the train slice")
    val pairs = ExtensionQueries.portableMinHashPairs(train)
    val nDup = pairs.select(col("id_a").as("id"))
      .union(pairs.select(col("id_b").as("id"))).distinct().count()
    assert(rows.map(_._3).sum == nDup,
      "per-decile dup counts must sum to the distinct flagged docs")
    // rates are bounded by construction
    assert(rows.forall { case (dec, nd, du, ct) =>
      dec >= 0 && dec <= 9 && du <= nd && ct <= nd })
  }
}
