package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Pins the pay-LSH-once contract of [[DedupOps.materializedPairs]]
  * (VERDICT r7 #5): the first caller computes and writes, every later
  * caller gets a bare parquet scan — the by-name compute thunk must not
  * even be forced, and the returned plan must contain none of the LSH
  * pipeline's operators (Generate from the shingle explode, HashAggregate
  * from the signature min).
  */
class PersistedPairsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def freshPath(): String = {
    val p = java.nio.file.Files
      .createTempDirectory("graft-pairs-spec").resolve("pairs").toString
    p
  }

  test("computes exactly once; cached result equals recomputation") {
    val path = freshPath()
    var computed = 0
    def pairs = {
      computed += 1
      graft.queries.ExtensionQueries.portableMinHashPairs(
        graft.Tables.load(spark, dir, "documents"))
    }
    val first = DedupOps.materializedPairs(spark, path)(pairs)
      .collect().map(_.toSeq).toSet
    assert(computed == 1)
    val second = DedupOps.materializedPairs(spark, path)(pairs)
      .collect().map(_.toSeq).toSet
    assert(computed == 1, "cache hit must not force the compute thunk")
    val direct = graft.queries.ExtensionQueries.portableMinHashPairs(
        graft.Tables.load(spark, dir, "documents"))
      .collect().map(_.toSeq).toSet
    assert(first == second)
    assert(first == direct)
    assert(first.nonEmpty)
  }

  test("cache-hit plan is a bare FileScan of the materialization — zero " +
      "LSH recompute") {
    val path = freshPath()
    val df0 = DedupOps.materializedPairs(spark, path)(
      graft.queries.ExtensionQueries.portableMinHashPairs(
        graft.Tables.load(spark, dir, "documents")))
    df0.limit(1).collect() // force the materialization write
    val hit = DedupOps.materializedPairs(spark, path)(
      fail("compute thunk must not be forced on a cache hit"))
    val plan = hit.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("Scan parquet"))
    assert(plan.contains("pairs"), s"scan should read the cache path:\n$plan")
    assert(!plan.contains("Generate"), "shingle explode must not reappear")
    assert(!plan.contains("HashAggregate"), "signature mins must not reappear")
    assert(!plan.contains("documents.parquet"), "corpus must not be re-scanned")
  }
}
