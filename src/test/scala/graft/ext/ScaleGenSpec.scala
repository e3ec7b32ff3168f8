package graft.ext

import graft.SparkTestSession
import graft.tools.ScaleGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SCALING.md measurements are only meaningful if the replicated
  * corpus preserves intra-replica structure exactly and keeps replicas
  * (near-)independent — these are the invariants the generator claims.
  */
class ScaleGenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val docs3 = ScaleGen.replicateDocuments(docs, 3).cache()

  test("rotation is a bijection fixing the stopword alphabet") {
    assert(ScaleGen.rotation(0) == ScaleGen.Movable)
    assert(ScaleGen.rotation(1).sorted == ScaleGen.Movable.sorted)
    val stopLetters = "the a of and to in is it for on".replace(" ", "").toSet
    assert(ScaleGen.Movable.toSet.intersect(stopLetters).isEmpty)
    assert((ScaleGen.Movable.toSet ++ stopLetters) == ('a' to 'z').toSet)
  }

  test("letterMap extends the rotation past its 15-replica group: " +
      "byte-compatible below the bound, a distinct Movable permutation " +
      "per replica beyond, and the no-exact-dup invariant holds in the " +
      "permutation regime") {
    // byte-compat: the first |Movable| replicas ARE the rotations, so
    // every earlier SCALING.md corpus regenerates bit-identically
    (0 until ScaleGen.Movable.length).foreach { r =>
      assert(ScaleGen.letterMap(r) == ScaleGen.rotation(r), s"r=$r")
    }
    // beyond the bound: still a permutation of Movable, deterministic,
    // never the identity, and no two replicas share a map (a shared
    // map would make those replicas byte-identical post-lowercase)
    val maps = (0 until 120).map(ScaleGen.letterMap)
    maps.zipWithIndex.foreach { case (m, r) =>
      assert(m.sorted == ScaleGen.Movable.sorted, s"r=$r not a perm") }
    assert(maps.distinct.size == maps.size, "two replicas share a map")
    maps.zipWithIndex.drop(1).foreach { case (m, r) =>
      assert(m != ScaleGen.Movable, s"replica $r maps identity") }
    // the invariant the 100x corpora rest on, tested IN the permutation
    // regime (n=20 > the 15-replica rotation bound): identical-text
    // groups never mix replicas
    val docs20 = ScaleGen.replicateDocuments(docs.limit(40), 20)
    val mixed20 = docs20
      .groupBy(TextOps.docFingerprint(col("text")).as("fp"))
      .agg(countDistinct(col("doc_id") % 20).as("nr"))
      .filter(col("nr") > 1)
    assert(mixed20.count() == 0,
      "exact dup crosses replicas in the permutation regime")
  }

  test("documents: N× rows, distinct ids, replica 0 verbatim") {
    val n0 = docs.count()
    assert(docs3.count() == 3 * n0)
    assert(docs3.select("doc_id").distinct().count() == 3 * n0)
    val orig = docs.select(col("doc_id") * 3, col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    docs3.filter(col("doc_id") % 3 === 0).collect().foreach { r =>
      assert(orig(r.getAs[Long]("doc_id")) == r.getAs[String]("text"))
    }
  }

  test("every quality-gate input is bit-identical across replicas") {
    val feats = docs3
      .withColumn("r", col("doc_id") % 3)
      .withColumn("base", expr("doc_id div 3"))
      .select(col("r"), col("base"),
        TextOps.qualityScore(col("text")).as("q"),
        size(TextOps.tokens(col("text"))).as("ntok"),
        length(col("text")).as("len"))
    val perReplica = feats.groupBy("base")
      .agg(countDistinct(col("q")).as("dq"),
        countDistinct(col("ntok")).as("dt"),
        countDistinct(col("len")).as("dl"))
      .filter(col("dq") > 1 || col("dt") > 1 || col("dl") > 1)
    assert(perReplica.count() == 0)
  }

  test("no exact dup crosses replicas; intra-replica dup structure replicates") {
    // groups of identical text never mix replicas...
    val mixed = docs3
      .groupBy(TextOps.docFingerprint(col("text")).as("fp"))
      .agg(countDistinct(col("doc_id") % 3).as("nr"))
      .filter(col("nr") > 1)
    assert(mixed.count() == 0)
    // ...and each replica has exactly the original's dup-group count
    val origGroups = DedupOps.exactDedup(docs).count()
    val perReplica = docs3.withColumn("r", col("doc_id") % 3)
      .groupBy(col("r"), TextOps.docFingerprint(col("text")))
      .count().groupBy("r").count().collect()
    assert(perReplica.forall(_.getLong(1) == origGroups))
  }

  test("embeddings: sign flips preserve intra-replica dots, norms exactly") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val dim = e.select(size(col("embedding"))).head().getInt(0)
    val e3 = ScaleGen.replicateEmbeddings(e, 3, dim).cache()
    assert(e3.count() == 3 * e.count())
    // dot(a,b) within replica r == dot(a,b) within replica 0, every pair of
    // the first 20 vectors
    val firsts = e3.filter(col("vec_id") < 60) // 20 base ids × 3 replicas
      .withColumn("r", col("vec_id") % 3)
      .withColumn("base", expr("vec_id div 3"))
    val pairs = firsts.as("a").join(firsts.as("b"),
        col("a.r") === col("b.r") && col("a.base") < col("b.base"))
      .select(col("a.r").as("r"), col("a.base").as("ba"), col("b.base").as("bb"),
        round(SimilarityOps.dot(col("a.embedding"), col("b.embedding")), 9)
          .as("d"))
    val divergent = pairs.groupBy("ba", "bb")
      .agg(countDistinct(col("d")).as("nd"), count(lit(1)).as("n"))
      .filter(col("nd") > 1 || col("n") =!= 3)
    assert(divergent.count() == 0)
  }

  test("bitsForScale holds expected bucket size as n grows") {
    assert(SimilarityOps.bitsForScale(2000) == 4)    // 2000/16  = 125
    assert(SimilarityOps.bitsForScale(20000) == 8)   // 20000/256 ≈ 78
    assert(SimilarityOps.bitsForScale(100) == 1)
    (1 to 30).foreach { p =>
      val n = 1L << p
      val bits = SimilarityOps.bitsForScale(n)
      val bucket = n.toDouble / (1L << bits)
      assert(bucket <= 125.0 + 1e-9, s"n=$n bits=$bits bucket=$bucket")
    }
  }
}
