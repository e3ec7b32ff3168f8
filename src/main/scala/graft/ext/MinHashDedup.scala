package graft.ext

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection (SURVEY.md §2.C) on Spark ML's
  * MinHashLSH: shingle → sparse term-frequency vector → minhash signature →
  * banded bucket join. Deterministic under the fixed seed.
  *
  * Scale shape: HashingTF and the minhash signature are map-only;
  * approxSimilarityJoin explodes each row into its LSH buckets and joins on
  * the bucket key — one shuffle on uniformly-hashed keys, candidate pairs
  * only (never the full cross product), then the exact Jaccard distance
  * filter runs on candidates alone. This is the canonical 100 TB near-dup
  * architecture (the same one the C4/RefinedWeb pipelines use).
  */
object MinHashDedup {

  /** Near-dup pairs with Jaccard distance <= maxDistance over k-token
    * shingles. Output: (id_a, id_b, jaccard_dist rounded).
    */
  def nearDupPairs(docs: DataFrame, k: Int, numHashTables: Int,
                   maxDistance: Double, seed: Long = 42L): DataFrame = {
    val sh = docs.select(col("doc_id"),
      array_distinct(TextOps.shingles(TextOps.tokens(col("text")), k))
        .as("sh"))
      .filter(size(col("sh")) > 0)
    val tf = new HashingTF().setInputCol("sh").setOutputCol("tf")
      .setNumFeatures(1 << 18)
    val featured = tf.transform(sh)
    val lsh = new MinHashLSH().setInputCol("tf").setOutputCol("sig")
      .setNumHashTables(numHashTables).setSeed(seed)
    val model = lsh.fit(featured)
    model.approxSimilarityJoin(featured, featured, maxDistance, "dist")
      .select(col("datasetA.doc_id").as("id_a"),
        col("datasetB.doc_id").as("id_b"),
        round(col("dist"), 4).as("jaccard_dist"))
      .filter(col("id_a") < col("id_b"))
  }
}
