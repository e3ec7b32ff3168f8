package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-time qrels SYNTHESIS for the MMR quality pool (VERDICT r18
  * task 3): the r15–r18 fixture judged only 5 probes, so every λ/MMR
  * conclusion rested on a pool the significance test itself called
  * underpowered (q185: p=0.237 at 5 probes). This tool grows the
  * committed [[graft.queries.ExtensionQueries.mmrQrels]] to 24 judged
  * probes with a DOCUMENTED deterministic rule instead of hand labels:
  *
  * For each new probe p in 4..21 (the grown q164 probe set), the
  * graded "ideal" is the EXACT cosine ranking the ANN/MMR stack
  * approximates — the same ground-truth-by-exhaustive-scan discipline
  * the ANN recall monitors (q136) already use:
  *   rank 1            -> rel 3
  *   ranks 2-3         -> rel 2
  *   ranks 4-6         -> rel 1
  *   rank 8            -> rel 0   (explicit judged irrelevance)
  * where rank is [[graft.ext.SimilarityOps.bruteForceTopK]]'s rounded
  * cosine order (ties to the smaller cand_id) at sf0.01 — byte-equal
  * to the oracle's `rk` CTE. Under these labels the plain ranking is
  * near-ideal BY CONSTRUCTION, so the MMR delta measures the real
  * relevance cost of diversity and q185 gains actual power.
  *
  * Probes 0-3 and 9 keep the r15 hand labels (they exercise the
  * judgment edge kinds: misses, an explicit rel=0 on a retrieved id,
  * exclusive ids); probe 25 is judged but never answered (the old
  * probe 9 role — 9 is now inside the probe set).
  *
  * Run manually when regenerating the fixture; paste the printed rows
  * into mmrQrels:
  *   sbt "runMain graft.tools.SynthMmrQrels [sfDir]"
  */
object SynthMmrQrels {
  /** The exact-cosine grading rule evaluated on the CURRENT corpus:
    * (probe, cand, rk, rel) rows in (probe, rk) order. The pasted
    * probes-4–21 rows of
    * [[graft.queries.ExtensionQueries.mmrQrels]] must carry exactly
    * these (probe, cand, rel) triples — SynthQrelsSpec pins it, so
    * corpus or operator drift fails a test instead of silently
    * detaching the committed grades from their documented rule.
    */
  def synthesize(spark: SparkSession,
                 sfDir: String): Seq[(Long, Long, Int, Int)] = {
    val e = graft.Tables.load(spark, sfDir, "embeddings").drop("label")
    val probes = e.filter(col("vec_id") >= 4 && col("vec_id") < 22)
    graft.ext.SimilarityOps.bruteForceTopK(probes, e, k = 8)
      .select(col("probe_id"), col("cand_id"), col("rk"))
      .filter(col("rk") <= 6 || col("rk") === 8)
      .withColumn("rel",
        when(col("rk") === 1, 3).when(col("rk") <= 3, 2)
          .when(col("rk") <= 6, 1).otherwise(0))
      .select(col("probe_id").cast("long"), col("cand_id").cast("long"),
        col("rk").cast("int"), col("rel").cast("int"))
      .orderBy(col("probe_id"), col("rk"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    synthesize(spark, sfDir).groupBy(_._1).toSeq.sortBy(_._1).foreach {
      case (p, rows) =>
        val cells = rows.sortBy(_._3).map { case (_, cand, _, rel) =>
          s"(${p}L, ${cand}L, $rel)"
        }.mkString(", ")
        println(s"    $cells,")
    }
    spark.stop()
  }
}
