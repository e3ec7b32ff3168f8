package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{RetrievalOps, SimilarityOps}

/** One-time qrels SYNTHESIS for the hybrid-fusion pool (VERDICT r18
  * task 3, fusion side): queries 4–20 of the grown
  * [[graft.queries.ExtensionQueries.fusionProbes]] get graded labels
  * by a documented LEG-BALANCED rule — each leg's own exact ideal
  * contributes symmetrically, so the q176 weight tuning measures how
  * the legs combine instead of echoing one leg's ordering back:
  *
  *   - the exact BM25 ranking's top-3 ids grade 3/2/1 (the lexical
  *     facet of relevance);
  *   - the exact-cosine ranking's top-3 ids grade 3/2/1 (the semantic
  *     facet);
  *   - an id in both ideals keeps the MAX grade;
  *   - the BM25 rank-5 id grades an explicit rel 0 (judged-irrelevant
  *     on a retrieved id — every query exercises that edge).
  *
  * Both ideals are the operators' own exact arithmetic at sf0.01
  * ([[RetrievalOps.bm25PerQuery]], [[SimilarityOps.bruteForceTopK]] —
  * byte-equal to the oracles' CTEs), so regeneration is deterministic.
  * Paste the printout into `synthFusionQrels`:
  *   sbt "runMain graft.tools.SynthFusionQrels [sfDir]"
  */
object SynthFusionQrels {
  /** The leg-balanced rule evaluated on the CURRENT corpus, in the
    * committed fixture's own (query, −rel, id) order. The pasted
    * [[graft.queries.ExtensionQueries.synthFusionQrels]] must equal
    * this exactly — SynthQrelsSpec pins it, so corpus or operator
    * drift fails a test instead of silently detaching the committed
    * grades from their documented rule.
    */
  def synthesize(spark: SparkSession,
                 sfDir: String): Seq[(Int, Long, Int)] = {
    import spark.implicits._

    val probes = graft.queries.ExtensionQueries.fusionProbes
      .filter(_._1 >= 4).toDF("query_id", "term")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val lex = RetrievalOps.bm25PerQuery(docs, probes,
        "query_id", "term", "doc_id", "text", k = 5)
      .select(col("query_id"), col("doc_id").as("id"), col("rank"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2)))
    val e = graft.Tables.load(spark, sfDir, "embeddings").drop("label")
    val vec = SimilarityOps.bruteForceTopK(
        e.filter(col("vec_id") >= 4L && col("vec_id") <= 20L), e, k = 3)
      .select(col("probe_id").cast("int").as("query_id"),
        col("cand_id").as("id"), col("rk").cast("int"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2)))

    def grade(rk: Int): Int = 4 - rk // 1→3, 2→2, 3→1
    val graded = scala.collection.mutable.Map.empty[(Int, Long), Int]
    (lex.filter(_._3 <= 3) ++ vec).foreach { case (q, id, rk) =>
      val k = (q, id)
      graded(k) = math.max(graded.getOrElse(k, 0), grade(rk))
    }
    // explicit rel-0 on the BM25 rank-5 id (never overrides a grade)
    lex.filter(_._3 == 5).foreach { case (q, id, _) =>
      if (!graded.contains((q, id))) graded((q, id)) = 0
    }
    (4 to 20).flatMap { q =>
      graded.toSeq.collect { case ((`q`, id), rel) => (id, rel) }
        .sortBy { case (id, rel) => (-rel, id) }
        .map { case (id, rel) => (q, id, rel) }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    synthesize(spark, sfDir).groupBy(_._1).toSeq.sortBy(_._1)
      .foreach { case (q, rows) =>
        println("    " + rows.map { case (_, id, rel) =>
          s"($q, ${id}L, $rel)" }.mkString(", ") + ",")
      }
    spark.stop()
  }
}
