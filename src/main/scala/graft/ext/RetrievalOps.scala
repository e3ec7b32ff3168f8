package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-retrieval scoring over the document corpus (SURVEY.md §2.C) —
  * the ranking half of a data-curation search loop (find the corpus
  * documents most relevant to a probe query: quality forensics, targeted
  * decontamination, seed expansion).
  */
object RetrievalOps {

  /** BM25 top-k retrieval (Robertson & Zaragoza 2009, "The Probabilistic
    * Relevance Framework: BM25 and Beyond", FnTIR 3(4) — the Okapi
    * formulation with the +1'd idf DuckDB/Lucene use, so the log never
    * goes negative for common terms):
    *
    *   score(d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    *   idf(t)   = ln( (N − df + 0.5)/(df + 0.5) + 1 )
    *
    * Plan shape at 100 TB: ONE explode of the corpus feeds ONE
    * (doc, term-or-other) aggregate — query terms keep their identity,
    * every other token collapses into a single null-key row per document,
    * so the shuffled stream is ≤ |docs|·(|q|+1) rows carrying counts, not
    * tokens. Document length is a window sum over those per-doc rows
    * (≤ |q|+1 rows per partition — no skew), NOT a second aggregate
    * lineage, and every consumer of the collapsed counts is a canonically
    * identical subtree, so exchange reuse runs the tokenize pass once
    * (the q113 dsirWeights discipline). df/idf (≤ |q| rows) and the
    * scalar N/avgdl broadcast back; the final ranking is a global top-k
    * (TakeOrderedAndProject — no full sort). Query terms absent from the
    * corpus contribute nothing on both engines (no df row → no score
    * row).
    *
    * Returns the top `k` rows (idCol, score) by (score DESC, id) —
    * deterministic at ties; score rounded to 6 for cross-engine parity.
    * Documents containing no query term never appear (their score is an
    * empty sum, not 0.0 — BM25 has no notion of them).
    */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], idCol: String,
               textCol: String, k: Int, k1: Double = 1.2,
               b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query")
    require(k > 0, "bm25TopK: k must be positive")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val toks = docs.select(col(idCol),
      explode(TextOps.tokens(col(textCol))).as("__t"))
    // one aggregate over the token stream: query terms survive with their
    // identity, everything else folds into the null bucket — term
    // frequency AND (via the window below) document length from the same
    // shuffled counts
    val counts = toks.groupBy(col(idCol),
        when(col("__t").isin(terms: _*), col("__t")).as("__qt"))
      .agg(count(lit(1)).as("__n"))
    val withDl = counts
      .withColumn("__dl", sum(col("__n")).over(
        Window.partitionBy(col(idCol))))
    val tf = withDl.filter(col("__qt").isNotNull)
    // corpus scalars: N counts EVERY document (null-text docs included —
    // they are real corpus members with dl 0; they add no token mass),
    // avgdl = Σ tokens / N. N is a column-pruned count scan, no tokenize.
    val nDocs = docs.agg(count(lit(1)).cast("double").as("__nd"))
    val scalars = counts.agg(sum(col("__n")).cast("double").as("__tl"))
      .crossJoin(broadcast(nDocs))
      .select(col("__nd"), (col("__tl") / col("__nd")).as("__avgdl"))
    val idf = tf.groupBy(col("__qt")).agg(count(lit(1)).as("__df"))
      .crossJoin(broadcast(nDocs))
      .select(col("__qt"),
        log((col("__nd") - col("__df") + 0.5) / (col("__df") + 0.5) + 1)
          .as("__idf"))
    scored(tf, idf, scalars, idCol, k1, b)
      .orderBy(col("score").desc, col(idCol)).limit(k)
  }

  private def scored(tf: DataFrame, idf: DataFrame, scalars: DataFrame,
                     idCol: String, k1: Double, b: Double): DataFrame =
    tf.join(broadcast(idf), Seq("__qt"))
      .crossJoin(broadcast(scalars))
      .withColumn("__c", col("__idf") * (col("__n") * (k1 + 1)) /
        (col("__n") +
          lit(k1) * (lit(1 - b) + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(col(idCol))
      .agg(round(sum(col("__c")), 6).as("score"))
}
