package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trained quality classifier: logistic regression over hashed n-gram
  * buckets — the fastText-style seed-labeled gate (Joulin et al. 2017;
  * the GPT-3/LLaMA/RedPajama curation pattern: label a positive seed
  * set, train a cheap discriminator, gate the corpus by its score).
  * Complements the HEURISTIC gate (q22 [[TextOps.qualityScore]]) and the
  * IMPORTANCE weights (q113 [[TextOps.dsirWeights]]): same feature map
  * as DSIR (unigrams ∪ bigram shingles, md5-hex-prefix bucket hash —
  * cross-engine reproducible, which is what lets q151's oracle rebuild
  * the score as a dot product in SQL), but a DISCRIMINATIVE weight
  * vector fit by gradient descent instead of closed-form ratios.
  *
  * Lifecycle is the [[IvfCentroids]]/[[BpeMerges]] discipline: [[fit]]
  * runs ONCE (a tool, [[graft.tools.FitQualityLr]]), the weights commit
  * as literals ([[QualityLrWeights]]), and scoring is a map-only native
  * expression ([[org.apache.spark.sql.graft.HashedGramScore]]) — no fit
  * job, no join, no UDF at query time.
  *
  * Training is DETERMINISTIC by construction (the q151 spec pins it):
  * zero-initialized weights, a fixed iteration count, no RNG, no
  * sampling; each iteration's gradient is a map-side partial aggregate
  * collapsing to ≤ nBuckets+1 rows (a bounded driver probe — the
  * fitIvfCentroids Lloyd pattern), and the updated weights round at
  * 1e-12 to absorb float fold-order jitter (~1e-16) across partitioning
  * layouts.
  */
object QualityLr {

  /** The shared bucket hash — q113's exact feature map: first 8 md5 hex
    * chars as an integer, mod nBuckets (nonnegative by construction).
    */
  private[ext] def bucketOf(g: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(conv(substring(md5(g), 1, 8), 16, 10).cast("long"),
      lit(nBuckets.toLong)).cast("int")

  /** Per-doc hashed-gram frequency features: (__id, __y, __b, __f) with
    * __f = bucket count / total grams of the doc. Docs with no grams
    * (null/empty text) carry no rows: a featureless doc cannot train
    * feature weights, and its serve-time score is σ(bias) by the same
    * normalization. A NULL label is "not in the positive seed".
    */
  private def features(docs: DataFrame, labelPred: org.apache.spark.sql.Column,
                       idCol: String, textCol: String,
                       nBuckets: Int): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    docs.select(col(idCol).as("__id"),
        coalesce(labelPred.cast("boolean"), lit(false)).as("__y"),
        explode(concat(toks, TextOps.shingles(toks, 2))).as("__g"))
      .withColumn("__b", bucketOf(col("__g"), nBuckets))
      .groupBy(col("__id"), col("__y"), col("__b"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__f", col("__n").cast("double") /
        sum(col("__n")).over(Window.partitionBy(col("__id"))))
  }

  /** Fit (weights, bias) on a labeled seed frame. Plain full-batch
    * gradient ascent on the log-likelihood, `iters` fixed iterations,
    * gradients 1/N-normalized. The weight rate `lr` is much larger than
    * `lrBias` BY DESIGN: the features are per-doc gram FREQUENCIES
    * (Σ_b f_b = 1, individual f_b ~ 1/|grams|), so the weight gradient
    * is ~1/|grams| of the bias gradient's scale — equal rates would
    * train the bias and freeze the weights (measured: accuracy stuck at
    * the class prior). Each iteration is two bounded
    * probes: per-doc scores reduce to a residual frame, residual×feature
    * reduces to ≤ nBuckets gradient rows. The feature frame is computed
    * once and cached for the loop (tool-lifetime; unpersisted on exit).
    *
    * Seed sets are bounded BY CONSTRUCTION (they are labeled data — the
    * corpus-sized thing is what the committed weights later score
    * map-only), so the per-iteration probes are histogram-scale.
    */
  def fit(docs: DataFrame, labelPred: org.apache.spark.sql.Column,
          idCol: String, textCol: String, nBuckets: Int = 256,
          iters: Int = 200, lr: Double = 2000.0,
          lrBias: Double = 1.0): (Array[Double], Double) = {
    require(nBuckets > 0, "QualityLr.fit: nBuckets must be positive")
    require(iters >= 0, "QualityLr.fit: iters must be non-negative")
    val spark = docs.sparkSession
    val feats = features(docs, labelPred, idCol, textCol, nBuckets)
      .persist()
    try {
      val nSeed = feats.select(col("__id")).distinct().count().toDouble
      require(nSeed > 0, "QualityLr.fit: no documents with features")
      val w = Array.fill(nBuckets)(0.0)
      var bias = 0.0
      def round12(x: Double): Double = math.rint(x * 1e12) / 1e12
      var it = 0
      while (it < iters) {
        val wDf = spark.createDataFrame(
          w.toIndexedSeq.zipWithIndex.map { case (v, i) => (i, v) })
          .toDF("__b", "__w")
        val resid = feats.join(broadcast(wDf), Seq("__b"))
          .groupBy(col("__id"), col("__y"))
          .agg(sum(col("__f") * col("__w")).as("__z"))
          .select(col("__id"),
            (when(col("__y"), 1.0).otherwise(0.0) -
              lit(1.0) / (lit(1.0) + exp(-(col("__z") + lit(bias)))))
              .as("__r"))
          .persist() // read twice per iteration (bucket grads + bias)
        try {
          val grads = feats.join(resid, Seq("__id"))
            .groupBy(col("__b"))
            .agg(sum(col("__r") * col("__f")).as("__g"))
            .collect()
          grads.foreach { r =>
            val b = r.getInt(0)
            w(b) = round12(w(b) + lr * r.getDouble(1) / nSeed)
          }
          // the bias gradient is Σ residual over DOCS — taken from the
          // residual frame itself (summing the per-bucket partials would
          // count a doc once per bucket it touches)
          val gBias = resid.agg(sum(col("__r"))).collect()(0).getDouble(0)
          bias = round12(bias + lrBias * gBias / nSeed)
        } finally { resid.unpersist(); () }
        it += 1
      }
      (w, bias)
    } finally { feats.unpersist(); () }
  }
}
