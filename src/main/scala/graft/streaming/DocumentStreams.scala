package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.TextOps

/** Streaming corpus ingest — the front half of q59's batch cleaning
  * pipeline (quality filter → exact dedup) run continuously over a
  * document stream. The point being demonstrated: the text kernels are
  * plain codegen'd expressions, so the SAME operators run per micro-batch
  * unchanged; only the dedup needs streaming semantics, and that is
  * state-store-backed with watermark-bounded memory.
  */
object DocumentStreams {

  case class Doc(ts: Timestamp, doc_id: Long, lang: String, text: String)

  /** Quality-filter, repetition-gate, then content-dedup an arriving
    * document stream:
    *   - quality scoring/filtering is STATELESS (a map over each batch —
    *     the identical [[TextOps.qualityScore]] expression q22/q59 use);
    *   - the repetition gate applies the MAP-ONLY half of q62's metrics
    *     (duplicate n-gram fractions via the native shingle kernel); the
    *     top-token fraction needs a per-doc aggregation pass and so stays
    *     batch-side — the asymmetry is the streaming/batch trade, stated
    *     rather than hidden;
    *   - dedup keys on the md5 content fingerprint
    *     ([[TextOps.docFingerprint]], 32 bytes per retained key) via
    *     `dropDuplicatesWithinWatermark`, so state is bounded by distinct
    *     fingerprints per watermark horizon, not stream length, and the
    *     state store shards on the fingerprint — uniform, skew-free.
    * A duplicate arriving after the watermark passes its original is kept
    * — the retention/correctness trade the watermark makes explicit
    * (batch q59 over the full corpus has no such horizon).
    */
  def cleanIngest(docs: DataFrame, watermark: String,
                  minQuality: Double,
                  maxDup2Frac: Double = 1.0): DataFrame =
    docs
      .withColumn("quality", TextOps.qualityScore(col("text")))
      .filter(col("quality") >= minQuality)
      // docs too short to have 2-grams pass the gate (null-safe coalesce)
      .filter(coalesce(
        TextOps.dupNgramFrac(TextOps.tokens(col("text")), 2),
        lit(0.0)) <= maxDup2Frac)
      .withColumn("fp", TextOps.docFingerprint(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("fp"))
      .select(col("ts"), col("doc_id"), col("lang"), col("quality"))
}
