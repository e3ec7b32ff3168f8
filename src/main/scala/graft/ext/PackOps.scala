package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data preparation (SURVEY.md §2.C scope:
  * "operations a large-scale training-data pipeline would need"): assign
  * documents to fixed token-budget bins, the step that turns a cleaned
  * corpus into constant-length training sequences.
  *
  * The scheme is deterministic concat-and-chunk: documents are sharded by
  * id (shards are the parallel unit — a real pipeline packs each shard
  * independently on one task), ordered by id within the shard, and a
  * document starts in the bin where the running token count before it
  * lands: bin = floor(prefix_sum / budget). That is exactly what a
  * streaming concat-then-chunk tokenizer run produces, computed as one
  * window over the shard.
  *
  * At 100 TB: ONE shuffle (hash partition by shard) + a sort within each
  * shard; no driver state, no iteration. Shard count is the knob — set it
  * to ~(corpus tokens / executor-task budget) so a shard's documents fit a
  * task's sort buffer. Skew-free by construction: id-mod sharding spreads
  * documents uniformly regardless of length distribution.
  */
object PackOps {

  /** Per-document bin assignment: adds `shard`, `bin`, and the document's
    * token count `n_tok` (from `nTokCol`). Deterministic in (id, nShards,
    * budget) only — reproducible across engines and retries.
    */
  def packBins(docs: DataFrame, idCol: String, nTokCol: Column,
               budget: Int, nShards: Int): DataFrame = {
    require({
        import org.apache.spark.sql.types._
        Seq(LongType, IntegerType, ShortType, ByteType)
          .contains(docs.schema(idCol).dataType)
      },
      s"packBins needs an integral id column; '$idCol' is " +
        docs.schema(idCol).dataType.simpleString +
        " (pmod on a non-numeric id would NULL every shard and funnel " +
        "the whole corpus through one window partition)")
    // pmod(id, 0) is NULL too — the same single-partition funnel, silently
    require(nShards > 0, s"packBins: nShards must be positive, got $nShards")
    require(budget > 0, s"packBins: budget must be positive, got $budget")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("shard", pmod(col(idCol), lit(nShards)).cast("int"))
      .withColumn("n_tok", nTokCol.cast("long"))
      .withColumn("__cum", sum(col("n_tok")).over(w))
      .withColumn("bin",
        floor((col("__cum") - col("n_tok")).cast("double") / budget)
          .cast("int"))
      .drop("__cum")
  }

  /** Deterministic epoch reshuffle: assign each document a shard and a
    * within-shard position from an md5 coin over (seed, id) — the step
    * that re-orders a finished corpus differently per training epoch.
    * Changing `seed` permutes everything; the same seed reproduces the
    * same order on any engine, any cluster size, any retry — which is
    * what makes a training run resumable mid-epoch.
    *
    * Plan shape at 100 TB: ONE shuffle (hash partition by shard) + a
    * sort within each shard — the window's partitioning IS the physical
    * layout a shard-file writer needs, so
    * [[SinkOps.writePartitionedParquet]] on (shard) with
    * sortWithinPartitions(ord) adds no further exchange. nShards is the
    * parallelism knob: ~(corpus / target shard file size). Hash-coin
    * sharding is skew-free regardless of id distribution or doc length.
    */
  def epochShuffle(docs: DataFrame, idCol: String, seed: Long,
                   nShards: Int): DataFrame = {
    require(nShards > 0, s"epochShuffle: nShards must be positive, got $nShards")
    // a NULL id NULL-propagates (null coin → null shard, same rows the
    // oracle's '||' produces) — the shared seededCoin contract
    val coin = DedupOps.seededCoin(seed.toString, col(idCol))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__coin"), col(idCol)) // id tie-break: total order even
                                          // on md5-prefix collisions
    docs
      .withColumn("__coin", coin)
      .withColumn("shard",
        pmod(conv(substring(col("__coin"), 1, 8), 16, 10).cast("long"),
          lit(nShards)).cast("int"))
      .withColumn("ord", row_number().over(w))
      .drop("__coin")
  }

  /** Per-bin packing summary: document count, filled tokens, id range.
    * The groupBy rides the same (shard) partitioning the window produced —
    * Catalyst reuses the exchange, so the summary adds no extra shuffle
    * of the corpus.
    */
  def packSummary(docs: DataFrame, idCol: String, nTokCol: Column,
                  budget: Int, nShards: Int): DataFrame =
    packBins(docs, idCol, nTokCol, budget, nShards)
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        min(col(idCol)).as("first_id"),
        max(col(idCol)).as("last_id"))
}
