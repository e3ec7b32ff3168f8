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

  /** Data-constrained epoch builder: [[DedupOps.repetitionSchedule]]'s
    * repeat counts expanded into concrete training-order instances and
    * packed into fixed-budget bins — the composition that turns "source s
    * repeats 3.4×" into the (shard, bin) layout a trainer reads.
    *
    * Expansion is MANIFEST-ONLY: `explode(sequence(1, n_repeats))`
    * multiplies the narrow (id, source, n_tok, n_repeats) schedule, never
    * the document bytes — a 100 TB corpus repeated 4× expands a few GB of
    * manifest, and the trainer joins text back per shard file. Each
    * (doc, rep) instance draws its own md5 coin over (seed, id, rep), so
    * the copies of a repeated document SCATTER across shards and bins
    * instead of training back-to-back (the adjacent-duplicate batch
    * pathology a naive `array_repeat` concat produces); a new seed
    * re-permutes every epoch boundary at once. Packing is then
    * [[packBins]]'s running-window scheme in (coin, id, rep) order:
    * ONE shuffle of the manifest (hash by shard) + a per-shard sort.
    * Deterministic in (data, targets, seed, budget, nShards) alone.
    *
    * Returns (idCol, sourceCol, rep_idx, n_tok, shard, bin).
    */
  def epochPack(docs: DataFrame, idCol: String, sourceCol: String,
                nTokCol: Column, targetTokens: Map[String, Long],
                seed: Long, budget: Int, nShards: Int): DataFrame = {
    require(nShards > 0, s"epochPack: nShards must be positive, got $nShards")
    require(budget > 0, s"epochPack: budget must be positive, got $budget")
    val inst = DedupOps.repetitionSchedule(docs, idCol, sourceCol, nTokCol,
        targetTokens)
      .filter(col("n_repeats") > 0L)
      .withColumn("rep_idx",
        explode(sequence(lit(1L), col("n_repeats"))))
      .withColumn("__coin",
        md5(concat(lit(s"$seed:"), col(idCol).cast("string"), lit(":"),
          col("rep_idx").cast("string"))))
      .withColumn("shard",
        pmod(conv(substring(col("__coin"), 1, 8), 16, 10).cast("long"),
          lit(nShards)).cast("int"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__coin"), col(idCol), col("rep_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    inst
      .withColumn("__cum", sum(col("n_tok")).over(w))
      .withColumn("bin",
        floor((col("__cum") - col("n_tok")).cast("double") / budget)
          .cast("int"))
      .select(col(idCol), col(sourceCol), col("rep_idx"), col("n_tok"),
        col("shard"), col("bin"))
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

  /** Packing on REAL token sequences (q156 — VERDICT r15 task 3): the
    * bin manifests [[packSummary]] ships become per-bin CONCATENATED
    * piece streams with document boundaries — the thing a trainer
    * actually loads. `piecesCol` is the per-document token sequence
    * (array<string>, e.g. [[graft.ext.TextOps.subwordPieces]]); a
    * document's token count is its piece count, so the bin layout is
    * [[packBins]]'s running-window scheme priced in the SAME units the
    * stream carries — n_tokens per bin counts exactly the stream's
    * tokens. Documents concatenate in id order within a bin, joined by
    * `docSep` (a reserved boundary token, never a corpus piece).
    *
    * Plan shape: ONE shuffle (hash by shard) + the per-shard window,
    * then the (shard, bin) aggregate rides the same partitioning —
    * plan-asserted single exchange. At 100 TB the piece streams ARE the
    * payload (unlike the count-manifest ops nothing narrow can stand in
    * for them), so the shard count is the file-size knob: ~(corpus
    * tokens / target shard file size); each bin's concat happens inside
    * one task, bounded by budget tokens per bin.
    *
    * Returns (shard, bin, n_docs, n_tokens, first_id, last_id,
    * token_stream) — token_stream the space-joined pieces with
    * ` docSep ` between documents (a doc with zero pieces contributes an
    * empty segment, so boundaries are position-faithful). A NULL
    * `piecesCol` row (e.g. NULL text under [[TextOps.subwordPieces]])
    * normalizes to the SAME empty segment — without the coalesce it
    * would NULL its window term and land in a phantom (shard, NULL) bin
    * that downstream consumers iterate over with no error.
    *
    * With `withBoundaries = true` (q173 — VERDICT r16 task 2) each bin
    * also carries its attention-boundary sidecar — the arrays a trainer
    * builds attention masks / position-id resets from WITHOUT re-scanning
    * the stream for separators:
    *
    *   doc_ids:     array<long> — documents in stream order
    *   doc_offsets: array<int>  — token position where each doc starts
    *                (0-based; offsets(0) = 0, offsets(i+1) =
    *                offsets(i) + doc_lengths(i) + 1 — the +1 is the
    *                separator token between documents)
    *   doc_lengths: array<int>  — per-doc token counts
    *                (Σ doc_lengths = n_tokens; the stream itself has
    *                n_tokens + n_docs − 1 tokens counting separators)
    *
    * The arrays ride the SAME collect_list aggregate the stream is
    * built from (the offsets are a pure post-aggregation fold over the
    * sorted per-doc structs) — the plan is unchanged: one shuffle, one
    * aggregate, no second lineage.
    */
  def packTokenStreams(docs: DataFrame, idCol: String, piecesCol: Column,
                       budget: Int, nShards: Int,
                       docSep: String = "<|doc|>",
                       withBoundaries: Boolean = false): DataFrame = {
    val binned = packBins(
      docs.withColumn("__pieces",
        coalesce(piecesCol, array().cast("array<string>"))),
      idCol, size(col("__pieces")).cast("long"), budget, nShards)
    val base = binned
      .withColumn("__str", array_join(col("__pieces"), " "))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        min(col(idCol)).as("first_id"),
        max(col(idCol)).as("last_id"),
        array_sort(collect_list(struct(col(idCol).as("id"),
          col("n_tok").as("n"), col("__str").as("s")))).as("__docs"))
      .withColumn("token_stream",
        array_join(transform(col("__docs"), x => x.getField("s")),
          s" $docSep "))
    val out =
      if (!withBoundaries) base
      else base
        .withColumn("doc_ids",
          transform(col("__docs"), x => x.getField("id")))
        .withColumn("doc_offsets", aggregate(
          col("__docs"),
          struct(array().cast("array<int>").as("offs"),
            lit(0).as("cum")),
          (acc, x) => struct(
            concat(acc.getField("offs"),
              array(acc.getField("cum"))).as("offs"),
            (acc.getField("cum") + x.getField("n").cast("int") + 1)
              .as("cum")),
          acc => acc.getField("offs")))
        .withColumn("doc_lengths",
          transform(col("__docs"), x => x.getField("n").cast("int")))
    out.drop("__docs")
  }

  /** Packing-efficiency report: per shard, how full the [[packBins]]
    * layout actually is — the padding-waste diagnostic a trainer reads
    * before committing a context length (`budget`). Because a document
    * never splits, a bin can RUN OVER its budget (the doc that straddles
    * the boundary belongs to the bin it started in) and the final bin of
    * a shard usually runs under; `fill_ratio` prices both effects in one
    * number and `overflow_bins` counts the stragglers.
    *
    * Determinism: every aggregate is an exact integer (docs, tokens,
    * bins, capacity = bins·budget); `fill_ratio` is ONE double division
    * of exact operands, rounded at 6 — no float aggregation anywhere.
    * Scale shape: rides [[packBins]]'s one shuffle; the report is
    * ≤ nShards rows.
    *
    * Returns (shard, n_bins, n_docs, n_tokens, capacity, fill_ratio,
    * overflow_bins) ordered by shard.
    */
  def packEfficiency(docs: DataFrame, idCol: String, nTokCol: Column,
                     budget: Int, nShards: Int): DataFrame =
    packBins(docs, idCol, nTokCol, budget, nShards)
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("__nd"), sum(col("n_tok")).as("__nt"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("__nd")).as("n_docs"),
        sum(col("__nt")).as("n_tokens"),
        (count(lit(1)) * budget).as("capacity"),
        count(when(col("__nt") > budget, lit(1))).as("overflow_bins"))
      .withColumn("fill_ratio",
        round(col("n_tokens").cast("double") /
          col("capacity").cast("double"), 6))
      .select(col("shard"), col("n_bins"), col("n_docs"),
        col("n_tokens"), col("capacity"), col("fill_ratio"),
        col("overflow_bins"))

  /** Curriculum ordering of packed training bins: [[packBins]]'s
    * (shard, bin) layout rolled up per bin and assigned a GLOBAL
    * consumption position by mean document quality — highest-scored
    * bins first by default (`highFirst = false` flips to an
    * easy-last/anneal-on-quality schedule). This is the manifest a
    * curriculum-scheduled trainer reads: it says in which ORDER to load
    * the bins the packer laid out, without moving a single document.
    *
    * Cross-engine determinism (the averaged-float-rounding trap): the
    * per-bin mean is NEVER a float `avg` — each (pre-rounded-at-6)
    * score converts to an exact integer micro-score, the bin sums
    * integers, and the mean is ONE double division of exact operands,
    * identical on any engine and any aggregation order. Rows with a
    * NULL (or NaN) score contribute nothing to the mean but still count in
    * `n_docs` (`bin_score` divides by the scored-row count; a bin with
    * zero scored rows has a NULL key and is excluded — the curriculum
    * cannot place it). Ties order by (shard, bin).
    *
    * Plan shape at 100 TB: the SPEC is one row_number over the global
    * bin order, but the PLAN never builds it (the q107/q110 global-
    * window lesson, [[DedupOps.tokenBudgetSelect]]'s histogram move):
    * bins bucket by score, per-bucket COUNTS collect to the driver
    * (≤ `nBuckets` rows — a bounded probe), each bucket gets its
    * position offset back by broadcast, and the exact row_number runs
    * per bucket (≈1/B of the bin manifest per window partition). Any
    * score-monotone bucketing yields the same positions; out-of-range
    * scores clamp into the edge buckets. The bin manifest is cached
    * ([[DedupOps.cachedManifest]]) so the corpus-sized packing lineage
    * runs once, not once per pass.
    *
    * Returns (shard, bin, n_docs, n_tokens, bin_score, curriculum_pos)
    * with curriculum_pos 1..|bins|.
    */
  def curriculumOrder(docs: DataFrame, idCol: String, nTokCol: Column,
                      scoreCol: Column, budget: Int, nShards: Int,
                      highFirst: Boolean = true, scoreLo: Double = 0.0,
                      scoreHi: Double = 1.0,
                      nBuckets: Int = 4096): DataFrame = {
    require(nBuckets > 0,
      s"curriculumOrder: nBuckets must be positive, got $nBuckets")
    require(scoreHi > scoreLo,
      s"curriculumOrder: score range [$scoreLo, $scoreHi) is empty")
    val spark = docs.sparkSession
    // NaN is a NULL for curriculum purposes (round(NaN)·cast would
    // silently become micro-score 0 and drag the bin mean — and DuckDB
    // errors on the same cast, so it would also be a cross-engine split)
    val score = scoreCol.cast("double")
    val packed = packBins(
      docs.withColumn("__sm",
        when(isnan(score), lit(null))
          .otherwise(round(score * 1e6)).cast("long")),
      idCol, nTokCol, budget, nShards)
    val bins = DedupOps.cachedManifest(packed
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("__sm")).as("__sms"),
        count(col("__sm")).as("__nsc"))
      .withColumn("bin_score",
        round(col("__sms").cast("double") /
          (col("__nsc").cast("double") * lit(1e6)), 6))
      .filter(col("bin_score").isNotNull)
      .withColumn("__b", least(lit((nBuckets - 1).toLong), greatest(lit(0L),
        floor((col("bin_score") - scoreLo) / (scoreHi - scoreLo) *
          nBuckets))).cast("int")))
    // bounded driver probe: per-bucket bin counts → curriculum-direction
    // position offsets, joined back by broadcast
    val counts = bins.groupBy(col("__b"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
    val ordered = if (highFirst) counts.sortBy(-_._1) else counts.sortBy(_._1)
    var acc = 0L
    val offsets = ordered.map { case (b, n) =>
      val o = acc; acc += n; (b, o)
    }.toSeq
    val offDf = spark.createDataFrame(offsets).toDF("__b", "__off")
    val ordCols =
      if (highFirst) Seq(col("bin_score").desc, col("shard"), col("bin"))
      else Seq(col("bin_score").asc, col("shard"), col("bin"))
    val w = Window.partitionBy(col("__b")).orderBy(ordCols: _*)
    bins.join(broadcast(offDf), Seq("__b"))
      .withColumn("curriculum_pos",
        (col("__off") + row_number().over(w)).cast("long"))
      .select(col("shard"), col("bin"), col("n_docs"), col("n_tokens"),
        col("bin_score"), col("curriculum_pos"))
  }
}
