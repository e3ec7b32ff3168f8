package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events schema (SURVEY.md §2.B
  * "Streaming" row — absent from the reference, Layer-C extension here).
  *
  * Every transform is written against an unbounded DataFrame/Dataset, so the
  * SAME code runs in batch (events.parquet) and streaming (readStream) —
  * Spark's unified model. State lives in the executor-side state store
  * (RocksDB/HDFS-backed on a cluster), partitioned by the grouping key:
  * nothing accumulates on the driver, so the operators scale horizontally
  * with key cardinality.
  */
object EventStreams {

  case class Event(ts: Timestamp, user_id: Long, event_type: String,
                   value: Double)

  case class SessionOut(user_id: Long, sess_start: Timestamp,
                        sess_end: Timestamp, n_events: Int, total: Double)

  // not private: the state-store encoder's generated code instantiates them
  case class SessionState(start: Long, last: Long, n: Int, total: Double)
  case class SessionsState(sessions: List[SessionState])

  /** File-based event stream: the streaming read of the same parquet the
    * batch queries use. maxFilesPerTrigger bounds per-batch work — the knob
    * that keeps backfill from flooding the cluster.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val reader = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
    // the driver-generated tables are single FILES named *.parquet; the
    // file streaming source only accepts directories, so stream the parent
    // dir with a glob pinned to this table (a directory layout — the
    // append-friendly production shape — streams as-is). Probed through
    // the Hadoop FileSystem, not java.io.File: on HDFS/S3 a local File
    // always answers "not a file", which happens to pick the right branch
    // for cluster layouts but only by accident.
    val hPath = new org.apache.hadoop.fs.Path(path)
    val hfs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val raw =
      if (hfs.exists(hPath) && hfs.getFileStatus(hPath).isFile)
        reader.option("pathGlobFilter", "events.parquet").parquet(dir)
      else reader.parquet(path)
    // ts contract (DIALECT.md "Timestamps"): the driver fixtures store ts
    // as parquet timestamp[us] with isAdjustedToUTC=false, which Spark
    // reads as TimestampNTZType (≙ DuckDB's naive TIMESTAMP) and batch
    // passes through unchanged. Watermarks however REQUIRE TimestampType
    // (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), so the streaming read
    // normalizes: under the library's pinned UTC session timezone the
    // NTZ→TIMESTAMP cast preserves the wall clock and the epoch micros,
    // so every streaming aggregate lands in the same window as its batch
    // twin. A TIMESTAMP(NANOS) fixture would instead arrive as LongType
    // under nanosAsLong; normalize with the same flooring expression
    // Tables.load uses.
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Watermarked tumbling-window counts. Late events beyond the watermark
    * are dropped; windows finalize (and emit, in Append mode) once the
    * watermark passes their end. The aggregation state is bounded by
    * (#open windows × #event types) — independent of stream length.
    */
  def windowedCounts(events: DataFrame, watermark: String,
                     windowLen: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total"))

  /** Custom-state sessionization: flatMapGroupsWithState with event-time
    * timeout — the streaming twin of q33's batch session_window, with
    * IDENTICAL session boundaries for every event the watermark admits.
    *
    * That parity forces two design points a single-session state can't
    * honor:
    *   - state holds a LIST of open sessions: a late-but-within-watermark
    *     event may open (or extend backwards) an EARLIER session that must
    *     not merge with the current one;
    *   - a session only closes once the WATERMARK passes last+gap (never
    *     eagerly on an in-batch gap): an admissible late event with
    *     t < last+gap could still extend it. Once the watermark passes
    *     last+gap, no admissible event can touch the session (every new t ≥
    *     watermark ≥ last+gap), so closing there is exact, not heuristic.
    * Events merge into any session whose span they touch within the gap
    * (strict <, like session_window), bridging sessions when one event
    * connects two.
    *
    * State per user is O(open sessions within the watermark horizon) —
    * bounded by watermark/gap, independent of stream length; the state
    * store shards by user_id across executors. Totals round HALF_UP like
    * the batch round() (math.rint would round ties half-even).
    */
  def sessionize(spark: SparkSession, events: DataFrame,
                 watermark: String, gapMinutes: Int): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    def emit(userId: Long, s: SessionState): SessionOut =
      SessionOut(userId, new Timestamp(s.start), new Timestamp(s.last), s.n,
        BigDecimal(s.total).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)

    events.selectExpr("ts", "user_id", "event_type", "value")
      // batch session_window drops null-ts rows (its plan plants an
      // isnotnull filter); do the same here — a null ts would otherwise
      // pass the watermark (NULL < wm is NULL, not true) and NPE at
      // e.ts.getTime inside the state function, killing the whole query
      .filter(col("ts").isNotNull)
      .as[Event]
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionsState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionsState]) =>
          val wm = state.getCurrentWatermarkMs()
          val folded =
            if (state.hasTimedOut) state.get.sessions
            else {
              // merge each event into every session it touches (bridging
              // adjacent ones); order within the batch doesn't matter —
              // the touch relation is symmetric
              var sessions = state.getOption.map(_.sessions).getOrElse(Nil)
              rows.foreach { e =>
                val t = e.ts.getTime
                val (touch, rest) = sessions.partition(s =>
                  t > s.start - gapMs && t < s.last + gapMs)
                sessions = touch.foldLeft(SessionState(t, t, 1, e.value)) {
                  (acc, s) => SessionState(math.min(acc.start, s.start),
                    math.max(acc.last, s.last), acc.n + s.n,
                    acc.total + s.total)
                } :: rest
              }
              sessions
            }
          val (closed, open) = folded.partition(_.last + gapMs <= wm)
          if (open.nonEmpty) {
            state.update(SessionsState(open))
            state.setTimeoutTimestamp(open.map(_.last).min + gapMs)
          } else if (state.exists) state.remove()
          closed.sortBy(_.start).map(emit(userId, _)).iterator
      }
  }

  /** The BATCH twin of [[sessionize]], in sessionize's exact emit shape:
    * `session_window` gap semantics (same-session iff gap-strict-less),
    * `sess_end = sw.end − gap = last event ts`, same HALF_UP rounding.
    * ONE definition serves both consumers — the registered q88 (DuckDB
    * oracle) and StreamBatchParitySpec's stream≡batch equality — so the
    * streaming sessionizer is transitively DuckDB-checked the way q87
    * checks [[windowedCounts]]: DuckDB ⊨ q88 = this, and the parity spec
    * proves sessionize ≡ this on the same fixture.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total"))
      .select(col("user_id"), col("sw.start").as("sess_start"),
        (col("sw.end") - expr(s"INTERVAL $gapMinutes MINUTES")).as("sess_end"),
        col("n_events"), col("total"))

  /** Streaming exact dedup — the streaming twin of q25's batch dedup (the
    * ingest-side first line of a training-data pipeline). State holds one
    * entry per key and is evicted once the watermark passes the event's
    * time + delay, so memory is bounded by keys-per-watermark-horizon
    * instead of stream length — duplicates later than the watermark are a
    * correctness/retention trade the watermark makes explicit. The state
    * store shards by the dedup key across executors.
    */
  def dedupWithinWatermark(events: DataFrame, watermark: String,
                           keys: Seq[String]): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Watermarked stream-stream inner join — the attribution shape: each
    * left event pairs with right events of the same key that happen within
    * `within` AFTER it. The time-range predicate is what bounds the state
    * store: Spark keeps a side's buffered rows only until the other side's
    * watermark passes the range, so state is O(events per watermark
    * horizon) per key shard, independent of stream length. Both inputs
    * shuffle once on the key (the state store shards likewise), exactly as
    * the batch equi-join would.
    */
  def followWithinJoin(left: DataFrame, right: DataFrame, key: String,
                       leftWatermark: String, rightWatermark: String,
                       within: String): DataFrame = {
    val l = left.withWatermark("ts", leftWatermark)
      .select(col(key), col("ts").as("l_ts"),
        col("event_type").as("l_type"), col("value").as("l_value"))
    val r = right.withWatermark("ts", rightWatermark)
      .select(col(key).as("__rk"), col("ts").as("r_ts"),
        col("event_type").as("r_type"), col("value").as("r_value"))
    l.join(r,
      col(key) === col("__rk") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"))
      .drop("__rk")
  }

  /** Streaming ingest dedup: each micro-batch of documents flags against
    * the persisted signature store ([[graft.ext.DedupOps.signatureStore]]
    * semantics), writes its decisions to `outPath/batch_id=N`, and
    * appends the ACCEPTED docs' signatures — so a later micro-batch
    * dedups against an earlier one. `foreachBatch` is the right tool,
    * not a stateful operator: the dedup state is the whole
    * corpus-to-date, which belongs in storage (bounded executor memory,
    * survives restarts, shared with batch ingests), not in the state
    * store — a flatMapGroupsWithState formulation would grow state
    * without bound and rebuild it from the changelog on every recovery.
    * Micro-batches execute serially per query, matching the store's
    * single-ingest writer contract. An absent store bootstraps by
    * PUBLISHING an explicit empty store (atomic, `_SUCCESS`-marked) —
    * a fresh crawl needs no out-of-band setup, and the store's
    * existence is always a deliberate publish, never an accidental
    * side effect of the first append.
    *
    * Retry contract (foreachBatch is at-least-once): replays are made
    * harmless by construction. A processed batch leaves a marker
    * (`<storePath>.appended/batch-N`) and is skipped wholesale; an
    * unmarked replay (1) OVERWRITES its own decisions partition — never
    * appends rows beside stale ones — and (2) flags against the store
    * with its OWN doc ids anti-joined out, so signatures a half-finished
    * earlier attempt already appended can't self-collide a unique doc
    * into `dup=true` (doc ids are assumed globally unique — the same
    * contract every dedup operator here carries). The one surviving
    * window — crash after the append, before the marker — can duplicate
    * signature ROWS in the store on replay; that inflates a future
    * collision's `n_dups` count but can never flip a `dup` boolean,
    * which is the decision consumers act on. The duplicates do not
    * accumulate forever: [[graft.ext.DedupOps.compactSignatureStore]]
    * collapses exact-duplicate rows (same doc_id AND signature) as part
    * of the store's periodic small-file maintenance, healing both the
    * inflated counts and the file growth in one serialized pass.
    */
  def runIngestDedup(docStream: DataFrame, storePath: String,
                     outPath: String, checkpoint: String,
                     k: Int = 3, numBands: Int = 8, rowsPerBand: Int = 2,
                     minJaccard: Double = 0.8) = {
    import graft.ext.DedupOps
    import org.apache.hadoop.fs.Path
    docStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val hconf = spark.sparkContext.hadoopConfiguration
        val marker = new Path(s"$storePath.appended", s"batch-$batchId")
        val mfs = marker.getFileSystem(hconf)
        if (!mfs.exists(marker)) {
          val b = batch.persist() // one materialization: flags + accept join
          try {
            val storeDir = new Path(storePath)
            if (!storeDir.getFileSystem(hconf).exists(storeDir)) {
              // fresh crawl: publish an explicit EMPTY store (atomic,
              // _SUCCESS-marked) rather than letting the first append
              // implicitly create one — the appendToSignatureStore
              // contract, so a later signatureStore(corpus) on this
              // path is a visible first-writer-wins event, not a
              // silent skip over an accidental store
              graft.ext.DedupOps.signatureStore(spark, b.limit(0),
                storePath, k, numBands, rowsPerBand)
              ()
            }
            val store = spark.read.parquet(storePath)
            val corpus = store.join(b.select("doc_id"), Seq("doc_id"),
              "left_anti") // replay self-exclusion
            val dir = s"$outPath/batch_id=$batchId"
            DedupOps.incrementalNearDupFlags(b, corpus, k, numBands,
                rowsPerBand, minJaccard)
              .write.mode("overwrite").parquet(dir) // idempotent partition
            // re-read the decisions just written: the accept join must not
            // re-execute the whole dedup pipeline a second time
            val decisions = spark.read.parquet(dir)
            val accepted = b.join(
              decisions.filter(!col("dup")).select("doc_id"), "doc_id")
            DedupOps.appendToSignatureStore(spark, accepted, storePath,
              k, numBands, rowsPerBand)
            mfs.mkdirs(marker.getParent)
            mfs.create(marker, true).close()
            ()
          } finally { b.unpersist(); () }
        }
      }
      .start()
  }

  /** Streaming SEMANTIC ingest dedup — [[runIngestDedup]]'s embedding
    * flavor (round-10 verdict item: the batch trio
    * [[graft.ext.SimilarityOps.embeddingStore]] /
    * `incrementalSemanticDupFlags` / `appendToEmbeddingStore` existed
    * with no foreachBatch loop). Each micro-batch of (vec_id, embedding)
    * rows flags against the cell-partitioned store (batch broadcasts,
    * dynamic partition pruning keeps untouched cell dirs unread), writes
    * decisions to `outPath/batch_id=N`, and appends the accepted rows'
    * unit vectors — so a later micro-batch dedups against an earlier
    * one. Same retry contract as the text flavor, for the same reasons:
    * marker-skipped replays, overwrite-own-partition decisions, store
    * anti-joined on the batch's own vec_ids so a half-finished earlier
    * attempt can't self-collide; the one surviving crash window
    * (append done, marker not) duplicates store ROWS, which inflates
    * `n_dups` but never flips `dup`, and
    * [[graft.ext.SimilarityOps.compactEmbeddingStore]] heals it.
    * `cents` must be the committed centroid fit the store path is
    * versioned by — the [[graft.ext.SimilarityOps.embeddingStore]]
    * contract.
    */
  def runSemanticIngestDedup(vecStream: DataFrame, storePath: String,
                             outPath: String, checkpoint: String,
                             cents: Array[Array[Double]],
                             minSim: Double) = {
    import graft.ext.SimilarityOps
    import org.apache.hadoop.fs.Path
    vecStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val hconf = spark.sparkContext.hadoopConfiguration
        val marker = new Path(s"$storePath.appended", s"batch-$batchId")
        val mfs = marker.getFileSystem(hconf)
        if (!mfs.exists(marker)) {
          val b = batch.persist()
          try {
            val storeDir = new Path(storePath)
            if (!storeDir.getFileSystem(hconf).exists(storeDir)) {
              // fresh crawl: publish an explicit EMPTY store (atomic,
              // _SUCCESS-marked) — the appendToEmbeddingStore contract
              SimilarityOps.embeddingStore(spark, b.limit(0), storePath,
                cents)
              ()
            }
            // schema-stated read: the bootstrap's empty store has no
            // data files, so inference would fail on batch 0
            val store = SimilarityOps.readEmbeddingStore(spark, storePath)
            val corpus = store.join(b.select("vec_id"), Seq("vec_id"),
              "left_anti") // replay self-exclusion
            val dir = s"$outPath/batch_id=$batchId"
            SimilarityOps.incrementalSemanticDupFlags(b, corpus, cents,
                minSim)
              .write.mode("overwrite").parquet(dir) // idempotent partition
            val decisions = spark.read.parquet(dir)
            val accepted = b.join(
              decisions.filter(!col("dup")).select("vec_id"), "vec_id")
            SimilarityOps.appendToEmbeddingStore(spark, accepted,
              storePath, cents)
            mfs.mkdirs(marker.getParent)
            mfs.create(marker, true).close()
            ()
          } finally { b.unpersist(); () }
        }
      }
      .start()
  }

  /** Streaming ANN-INDEX ingest — keep the
    * [[graft.ext.SimilarityOps.annIndexStore]] current while a crawl
    * runs: each micro-batch of (vec_id, embedding) rows is encoded
    * (cell + PQ codes, map-only) and appended to the index's cell
    * directories, so the corpus is queryable via
    * [[graft.ext.SimilarityOps.ivfPqTopKFromStore]] the moment a batch
    * lands — no rebuild job between crawl and query. Composes with
    * [[runSemanticIngestDedup]] the way a curation pipeline runs them:
    * gate the batch there first, feed the ACCEPTED rows here. Retry
    * contract mirrors the store ingests: a marker under
    * `indexPath.appended/batch-N` makes replays whole-batch no-ops, an
    * absent index bootstraps as an explicit empty published store, and
    * the one surviving crash window (append done, marker not) duplicates
    * index ROWS — which cannot change any top-k answer beyond duplicate
    * candidates that [[graft.ext.SimilarityOps.compactAnnIndex]]'s
    * dedup pass heals. `cents`/`cbs` must be the committed fits the
    * index path is versioned by.
    */
  def runAnnIndexIngest(vecStream: DataFrame, indexPath: String,
                        checkpoint: String, cents: Array[Array[Double]],
                        cbs: Array[Array[Array[Double]]]) = {
    import graft.ext.SimilarityOps
    import org.apache.hadoop.fs.Path
    vecStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val hconf = spark.sparkContext.hadoopConfiguration
        val marker = new Path(s"$indexPath.appended", s"batch-$batchId")
        val mfs = marker.getFileSystem(hconf)
        if (!mfs.exists(marker)) {
          val b = batch.persist()
          try {
            val dir = new Path(indexPath)
            if (!dir.getFileSystem(hconf).exists(dir)) {
              SimilarityOps.annIndexStore(spark, b.limit(0), indexPath,
                cents, cbs)
              ()
            }
            SimilarityOps.appendToAnnIndex(spark, b, indexPath, cents, cbs)
            mfs.mkdirs(marker.getParent)
            mfs.create(marker, true).close()
            ()
          } finally { b.unpersist(); () }
        }
      }
      .start()
  }

  /** Streaming VECTOR-SERVING ingest (VERDICT r16 task 5 — closes the
    * lexical/vector serving asymmetry): one micro-batch loop that keeps
    * BOTH halves of the fully-store-served ANN path current — the
    * IVF-PQ index ([[graft.ext.SimilarityOps.appendToAnnIndex]]) and
    * the refine-side vector store
    * ([[graft.ext.SimilarityOps.appendToVectorStore]]) — so
    * `ivfPqTopKFromStores` (q120/q166/q167's serving shape) answers
    * over a streamed corpus encode-free, exactly as the lexical store
    * already could via [[runLexicalStatsIngest]]. Per-batch cost is
    * batch-bound: each micro-batch encodes/assigns ONLY its own rows.
    *
    * Replay contract (foreachBatch is at-least-once): ONE batch-id
    * marker beside the VECTOR store, created after BOTH appends, makes
    * redelivered batches no-ops; both stores bootstrap from an explicit
    * empty publish when absent, so the stream can start first. The
    * crash windows re-append at most one batch into one or both stores
    * as EXACT duplicate rows — the same residue contract as
    * [[runAnnIndexIngest]]: a duplicated candidate can occupy two
    * shortlist slots until
    * [[graft.ext.SimilarityOps.compactAnnIndex]]'s dedup pass heals it,
    * bounded by the one replayed batch.
    */
  def runVectorServingIngest(vecStream: DataFrame, indexPath: String,
                             vecPath: String, checkpoint: String,
                             cents: Array[Array[Double]],
                             cbs: Array[Array[Array[Double]]],
                             nBuckets: Int = 64) = {
    import graft.ext.SimilarityOps
    import org.apache.hadoop.fs.Path
    vecStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        val spark = batch.sparkSession
        val hconf = spark.sparkContext.hadoopConfiguration
        val marker = new Path(s"$vecPath.appended", s"batch-$batchId")
        val mfs = marker.getFileSystem(hconf)
        if (!mfs.exists(marker)) {
          val b = batch.persist()
          try {
            val idxDir = new Path(indexPath)
            if (!idxDir.getFileSystem(hconf).exists(idxDir)) {
              SimilarityOps.annIndexStore(spark, b.limit(0), indexPath,
                cents, cbs)
              ()
            }
            val vecSuccess = new Path(vecPath, "_SUCCESS")
            if (!vecSuccess.getFileSystem(hconf).exists(vecSuccess)) {
              SimilarityOps.vectorStore(spark, b.limit(0), vecPath,
                nBuckets)
              ()
            }
            SimilarityOps.appendToAnnIndex(spark, b, indexPath, cents, cbs)
            SimilarityOps.appendToVectorStore(spark, b, vecPath, nBuckets)
            mfs.mkdirs(marker.getParent)
            mfs.create(marker, true).close()
            ()
          } finally { b.unpersist(); () }
        }
      }
      .start()
  }

  /** Streaming lexical-stats ingest — keeps a
    * [[graft.ext.RetrievalOps.lexicalStatsStore]] current as documents
    * stream in, so retrieval (q144/q145) serves from live statistics
    * without ever re-tokenizing the accumulated corpus: each micro-batch
    * tokenizes ONLY itself and appends its (doc, term, tf, dl) rows and
    * docs rows ([[graft.ext.RetrievalOps.appendToLexicalStats]] — per-
    * batch cost is batch-bound). Same replay contract as
    * [[runAnnIndexIngest]]: a batch-id marker created AFTER the append
    * makes redelivered batches no-ops, and an absent store bootstraps
    * from an empty publish so the stream can start before any batch
    * corpus exists. Streamed ≡ batch-built store (spec-pinned).
    *
    * The one crash window (append done, marker not) re-appends the batch
    * on restart, duplicating its rows EXACTLY. That residue cannot wrong
    * a served score's tf/df — the serving core dedupes its bounded
    * pruned slice ([[graft.ext.RetrievalOps]]' storedContributions) —
    * and the N/avgdl scalars drift by at most one batch until
    * [[graft.ext.RetrievalOps.compactLexicalStats]], which dedupes both
    * store sides and fully heals it (spec-pinned in RetrievalOpsSpec).
    */
  def runLexicalStatsIngest(docStream: DataFrame, statsPath: String,
                            checkpoint: String, idCol: String,
                            textCol: String, nBuckets: Int = 64) = {
    import graft.ext.RetrievalOps
    import org.apache.hadoop.fs.Path
    docStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        val spark = batch.sparkSession
        val hconf = spark.sparkContext.hadoopConfiguration
        val marker = new Path(s"$statsPath.appended", s"batch-$batchId")
        val mfs = marker.getFileSystem(hconf)
        if (!mfs.exists(marker)) {
          val b = batch.persist()
          try {
            val terms = new Path(s"$statsPath/terms")
            if (!terms.getFileSystem(hconf)
                .exists(new Path(terms, "_SUCCESS"))) {
              RetrievalOps.lexicalStatsStore(spark, b.limit(0), statsPath,
                idCol, textCol, nBuckets)
              ()
            }
            RetrievalOps.appendToLexicalStats(spark, b, statsPath, idCol,
              textCol, nBuckets)
            mfs.mkdirs(marker.getParent)
            mfs.create(marker, true).close()
            ()
          } finally { b.unpersist(); () }
        }
      }
      .start()
  }

  case class DriftRow(batch_id: Long, cell: Int, n_before: Option[Long],
                      n_after: Long, share_before: Option[Double],
                      share_after: Double, share_delta: Double,
                      coh_before: Option[Double], coh_after: Double)
  case class DriftState(cell: Int, n: Long, coh: Double, batch_id: Long)

  /** Streaming embedding-distribution drift monitor —
    * [[graft.ext.SimilarityOps.embeddingDriftReport]]'s per-cell rows
    * (+ batch_id) emitted per micro-batch against the corpus streamed SO
    * FAR, with CONSTANT state: instead of re-scanning the accumulated
    * corpus per batch (the batch operator's shape), each batch collapses
    * to its per-cell (count, cohesion-sum) partial aggregate — an
    * nCells-row bounded probe — and folds into an nCells-row state store.
    * Per-batch cost ∝ batch + nCells; state never grows.
    *
    * Replay contract (foreachBatch is at-least-once): the state store
    * publishes via [[graft.ext.StoreSwap]] (write-new + atomic swap) and
    * records the batch id it last folded, which makes the fold
    * IDEMPOTENT: a replay that finds the state already at this batch id
    * (crash between state-swap and drift-append) re-derives the
    * pre-batch state by subtraction instead of double-folding. The one
    * surviving crash window (drift appended, marker not) duplicates
    * drift ROWS — monitoring output, dedupable by (batch_id, cell),
    * with at most last-ULP cohesion differences from the subtraction
    * path — and can never corrupt the state. Marker is created LAST.
    */
  def runDriftMonitor(vecStream: DataFrame, embCol: String,
                      cents: Array[Array[Double]], statePath: String,
                      outPath: String, checkpoint: String) = {
    import graft.ext.{SimilarityOps, StoreSwap}
    import org.apache.hadoop.fs.Path
    import scala.math.BigDecimal.RoundingMode
    def r(x: Double, n: Int): Double =
      BigDecimal(x).setScale(n, RoundingMode.HALF_UP).toDouble
    vecStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val hconf = spark.sparkContext.hadoopConfiguration
        val marker = new Path(s"$outPath.appended", s"batch-$batchId")
        val mfs = marker.getFileSystem(hconf)
        if (!mfs.exists(marker)) {
          val bAgg: Map[Int, (Long, Double)] = SimilarityOps
            .withUnitVec(batch.toDF(), embCol, "__u")
            .withColumn("cell", SimilarityOps.cellOf(col("__u"), cents))
            .filter(col("cell").isNotNull)
            .withColumn("__d", org.apache.spark.sql.graft.VectorFunctions
              .dotProduct(col("__u"), element_at(
                typedLit(cents.map(_.toSeq).toSeq), col("cell") + 1)))
            .groupBy(col("cell"))
            .agg(count(lit(1)).as("n"), sum(col("__d")).as("coh"))
            .collect()
            .map(x => x.getInt(0) -> (x.getLong(1), x.getDouble(2))).toMap
          val sPath = new Path(statePath)
          val sfs = sPath.getFileSystem(hconf)
          StoreSwap.recoverIfInterrupted(sfs, sPath)
          val (stateBid, state0) =
            if (sfs.exists(sPath)) {
              val rows = spark.read.parquet(statePath).as[DriftState]
                .collect()
              (rows.headOption.fold(-1L)(_.batch_id),
                rows.map(s => s.cell -> (s.n, s.coh)).toMap)
            } else (-1L, Map.empty[Int, (Long, Double)])
          val alreadyFolded = stateBid >= batchId
          val pre: Map[Int, (Long, Double)] =
            if (!alreadyFolded) state0
            else state0.flatMap { case (c, (n0, d0)) =>
              val (nb, db) = bAgg.getOrElse(c, (0L, 0.0))
              val n = n0 - nb
              if (n > 0) Some(c -> (n, d0 - db)) else None
            }
          val after: Map[Int, (Long, Double)] =
            (pre.keySet ++ bAgg.keySet).map { c =>
              val (n0, d0) = pre.getOrElse(c, (0L, 0.0))
              val (nb, db) = bAgg.getOrElse(c, (0L, 0.0))
              c -> (n0 + nb, d0 + db)
            }.toMap
          val totB = pre.values.map(_._1).sum
          val totA = after.values.map(_._1).sum
          val drift = after.keys.toSeq.sorted.map { c =>
            val b = pre.get(c)
            val (na, da) = after(c)
            val qB = b.map(_._1.toDouble / totB)
            val qA = na.toDouble / totA
            DriftRow(batchId, c, b.map(_._1), na, qB.map(r(_, 6)),
              r(qA, 6), r(qA - qB.getOrElse(0.0), 6),
              b.map(x => r(x._2, 4)), r(da, 4))
          }
          if (!alreadyFolded) {
            val tmp = new Path(sPath.getParent,
              s".${sPath.getName}.tmp-${java.util.UUID.randomUUID()}")
            after.toSeq.sortBy(_._1)
              .map { case (c, (n, d)) => DriftState(c, n, d, batchId) }
              .toDF().coalesce(1)
              .write.mode("overwrite").parquet(tmp.toString)
            StoreSwap.swapIn(sfs, sPath, tmp, "runDriftMonitor state")
          }
          if (drift.nonEmpty)
            drift.toDF().coalesce(1).write.mode("append").parquet(outPath)
          mfs.mkdirs(marker.getParent)
          mfs.create(marker, true).close()
          ()
        }
      }
      .start()
  }

  /** End-to-end streaming pipeline wiring: file source → windowed agg →
    * sink. Returns the started query; callers own its lifecycle.
    */
  def runWindowedPipeline(spark: SparkSession, dir: String, outPath: String,
                          checkpoint: String) = {
    val agg = windowedCounts(readEventStream(spark, dir), "1 hour", "1 day")
    agg.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
