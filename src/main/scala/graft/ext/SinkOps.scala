package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Sink helpers for the 100 TB layout decisions a plain
  * `df.write.parquet(path)` leaves on the table:
  *
  *   - `partitionBy` on low-cardinality columns → downstream queries with
  *     a partition predicate scan only matching directories (partition
  *     pruning happens before any file is opened);
  *   - `sortWithinPartitions` on high-selectivity columns → parquet
  *     row-group min/max statistics become tight, so point/range filters
  *     skip row groups inside the files too;
  *   - `maxRecordsPerFile` bounds file sizes so a hot output partition
  *     becomes many parallel-readable files instead of one giant one.
  *
  * Partition columns must be low-cardinality (dates, categories): one
  * directory per value; a high-cardinality partitionBy creates the classic
  * small-files failure mode.
  */
object SinkOps {

  def writePartitionedParquet(df: DataFrame, path: String,
                              partitionCols: Seq[String],
                              sortCols: Seq[String] = Nil,
                              maxRecordsPerFile: Long = 5000000L): Unit = {
    // repartition on the partition columns REGARDLESS of sorting, so each
    // output directory is written by few tasks (few, large files) — without
    // it every task holding a partition value writes its own file,
    // #tasks × #values small files; the sort only adds row-group
    // statistics locality on top
    val clustered = {
      val rp = df.repartition(partitionCols.map(col): _*)
      if (sortCols.nonEmpty)
        rp.sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      else rp
    }
    clustered.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Bucketed (hash-clustered) table sink — the co-located-join layout:
    * two tables bucketed on the same keys with the same bucket count join
    * with NO exchange on either side, because the bucketed scan already
    * reports the required hash distribution. For a fact table joined every
    * run on the same key (lineitem⋈orders), this converts the recurring
    * shuffle of the BIG side into a one-time write-side cost — the single
    * biggest recurring-saving knob at 100 TB.
    *
    * The pre-write `repartition(nBuckets, keys)` aligns task and bucket
    * boundaries, yielding ONE file per bucket instead of
    * (#tasks × #buckets) small files; `sortBy` additionally persists
    * in-bucket order so a sort-merge join skips its Sort too. nBuckets
    * sizes a bucket ≈ one task's comfortable input (~128-256 MB at
    * target scale).
    *
    * Pass `dbPath` to also record the table (WITH its bucket spec) in the
    * pipeline's ViewStore manifest, so a later session over the same
    * db_path restores it still bucketed — otherwise the zero-exchange
    * property silently dies at the session boundary.
    */
  def writeBucketedTable(df: DataFrame, table: String,
                         bucketCols: Seq[String], nBuckets: Int,
                         sortCols: Seq[String] = Nil,
                         dbPath: Option[String] = None): Unit = {
    // a previous-session restore registers the table EXTERNAL, whose drop
    // leaves data behind — clear it or the overwrite saveAsTable below
    // fails with LOCATION_ALREADY_EXISTS (same guard the pipeline's table
    // materialization uses)
    graft.pipeline.ViewStore.dropTableClearingLocation(df.sparkSession, table)
    val writer = df.repartition(nBuckets, bucketCols.map(col): _*)
      .write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) writer.sortBy(sortCols.head, sortCols.tail: _*)
     else writer).saveAsTable(table)
    // no-op when dbPath is None (saveTable's own contract)
    graft.pipeline.ViewStore.saveTable(df.sparkSession, dbPath, table)
  }

  // -- File-stats sidecar: zone maps above the footer level -------------

  /** Write `data` range-clustered on `statsCols` and publish a per-FILE
    * min/max sidecar next to it — the zone-map/data-skipping layer Delta
    * and Iceberg keep in their manifests, for plain parquet directories.
    * Parquet footers already carry row-group min/max, but a reader still
    * OPENS every footer to use them: at 100 TB that is one metadata round
    * trip per file (100k+ object-store reads) before the first data byte.
    * The sidecar collapses that to ONE small parquet read; footer stats
    * then prune row groups WITHIN the files that survive.
    *
    * `repartitionByRange` makes the per-file ranges tight and disjoint, so
    * a range predicate maps to few files. An unclustered layout would
    * still be CORRECT (zones overlap, pruning just degrades toward
    * read-everything) — clustering is what makes the sidecar worth
    * consulting. The data and the sidecar publish as TWO atomic steps
    * (each `_SUCCESS`-gated via [[DedupOps.materializedPairs]],
    * write-once): a crashed writer can leave published data with no
    * sidecar yet — [[readPruned]] detects the absent sidecar and falls
    * back to a plain full-scan filter, result-identical by contract —
    * but never a sidecar that disagrees with the data.
    */
  def writeWithFileStats(spark: org.apache.spark.sql.SparkSession,
                         path: String, statsCols: Seq[String], nFiles: Int)
                        (data: => DataFrame): DataFrame = {
    val written = DedupOps.materializedPairs(spark, path)(
      data.repartitionByRange(nFiles, statsCols.map(col): _*))
    DedupOps.materializedPairs(spark, s"$path.stats")(
      fileStatsOf(written, statsCols))
    written
  }

  /** Per-file min/max rows for the sidecar. The `file` key is the bare
    * FILE NAME, not `input_file_name()`'s absolute percent-encoded URI:
    * [[writeWithFileStats]]' layout is flat (no partition dirs), so the
    * basename is unique, needs no URI decoding (Spark-generated part
    * names are URL-safe; an absolute URI would double-decode a dataset
    * path containing spaces/%/#), and the sidecar survives the dataset
    * directory being moved or copied.
    */
  private def fileStatsOf(data: DataFrame, statsCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    data.withColumn("file", substring_index(input_file_name(), "/", -1))
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
  }

  private def dataFileNames(fs: org.apache.hadoop.fs.FileSystem,
                            dir: org.apache.hadoop.fs.Path): Set[String] =
    fs.listStatus(dir)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).toSet

  /** Append `data` to a published [[writeWithFileStats]] layout and merge
    * the new files' min/max rows into the sidecar — the lifecycle step a
    * write-once zone map lacks (a continuously-landing table would
    * otherwise need a full rewrite per batch). The appended batch is
    * range-clustered WITHIN ITSELF; its file zones may overlap the base
    * files' ranges, which degrades pruning tightness, never correctness
    * (zones are per-file facts either way) — periodic re-clustering via
    * [[writeWithFileStats]] to a fresh path restores tightness.
    *
    * Publish order is data-append THEN sidecar-swap (via [[StoreSwap]],
    * no destroy-first window), and the crash window between the two is
    * SAFE by the reader's contract: [[readPruned]] always scans data
    * files the sidecar does not know (their zones are unknown), so a
    * crashed append degrades to reading the new files, never to missing
    * them. Single-writer contract like every store here. Returns the
    * number of files appended.
    */
  def appendWithFileStats(spark: org.apache.spark.sql.SparkSession,
                          path: String, statsCols: Seq[String], nFiles: Int)
                         (data: => DataFrame): Int = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.functions.col
    val dst = new Path(path)
    val statsDst = new Path(s"$path.stats")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    StoreSwap.recoverIfInterrupted(fs, statsDst)
    require(fs.exists(new Path(dst, "_SUCCESS")) &&
        fs.exists(new Path(statsDst, "_SUCCESS")),
      s"appendWithFileStats: no published zone-mapped layout at $path — " +
        "build it with writeWithFileStats first")
    val before = dataFileNames(fs, dst)
    data.repartitionByRange(nFiles, statsCols.map(col): _*)
      .write.mode("append").parquet(path)
    val fresh = (dataFileNames(fs, dst) -- before).toIndexedSeq.sorted
    if (fresh.nonEmpty) {
      val newStats = fileStatsOf(
        spark.read.parquet(fresh.map(n => new Path(dst, n).toString): _*),
        statsCols)
      val merged = spark.read.parquet(statsDst.toString)
        .unionByName(newStats).coalesce(1)
      val tmp = new Path(statsDst.getParent,
        s".${statsDst.getName}.merge-${java.util.UUID.randomUUID()}")
      try {
        merged.write.mode("overwrite").parquet(tmp.toString)
        StoreSwap.swapIn(fs, statsDst, tmp, "appendWithFileStats")
      } finally { if (fs.exists(tmp)) fs.delete(tmp, true); () }
    }
    fresh.size
  }

  /** Multi-column zone scan through the [[writeWithFileStats]] sidecar:
    * a file enters the scan's file index only if EVERY requested range
    * intersects that file's per-column zone — predicates prune the
    * intersection, so each added column can only shrink the file list.
    * Pruned files are never listed, opened, or footer-read; the residual
    * in-file filter is applied on top, so the result is bit-identical to
    * a full scan with the same conjunction (q108's oracle is exactly that
    * plain filter).
    *
    * Reader-side safety contract, exact in every degraded state:
    *   - no published sidecar (never written, or a compaction crash left
    *     it parked aside) → plain full-scan filter, result-identical;
    *   - data files the sidecar does not know (the [[appendWithFileStats]]
    *     crash window) → always scanned, their zones are unknown;
    *   - all-null zones: min/max ignore nulls, null bounds fail the
    *     intersection test, and a range predicate excludes null rows by
    *     SQL semantics — dropping such files is exact.
    *
    * The sidecar collect and the directory listing are metadata-scale —
    * the file LIST, which any reader materializes on the driver anyway —
    * never data.
    */
  def readPruned(spark: org.apache.spark.sql.SparkSession, path: String,
                 ranges: Seq[(String, Any, Any)]): DataFrame = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.functions._
    require(ranges.nonEmpty, "readPruned: at least one (col, lo, hi) range")
    val residual = ranges.map { case (c, lo, hi) =>
      col(c) >= lit(lo) && col(c) <= lit(hi) }.reduce(_ && _)
    val dst = new Path(path)
    val statsDst = new Path(s"$path.stats")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(statsDst, "_SUCCESS")))
      return spark.read.parquet(path).filter(residual)
    val stats = spark.read.parquet(statsDst.toString)
    val zoneHit = ranges.map { case (c, lo, hi) =>
      col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi) }
      .reduce(_ && _)
    val known = stats
      .select(col("file"), coalesce(zoneHit, lit(false)).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val files = dataFileNames(fs, dst).toIndexedSeq.sorted
      .filter(n => known.getOrElse(n, true)) // unknown → must scan
      .map(n => new Path(dst, n).toString)
    val base =
      if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(files: _*)
    base.filter(residual)
  }

  /** Single-range [[readPruned]] — q108's registered shape. */
  def readPrunedRange(spark: org.apache.spark.sql.SparkSession,
                      path: String, c: String, lo: Any, hi: Any): DataFrame =
    readPruned(spark, path, Seq((c, lo, hi)))
}
