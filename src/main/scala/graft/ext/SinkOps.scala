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
    * consulting. Both the data and the sidecar publish atomically through
    * [[DedupOps.materializedPairs]] (`_SUCCESS`-gated, write-once), so a
    * crashed writer never leaves a sidecar that disagrees with the data.
    */
  def writeWithFileStats(spark: org.apache.spark.sql.SparkSession,
                         path: String, statsCols: Seq[String], nFiles: Int)
                        (data: => DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val written = DedupOps.materializedPairs(spark, path)(
      data.repartitionByRange(nFiles, statsCols.map(col): _*))
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    DedupOps.materializedPairs(spark, s"$path.stats")(
      written.withColumn("file", input_file_name())
        .groupBy(col("file"))
        .agg(aggs.head, aggs.tail: _*)
        .coalesce(1))
    written
  }

  /** Range scan through the [[writeWithFileStats]] sidecar: only files
    * whose [min, max] zone intersects [lo, hi] enter the scan's file
    * index — pruned files are never listed, opened, or footer-read. The
    * residual in-file filter is applied on top, so the result is
    * bit-identical to a full scan with the same predicate (q108's oracle
    * is exactly that plain filter).
    *
    * The sidecar collect is metadata-scale — the file LIST, which any
    * reader materializes on the driver anyway — never data. NULL keys:
    * min/max ignore nulls, an all-null zone has null bounds and fails the
    * intersection test, and a range predicate excludes null rows by SQL
    * semantics — so dropping such files is exact, not approximate.
    */
  def readPrunedRange(spark: org.apache.spark.sql.SparkSession,
                      path: String, c: String, lo: Any, hi: Any): DataFrame = {
    import org.apache.spark.sql.functions._
    val stats = spark.read.parquet(s"$path.stats")
    val files = stats
      .filter(col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi))
      .select(col("file")).collect().map(_.getString(0)).toIndexedSeq
    val base =
      if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(files: _*)
    base.filter(col(c) >= lit(lo) && col(c) <= lit(hi))
  }
}
