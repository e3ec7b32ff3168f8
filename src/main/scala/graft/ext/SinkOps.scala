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
}
