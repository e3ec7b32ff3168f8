package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation helpers for skewed data (SURVEY.md §2.C / the 100 TB design
  * constraint: "Skewed keys → salting or AQE skew-join").
  */
object AggOps {

  /** Salted two-phase aggregation: groupBy(keys, salt) pre-aggregates into
    * saltFactor partial rows per key, then groupBy(keys) combines them.
    * Algebraic aggregates (sum/count/min/max) compose exactly, so the
    * result is IDENTICAL to a direct groupBy — only the shuffle profile
    * changes: a hot key's rows spread over saltFactor reducers in phase 1,
    * and phase 2 only sees saltFactor rows per key.
    *
    * Note Spark's hash aggregate already does map-side partial combine,
    * which handles most skew; salting matters when the DISTINCT key count
    * per partition overflows the hash map (spill) or when a single reducer
    * key is hot downstream of a non-combinable op. The salt is
    * deterministic (hash of the whole input row, not rand()), keeping
    * results reproducible and retry-safe.
    *
    * `partials`: per-phase-1 aggregates as (alias → column builder);
    * `finals`: how to combine a phase-1 alias in phase 2.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltFactor: Int,
                partials: Seq[(String, Column)],
                finals: Seq[(String, String => Column)]): DataFrame = {
    val salt = pmod(hash(df.columns.map(col): _*), lit(saltFactor))
    val phase1 = df.withColumn("__salt", salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(finals.head._2(finals.head._1).as(finals.head._1),
        finals.tail.map { case (n, f) => f(n).as(n) }: _*)
  }

  /** Broadcast join back on group keys with NULL-SAFE equality: GROUP BY
    * treats NULL as a real group, but a plain using-join (NULL == NULL is
    * NULL) would silently drop that group's rows on the way back —
    * diverging from the quantile_cont oracle. Empty `cols` = cross join
    * (the ungrouped / global-quantile shape), as with the using-join.
    */
  private def joinBackNullSafe(l: DataFrame, r: DataFrame,
                               cols: Seq[String]): DataFrame = {
    if (cols.isEmpty) l.crossJoin(broadcast(r))
    else {
      val rr = cols.foldLeft(r)((d, c) => d.withColumnRenamed(c, "__jb_" + c))
      // <=> only where a null key is POSSIBLE: Spark rewrites null-safe
      // equi-join keys as (coalesce, isnull) pairs — double-width probe
      // keys for nothing on non-nullable columns (e.g. the computed __bkt)
      val cond = cols.map { c =>
        if (l.schema(c).nullable) col(c) <=> col("__jb_" + c)
        else col(c) === col("__jb_" + c)
      }.reduce(_ && _)
      cols.foldLeft(l.join(broadcast(rr), cond))((d, c) => d.drop("__jb_" + c))
    }
  }

  /** Exact linear-interpolated quantiles (SQL `quantile_cont` semantics)
    * computed with a distributed sort instead of Spark's built-in
    * `percentile`, whose value→count hash map degenerates on
    * mostly-distinct doubles (it holds every distinct value in one
    * aggregation buffer per group). Here each group is sorted once inside
    * its shuffle partition, only the O(#probs) boundary rows survive the
    * filter, and the final aggregate interpolates between them — the
    * per-executor memory is O(partition), never O(group).
    *
    * probs maps output column name → probability in [0,1]; 0.0 and 1.0
    * give exact min/max for free. Groups must be non-empty (SQL GROUP BY
    * guarantees this).
    *
    * One sort-window pass per group: parallelism is bounded by #groups —
    * fine when every group fits a task AND there are enough groups to fill
    * the cluster. [[exactQuantilesBySelection]] (the q14 path) removes both
    * bounds at roughly the same bench cost; this variant remains for
    * many-small-groups shapes where its single window pass wins.
    */
  def exactQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     probs: Seq[(String, Double)]): DataFrame = {
    val gcols = groupCols.map(col)
    // quantile_cont IGNORES NULLs: an unfiltered NULL would count toward
    // the group size AND rank first (nulls sort low), shifting every
    // quantile. A group whose values are all NULL yields no output row.
    val vals = df.filter(col(valueCol).isNotNull)
    val wSort = Window.partitionBy(gcols: _*).orderBy(col(valueCol))
    // Group sizes via a separate partial aggregate + broadcast join back:
    // a `count() over (partition)` window would drag every row through a
    // second WindowExec buffer pass.
    val counts = vals.groupBy(gcols: _*).agg(count(lit(1)).as("__n"))
    val ranked = vals.select(gcols :+ col(valueCol): _*)
      .withColumn("__rn", row_number().over(wSort))
      .transform(joinBackNullSafe(_, counts, groupCols))
    interpolate(ranked, gcols, valueCol, probs)
  }

  /** [[exactQuantiles]] for groups too large to sort in one task.
    *
    * Two-phase distributed selection — NO global or per-group sort:
    *   1. `percentile_approx` sketches ~`numBuckets` split points per
    *      group (one map-side-combined pass), and each row gets a bucket =
    *      #splits ≤ value (unrolled comparisons, codegen'd);
    *   2. exact counts per (group, bucket) + a cumulative offset over the
    *      ≤numBuckets count rows locate which buckets contain the target
    *      ranks; ONLY those buckets' rows (≈ 2·#probs/numBuckets of the
    *      data) are ranked — a window over (group, bucket) partitions, so
    *      parallelism is #groups × numBuckets and the per-task sort is a
    *      bucket, not a group. The sketch only steers bucket SIZES; ranks
    *      and interpolation are exact regardless of its error.
    * At 100 TB: every full-data pass is a partial aggregate or a
    * broadcast-join filter; nothing funnels a whole group through one task.
    */
  def exactQuantilesBySelection(df: DataFrame, groupCols: Seq[String], valueCol: String,
                                probs: Seq[(String, Double)], numBuckets: Int = 16): DataFrame = {
    require(numBuckets >= 2,
      s"exactQuantilesBySelection: numBuckets must be >= 2, got $numBuckets")
    val gcols = groupCols.map(col)
    // quantile_cont semantics: NULL values are ignored (see exactQuantiles)
    val vals = df.filter(col(valueCol).isNotNull)
    // Phase 1: split sketch + exact group sizes in one pass. Sketch
    // accuracy only shapes bucket SIZES (ranks stay exact), so the cheap
    // accuracy=1000 summary is plenty — with numBuckets=16 a 2× size skew
    // still leaves candidate buckets at ~12% of the group.
    val fracs = (1 until numBuckets).map(_.toDouble / numBuckets)
    val splits = vals.groupBy(gcols: _*).agg(
      expr(s"percentile_approx(`$valueCol`, array(${fracs.mkString(",")}), 1000)")
        .as("__splits"),
      count(lit(1)).as("__n"))
    val bucket = (1 until numBuckets).map(i =>
        when(col(valueCol) >= element_at(col("__splits"), i), 1).otherwise(0))
      .reduce(_ + _)
    val withB = vals.select(gcols :+ col(valueCol): _*)
      .transform(joinBackNullSafe(_, splits, groupCols))
      .withColumn("__bkt", bucket)
    // Phase 2: exact per-bucket counts → offsets; a bucket is a candidate
    // iff some needed rank falls inside (offset, offset + cnt].
    val wCum = Window.partitionBy(gcols: _*).orderBy(col("__bkt"))
    val offsets = withB.groupBy(gcols :+ col("__bkt"): _*)
      .agg(count(lit(1)).as("__cnt"), first(col("__n")).as("__n"))
      .withColumn("__off", sum(col("__cnt")).over(wCum) - col("__cnt"))
    val neededRanks: Seq[Column] = probs.map(_._2).flatMap { p =>
      val pos = (col("__n") - 1) * p
      Seq(floor(pos) + 1, ceil(pos) + 1)
    }
    val candBuckets = offsets.filter(neededRanks
        .map(r => r > col("__off") && r <= col("__off") + col("__cnt"))
        .reduce(_ || _))
      .select(gcols :+ col("__bkt") :+ col("__off") :+ col("__n"): _*)
    // Rank only candidate-bucket rows; global rank = offset + local rank.
    val wLoc = Window.partitionBy(gcols :+ col("__bkt"): _*).orderBy(col(valueCol))
    val ranked = withB.drop("__n", "__splits")
      .transform(joinBackNullSafe(_, candBuckets, groupCols :+ "__bkt"))
      .withColumn("__rn", col("__off") + row_number().over(wLoc))
    interpolate(ranked, gcols, valueCol, probs)
  }

  /** Shared tail: from rows carrying exact global rank `__rn` and group
    * size `__n`, keep the interpolation endpoints and linearly interpolate
    * each requested quantile. Endpoint index + weight are plain columns (n
    * is constant per group), keeping the final aggregates un-nested.
    */
  private def interpolate(ranked: DataFrame, gcols: Seq[Column],
                          valueCol: String,
                          probs: Seq[(String, Double)]): DataFrame = {
    val neededRanks = probs.map(_._2).flatMap { p =>
      val pos = (col("__n") - 1) * p
      Seq(floor(pos) + 1, ceil(pos) + 1)
    }
    val kept = probs.zipWithIndex.foldLeft(
        ranked.filter(neededRanks.map(col("__rn") === _).reduce(_ || _))) {
      case (d, ((_, p), i)) =>
        val pos = (col("__n") - 1) * p
        d.withColumn(s"__lo_$i", floor(pos) + 1)
          .withColumn(s"__frac_$i", pos - floor(pos))
    }
    val aggs = probs.zipWithIndex.map { case ((name, _), i) =>
      val vLo = max(when(col("__rn") === col(s"__lo_$i"), col(valueCol)))
      val vHi = max(when(col("__rn") === col(s"__lo_$i") + 1, col(valueCol)))
      val frac = first(col(s"__frac_$i"))
      // frac == 0 leaves vHi absent; coalesce keeps the 0-weight term sane.
      (vLo + frac * (coalesce(vHi, vLo) - vLo)).as(name)
    }
    kept.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Convenience: salted sum+count (the common skew case). */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     saltFactor: Int = 16): DataFrame =
    saltedAgg(df, keys, saltFactor,
      partials = Seq(
        "sum_v" -> sum(col(valueCol)),
        "n" -> count(lit(1))),
      finals = Seq(
        "sum_v" -> (c => sum(col(c))),
        "n" -> (c => sum(col(c)).cast("long"))))
}
