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
    * guarantees this). Low-cardinality group keys bound the sort
    * parallelism at #groups; for very hot groups at 100 TB prefer
    * `approx_percentile`, which keeps partial sketches map-side.
    */
  def exactQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     probs: Seq[(String, Double)]): DataFrame = {
    val gcols = groupCols.map(col)
    val wSort = Window.partitionBy(gcols: _*).orderBy(col(valueCol))
    // Group sizes via a separate partial aggregate + broadcast join back:
    // a `count() over (partition)` window would drag every row through a
    // second WindowExec buffer pass; the aggregate is one cheap scan and
    // the join adds no shuffle.
    val counts = df.groupBy(gcols: _*).agg(count(lit(1)).as("__n"))
    val ranked = df.select(gcols :+ col(valueCol): _*)
      .withColumn("__rn", row_number().over(wSort))
      .join(broadcast(counts), groupCols)
    // Keep only rows that can be an interpolation endpoint for some prob.
    val needed = probs.map(_._2).flatMap { p =>
      val pos = (col("__n") - 1) * p
      Seq(floor(pos) + 1, ceil(pos) + 1)
    }
    // Per-prob endpoint index + interpolation weight as plain columns (n is
    // constant per group), so the final aggregates stay un-nested.
    val kept = probs.zipWithIndex.foldLeft(
        ranked.filter(needed.map(col("__rn") === _).reduce(_ || _))) {
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
