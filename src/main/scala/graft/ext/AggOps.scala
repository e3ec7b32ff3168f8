package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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
