package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the Spark analog of DuckDB's `SUMMARIZE`
  * (/root/reference delegates profiling to DuckDB, where SUMMARIZE is the
  * idiom): per-column row counts, null counts, exact distinct counts,
  * min/max/mean, emitted in long format (one row per column) so the
  * profile of a 1000-column table is still a 1000-row result.
  *
  * Two branches, both expand-free:
  *   - base metrics: ONE aggregate pass computes rows/nulls/min/max/mean
  *     for every column (map-side partial combine), pivoted to long format
  *     by exploding a literal struct array of the single result row;
  *   - exact distincts: n count(DISTINCT) columns in one agg would Expand
  *     the input ×(n+1) before the shuffle; instead the columns explode to
  *     (column-idx, value) pairs and a two-phase distinct shuffles only
  *     each PARTITION's distinct values — for typical profiles orders of
  *     magnitude fewer rows. Exact distinct (not approx_count_distinct)
  *     keeps the operator oracle-checkable; swap in approx at trillion-row
  *     scale where a 2% error beats any exact plan.
  */
object ProfileOps {

  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    def d(c: String): Column = col(c).cast("double")
    val aggs: Seq[Column] = cols.flatMap { c => Seq(
      count(lit(1)).as(s"${c}__rows"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
      min(d(c)).as(s"${c}__min"),
      max(d(c)).as(s"${c}__max"),
      round(avg(d(c)), 4).as(s"${c}__mean"))
    }
    val agged = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"${c}__rows").as("n_rows"),
        col(s"${c}__nulls").as("n_null"),
        col(s"${c}__min").as("min_v"),
        col(s"${c}__max").as("max_v"),
        col(s"${c}__mean").as("mean_v"))
    }
    val base = agged.select(explode(array(rows: _*)).as("p")).select("p.*")

    val nd = df
      .select(posexplode(array(cols.map(d): _*)).as(Seq("__i", "__v")))
      .filter(col("__v").isNotNull) // count(DISTINCT c) ignores nulls
      .distinct()
      .groupBy(col("__i"))
      .agg(count(lit(1)).as("n_distinct"))
      .select(element_at(typedLit(cols), col("__i") + 1).as("col_name"),
        col("n_distinct"))

    base.join(nd, Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_null"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"), // all-null col
        col("min_v"), col("max_v"), col("mean_v"))
  }
}
