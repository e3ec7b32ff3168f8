package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the Spark analog of DuckDB's `SUMMARIZE`
  * (/root/reference delegates profiling to DuckDB, where SUMMARIZE is the
  * idiom): per-column row counts, null counts, exact distinct counts,
  * min/max/mean, emitted in long format (one row per column) so the
  * profile of a 1000-column table is still a 1000-row result.
  *
  * ONE aggregate pass over the data computes every metric for every column
  * (map-side partial combine; the count(DISTINCT) columns expand the
  * aggregate but stay distributed); the long-format pivot is a literal
  * struct explode of the single result row — no second scan. Exact
  * distinct (not approx_count_distinct) keeps the operator oracle-checkable;
  * swap in approx_count_distinct at trillion-row scale where a 2% error
  * beats the expand.
  */
object ProfileOps {

  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    def d(c: String): Column = col(c).cast("double")
    val aggs: Seq[Column] = cols.flatMap { c => Seq(
      count(lit(1)).as(s"${c}__rows"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__nd"),
      min(d(c)).as(s"${c}__min"),
      max(d(c)).as(s"${c}__max"),
      round(avg(d(c)), 4).as(s"${c}__mean"))
    }
    val agged = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"${c}__rows").as("n_rows"),
        col(s"${c}__nulls").as("n_null"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__min").as("min_v"),
        col(s"${c}__max").as("max_v"),
        col(s"${c}__mean").as("mean_v"))
    }
    agged.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
