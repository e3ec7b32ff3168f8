package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared kept-token reassembly for the span-editing operators
  * ([[DedupOps.chunkDedup]], [[TextOps.collapseTokenRuns]],
  * [[TextOps.cutSharedSpans]]): given a flagged position stream, rebuild
  * each document's surviving text and report the kept/total counts.
  *
  * One `groupBy(id)` does everything: `collect_list` skips the `when()`'s
  * nulls (the cut positions), `sort_array` restores document order by the
  * (pos, token) struct's leading field, and the struct's token field is
  * extracted array-wise (`getField`, a codegen'd projection — no
  * interpreted higher-order function). This replaces the previous
  * running-window idiom (`collect_list over rowsBetween(unboundedPreceding,
  * currentRow)` + keep the max-pos row), which materialized a length-p
  * prefix array at every position p — O(T²) intermediate state per
  * document, a wall killer on book-length inputs (bounded in
  * DedupOpsSpec's 50k-token stress test). The aggregate is a plain
  * hash-shuffle on the doc id with no sort and no per-row array growth;
  * when the input is already id-partitioned (a preceding flag window),
  * the exchange is reused.
  *
  * Contract (mirrored by the q67/q109/q112 oracles): `n_kept` counts
  * keep-flagged positions; the total column counts non-null tokens (a
  * null-text doc's single outer-exploded row reports 0/0/null); the
  * rebuilt text is null when nothing survives.
  */
object Reassemble {

  def reassembleKept(df: DataFrame, idCol: String, posCol: String,
                     tokCol: String, keepCol: String,
                     nTotalName: String,
                     textName: String = "clean_text"): DataFrame =
    df.groupBy(col(idCol))
      .agg(count(col(tokCol)).as(nTotalName),
        sum(when(col(keepCol), 1L).otherwise(0L)).as("n_kept"),
        sort_array(collect_list(when(col(keepCol),
          struct(col(posCol), col(tokCol))))).as("__kept"))
      .select(col(idCol), col(nTotalName), col("n_kept"),
        when(col("n_kept") > 0,
          concat_ws(" ", col("__kept").getField(tokCol))).as(textName))
}
