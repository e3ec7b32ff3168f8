package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators the reference's engine (DuckDB) has natively but Spark
  * lacks (SURVEY.md §2.B joins row: ASOF; custom-operator preference (a):
  * "compose existing ops if semantics allow" — both of these compose, so no
  * custom SparkPlan is needed).
  */
object JoinOps {

  /** As-of join: for each left row, the single latest right row with
    * right.ts <= left.ts and equal keys (DuckDB `ASOF JOIN ... ON l.ts >= r.ts`).
    *
    * NOT implemented as an inequality join — that is a per-key cross product
    * which explodes quadratically on active keys. Instead: union both sides
    * tagged, one window pass per key ordered by (ts, side), and carry the
    * last non-null right payload forward. Cost: ONE shuffle on the key
    * (same as any keyed join) + a linear in-partition scan — the optimal
    * distributed as-of shape. Right rows sort before left rows at equal ts,
    * so a right row exactly at left.ts matches (>= semantics).
    *
    * Output: leftKeep ++ keys ++ ts, plus each rightKeep column as
    * `<name>_r` and the matched right timestamp as `ts_r`; with
    * `inner = true` (the DuckDB ASOF JOIN default) unmatched left rows are
    * dropped, with `inner = false` (ASOF LEFT JOIN) they survive with null
    * right columns — same single-shuffle plan either way, the variants
    * differ only in the final filter.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               ts: String, leftKeep: Seq[String], rightKeep: Seq[String],
               inner: Boolean = true): DataFrame = {
    val rightOut = rightKeep.map(_ + "_r") :+ (ts + "_r")
    // the right payload rides as ONE struct so the fill is atomic: filling
    // each column independently with last(ignoreNulls) would substitute a
    // STALE row's value wherever the matched right row carries a NULL —
    // and could stitch fields of different right rows into one output row
    val payload = "__asof_r"
    val l = left.select(
      (keys.map(col) :+ col(ts) :+ lit(1).as("__side")) ++
        leftKeep.map(col) :+
        lit(null).cast(org.apache.spark.sql.types.StructType(
          (rightKeep :+ ts).map(c => org.apache.spark.sql.types.StructField(
            c + "_r", right.schema(c).dataType)))).as(payload): _*)
    val r = right
      // equi-join semantics: a NULL key (or NULL ts) right row matches
      // nothing — without this filter the window's NULL partition would
      // pair it with NULL-key left rows, which DuckDB ASOF never does
      .filter(keys.map(col(_).isNotNull).reduce(_ && _) && col(ts).isNotNull)
      .select(
      (keys.map(col) :+ col(ts) :+ lit(0).as("__side")) ++
        leftKeep.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct((rightKeep :+ ts).map(c => col(c).as(c + "_r")): _*)
          .as(payload): _*)
    // payload as the final sort key: right rows tied on (keys, ts) would
    // otherwise resolve by partition order — run-dependent; the struct's
    // lexicographic order makes the pick deterministic (retry-safe)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("__side").asc, col(payload).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn(payload, last(col(payload), ignoreNulls = true).over(w))
    val leftRows = filled.filter(col("__side") === 1)
      .select((keys.map(col) :+ col(ts)) ++ leftKeep.map(col) ++
        rightOut.map(c => col(s"$payload.$c").as(c)): _*)
    if (inner) leftRows.filter(col(ts + "_r").isNotNull) else leftRows
  }

  /** Skew-salted inner equi-join. For a fact⋈fact join where one key is
    * hot enough that a single reducer partition overflows (beyond what AQE
    * skew-split handles — it can split the skewed SIDE's partition, but
    * every split still reads the other side's full key partition): the
    * probe side gets a deterministic salt in [0, saltFactor), the build
    * side is replicated saltFactor× via explode, and the join keys on
    * (keys, salt) — the hot key's rows spread over saltFactor reducers.
    * Result is EXACTLY the plain inner join: each probe row carries one
    * salt and meets each matching build row exactly once (at that salt's
    * replica). Cost: build-side shuffle volume × saltFactor — use only
    * when the build side is the smaller input and skew is proven.
    * The salt hashes the probe's join keys + a per-row component so one
    * hot key's rows fan out; hashing the whole row keeps it deterministic
    * (retry-safe), unlike rand().
    */
  def saltedEquiJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                     saltFactor: Int): DataFrame = {
    val p = probe.withColumn("__salt",
      pmod(hash(probe.columns.map(col): _*), lit(saltFactor)))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    p.join(b, keys :+ "__salt").drop("__salt")
  }

  /** Range join: pair each left row with right rows whose timestamp falls
    * in [left.ts, left.ts + windowSeconds), with equal keys.
    *
    * A raw inequality join would be a BroadcastNestedLoopJoin (quadratic
    * scan). Instead the classic bucketization: quantize time into
    * windowSeconds-wide buckets; an interval spans at most 2 buckets, so
    * the LEFT side explodes ×2, the point side maps to its single bucket,
    * and the join is a plain equi-join on (key, bucket) with the residual
    * range predicate applied after. Shuffle keys are (key, bucket) —
    * fine-grained and uniform, so skew from hot keys is also diluted.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                ts: String, windowSeconds: Long): DataFrame = {
    val bucket = (c: String) =>
      floor(unix_timestamp(col(c)) / windowSeconds).cast("long")
    val l = left
      .withColumn("__b0", bucket(ts))
      .withColumn("__bucket", explode(array(col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val r = right
      .withColumnRenamed(ts, ts + "_r")
      .withColumn("__bucket", bucket(ts + "_r"))
    l.join(r, keys :+ "__bucket")
      .filter(col(ts + "_r") >= col(ts) &&
        col(ts + "_r") < col(ts) + expr(s"INTERVAL $windowSeconds SECONDS"))
      .drop("__bucket")
  }
}
