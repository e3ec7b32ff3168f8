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

  /** Skew-AWARE inner equi-join: close the decide-to-salt loop that
    * [[ProfileOps.keySkew]] (q96) exists to feed. Measures the PROBE
    * side's key distribution with one bounded job — per-key counts
    * partial-aggregate map-side, the shuffle carries only distinct keys,
    * and the driver receives exactly ONE row (max, total, n_keys) — then
    * salts via [[saltedEquiJoin]] only when max-over-mean crosses
    * `skewThreshold`. A uniform input pays zero salt cost (the plan is
    * the plain join: no salt column, no build-side explode — asserted by
    * JoinOpsSpec); a hot-keyed input spreads its heavy key over
    * `saltFactor` reducers. Result is EXACTLY the plain inner join either
    * way, which is what the q100 oracle pins.
    *
    * The probe side is measured because it is the side [[saltedEquiJoin]]
    * salts (its hot key is what overflows one reducer; the build side is
    * the replicated small side). NULL-keyed probe rows are excluded from
    * the measurement — an inner equi-join drops them, so a NULL-heavy
    * probe must not trigger pointless salting (contrast q96, where the
    * NULL bucket is deliberately reported: a diagnostic answers "what's
    * hot", this operator answers "what will this join shuffle").
    *
    * At 100 TB the measurement is one scan (map-side-combined) — cheap
    * next to a fact⋈fact shuffle, and the alternative (always salt)
    * multiplies build-side shuffle volume by saltFactor on every join,
    * skewed or not. AQE's skew-split handles the moderate cases at
    * runtime; this handles the single-key-overwhelms-one-reducer case
    * AQE can only split on one side.
    */
  def skewAwareJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                    skewThreshold: Double = 4.0,
                    saltFactor: Int = 8): DataFrame = {
    require(skewThreshold > 1.0,
      s"skewAwareJoin: threshold must exceed 1.0 (uniform), got $skewThreshold")
    require(saltFactor > 1, s"skewAwareJoin: saltFactor must be > 1")
    val joinable = probe.filter(keys.map(col(_).isNotNull).reduce(_ && _))
    val stats = joinable
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(max(col("__n")).as("max_n"), sum(col("__n")).as("total"),
        count(lit(1)).as("n_keys"))
      .head()
    val skewed = !stats.isNullAt(0) && {
      val maxN = stats.getLong(0)
      val total = stats.getLong(1)
      val nKeys = stats.getLong(2)
      // max/mean >= threshold, kept in integer-product form (no division)
      maxN.toDouble * nKeys >= skewThreshold * total
    }
    if (skewed) saltedEquiJoin(probe, build, keys, saltFactor)
    else probe.join(build, keys)
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
