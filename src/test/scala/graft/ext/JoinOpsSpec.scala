package graft.ext

import java.sql.Timestamp

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JoinOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(m: Int) =
    Timestamp.valueOf(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")

  test("asofJoin picks the latest right row at or before left ts, per key") {
    val left = Seq((1L, ts(60), 100L), (1L, ts(30), 101L), (2L, ts(60), 102L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq((1L, ts(10), 1.0), (1L, ts(45), 2.0), (1L, ts(61), 9.0),
      (2L, ts(60), 5.0)) // exactly-equal ts must match (>= semantics)
      .toDF("user_id", "ts", "value")
    val r = JoinOps.asofJoin(left, right, Seq("user_id"), "ts",
        leftKeep = Seq("event_id"), rightKeep = Seq("value"))
      .orderBy("event_id")
      .select("event_id", "value_r", "ts_r").collect()
    assert(r.map(x => (x.getLong(0), x.getDouble(1))).toSeq ==
      Seq((100L, 2.0), (101L, 1.0), (102L, 5.0)))
  }

  test("asofJoin: a matched row's NULL payload stays NULL (no stale fill)") {
    // the matched right row carries v=NULL; a per-column fill would
    // substitute the OLDER row's 10.0 — DuckDB ASOF returns the matched
    // row as-is, NULLs included
    val left = Seq((1L, ts(30), 100L)).toDF("user_id", "ts", "event_id")
    val right = Seq((1L, ts(10), Some(10.0)), (1L, ts(20), None))
      .toDF("user_id", "ts", "value")
    val r = JoinOps.asofJoin(left, right, Seq("user_id"), "ts",
        leftKeep = Seq("event_id"), rightKeep = Seq("value")).collect().head
    assert(r.getAs[Timestamp]("ts_r") == ts(20)) // the ts(20) row matched
    assert(r.isNullAt(r.fieldIndex("value_r"))) // with its own NULL value
  }

  test("asofJoin drops left rows with no prior right row (inner as-of)") {
    val left = Seq((1L, ts(5), 100L)).toDF("user_id", "ts", "event_id")
    val right = Seq((1L, ts(10), 1.0)).toDF("user_id", "ts", "value")
    assert(JoinOps.asofJoin(left, right, Seq("user_id"), "ts",
      Seq("event_id"), Seq("value")).count() == 0)
  }

  test("asofJoin inner=false keeps unmatched left rows with null right " +
      "(ASOF LEFT JOIN)") {
    val left = Seq((1L, ts(5), 100L), (1L, ts(20), 101L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq((1L, ts(10), 1.0)).toDF("user_id", "ts", "value")
    val r = JoinOps.asofJoin(left, right, Seq("user_id"), "ts",
        Seq("event_id"), Seq("value"), inner = false)
      .orderBy("event_id").collect()
    assert(r.length == 2)
    assert(r(0).getLong(r(0).fieldIndex("event_id")) == 100L &&
      r(0).isNullAt(r(0).fieldIndex("value_r")))
    assert(r(1).getLong(r(1).fieldIndex("event_id")) == 101L &&
      r(1).getDouble(r(1).fieldIndex("value_r")) == 1.0)
  }

  test("asofJoin never matches across NULL keys (equi-join semantics)") {
    // DuckDB ASOF joins on key EQUALITY: NULL = NULL is not a match, so a
    // NULL-key left row stays unmatched even with a NULL-key right row
    // earlier in time
    val left = Seq((Some(1L), ts(30), 100L), (None, ts(30), 101L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq((Some(1L), ts(10), 1.0), (None, ts(10), 9.0))
      .toDF("user_id", "ts", "value")
    val inner = JoinOps.asofJoin(left, right, Seq("user_id"), "ts",
      Seq("event_id"), Seq("value")).collect()
    assert(inner.map(_.getLong(2)).toSeq == Seq(100L)) // null-key left dropped
    val outer = JoinOps.asofJoin(left, right, Seq("user_id"), "ts",
        Seq("event_id"), Seq("value"), inner = false)
      .orderBy("event_id").collect()
    assert(outer.length == 2)
    assert(outer(1).getLong(outer(1).fieldIndex("event_id")) == 101L &&
      outer(1).isNullAt(outer(1).fieldIndex("value_r"))) // unmatched, not 9.0
  }

  test("asofJoin breaks right-side ts ties deterministically") {
    val left = Seq((1L, ts(30), 100L)).toDF("user_id", "ts", "event_id")
    // two right rows tied on (key, ts): without an explicit tiebreaker the
    // pick would follow partition order and flip between runs/retries
    val right = Seq((1L, ts(10), 1.0), (1L, ts(10), 2.0))
      .toDF("user_id", "ts", "value")
    val picks = (1 to 5).map { _ =>
      JoinOps.asofJoin(left.repartition(7), right.repartition(3),
          Seq("user_id"), "ts", Seq("event_id"), Seq("value"))
        .collect().head.getAs[Double]("value_r")
    }
    assert(picks.distinct.size == 1)
    assert(picks.head == 2.0) // max payload struct among the tied rows
  }

  test("rangeJoin matches rows in [ts, ts+window) incl. bucket-crossing") {
    val left = Seq((1L, ts(50), 100L)).toDF("user_id", "ts", "signup_id")
    // window [00:50, 01:50): 00:55 in same hour-bucket, 01:20 in the next,
    // 01:50 excluded (half-open), 00:49 before start
    val right = Seq((1L, ts(55), 1.0), (1L, ts(80), 2.0),
      (1L, ts(110), 4.0), (1L, ts(49), 8.0))
      .toDF("user_id", "ts", "value")
    val r = JoinOps.rangeJoin(left, right, Seq("user_id"), "ts", 3600)
      .select("value").collect().map(_.getDouble(0)).sorted
    assert(r.toSeq == Seq(1.0, 2.0))
  }

  test("rangeJoin produces each qualifying pair exactly once") {
    val left = Seq((1L, ts(0), 1L), (1L, ts(30), 2L))
      .toDF("user_id", "ts", "signup_id")
    val right = Seq((1L, ts(30), 1.0)).toDF("user_id", "ts", "value")
    val r = JoinOps.rangeJoin(left, right, Seq("user_id"), "ts", 3600)
    assert(r.count() == 2)            // matches both intervals, once each
    assert(r.distinct().count() == 2)
  }

  test("saltedEquiJoin equals the plain inner join exactly") {
    val orders = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = graft.Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"))
      .select("o_orderkey", "c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val salted = JoinOps.saltedEquiJoin(orders, customer, Seq("o_custkey"), 8)
      .select("o_orderkey", "c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedEquiJoin plan shuffles on (keys, salt), never bare keys") {
    // guards the refactor hazard: if the salt column fell out of the join
    // keys, the operator would silently regress to a plain skewed join and
    // still pass the equality test above
    val orders = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = graft.Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = JoinOps.saltedEquiJoin(orders, customer, Seq("o_custkey"), 8)
        .queryExecution.executedPlan.toString
      val parts = "hashpartitioning\\(([^)]*)".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      val keyed = parts.filter(_.contains("o_custkey"))
      assert(keyed.nonEmpty, s"expected shuffles on the join key:\n$plan")
      keyed.foreach(p =>
        assert(p.contains("__salt"), s"shuffle on bare keys (salt lost): $p\n$plan"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("skewAwareJoin: uniform keys take the PLAIN path (no salt column " +
      "anywhere in the plan), hot keys take the salted path") {
    import spark.implicits._
    val uniformProbe = (1L to 2000L).map(i => (i, i % 100, i * 1.0))
      .toDF("id", "k", "v")
    val hotProbe = (1L to 2000L)
      .map(i => (i, if (i <= 1800) 0L else i % 100, i * 1.0))
      .toDF("id", "k", "v")
    val dim = (0L until 100L).map(k => (k, s"g${k % 5}")).toDF("k", "grp")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plainPlan = JoinOps.skewAwareJoin(uniformProbe, dim, Seq("k"))
        .queryExecution.executedPlan.toString
      assert(!plainPlan.contains("__salt"),
        s"uniform input must not pay the salt cost:\n$plainPlan")
      val saltedPlan = JoinOps.skewAwareJoin(hotProbe, dim, Seq("k"))
        .queryExecution.executedPlan.toString
      assert(saltedPlan.contains("__salt"),
        s"hot key must trip the salted path:\n$saltedPlan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("skewAwareJoin result equals the plain join on BOTH paths") {
    import spark.implicits._
    val hotProbe = (1L to 500L)
      .map(i => (i, if (i <= 400) 0L else i % 50, i * 1.0))
      .toDF("id", "k", "v")
    val uniformProbe = (1L to 500L).map(i => (i, i % 50, i * 1.0))
      .toDF("id", "k", "v")
    val dim = (0L until 50L).map(k => (k, s"g${k % 5}")).toDF("k", "grp")
    for (probe <- Seq(hotProbe, uniformProbe)) {
      val plain = probe.join(dim, Seq("k")).select("id", "grp")
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      val aware = JoinOps.skewAwareJoin(probe, dim, Seq("k"))
        .select("id", "grp")
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(aware == plain)
    }
  }

  test("skewAwareJoin: NULL-keyed probe rows neither join nor trigger " +
      "salting (inner-join semantics drive the measurement)") {
    import spark.implicits._
    // 90% NULL keys, non-null keys uniform: a measurement that counted
    // NULLs would see one giant bucket and salt pointlessly
    val probe = (1L to 1000L)
      .map(i => (i, if (i <= 900) None else Some(i % 10), i * 1.0))
      .toDF("id", "k", "v")
    val dim = (0L until 10L).map(k => (k, s"g$k")).toDF("k", "grp")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = JoinOps.skewAwareJoin(probe, dim, Seq("k"))
      assert(!df.queryExecution.executedPlan.toString.contains("__salt"))
      assert(df.count() == 100L) // the non-null rows, each matched once
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("skewAwareJoin: an all-NULL or empty probe takes the plain path " +
      "without dividing by zero") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Option[Long], Double)].toDF("id", "k", "v")
    val dim = (0L until 5L).map(k => (k, s"g$k")).toDF("k", "grp")
    assert(JoinOps.skewAwareJoin(empty, dim, Seq("k")).count() == 0L)
    val allNull = (1L to 50L).map(i => (i, None: Option[Long], 1.0))
      .toDF("id", "k", "v")
    assert(JoinOps.skewAwareJoin(allNull, dim, Seq("k")).count() == 0L)
  }
}
