package graft.ext

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the branches q58's oracle doesn't reach: DateType
  * columns, all-null columns, and null accounting in the typed-slot
  * distinct pass.
  */
class ProfileOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("mixed-type profile incl. date and all-null columns") {
    import spark.implicits._
    val df = Seq(
      (1, Option(2.0), Option("b"), Option(java.sql.Date.valueOf("2024-01-02"))),
      (2, Option(2.0), Option("a"), Option(java.sql.Date.valueOf("2024-01-05"))),
      (3, Option.empty[Double], Option.empty[String], Option.empty[java.sql.Date]))
      .toDF("id", "v", "s", "d")
      .withColumn("allnull", org.apache.spark.sql.functions.lit(null).cast("double"))
    val p = ProfileOps.profile(df, Seq("id", "v", "s", "d", "allnull"))
      .collect().map(r => r.getString(0) -> r).toMap

    assert(p("id").getAs[String]("col_type") == "numeric")
    assert(p("id").getAs[Long]("n_distinct") == 3)
    assert(p("id").getAs[Double]("min_num") == 1.0)
    assert(p("v").getAs[Long]("n_null") == 1)
    assert(p("v").getAs[Long]("n_distinct") == 1) // nulls don't count
    assert(p("v").getAs[Double]("mean_v") == 2.0)
    assert(p("s").getAs[String]("col_type") == "string")
    assert(p("s").getAs[String]("min_str") == "a")
    assert(p("s").getAs[String]("max_str") == "b")
    assert(p("s").isNullAt(p("s").fieldIndex("min_num")))
    assert(p("d").getAs[String]("col_type") == "date")
    assert(p("d").getAs[String]("min_str") == "2024-01-02")
    assert(p("d").getAs[String]("max_str") == "2024-01-05")
    assert(p("d").getAs[Long]("n_distinct") == 2)
    assert(p("allnull").getAs[Long]("n_null") == 3)
    assert(p("allnull").getAs[Long]("n_distinct") == 0)
  }

  test("empty input profiles with numeric zeros, not NULL counts") {
    import spark.implicits._
    // sum over zero rows is NULL; the profile must report 0 nulls like it
    // already reports 0 distinct
    val df = Seq((1, "a")).toDF("id", "s").filter("id < 0")
    val p = ProfileOps.profile(df, Seq("id", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    for (c <- Seq("id", "s")) {
      assert(p(c).getAs[Long]("n_rows") == 0L)
      assert(p(c).getAs[Long]("n_null") == 0L)
      assert(p(c).getAs[Long]("n_distinct") == 0L)
    }
  }

  test("boolean columns profile as numeric 0/1") {
    import spark.implicits._
    val df = Seq(true, false, true).toDF("b")
    val r = ProfileOps.profile(df, Seq("b")).collect().head
    assert(r.getAs[String]("col_type") == "numeric")
    assert(r.getAs[Double]("min_num") == 0.0)
    assert(r.getAs[Double]("max_num") == 1.0)
    assert(r.getAs[Long]("n_distinct") == 2)
  }

  test("profileNumeric keeps the narrow legacy schema") {
    import spark.implicits._
    val df = Seq((1, 10.0), (2, 30.0)).toDF("k", "x")
    val r = ProfileOps.profileNumeric(df, Seq("x")).collect().head
    assert(r.schema.fieldNames.toSeq ==
      Seq("col_name", "n_rows", "n_null", "n_distinct", "min_v", "max_v", "mean_v"))
    assert(r.getAs[Double]("min_v") == 10.0 && r.getAs[Double]("max_v") == 30.0)
    assert(r.getAs[Double]("mean_v") == 20.0)
  }

  test("profileNumeric coerces numeric strings (original contract)") {
    import spark.implicits._
    val df = Seq("1", "2", "2.0").toDF("amount")
    val r = ProfileOps.profileNumeric(df, Seq("amount")).collect().head
    assert(r.getAs[Double]("min_v") == 1.0 && r.getAs[Double]("max_v") == 2.0)
    assert(r.getAs[Long]("n_distinct") == 2) // "2" and "2.0" parse equal
  }

  test("bigint distinct counts are exact beyond double precision") {
    import spark.implicits._
    // 2^53 and 2^53+1 collapse to one double; the long slot keeps them apart
    val df = Seq(9007199254740992L, 9007199254740993L).toDF("big")
    val r = ProfileOps.profile(df, Seq("big")).collect().head
    assert(r.getAs[Long]("n_distinct") == 2)
  }

  test("column names containing dots profile intact") {
    import spark.implicits._
    val df = Seq((1.5, "x"), (2.5, "y")).toDF("price.usd", "tag")
    val p = ProfileOps.profile(df, Seq("price.usd", "tag")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("price.usd").getAs[Double]("max_num") == 2.5)
    assert(p("price.usd").getAs[Long]("n_distinct") == 2)
    assert(p("tag").getAs[String]("max_str") == "y")
  }

  test("keySkew: heaviest keys first with exact totals; top slice is a " +
      "TakeOrderedAndProject, never a full sort") {
    import spark.implicits._
    // key 1 → 6 rows, key 2 → 3, keys 3..6 → 1 each: 13 rows, 6 keys
    val df = (Seq.fill(6)(1) ++ Seq.fill(3)(2) ++ (3 to 6)).toDF("k")
    val r = ProfileOps.keySkew(df, "k", topN = 3).collect()
    assert(r.map(x => (x.getInt(0), x.getLong(1))).toSeq ==
      Seq((1, 6L), (2, 3L), (3, 1L))) // count desc, key asc tie-break
    assert(r.forall(x => x.getAs[Long]("total_rows") == 13L &&
      x.getAs[Long]("n_keys") == 6L))
    val plan = ProfileOps.keySkew(df, "k", 3).queryExecution
      .executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("wide-profile stress: 500 columns profile in one pass within a " +
      "wall-time bound (the stated '1000-column table → 1000-row result' " +
      "contract), with spot-checked values") {
    // per-column expression count is the de-JIT axis SCALING.md warns
    // about: 500 cols ⇒ ~2500 agg expressions + a 500-wide slot explode.
    // Spark splits generated methods under the JIT's 64KB ceiling; this
    // pins that the whole thing still compiles, runs, and answers
    // correctly at width — measured 22s cold for 500×20k on 8 threads,
    // bounded here with generous headroom against CI contention.
    import org.apache.spark.sql.functions.{col, concat, lit}
    val nCols = 500
    val nRows = 10000L
    val wide = spark.range(0, nRows, 1, 8).select(
      (0 until nCols).map { i =>
        if (i % 5 == 4)
          concat(lit(s"s$i-"), (col("id") % (i + 2)).cast("string")).as(s"c$i")
        else ((col("id") * (i + 1)) % 1000).cast("double").as(s"c$i")
      }: _*)
    val cols = (0 until nCols).map(i => s"c$i")
    val t0 = System.nanoTime()
    val out = ProfileOps.profile(wide, cols).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out.length == nCols, "one row per column")
    assert(secs < 150.0, f"wide profile took $secs%.1f s — de-JIT suspected")
    val byName = out.map(r => r.getString(0) -> r).toMap
    // c1: id*2 % 1000 over 10k rows → 500 distinct even values, max 998
    assert(byName("c1").getAs[Long]("n_rows") == nRows)
    assert(byName("c1").getAs[Long]("n_null") == 0L)
    assert(byName("c1").getAs[Long]("n_distinct") == 500L)
    assert(byName("c1").getAs[Double]("max_num") == 998.0)
    // c4 is a string column: id % 6 prefixed → 6 distinct values
    assert(byName("c4").getAs[String]("col_type") == "string")
    assert(byName("c4").getAs[Long]("n_distinct") == 6L)
    // c0: id*1 % 1000 → 1000 distinct, mean 499.5
    assert(byName("c0").getAs[Long]("n_distinct") == 1000L)
    assert(byName("c0").getAs[Double]("mean_v") == 499.5)
  }

  test("snapshotDiff: added/removed/changed/unchanged, multi-column " +
      "content, payload never crosses the join") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val oldSnap = Seq(
      (1L, "alpha", "en"), (2L, "beta", "en"),
      (3L, "gamma", "de"), (4L, "delta", "en")
    ).toDF("doc_id", "text", "lang")
    val newSnap = Seq(
      (2L, "beta", "en"),        // unchanged
      (3L, "gamma", "fr"),       // changed via the SECOND content column
      (4L, "delta!", "en"),      // changed via text
      (5L, "epsilon", "en")      // added
    ).toDF("doc_id", "text", "lang")
    val d = ProfileOps.snapshotDiff(oldSnap, newSnap, "doc_id",
      Seq("text", "lang"))
    val byId = d.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "changed", 5L -> "added"))
    // the fingerprint must be computed BELOW the join: the join operator's
    // own output carries only the key and the two 16-byte hashes, so the
    // payload never rides the exchange
    val plan = d.queryExecution.executedPlan.toString()
    assert(!plan.contains("FileScan"), "fixture-free test precondition")
    val joinLine = plan.linesIterator
      .find(l => l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
    assert(joinLine.isDefined, s"expected a shuffle join:\n$plan")
  }

  test("snapshotDiff NULL semantics: NULL→'' is a change (separator " +
      "survives the empty string), value-swap across nullable columns " +
      "is the documented blind spot") {
    import spark.implicits._
    val oldSnap = Seq((1L, Option("x"), Option("en")),
      (2L, None: Option[String], Option("en")),
      (3L, Option("x"), None: Option[String]))
      .toDF("doc_id", "text", "lang")
    val newSnap = Seq((1L, Option("x"), Option("en")),
      (2L, Option(""), Option("en")),   // NULL→'': separator appears
      (3L, None: Option[String], Option("x"))) // swap: same fingerprint
      .toDF("doc_id", "text", "lang")
    val byId = ProfileOps.snapshotDiff(oldSnap, newSnap, "doc_id",
        Seq("text", "lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "unchanged"))
  }

  test("calibrationReport: hand-computed reliability buckets and ECE; " +
      "score 1.0 clamps into the top bucket; NaN scores, NULL scores " +
      "and NULL labels are excluded; the summary row carries ECE") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq[(java.lang.Double, java.lang.Boolean)](
      (0.95, true), (1.0, true),            // bucket 9 (1.0 clamps)
      (0.85, true),                         // bucket 8
      (0.55, true),                         // bucket 5
      (0.45, false),                        // bucket 4
      (0.15, false),                        // bucket 1
      (0.05, false),                        // bucket 0
      (Double.NaN, true), (null, true), (0.5, null) // all excluded
    ).toDF("score", "label")
    val r = ProfileOps.calibrationReport(rows, col("score"), col("label"))
      .orderBy("bucket").collect()
      .map(x => x.getInt(0) -> ((x.getLong(1), x.getLong(2),
        x.getDouble(3), x.getDouble(4), x.getDouble(5)))).toMap
    assert(r.keySet == Set(-1, 0, 1, 4, 5, 8, 9))
    // bucket 9: micro sum 1950000 over 2 rows → mean 0.975, gap 0.025
    assert(r(9) == ((2L, 2L, 1.0, 0.975, 0.025)))
    assert(r(8) == ((1L, 1L, 1.0, 0.85, 0.15)))
    assert(r(5) == ((1L, 1L, 1.0, 0.55, 0.45)))
    assert(r(4) == ((1L, 0L, 0.0, 0.45, 0.45)))
    assert(r(1) == ((1L, 0L, 0.0, 0.15, 0.15)))
    assert(r(0) == ((1L, 0L, 0.0, 0.05, 0.05)))
    // summary: N=7, pos=4; ECE = Σgap_u/(10⁶·N) = 1300000/7000000,
    // integer-rounded half-up at 6 → 0.185714
    assert(r(-1) == ((7L, 4L, 0.571429, 0.571429, 0.185714)))
  }

  test("calibrationReport validates nBuckets loudly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val d = Seq((0.5, true)).toDF("score", "label")
    def msg(n: Int): String = intercept[IllegalArgumentException](
      ProfileOps.calibrationReport(d, col("score"), col("label"), n))
      .getMessage
    assert(msg(0).contains("not in 1..10000"))
    assert(msg(10001).contains("not in 1..10000"))
  }
}
