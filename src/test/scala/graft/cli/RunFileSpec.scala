package graft.cli

import java.nio.file.Files
import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** A19 run-file parity: per-file OK/ERROR status, unreadable files and
  * failing files are skipped without aborting later files, statements run
  * in file order with the dialect shim applied.
  */
class RunFileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("run-file: ok / missing / failing files each get the right status") {
    val dir = Files.createTempDirectory("graft-runfile")
    val good = dir.resolve("good.sql")
    // two statements incl. a DuckDB-ism the shim must rewrite
    Files.writeString(good,
      """CREATE OR REPLACE TEMPORARY VIEW rf_v AS
        |  SELECT * FROM VALUES (1), (2), (3) AS t(x);
        |SELECT count() AS n FROM rf_v""".stripMargin)
    val bad = dir.resolve("bad.sql")
    Files.writeString(bad, "SELECT * FROM definitely_missing_table_xyz")
    val missing = dir.resolve("nope.sql").toString
    val after = dir.resolve("after.sql")
    Files.writeString(after, "SELECT 1 AS one")

    val statuses = Main.runFilesOn(spark,
      List(good.toString, missing, bad.toString, after.toString))
    assert(statuses(0)._2 == s"OK: $good")
    assert(statuses(1)._2 == s"Cannot open $missing, skipping")
    assert(statuses(2)._2.startsWith("ERROR: "))
    assert(statuses(2)._2.endsWith(s"Skipping $bad"))
    assert(statuses(3)._2 == s"OK: $after") // later file still ran
    // the good file's view exists in the session
    assert(spark.table("rf_v").count() == 3)
  }

  test("run-file: a script using CREATE MACRO and ASOF JOIN executes") {
    val s = spark.newSession()
    val dir = Files.createTempDirectory("graft-runfile-asof")
    val f = dir.resolve("asof.sql")
    // a DuckDB-dialect script: macro definition, macro use, ASOF JOIN —
    // all statements the reference passes straight to DuckDB
    Files.writeString(f,
      """CREATE OR REPLACE TEMPORARY VIEW clicks AS
        |  SELECT * FROM VALUES (1, 10), (1, 20), (2, 5) AS t(k, ts);
        |CREATE OR REPLACE TEMPORARY VIEW buys AS
        |  SELECT * FROM VALUES (1, 9, 100.0), (1, 15, 200.0) AS t(k, ts, amt);
        |CREATE MACRO doubled(x) AS x * 2;
        |CREATE OR REPLACE TEMPORARY VIEW attributed AS
        |  SELECT c.k, c.ts, doubled(b.amt) AS amt2 FROM clicks c
        |  ASOF JOIN buys b ON c.k = b.k AND c.ts >= b.ts;
        |SELECT count() FROM attributed""".stripMargin)
    val statuses = Main.runFilesOn(s, List(f.toString))
    assert(statuses.head._2 == s"OK: $f", statuses.head._2)
    val rows = s.table("attributed").orderBy("k", "ts")
      .collect() // 100.0 in SQL VALUES is a DECIMAL literal
      .map(r => (r.getInt(0), r.getInt(1), r.getDecimal(2).doubleValue())).toSeq
    // click(1,10)→buy@9, click(1,20)→buy@15, click(2,5)→no match (inner)
    assert(rows == Seq((1, 10, 200.0), (1, 20, 400.0)))
  }

  test("run-file: scripts see views persisted under db_path") {
    // reference parity: run-file executes on the connection opened from
    // the config's db_path, so prior runs' views resolve in scripts
    val db = Files.createTempDirectory("graft-runfile-db")
    graft.pipeline.ViewStore.saveView(Some(db.toString), "persisted_v",
      "SELECT 7 AS seven")
    val s2 = spark.newSession()
    assert(graft.pipeline.ViewStore.restore(s2, db.toString) == 1)
    val f = Files.createTempDirectory("graft-runfile2").resolve("q.sql")
    Files.writeString(f,
      "CREATE OR REPLACE TEMPORARY VIEW got AS SELECT seven FROM persisted_v")
    val statuses = Main.runFilesOn(s2, List(f.toString))
    assert(statuses.head._2 == s"OK: $f")
    assert(s2.table("got").collect().head.getInt(0) == 7)
  }

  test("run-file: SELECT statements execute distributed, never collect()") {
    // A script whose SELECT yields 1M rows must not materialize on the
    // driver. Assert via QueryExecutionListener: the only actions fired
    // while the script runs are v2 writes (the noop sink), no `collect`.
    val dir = Files.createTempDirectory("graft-runfile-big")
    val big = dir.resolve("big.sql")
    // `range` is the DuckDB column name the shim now produces (previously
    // this script leaned on Spark's native `id`)
    Files.writeString(big,
      """CREATE OR REPLACE TEMPORARY VIEW rf_big AS
        |  SELECT range AS id, range * 2 AS twice FROM range(1000000);
        |SELECT * FROM rf_big""".stripMargin)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = seen.add(funcName)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = seen.add("FAIL:" + funcName)
    }
    spark.listenerManager.register(listener)
    try {
      val statuses = Main.runFilesOn(spark, List(big.toString))
      assert(statuses.head._2 == s"OK: $big")
      // listener delivery is async; wait for at least one event
      val deadline = System.currentTimeMillis() + 20000
      while (seen.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      import scala.jdk.CollectionConverters._
      val funcs = seen.asScala.toSet
      assert(funcs.nonEmpty, "listener saw no query executions")
      assert(!funcs.exists(_.contains("collect")),
        s"driver-side collect fired during run-file: $funcs")
    } finally spark.listenerManager.unregister(listener)
  }
}
