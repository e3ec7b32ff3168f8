package graft.pipeline

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** dbt 1.9 `incremental_strategy: microbatch` E2E (VERDICT r18 task 5):
  * event-time windowed batches over an events-shaped source, each window
  * an insert_overwrite partition swap. The parity contract: a microbatch
  * incremental run converges on EXACTLY what --full-refresh would build.
  */
class MicrobatchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def writeSource(dir: Path, rows: Seq[(Long, String, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("ev_id", "ts_s", "amount")
      .selectExpr("ev_id", "CAST(ts_s AS TIMESTAMP) AS ts", "amount")
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)
  }

  private def fixture(srcDir: Path, dbPath: Path,
                      lookback: Option[Int] = None): PipelineConfig = {
    val dir = Files.createTempDirectory("graft-mb")
    val modelsDir = dir.resolve("models"); Files.createDirectories(modelsDir)
    Files.writeString(modelsDir.resolve("mb_events.sql"),
      s"""SELECT ev_id, ts, amount, CAST(ts AS DATE) AS d
         |FROM read_parquet('$srcDir')""".stripMargin)
    Files.writeString(dir.resolve("config.yaml"),
      s"""models_dir: $modelsDir
         |db_path: $dbPath
         |models:
         |  mb_events:
         |    materialize: incremental
         |    incremental_strategy: microbatch
         |    event_time: ts
         |    batch_size: day
         |    partition_by: d
         |${lookback.fold("")(n => s"    lookback: $n")}""".stripMargin)
    PipelineConfig.load(dir.resolve("config.yaml"))
  }

  private def tableRows(): Set[(Long, String, Long, String)] =
    spark.table("mb_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2),
        r.getDate(3).toString)).toSet

  private def run(config: PipelineConfig, fullRefresh: Boolean = false,
                  start: Option[String] = None,
                  end: Option[String] = None): Unit = {
    val s = new PipelineSession(spark, config, fullRefresh = fullRefresh,
      eventTimeStart = start, eventTimeEnd = end)
    val r = s.runNodes()
    assert(r.errors.isEmpty, r.errors.mkString("; "))
  }

  private def drop(): Unit = {
    spark.catalog.dropTempView("mb_events")
    ViewStore.dropTableClearingLocation(spark, "mb_events")
  }

  private val day1 = Seq(
    (1L, "2026-01-01 08:00:00", 10L), (2L, "2026-01-01 17:30:00", 20L))
  private val day2 = Seq(
    (3L, "2026-01-02 09:00:00", 30L), (4L, "2026-01-02 23:59:59", 40L))
  private val day3a = Seq((5L, "2026-01-03 05:00:00", 50L))

  test("bootstrap + default-window incremental run == full refresh " +
      "bit-for-bit (late rows in the latest batch land; new batches " +
      "append; untouched partitions never move)") {
    drop()
    val src = Files.createTempDirectory("graft-mb-src")
    val cfg = fixture(src, Files.createTempDirectory("graft-mb-db"))
    writeSource(src, day1 ++ day2 ++ day3a)
    run(cfg) // bootstrap: full history, partitioned by d

    // upstream evolves: a LATE day-3 row, a MODIFIED day-3 row, and two
    // new day-4/day-5 batches; days 1-2 untouched
    val evolved = day1 ++ day2 ++ Seq(
      (5L, "2026-01-03 05:00:00", 55L), // modified in-window
      (6L, "2026-01-03 21:00:00", 60L), // late arrival
      (7L, "2026-01-04 01:00:00", 70L),
      (8L, "2026-01-05 12:00:00", 80L))
    writeSource(src, evolved)
    run(cfg) // default lookback=1: trunc(max ts in target)=day3 onward
    val incremental = tableRows()

    drop()
    run(cfg, fullRefresh = true)
    assert(incremental == tableRows(),
      "microbatch incremental must converge on the full-refresh result")
    assert(incremental.exists(r => r._1 == 5L && r._3 == 55L))
    assert(incremental.size == 8)
    drop()
  }

  test("lookback widens the default window to earlier batches") {
    drop()
    val src = Files.createTempDirectory("graft-mb-src")
    val cfg = fixture(src, Files.createTempDirectory("graft-mb-db"),
      lookback = Some(2))
    writeSource(src, day1 ++ day2 ++ day3a)
    run(cfg)
    // a late DAY-2 row: outside lookback=1's window, inside lookback=2's
    writeSource(src, day1 ++ day2 ++ day3a :+
      (9L, "2026-01-02 12:00:00", 90L))
    run(cfg)
    assert(tableRows().exists(_._1 == 9L),
      "lookback=2 must reprocess the day-2 window")
    drop()
  }

  test("backfill: --event-time-start/--event-time-end reprocesses exactly " +
      "the named windows and leaves the others alone") {
    drop()
    val src = Files.createTempDirectory("graft-mb-src")
    val cfg = fixture(src, Files.createTempDirectory("graft-mb-db"))
    writeSource(src, day1 ++ day2 ++ day3a)
    run(cfg)
    // rewrite history for days 1 AND 3 in the source, but backfill ONLY
    // day 1: day 3 must keep its OLD contents, day 1 swaps
    writeSource(src, Seq(
      (1L, "2026-01-01 08:00:00", 11L), (2L, "2026-01-01 17:30:00", 21L))
      ++ day2 ++ Seq((5L, "2026-01-03 05:00:00", 59L)))
    run(cfg, start = Some("2026-01-01"), end = Some("2026-01-02"))
    val rows = tableRows()
    assert(rows.exists(r => r._1 == 1L && r._3 == 11L), "day 1 swapped")
    assert(rows.exists(r => r._1 == 5L && r._3 == 50L),
      "day 3 outside the backfill window must not move")
    drop()
  }

  test("a window whose fresh SELECT has no rows drops its partition " +
      "(disappeared upstream data converges on full refresh)") {
    drop()
    val src = Files.createTempDirectory("graft-mb-src")
    val cfg = fixture(src, Files.createTempDirectory("graft-mb-db"))
    writeSource(src, day1 ++ day2 ++ day3a)
    run(cfg)
    // upstream deletes day 2 wholesale; backfill days 2-3
    writeSource(src, day1 ++ day3a)
    run(cfg, start = Some("2026-01-02"), end = Some("2026-01-04"))
    val incremental = tableRows()
    drop()
    run(cfg, fullRefresh = true)
    assert(incremental == tableRows())
    assert(!incremental.exists(_._4 == "2026-01-02"))
    drop()
  }

  test("microbatch misconfiguration fails NAMED") {
    drop()
    val src = Files.createTempDirectory("graft-mb-src")
    writeSource(src, day1)
    // missing event_time
    val dir = Files.createTempDirectory("graft-mb-bad")
    val modelsDir = dir.resolve("models"); Files.createDirectories(modelsDir)
    Files.writeString(modelsDir.resolve("mb_events.sql"),
      s"SELECT ev_id, ts, amount, CAST(ts AS DATE) AS d " +
        s"FROM read_parquet('$src')")
    Files.writeString(dir.resolve("config.yaml"),
      s"""models_dir: $modelsDir
         |db_path: ${Files.createTempDirectory("graft-mb-db")}
         |models:
         |  mb_events:
         |    materialize: incremental
         |    incremental_strategy: microbatch
         |    partition_by: d""".stripMargin)
    val cfg = PipelineConfig.load(dir.resolve("config.yaml"))
    run(cfg) // bootstrap never consults the strategy
    val s2 = new PipelineSession(spark, cfg)
    val r2 = s2.runNodes()
    assert(r2.errors.exists(_.render.contains("event_time")),
      r2.errors.mkString("; "))
    drop()
  }

  test("a non-timestamp --event-time-start fails NAMED, never as a " +
      "SQL parse error") {
    drop()
    val src = Files.createTempDirectory("graft-mb-src")
    writeSource(src, day1)
    val db = Files.createTempDirectory("graft-mb-db")
    val cfg = fixture(src, db)
    run(cfg) // bootstrap
    val s2 = new PipelineSession(spark, cfg,
      eventTimeStart = Some("not-a'timestamp"))
    val r2 = s2.runNodes()
    assert(r2.errors.exists { e =>
      e.render.contains("--event-time-start") &&
        e.render.contains("cannot parse")
    }, r2.errors.mkString("; "))
    drop()
  }
}
