package graft.pipeline

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** dbt `retry` E2E: the run ledger records every node's status, and a
  * retry re-executes EXACTLY the failed + forced-skipped set under the
  * recorded flags — never the successes, and consecutive retries
  * converge to an empty set.
  */
class RetrySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def fixture(models: Map[String, String], configExtra: String = "",
                      dbPath: Path): (Path, PipelineConfig) = {
    val dir = Files.createTempDirectory("graft-retry")
    val modelsDir = dir.resolve("models"); Files.createDirectories(modelsDir)
    models.foreach { case (name, sql) =>
      Files.writeString(modelsDir.resolve(s"$name.sql"), sql) }
    Files.writeString(dir.resolve("config.yaml"),
      s"""models_dir: $modelsDir
         |db_path: $dbPath
         |$configExtra""".stripMargin)
    (modelsDir, PipelineConfig.load(dir.resolve("config.yaml")))
  }

  private def dropAll(ids: String*): Unit = ids.foreach { id =>
    spark.catalog.dropTempView(id)
    ViewStore.dropTableClearingLocation(spark, id)
  }

  test("retry re-runs exactly the failed node and its skipped " +
      "descendant, re-applying the recorded vars; a second retry " +
      "has nothing to do") {
    val db = Files.createTempDirectory("graft-retry-db")
    dropAll("rt_a", "rt_b", "rt_c")
    val (modelsDir, cfg) = fixture(Map(
      "rt_a" -> (s"SELECT * FROM read_parquet('$sfDir/nation.parquet') " +
        "LIMIT {{ var('lim') }}"),
      "rt_b" -> "SELECT no_such_column FROM rt_a",
      "rt_c" -> "SELECT count() AS n FROM rt_b"), dbPath = db)

    val r1 = new PipelineSession(spark, cfg,
      cliVars = Map("lim" -> "7")).runNodes()
    assert(r1.errors.size == 1)
    assert(r1.results.map(r => r.id -> (r.error.nonEmpty ||
      r.status.startsWith("SKIP"))).toMap ==
      Map("rt_a" -> false, "rt_b" -> true, "rt_c" -> true))

    // the ledger names the failed node and its forced skip, in order,
    // and carries the vars
    val p1 = Retry.plan(cfg).get
    assert(p1.ids == Seq("rt_b", "rt_c"))
    assert(p1.flags.get("var:lim").contains("7"))

    // fix the broken model, then retry: ONLY rt_b and rt_c run (rt_a is
    // not re-executed), and the var renders in the retried subgraph's
    // upstream read (rt_a's temp view from the first run still serves)
    Files.writeString(modelsDir.resolve("rt_b.sql"),
      "SELECT n_nationkey FROM rt_a")
    val r2 = Retry.session(spark, cfg, p1).runNodes()
    assert(r2.errors.isEmpty, r2.errors.mkString("; "))
    assert(r2.results.map(_.id) == Seq("rt_b", "rt_c"))
    assert(spark.table("rt_c").collect().map(_.getLong(0)).toSeq == Seq(7L))

    // the retry overwrote the ledger: nothing left to retry
    val p2 = Retry.plan(cfg).get
    assert(p2.ids.isEmpty)
    dropAll("rt_a", "rt_b", "rt_c")
  }

  test("no recorded run -> plan is None; no db_path -> fails NAMED") {
    val db = Files.createTempDirectory("graft-retry-db2")
    val (_, cfg) = fixture(Map("rt_x" -> "SELECT 1 AS one"), dbPath = db)
    assert(Retry.plan(cfg).isEmpty)
    val noDb = cfg.copy(dbPath = None)
    val e = intercept[GenericError](Retry.plan(noDb))
    assert(e.render.contains("db_path"))
  }

  test("fail-fast aborts are retried too, under the recorded flag") {
    val db = Files.createTempDirectory("graft-retry-db3")
    dropAll("rt_p", "rt_q", "rt_r")
    // rt_p fails; rt_q/rt_r are INDEPENDENT but abort under --fail-fast
    val (modelsDir, cfg) = fixture(Map(
      "rt_p" -> "SELECT no_such_column FROM nowhere_at_all",
      "rt_q" -> "SELECT 2 AS two",
      "rt_r" -> "SELECT 3 AS three"), dbPath = db)
    val r1 = new PipelineSession(spark, cfg, failFast = true).runNodes()
    assert(r1.errors.size == 1)
    val p1 = Retry.plan(cfg).get
    val succeeded = r1.results.filter(r => r.error.isEmpty &&
      !r.status.startsWith("SKIP")).map(_.id).toSet
    assert(p1.ids.toSet == Set("rt_p", "rt_q", "rt_r") -- succeeded,
      s"retry set ${p1.ids} vs results ${r1.results}")
    assert(p1.flags.get("fail-fast").contains("true"))
    // fix and retry: everything recorded as failed/aborted re-runs
    Files.writeString(modelsDir.resolve("rt_p.sql"), "SELECT 1 AS one")
    val r2 = Retry.session(spark, cfg, p1).runNodes()
    assert(r2.errors.isEmpty, r2.errors.mkString("; "))
    assert(r2.results.map(_.id).toSet == p1.ids.toSet)
    assert(Retry.plan(cfg).get.ids.isEmpty)
    dropAll("rt_p", "rt_q", "rt_r")
  }
}
