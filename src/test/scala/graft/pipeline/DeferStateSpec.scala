package graft.pipeline

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** dbt `--defer --state <dir>` E2E (VERDICT r18 task 4): unselected refs
  * resolve from a PRIOR run's db_path artifacts — the other half of the
  * slim-CI workflow (build only what changed, defer the rest).
  *
  * The shared test session stands in for both the "prod" and the "dev"
  * session, so each scenario drops prod's catalog registrations before
  * the defer run (a real dev session starts empty) and copies prod's
  * table parquet under the state dir (the CLI builds Spark with
  * warehouse == db_path, so a real prod state dir already holds it —
  * the shared test session's warehouse is fixed elsewhere).
  */
class DeferStateSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def fixture(models: Map[String, String], configExtra: String = "",
                      dbPath: Path): PipelineConfig = {
    val dir = Files.createTempDirectory("graft-defer")
    val modelsDir = dir.resolve("models"); Files.createDirectories(modelsDir)
    models.foreach { case (name, sql) =>
      Files.writeString(modelsDir.resolve(s"$name.sql"), sql) }
    Files.writeString(dir.resolve("config.yaml"),
      s"""models_dir: $modelsDir
         |db_path: $dbPath
         |$configExtra""".stripMargin)
    PipelineConfig.load(dir.resolve("config.yaml"))
  }

  /** Simulate the CLI's warehouse==db_path layout: copy a table's data
    * from the shared session warehouse into the state dir.
    */
  private def copyTableToState(id: String, stateDir: Path): Unit = {
    val src = ViewStore.warehouseLocation(spark, id)
    val dst = stateDir.resolve(id.toLowerCase(java.util.Locale.ROOT))
    val s = Files.walk(src)
    try s.forEach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t); () }
    } finally s.close()
  }

  private def dropAll(ids: String*): Unit = ids.foreach { id =>
    spark.catalog.dropTempView(id)
    ViewStore.dropTableClearingLocation(spark, id)
  }

  test("deferred table ref reads the prior state's artifact while the " +
      "selected node builds fresh") {
    val state = Files.createTempDirectory("graft-state")
    val models = Map(
      "dfr_base" ->
        (s"SELECT * FROM read_parquet('$sfDir/nation.parquet') " +
          "LIMIT {{ var('lim') }}"),
      "dfr_top" ->
        "SELECT count() AS n FROM dfr_base")
    val extra =
      """models:
        |  dfr_base:
        |    materialize: table""".stripMargin
    // "prod" run into the state dir with lim=10
    dropAll("dfr_base", "dfr_top")
    val prodCfg = fixture(models, extra, dbPath = state)
    val prod = new PipelineSession(spark, prodCfg,
      cliVars = Map("lim" -> "10"))
    assert(prod.runNodes().errors.isEmpty)
    copyTableToState("dfr_base", state)

    // "dev" session: fresh catalog, DIFFERENT var (lim=3), but only
    // dfr_top selected with --defer --state: dfr_base must come from
    // prod's 10-row artifact, NOT rebuild at 3
    dropAll("dfr_base", "dfr_top")
    val devDb = Files.createTempDirectory("graft-dev")
    val devCfg = fixture(models, extra, dbPath = devDb)
    val dev = new PipelineSession(spark, devCfg,
      selectors = Seq("dfr_top"), cliVars = Map("lim" -> "3"),
      deferEnabled = true, stateDir = Some(state.toString))
    val report = dev.runNodes()
    assert(report.errors.isEmpty, report.errors.mkString("; "))
    assert(report.results.map(_.id) == Seq("dfr_top"))
    assert(spark.table("dfr_top").collect()(0).getLong(0) == 10L,
      "deferred ref must read prod's 10-row state, not rebuild at lim=3")
    dropAll("dfr_base", "dfr_top")
  }

  test("deferred VIEW refs restore transitively (ancestor closure) from " +
      "the state's stored SELECTs") {
    val state = Files.createTempDirectory("graft-state")
    val models = Map(
      "dfv_src" ->
        s"SELECT n_nationkey, n_name FROM read_parquet('$sfDir/nation.parquet')",
      "dfv_mid" -> "SELECT n_nationkey FROM dfv_src WHERE n_nationkey < 5",
      "dfv_out" -> "SELECT count() AS n FROM dfv_mid")
    dropAll("dfv_src", "dfv_mid", "dfv_out")
    val prod = new PipelineSession(spark, fixture(models, dbPath = state))
    assert(prod.runNodes().errors.isEmpty)

    // dev: select only the leaf; BOTH ancestors must defer (dfv_mid's
    // stored SELECT references dfv_src by name)
    dropAll("dfv_src", "dfv_mid", "dfv_out")
    val dev = new PipelineSession(spark,
      fixture(models, dbPath = Files.createTempDirectory("graft-dev")),
      selectors = Seq("dfv_out"),
      deferEnabled = true, stateDir = Some(state.toString))
    assert(dev.runNodes().errors.isEmpty)
    assert(spark.table("dfv_out").collect()(0).getLong(0) == 5L)
    dropAll("dfv_src", "dfv_mid", "dfv_out")
  }

  test("a needed ref missing from the state fails NAMED before anything " +
      "executes") {
    val emptyState = Files.createTempDirectory("graft-state-empty")
    val models = Map(
      "dfm_base" -> s"SELECT * FROM read_parquet('$sfDir/region.parquet')",
      "dfm_top" -> "SELECT count() AS n FROM dfm_base")
    dropAll("dfm_base", "dfm_top")
    val dev = new PipelineSession(spark,
      fixture(models, dbPath = Files.createTempDirectory("graft-dev")),
      selectors = Seq("dfm_top"),
      deferEnabled = true, stateDir = Some(emptyState.toString))
    val e = intercept[GenericError](dev.runNodes())
    assert(e.msg.contains("dfm_base") && e.msg.contains("--state"))
    dropAll("dfm_base", "dfm_top")
  }

  test("--state re-bases state:modified: only models whose closure " +
      "fingerprint differs from the STATE's base select") {
    val state = Files.createTempDirectory("graft-state")
    val models = Map(
      "dsm_a" -> s"SELECT * FROM read_parquet('$sfDir/region.parquet')",
      "dsm_b" -> "SELECT count() AS n FROM dsm_a")
    dropAll("dsm_a", "dsm_b")
    val prod = new PipelineSession(spark, fixture(models, dbPath = state))
    assert(prod.runNodes().errors.isEmpty)

    // unchanged project vs the state: state:modified resolves EMPTY
    val devDb = Files.createTempDirectory("graft-dev")
    val s1 = new PipelineSession(spark, fixture(models, dbPath = devDb),
      selectors = Seq("state:modified"), stateDir = Some(state.toString))
    val (o1, m1) = s1.buildGraph()
    assert(s1.selectionSet(o1, m1).contains(Set.empty[String]))

    // edit the leaf only: exactly it selects (vs the state, even though
    // the dev db_path has NO fingerprints at all)
    val models2 = models + ("dsm_b" ->
      "SELECT count() AS n2 FROM dsm_a")
    val s2 = new PipelineSession(spark, fixture(models2, dbPath = devDb),
      selectors = Seq("state:modified"), stateDir = Some(state.toString))
    val (o2, m2) = s2.buildGraph()
    assert(s2.selectionSet(o2, m2).contains(Set("dsm_b")))
    dropAll("dsm_a", "dsm_b")
  }

  test("slim CI composed: state:modified selection + --defer builds only " +
      "the edited leaf against prod's upstream") {
    val state = Files.createTempDirectory("graft-state")
    val models = Map(
      "dci_base" ->
        (s"SELECT * FROM read_parquet('$sfDir/nation.parquet') LIMIT 7"),
      "dci_leaf" -> "SELECT count() AS n FROM dci_base")
    val extra =
      """models:
        |  dci_base:
        |    materialize: table""".stripMargin
    dropAll("dci_base", "dci_leaf")
    val prod = new PipelineSession(spark, fixture(models, extra, state))
    assert(prod.runNodes().errors.isEmpty)
    copyTableToState("dci_base", state)

    dropAll("dci_base", "dci_leaf")
    val models2 = models + ("dci_leaf" ->
      "SELECT count() * 2 AS n FROM dci_base")
    val dev = new PipelineSession(spark,
      fixture(models2, extra, Files.createTempDirectory("graft-dev")),
      selectors = Seq("state:modified"),
      deferEnabled = true, stateDir = Some(state.toString))
    val report = dev.runNodes()
    assert(report.errors.isEmpty, report.errors.mkString("; "))
    assert(report.results.map(_.id) == Seq("dci_leaf"),
      "only the edited leaf may build; the base defers")
    assert(spark.table("dci_leaf").collect()(0).getLong(0) == 14L)
    dropAll("dci_base", "dci_leaf")
  }

  test("--defer without --state is rejected") {
    val e = intercept[IllegalArgumentException] {
      new PipelineSession(spark,
        fixture(Map("x" -> "SELECT 1"),
          dbPath = Files.createTempDirectory("graft-dev")),
        deferEnabled = true)
    }
    assert(e.getMessage.contains("--state"))
  }
}
