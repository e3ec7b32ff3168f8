package graft.pipeline

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** dbt 1.6 `clone` E2E: state artifacts copy into the local db_path as
  * INDEPENDENT relations (prod mutations after the clone must not show
  * through), the skip-existing rule holds unless --full-refresh, and a
  * wanted-but-absent id reports missing.
  *
  * Like DeferStateSpec, the shared test session stands in for prod and
  * dev, so scenarios copy prod table parquet into the state dir (the
  * CLI's warehouse == db_path layout) and drop catalog registrations
  * between the "sessions".
  */
class CloneSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def fixture(models: Map[String, String], configExtra: String = "",
                      dbPath: Path): PipelineConfig = {
    val dir = Files.createTempDirectory("graft-clone")
    val modelsDir = dir.resolve("models"); Files.createDirectories(modelsDir)
    models.foreach { case (name, sql) =>
      Files.writeString(modelsDir.resolve(s"$name.sql"), sql) }
    Files.writeString(dir.resolve("config.yaml"),
      s"""models_dir: $modelsDir
         |db_path: $dbPath
         |$configExtra""".stripMargin)
    PipelineConfig.load(dir.resolve("config.yaml"))
  }

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

  /** Simulate a fresh session: drop catalog registrations ONLY (a real
    * new session starts with an empty catalog but the warehouse data
    * still on disk — clearing locations here would delete the very
    * artifacts the restore under test reads).
    */
  private def dropCatalogOnly(ids: String*): Unit = ids.foreach { id =>
    spark.catalog.dropTempView(id)
    spark.sql(s"DROP TABLE IF EXISTS `$id`")
    ()
  }

  private def rmTree(p: Path): Unit = {
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.delete(f))
    finally s.close()
  }

  test("clone copies a table and its dependent view into the local " +
      "db_path; the copy is INDEPENDENT of the state; a re-clone " +
      "skips existing ids unless --full-refresh; absent ids report " +
      "missing") {
    val state = Files.createTempDirectory("graft-clone-state")
    val localDb = Files.createTempDirectory("graft-clone-local")
    dropAll("cl_base", "cl_top")
    val models = Map(
      "cl_base" -> (s"SELECT * FROM " +
        s"read_parquet('$sfDir/nation.parquet') LIMIT 6"),
      "cl_top" -> "SELECT count() AS n FROM cl_base")
    val extra =
      """models:
        |  cl_base:
        |    materialize: table""".stripMargin
    // "prod" run into the state dir
    val prod = new PipelineSession(spark,
      fixture(models, extra, dbPath = state)).runNodes()
    assert(prod.errors.isEmpty, prod.errors.mkString("; "))
    copyTableToState("cl_base", state)
    // fresh "dev session": nothing registered
    dropAll("cl_base", "cl_top")

    val (cloned, skipped, missing) = ViewStore.cloneFromState(
      spark, state.toString, Some(localDb.toString), ids = None)
    assert(cloned.sorted == Seq("cl_base", "cl_top"), cloned)
    assert(skipped.isEmpty && missing.isEmpty)
    assert(spark.table("cl_base").count() == 6)
    assert(spark.table("cl_top").collect()(0).getLong(0) == 6L)

    // independence: delete the STATE's table data — the local clone
    // still reads (a defer-style pointer would now break)
    rmTree(state.resolve("cl_base"))
    assert(spark.table("cl_base").count() == 6)

    // the local store can rebuild a fresh session from the clones alone
    dropCatalogOnly("cl_base", "cl_top")
    ViewStore.restore(spark, localDb.toString)
    assert(spark.table("cl_base").count() == 6)
    assert(spark.table("cl_top").collect()(0).getLong(0) == 6L)

    // skip-existing (dbt's rule): everything present -> all skipped...
    val (c2, s2, m2) = ViewStore.cloneFromState(
      spark, state.toString, Some(localDb.toString), ids = None)
    assert(c2.isEmpty && m2.isEmpty && s2.sorted == Seq("cl_base", "cl_top"))
    // ...and --full-refresh replaces: the view re-clones; the table
    // FAILS to copy (its state data was deleted above) and reports
    // missing — loudly, AND without destroying the existing local
    // copy (the staged-copy swap discipline: the broken source is
    // detected before anything local is dropped)
    val (c3, s3, m3) = ViewStore.cloneFromState(
      spark, state.toString, Some(localDb.toString), ids = None,
      fullRefresh = true)
    assert(s3.isEmpty, s3)
    assert(c3.contains("cl_top"))
    assert(m3 == Set("cl_base"), m3)
    assert(spark.table("cl_base").count() == 6)

    // a wanted id the state never had reports missing up front
    val (c4, _, m4) = ViewStore.cloneFromState(
      spark, state.toString, Some(localDb.toString),
      ids = Some(Set("cl_nowhere")))
    assert(c4.isEmpty && m4 == Set("cl_nowhere"))
    dropAll("cl_base", "cl_top")
  }
}
