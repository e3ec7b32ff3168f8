package graft.pipeline

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** dbt 1.8 unit tests (mock inputs → expected rows, run BEFORE the
  * model materializes) and enforced model contracts (declared
  * columns/types checked before the swap publishes) — VERDICT r17
  * tasks 6 and 7.
  */
class UnitTestContractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  // -- unit tests ------------------------------------------------------

  test("unit tests: pass gates nothing, a logic failure gates the node " +
      "BEFORE it materializes and skips downstream; ledger holds every " +
      "outcome; `run` skips unit tests (dbt semantics)") {
    val db = Files.createTempDirectory("graft-ut-db")
    val dir = Files.createTempDirectory("graft-ut")
    val modelsDir = dir.resolve("models"); Files.createDirectories(modelsDir)
    Files.writeString(modelsDir.resolve("ut_src.sql"),
      s"SELECT r_regionkey AS id, r_name AS nm " +
        s"FROM read_parquet('$sfDir/region.parquet')")
    Files.writeString(modelsDir.resolve("ut_agg.sql"),
      "SELECT id % 2 AS bucket, count() AS n FROM ut_src GROUP BY 1")
    Files.writeString(modelsDir.resolve("ut_leaf.sql"),
      "SELECT sum(n) AS total FROM ut_agg")
    def cfg(expectRows: String): PipelineConfig = {
      Files.writeString(dir.resolve("config.yaml"),
        s"""models_dir: $modelsDir
           |db_path: $db
           |models:
           |  ut_agg:
           |    materialize: table
           |    unit_tests:
           |      - name: buckets
           |        given:
           |          - input: ut_src
           |            rows:
           |              - {id: 1, nm: a}
           |              - {id: 2, nm: b}
           |              - {id: 3, nm: c}
           |        expect:
           |          rows:
           |$expectRows""".stripMargin)
      PipelineConfig.load(dir.resolve("config.yaml"))
    }
    // correct expectation: 2 odd ids, 1 even — note YAML ints match the
    // model's BIGINT counts through the numeric canonicalization
    val okCfg = cfg(
      """            - {bucket: 1, n: 2}
        |            - {bucket: 0, n: 1}""".stripMargin)
    assert(okCfg.models("ut_agg").unitTests.size == 1)
    val s1 = new PipelineSession(spark, okCfg, buildMode = true)
    val r1 = s1.runNodes()
    assert(r1.errors.isEmpty, r1.errors.map(_.render))
    assert(s1.collectedTests.exists(t =>
      t._1 == "ut_agg" && t._2.startsWith("unit_test(buckets#") &&
        t._3.isEmpty))

    // wrong expectation: the node fails BEFORE materializing (the table
    // from the previous green build survives untouched) and downstream
    // skips
    val before = spark.table("ut_agg").collect().toSet
    val badCfg = cfg("            - {bucket: 1, n: 99}")
    val s2 = new PipelineSession(spark, badCfg, buildMode = true)
    val r2 = s2.runNodes()
    val st2 = r2.results.map(r => r.id -> r.status).toMap
    assert(st2("ut_agg") == "ERROR", st2)
    assert(st2("ut_leaf") == "SKIP upstream failed", st2)
    assert(r2.errors.exists(_.render.contains("1 of 1 unit tests failed")),
      r2.errors.map(_.render))
    assert(spark.table("ut_agg").collect().toSet == before,
      "a failing unit test must not republish the table")
    // the ledger names the failing unit test with the row diff
    val led = s2.collectedTests.find(_._1 == "ut_agg").get
    assert(led._3.exists(_.getMessage.contains("missing: (1, 99)")),
      led._3.map(_.getMessage))

    // plain `run` skips unit tests: the same bad config runs green
    val r3 = new PipelineSession(spark, badCfg).runNodes()
    assert(r3.errors.isEmpty, r3.errors.map(_.render))

    // `graft test` (runTestsOnly) includes the unit rows
    val rows = new PipelineSession(spark, badCfg).runTestsOnly()
    val utRow = rows.find(_._2.startsWith("unit_test(buckets#"))
    assert(utRow.exists(_._3.nonEmpty), rows)

    // editing the EXPECT rows alone re-executes under --changed-only
    // (unit tests fold into the closure fingerprint)
    val s4 = new PipelineSession(spark, okCfg, buildMode = true,
      changedOnly = true)
    val r4 = s4.runNodes()
    assert(r4.results.find(_.id == "ut_agg").get.status != "SKIP unchanged")
    val s5 = new PipelineSession(spark, okCfg, buildMode = true,
      changedOnly = true)
    val r5 = s5.runNodes()
    assert(r5.results.find(_.id == "ut_agg").get.status == "SKIP unchanged",
      r5.results)
  }

  test("unit tests: unmocked and over-mocked inputs fail NAMED as broken " +
      "tests; partial rows are NULL; empty expect means empty output") {
    val dir = Files.createTempDirectory("graft-ut2")
    val modelsDir = dir.resolve("models"); Files.createDirectories(modelsDir)
    Files.writeString(modelsDir.resolve("u2_a.sql"), "SELECT 1 AS x")
    Files.writeString(modelsDir.resolve("u2_b.sql"), "SELECT 2 AS x")
    Files.writeString(modelsDir.resolve("u2_join.sql"),
      "SELECT a.x AS ax, b.x AS bx FROM u2_a a JOIN u2_b b ON a.x < b.x")
    def cfg(body: String): PipelineConfig = {
      Files.writeString(dir.resolve("config.yaml"),
        s"""models_dir: $modelsDir
           |models:
           |  u2_join:
           |    unit_tests:
           |$body""".stripMargin)
      PipelineConfig.load(dir.resolve("config.yaml"))
    }
    // missing mock for u2_b
    val missing = cfg(
      """      - name: half_mocked
        |        given:
        |          - input: u2_a
        |            rows: [{x: 1}]
        |        expect:
        |          rows: [{ax: 1}]""".stripMargin)
    val s1 = new PipelineSession(spark, missing, buildMode = true)
    val r1 = s1.runNodes()
    assert(r1.errors.nonEmpty)
    assert(s1.collectedTests.exists(
      _._3.exists(_.getMessage.contains("inputs not mocked: u2_b"))),
      s1.collectedTests.map(_._3.map(_.getMessage)))

    // a mock for an input the model never reads
    val extra = cfg(
      """      - name: over_mocked
        |        given:
        |          - input: u2_a
        |            rows: [{x: 1}]
        |          - input: u2_b
        |            rows: [{x: 2}]
        |          - input: u2_zz
        |            rows: [{x: 3}]
        |        expect:
        |          rows: [{ax: 1}]""".stripMargin)
    val s2x = new PipelineSession(spark, extra, buildMode = true)
    val r2 = s2x.runNodes()
    assert(r2.errors.nonEmpty)
    assert(s2x.collectedTests.exists(_._3.exists(_.getMessage
      .contains("mocks inputs the model never reads: u2_zz"))),
      s2x.collectedTests.map(_._3.map(_.getMessage)))

    // partial rows: a key omitted from a row is NULL (the join drops
    // it), and expect projects onto only the columns it names
    val partial = cfg(
      """      - name: null_partial
        |        given:
        |          - input: u2_a
        |            rows:
        |              - {x: 1}
        |              - {}
        |          - input: u2_b
        |            rows: [{x: 5}]
        |        expect:
        |          rows: [{ax: 1}]""".stripMargin)
    val r3 = new PipelineSession(spark, partial, buildMode = true).runNodes()
    assert(r3.errors.isEmpty, r3.errors.map(_.render))

    // empty expect (`rows: []`) asserts the logic produces NOTHING
    val empty = cfg(
      """      - name: none_match
        |        given:
        |          - input: u2_a
        |            rows: [{x: 9}]
        |          - input: u2_b
        |            rows: [{x: 5}]
        |        expect:
        |          rows: []""".stripMargin)
    val r4 = new PipelineSession(spark, empty, buildMode = true).runNodes()
    assert(r4.errors.isEmpty, r4.errors.map(_.render))

    // an expect column the model doesn't produce is a broken test
    val badCol = cfg(
      """      - name: ghost_col
        |        given:
        |          - input: u2_a
        |            rows: [{x: 1}]
        |          - input: u2_b
        |            rows: [{x: 5}]
        |        expect:
        |          rows: [{zz: 1}]""".stripMargin)
    val s5x = new PipelineSession(spark, badCol, buildMode = true)
    val r5 = s5x.runNodes()
    assert(r5.errors.nonEmpty)
    assert(s5x.collectedTests.exists(
      _._3.exists(_.getMessage.contains("expect column `zz`"))),
      s5x.collectedTests.map(_._3.map(_.getMessage)))
  }

  // -- contracts -------------------------------------------------------

  test("contracts: a conforming model publishes; type drift, missing and " +
      "extra columns fail NAMED before the swap (previous table intact); " +
      "config validates shapes") {
    val db = Files.createTempDirectory("graft-ct-db")
    val dir = Files.createTempDirectory("graft-ct")
    val modelsDir = dir.resolve("models"); Files.createDirectories(modelsDir)
    def writeModel(sql: String): Unit = {
      Files.writeString(modelsDir.resolve("ct_m.sql"), sql); ()
    }
    def cfg(columns: String, contract: String = "enforced")
        : PipelineConfig = {
      Files.writeString(dir.resolve("config.yaml"),
        s"""models_dir: $modelsDir
           |db_path: $db
           |models:
           |  ct_m:
           |    materialize: table
           |    contract: $contract
           |    columns:
           |$columns""".stripMargin)
      PipelineConfig.load(dir.resolve("config.yaml"))
    }
    val declared =
      """      - {name: id, data_type: int}
        |      - {name: nm, data_type: string}""".stripMargin
    writeModel(s"SELECT r_regionkey AS id, r_name AS nm " +
      s"FROM read_parquet('$sfDir/region.parquet')")
    val r1 = new PipelineSession(spark, cfg(declared)).runNodes()
    assert(r1.errors.isEmpty, r1.errors.map(_.render))
    val before = spark.table("ct_m").collect().toSet

    // type drift: id becomes string → fails named, table untouched
    writeModel(s"SELECT CAST(r_regionkey AS STRING) AS id, r_name AS nm " +
      s"FROM read_parquet('$sfDir/region.parquet')")
    val r2 = new PipelineSession(spark, cfg(declared)).runNodes()
    assert(r2.errors.exists(e => e.isInstanceOf[ContractViolation] &&
      e.render.contains("`id` declared int, got string")),
      r2.errors.map(_.render))
    assert(spark.table("ct_m").collect().toSet == before)

    // extra undeclared column + missing declared column, both named
    writeModel(s"SELECT r_regionkey AS id, 'x' AS cm " +
      s"FROM read_parquet('$sfDir/region.parquet')")
    val r3 = new PipelineSession(spark, cfg(declared)).runNodes()
    val msg3 = r3.errors.map(_.render).mkString("; ")
    assert(msg3.contains("missing declared column(s) nm") &&
      msg3.contains("undeclared column(s) cm"), msg3)

    // dbt's mapping spelling parses; type aliases agree (integer ≡ int)
    writeModel(s"SELECT r_regionkey AS id, r_name AS nm " +
      s"FROM read_parquet('$sfDir/region.parquet')")
    val mapped = cfg(
      """      - {name: id, data_type: integer}
        |      - {name: nm, data_type: varchar(25)}""".stripMargin,
      contract = "{enforced: true}")
    assert(mapped.models("ct_m").contract)
    val r4 = new PipelineSession(spark, mapped).runNodes()
    assert(r4.errors.isEmpty, r4.errors.map(_.render))

    // enforced contract with no columns is a config contradiction
    val e = intercept[GenericError] {
      Files.writeString(dir.resolve("config.yaml"),
        s"""models_dir: $modelsDir
           |models:
           |  ct_m:
           |    contract: enforced""".stripMargin)
      PipelineConfig.load(dir.resolve("config.yaml"))
    }
    assert(e.getMessage.contains("requires a non-empty `columns:` list"))

    // an unparseable declared type fails as a contract violation
    val badType = cfg("      - {name: id, data_type: notatype}")
    val r5 = new PipelineSession(spark, badType).runNodes()
    assert(r5.errors.exists(_.render.contains("unparseable data_type")),
      r5.errors.map(_.render))

    // documentation-only columns (no data_type) are tolerated WITHOUT
    // a contract (dbt's description blocks) ...
    Files.writeString(dir.resolve("config.yaml"),
      s"""models_dir: $modelsDir
         |models:
         |  ct_m:
         |    columns:
         |      - {name: id, description: the key}""".stripMargin)
    val docOnly = PipelineConfig.load(dir.resolve("config.yaml"))
    assert(!docOnly.models("ct_m").contract &&
      docOnly.models("ct_m").contractColumns.isEmpty)
    // ...but an enforced contract requires every column typed
    val e2 = intercept[GenericError] {
      Files.writeString(dir.resolve("config.yaml"),
        s"""models_dir: $modelsDir
           |models:
           |  ct_m:
           |    contract: enforced
           |    columns:
           |      - {name: id}""".stripMargin)
      PipelineConfig.load(dir.resolve("config.yaml"))
    }
    assert(e2.getMessage.contains(
      "needs a data_type under contract: enforced"))
  }

  test("unit-test mocks: a column mixing ints and floats widens to " +
      "double instead of truncating the float") {
    val dir = Files.createTempDirectory("graft-ut3")
    val modelsDir = dir.resolve("models"); Files.createDirectories(modelsDir)
    Files.writeString(modelsDir.resolve("u3_src.sql"), "SELECT 1.0 AS x")
    Files.writeString(modelsDir.resolve("u3_sum.sql"),
      "SELECT CAST(sum(x) AS DOUBLE) AS s FROM u3_src")
    Files.writeString(dir.resolve("config.yaml"),
      s"""models_dir: $modelsDir
         |models:
         |  u3_sum:
         |    unit_tests:
         |      - name: widen
         |        given:
         |          - input: u3_src
         |            rows:
         |              - {x: 1}
         |              - {x: 2.5}
         |        expect:
         |          rows: [{s: 3.5}]""".stripMargin)
    val config = PipelineConfig.load(dir.resolve("config.yaml"))
    val r = new PipelineSession(spark, config, buildMode = true).runNodes()
    assert(r.errors.isEmpty, r.errors.map(_.render))
  }

  test("contracts: an incremental model re-checks every run — a drifted " +
      "second batch fails before the merge, keeping the first batch") {
    val db = Files.createTempDirectory("graft-cti-db")
    val dir = Files.createTempDirectory("graft-cti")
    val dataDir = Files.createTempDirectory("graft-cti-data")
    val parq = dataDir.resolve("rows.parquet").toString
    val modelsDir = dir.resolve("models"); Files.createDirectories(modelsDir)
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(parq)
    Files.writeString(modelsDir.resolve("cti_m.sql"),
      s"SELECT id, v FROM read_parquet('$parq')")
    Files.writeString(dir.resolve("config.yaml"),
      s"""models_dir: $modelsDir
         |db_path: $db
         |models:
         |  cti_m:
         |    materialize: incremental
         |    unique_key: id
         |    contract: enforced
         |    columns:
         |      - {name: id, data_type: bigint}
         |      - {name: v, data_type: string}""".stripMargin)
    val config = PipelineConfig.load(dir.resolve("config.yaml"))
    val r1 = new PipelineSession(spark, config).runNodes()
    assert(r1.errors.isEmpty, r1.errors.map(_.render))
    assert(spark.table("cti_m").count() == 2)

    // the source drifts a type under the same SQL: the second run's
    // contract check fires before the merge touches anything
    Seq((3, "c")).toDF("id", "v").write.mode("overwrite").parquet(parq)
    val r2 = new PipelineSession(spark, config).runNodes()
    assert(r2.errors.exists(e => e.isInstanceOf[ContractViolation] &&
      e.render.contains("`id` declared bigint, got int")),
      r2.errors.map(_.render))
    assert(spark.table("cti_m").count() == 2,
      "a contract-violating batch must not merge")
  }
}
