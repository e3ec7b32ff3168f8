package graft.pipeline

import java.nio.file.Files

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class PipelineConfigSpec extends AnyFunSuite {

  test("yaml parse: all keys, reference names") {
    val c = PipelineConfig.fromYaml(
      """models_dir: models
        |db_path: out.db
        |macro_path: macros
        |duckdb_settings:
        |  memory_limit: "1GB"
        |  threads: 4
        |models:
        |  source_orders:
        |    materialize: table
        |  summary:
        |    materialize: view
        |""".stripMargin)
    assert(c.modelsDir == "models")
    assert(c.dbPath.contains("out.db"))
    assert(c.macroPath.contains("macros"))
    assert(c.settings == Map("memory_limit" -> "1GB", "threads" -> "4"))
    assert(c.models("source_orders").materialize.contains("table"))
    assert(c.models("summary").materialize.contains("view"))
  }

  test("spark_settings alias accepted") {
    val c = PipelineConfig.fromYaml(
      """spark_settings:
        |  spark.sql.shuffle.partitions: 8
        |""".stripMargin)
    assert(c.settings == Map("spark.sql.shuffle.partitions" -> "8"))
  }

  test("missing config file yields defaults anchored at the config's dir") {
    val dir = Files.createTempDirectory("cfg")
    val c = PipelineConfig.load(dir.resolve("config.yaml"))
    // defaults, but models_dir "." resolves against the config's directory
    // (not the process cwd) so discovery scans where the user pointed
    assert(java.nio.file.Paths.get(c.modelsDir).normalize() == dir.normalize())
    assert(c.dbPath.isEmpty) // in-memory mode
  }

  test("blank values and non-mapping documents fail soft or named") {
    // a key left blank mid-edit parses as YAML null → treated as absent
    val c = PipelineConfig.fromYaml(
      "models_dir: m\ndb_path:\nmacro_path:\nduckdb_settings:\n")
    assert(c.modelsDir == "m" && c.dbPath.isEmpty && c.macroPath.isEmpty)
    val c2 = PipelineConfig.fromYaml(
      "models:\n  a:\n    materialize:\n")
    assert(c2.models("a").materialize.isEmpty)
    // a non-mapping document names the problem instead of a bare
    // ClassCastException from deep inside the parser
    val e = intercept[GenericError](
      PipelineConfig.fromYaml("- just\n- a\n- list\n"))
    assert(e.getMessage.contains("mapping"))
  }

  test("empty yaml yields defaults") {
    assert(PipelineConfig.fromYaml("") == PipelineConfig())
  }

  test("settings pass-through applies to the Spark session, fail-fast on bad key") {
    val spark = SparkTestSession.spark
    val ok = new PipelineSession(spark,
      PipelineConfig(settings = Map("spark.sql.cbo.enabled" -> "true")))
    ok.applySettings()
    assert(spark.conf.get("spark.sql.cbo.enabled") == "true")
    spark.conf.unset("spark.sql.cbo.enabled")

    val bad = new PipelineSession(spark,
      PipelineConfig(settings = Map("spark.executor.memory" -> "1g"))) // static conf
    val e = intercept[GenericError](bad.applySettings())
    assert(e.getMessage.contains("spark.executor.memory"))
  }
}
