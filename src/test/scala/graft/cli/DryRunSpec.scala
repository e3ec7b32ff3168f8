package graft.cli

import java.io.ByteArrayOutputStream
import java.nio.file.Files
import graft.SparkTestSession
import graft.pipeline.{PipelineConfig, PipelineSession}
import org.scalatest.funsuite.AnyFunSuite

/** `run --dry-run`: the terminal-surface twin of `viz --changed-only` —
  * prints the would-run / would-skip split in execution order without
  * starting Spark or executing SQL. Spark-free-ness is proven by
  * construction: dryRun builds its PipelineSession around a THROWING
  * spark thunk, so any accidental execution fails the test.
  */
class DryRunSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def captureOut(body: => Unit): String = {
    val bos = new ByteArrayOutputStream()
    Console.withOut(bos)(body)
    bos.toString("UTF-8")
  }

  test("run --dry-run prints the skip/run split from stored fingerprints " +
      "without executing; without --changed-only everything would run") {
    val db = Files.createTempDirectory("graft-dryrun-db")
    val dir = Files.createTempDirectory("graft-dryrun")
    val modelsDir = dir.resolve("models"); Files.createDirectories(modelsDir)
    Files.writeString(modelsDir.resolve("dr_base.sql"),
      "SELECT * FROM VALUES (1), (2) AS t(x)")
    Files.writeString(modelsDir.resolve("dr_leaf.sql"),
      "SELECT sum(x) AS s FROM dr_base")
    val cfgPath = dir.resolve("config.yaml")
    Files.writeString(cfgPath,
      s"""models_dir: $modelsDir
         |db_path: $db""".stripMargin)
    val config = PipelineConfig.load(cfgPath)

    // seed fingerprints with one real run
    val r1 = new PipelineSession(spark, config).runNodes()
    assert(r1.errors.isEmpty)

    val flags = Map("config" -> cfgPath.toString,
      "dry-run" -> "true", "changed-only" -> "true")

    // unchanged: both models preview as skips, summary says 0 would run
    val out1 = captureOut(Main.dryRun(flags))
    assert(out1.contains("dr_base") && out1.contains("dr_leaf"), out1)
    assert(out1.linesIterator.count(_.endsWith("[would SKIP unchanged]")) == 2,
      out1)
    assert(out1.contains("Dry run: 0 would run, 2 would skip"), out1)

    // edit the leaf: it previews as RUN, the untouched base still skips —
    // and the printed order is execution (topo) order: base before leaf
    Files.writeString(modelsDir.resolve("dr_leaf.sql"),
      "SELECT sum(x) + 1 AS s FROM dr_base")
    val out2 = captureOut(Main.dryRun(flags))
    val lines = out2.linesIterator.toSeq
    assert(lines.exists(l => l.contains("dr_base") &&
      l.endsWith("[would SKIP unchanged]")), out2)
    assert(lines.exists(l => l.contains("dr_leaf") &&
      l.endsWith("[would RUN]")), out2)
    assert(lines.indexWhere(_.contains("dr_base")) <
      lines.indexWhere(_.contains("dr_leaf")), out2)
    assert(out2.contains("Dry run: 1 would run, 1 would skip"), out2)

    // nothing executed: the edited leaf's stored fingerprint is unchanged,
    // so a later real --changed-only run still re-executes it
    val r2 = new PipelineSession(spark, config, changedOnly = true).runNodes()
    assert(r2.errors.isEmpty)
    val st = r2.results.map(r => r.id -> r.status).toMap
    assert(st("dr_leaf") != "SKIP unchanged", st.toString)

    // without --changed-only the dry run reports everything as RUN
    val out3 = captureOut(Main.dryRun(flags - "changed-only"))
    assert(out3.linesIterator.count(_.endsWith("[would RUN]")) == 2, out3)
    assert(out3.contains("Dry run: 2 would run, 0 would skip"), out3)
  }

  test("--vars splits on commas only BETWEEN k=v pairs: a fragment " +
      "without '=' continues the previous value (ADVICE r15); trailing " +
      "comma tolerated; empty-interior commas preserved in the value") {
    def vars(s: String) = Main.varsOf(Map("vars" -> s))
    assert(vars("a=1,b=2") == Map("a" -> "1", "b" -> "2"))
    assert(vars("list=a,b,c") == Map("list" -> "a,b,c"))
    assert(vars("list=a,b,k2=v") == Map("list" -> "a,b", "k2" -> "v"))
    assert(vars("x=1,y=a,,b,z=3") ==
      Map("x" -> "1", "y" -> "a,,b", "z" -> "3"))
    assert(vars("a=1,") == Map("a" -> "1"))
    assert(vars("a=") == Map("a" -> ""))
  }
}
