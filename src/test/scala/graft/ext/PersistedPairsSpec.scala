package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Pins the pay-LSH-once contract of [[DedupOps.materializedPairs]]
  * (VERDICT r7 #5): the first caller computes and writes, every later
  * caller gets a bare parquet scan — the by-name compute thunk must not
  * even be forced, and the returned plan must contain none of the LSH
  * pipeline's operators (Generate from the shingle explode, HashAggregate
  * from the signature min).
  */
class PersistedPairsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def freshPath(): String = {
    val p = java.nio.file.Files
      .createTempDirectory("graft-pairs-spec").resolve("pairs").toString
    p
  }

  test("computes exactly once; cached result equals recomputation") {
    val path = freshPath()
    var computed = 0
    def pairs = {
      computed += 1
      graft.queries.ExtensionQueries.portableMinHashPairs(
        graft.Tables.load(spark, dir, "documents"))
    }
    val first = DedupOps.materializedPairs(spark, path)(pairs)
      .collect().map(_.toSeq).toSet
    assert(computed == 1)
    val second = DedupOps.materializedPairs(spark, path)(pairs)
      .collect().map(_.toSeq).toSet
    assert(computed == 1, "cache hit must not force the compute thunk")
    val direct = graft.queries.ExtensionQueries.portableMinHashPairs(
        graft.Tables.load(spark, dir, "documents"))
      .collect().map(_.toSeq).toSet
    assert(first == second)
    assert(first == direct)
    assert(first.nonEmpty)
  }

  test("cache-hit plan is a bare FileScan of the materialization — zero " +
      "LSH recompute") {
    val path = freshPath()
    val df0 = DedupOps.materializedPairs(spark, path)(
      graft.queries.ExtensionQueries.portableMinHashPairs(
        graft.Tables.load(spark, dir, "documents")))
    df0.limit(1).collect() // force the materialization write
    val hit = DedupOps.materializedPairs(spark, path)(
      fail("compute thunk must not be forced on a cache hit"))
    val plan = hit.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("Scan parquet"))
    assert(plan.contains("pairs"), s"scan should read the cache path:\n$plan")
    assert(!plan.contains("Generate"), "shingle explode must not reappear")
    assert(!plan.contains("HashAggregate"), "signature mins must not reappear")
    assert(!plan.contains("documents.parquet"), "corpus must not be re-scanned")
  }

  test("existence resolves through the Hadoop FileSystem API — cache hit " +
      "on an explicit file: URI path (the cluster-storage contract)") {
    // On a real cluster the path is hdfs:/s3: where java.io.File always
    // answers "absent"; a file: URI is the local stand-in that exercises
    // the same FileSystem resolution path (VERDICT r8 #1).
    val path = "file:" + freshPath()
    var computed = 0
    def pairs = {
      computed += 1
      graft.queries.ExtensionQueries.portableMinHashPairs(
        graft.Tables.load(spark, dir, "documents"))
    }
    val first = DedupOps.materializedPairs(spark, path)(pairs)
      .collect().map(_.toSeq).toSet
    assert(computed == 1)
    val second = DedupOps.materializedPairs(spark, path)(
      fail("compute thunk must not be forced on a file:-URI cache hit"))
      .collect().map(_.toSeq).toSet
    assert(first == second)
    assert(first.nonEmpty)
  }

  test("a _SUCCESS-less partial write is treated as absent and replaced") {
    val path = freshPath()
    // simulate a crash mid-write: directory with a stray part file, no
    // _SUCCESS marker
    val d = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(d)
    java.nio.file.Files.write(d.resolve("part-00000.parquet"),
      Array[Byte](1, 2, 3))
    var computed = 0
    def pairs = {
      computed += 1
      graft.queries.ExtensionQueries.portableMinHashPairs(
        graft.Tables.load(spark, dir, "documents"))
    }
    val rows = DedupOps.materializedPairs(spark, path)(pairs)
      .collect().map(_.toSeq).toSet
    assert(computed == 1, "partial write must trigger recompute")
    assert(rows.nonEmpty)
    assert(java.nio.file.Files.exists(d.resolve("_SUCCESS")))
  }

  test("persistedMinHashPairs keys the cache by a content fingerprint — " +
      "regenerated fixture data invalidates it") {
    // stage a private copy of the corpus so we can regenerate it
    val dataDir = java.nio.file.Files.createTempDirectory("graft-pairs-fp")
    val src = java.nio.file.Paths.get(dir, "documents.parquet")
    val dst = dataDir.resolve("documents.parquet")
    java.nio.file.Files.copy(src, dst)
    import scala.jdk.CollectionConverters._
    def cacheDirs(): Set[String] = {
      val wh = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      val root = java.nio.file.Paths.get(wh, "_graft_pairs")
      if (!java.nio.file.Files.isDirectory(root)) Set.empty
      else {
        val s = java.nio.file.Files.list(root)
        try s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.contains("graft_pairs_fp")).toSet
        finally s.close()
      }
    }
    val r1 = graft.queries.ExtensionQueries
      .persistedMinHashPairs(spark, dataDir.toString)
      .collect().map(_.toSeq).toSet
    assert(r1.nonEmpty)
    val after1 = cacheDirs()
    assert(after1.size == 1)
    // "regenerate" the fixture: same path, same bytes, new mtime — the
    // file-level fingerprint (name:length:mtime) must mint a new key
    java.nio.file.Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(
        java.nio.file.Files.getLastModifiedTime(dst).toMillis + 123456L))
    graft.queries.ExtensionQueries
      .persistedMinHashPairs(spark, dataDir.toString)
      .limit(1).collect()
    val after2 = cacheDirs()
    assert(after2.size == 2,
      s"regenerated fixture must mint a NEW cache key, got $after2")
  }
}
