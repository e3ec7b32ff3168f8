package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{IvfCentroids, PqCodebooks, SimilarityOps}

/** Controlled same-JVM A/B of the two ANN-index migration paths
  * ([[SimilarityOps.reencodeAnnIndex]] full re-encode vs
  * [[SimilarityOps.reencodeAnnIndexCells]] centroid-only reconcile), at a
  * corpus size the [[ScaleCurve]] documents-rotation cap (15×) cannot
  * reach — embeddings replicate without a cap
  * ([[ScaleGen.replicateEmbeddings]], the AnnStoreAb precedent). Each
  * path migrates its own pre-drifted store (negated centroids; the
  * cells-only store keeps the committed codebooks, its validity
  * precondition); reps interleave so machine drift cancels. Re-migrating
  * an already-clean store does the same work on both paths (the full
  * path always re-encodes; the reconcile's cost is drift-insensitive
  * because codes are never re-encoded either way), so reps are
  * comparable.
  *
  *   SPARK_GRAFT_CPUS=16 sbt "runMain graft.tools.ReencodeAb <dir> <reps> [--gen <baseDir> <n>]"
  */
object ReencodeAb {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.register(spark)
    val gi = args.indexOf("--gen")
    if (gi >= 0 && gi + 2 < args.length &&
        !new java.io.File(s"$dir/embeddings.parquet/_SUCCESS").exists()) {
      val base = spark.read.parquet(s"${args(gi + 1)}/embeddings.parquet")
      ScaleGen.replicateEmbeddings(base, args(gi + 2).toInt,
          SimilarityOps.inferDim(base, "embedding"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    val e = spark.read.parquet(s"$dir/embeddings.parquet").drop("label")
    val n = e.count()
    val cents = IvfCentroids.centroids
    val cbs = PqCodebooks.codebooks
    val oldCents = cents.map(_.map(-_))
    val base = java.nio.file.Files.createTempDirectory("graft-reencab")
    val pathFull = base.resolve("full").toString
    val pathCells = base.resolve("cells").toString
    // pre-drifted stores (untimed builds — the drift event is one-time)
    SimilarityOps.annIndexStore(spark, e, pathFull, oldCents,
      cbs.map(_.reverse))
    SimilarityOps.annIndexStore(spark, e, pathCells, oldCents, cbs)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    // untimed JIT warm of both paths
    SimilarityOps.reencodeAnnIndex(spark, e, pathFull, cents, cbs)
    SimilarityOps.reencodeAnnIndexCells(spark, e, pathCells, cents, cbs)
    val full = scala.collection.mutable.ArrayBuffer.empty[Double]
    val cells = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to reps).foreach { _ =>
      full += time {
        SimilarityOps.reencodeAnnIndex(spark, e, pathFull, cents, cbs); ()
      }
      cells += time {
        SimilarityOps.reencodeAnnIndexCells(spark, e, pathCells, cents,
          cbs); ()
      }
    }
    // result identity across the two paths (cells-only requires the
    // SAME codebooks — satisfied by construction here)
    val rowsOf = (p: String) =>
      SimilarityOps.readAnnIndexStore(spark, p)
        .orderBy("cand_id", "cell").collect().toSeq
    val identical = rowsOf(pathFull) == rowsOf(pathCells)
    println(s"""{"metric":"reencode_ab","n_vecs":$n,""" +
      s""""full_min":${full.min},"cells_min":${cells.min},""" +
      s""""full_all":${full.mkString("[", ",", "]")},""" +
      s""""cells_all":${cells.mkString("[", ",", "]")},""" +
      s""""identical":$identical}""")
    spark.stop()
  }
}
