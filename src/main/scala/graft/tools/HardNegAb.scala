package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{IvfCentroids, PqCodebooks, SimilarityOps}

/** Controlled same-JVM A/B of the hard-negative mining paths: exact
  * ([[SimilarityOps.hardNegatives]] — anchors broadcast over a full
  * corpus scan, cost ∝ |anchors|·|corpus|) vs store-backed
  * ([[SimilarityOps.hardNegativesFromStore]] — over-fetch from a
  * prebuilt IVF-PQ index, ADC touches only probed-cell byte codes).
  * Interleaved reps in one session so machine drift cancels (the
  * IvfAb/AnnStoreAb pattern); the anchor-count sweep shows where the
  * index path's corpus-scan independence pays.
  *
  *   SPARK_GRAFT_CPUS=16 sbt "runMain graft.tools.HardNegAb <dir> <reps> [--gen <baseDir> <n>]"
  */
object HardNegAb {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1 && !args(1).startsWith("--"))
      args(1).toInt else 3
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
    val path = java.nio.file.Files.createTempDirectory("graft-hnab")
      .resolve("idx").toString
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val tBuild = time {
      SimilarityOps.annIndexStore(spark, e, path, cents, cbs); ()
    }
    val index = SimilarityOps.readAnnIndexStore(spark, path)
    println(f"corpus=$n%d build=$tBuild%.2fs")
    for (nAnchors <- Seq(10L, 100L, 500L)) {
      val anchors = e.filter(col("vec_id") < nAnchors)
      val (ex, st) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
      for (r <- 0 until reps) { // interleaved: drift cancels
        ex(r) = time(sink(SimilarityOps.hardNegatives(anchors, e,
          k = 5, simLo = 0.15, simHi = 0.6)))
        st(r) = time(sink(SimilarityOps.hardNegativesFromStore(anchors,
          index, e, cents, cbs, k = 5, kFetch = 40,
          simLo = 0.15, simHi = 0.6, nprobe = 3, refineFactor = 4)))
      }
      def med(a: Array[Double]) = a.sorted.apply(reps / 2)
      println(f"anchors=$nAnchors%4d exact=${med(ex)}%.2fs " +
        f"stored=${med(st)}%.2fs speedup=${med(ex) / med(st)}%.2fx")
    }
    spark.stop()
  }
}
