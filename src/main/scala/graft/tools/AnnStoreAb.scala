package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{IvfCentroids, PqCodebooks, SimilarityOps}

/** Controlled same-JVM A/B of the IVF-PQ query paths: inline
  * ([[SimilarityOps.ivfPqTopK]], re-encodes the corpus every call) vs
  * store-backed ([[SimilarityOps.ivfPqTopKFromStore]] over a pre-built
  * [[SimilarityOps.annIndexStore]]), plus the one-time store build and a
  * per-ingest append — the costs a deployment actually trades. Same
  * session, interleaved reps, so machine drift cancels (the IvfAb
  * pattern). Committed centroid/codebook literals, so the two paths
  * return identical rows (q117 ≡ q115 by oracle).
  *
  *   SPARK_GRAFT_CPUS=16 sbt "runMain graft.tools.AnnStoreAb <dir> <nProbes> <reps>"
  */
object AnnStoreAb {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nProbes = if (args.length > 1) args(1).toLong else 10L
    val reps = if (args.length > 2) args(2).toInt else 5
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
    // optional "--gen <baseDir> <n>": ScaleGen-replicate the base
    // EMBEDDINGS into <dir> first, for the N-times corpus points of the
    // SCALING.md table (embeddings only — the sign-pattern replication
    // has no replica cap, unlike the documents letter rotation)
    val gi = args.indexOf("--gen")
    if (gi >= 0 && gi + 2 < args.length &&
        !new java.io.File(s"$dir/embeddings.parquet/_SUCCESS").exists()) {
      val base = spark.read.parquet(s"${args(gi + 1)}/embeddings.parquet")
      ScaleGen.replicateEmbeddings(base, args(gi + 2).toInt,
          SimilarityOps.inferDim(base, "embedding"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    val e = spark.read.parquet(s"$dir/embeddings.parquet").drop("label")
    val probes = e.filter(col("vec_id") < nProbes)
    val cents = IvfCentroids.centroids
    val cbs = PqCodebooks.codebooks
    val path = java.nio.file.Files.createTempDirectory("graft-annab")
      .resolve("idx").toString
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // one-time build (atomic publish) — the cost the store amortizes
    val tBuild = time {
      SimilarityOps.annIndexStore(spark, e, path, cents, cbs); ()
    }
    // per-ingest append: encode ONLY the batch (1% of the corpus here)
    val batch = e.filter(col("vec_id") % 100 === 0)
      .withColumn("vec_id", col("vec_id") + 10000000L)
    val tAppend = time {
      SimilarityOps.appendToAnnIndex(spark,
        batch, path, cents, cbs); ()
    }
    // third path: the id-bucketed raw-vector FETCH store retires the
    // re-rank's corpus scan too (q120's shape)
    val vecPath = java.nio.file.Files.createTempDirectory("graft-annab-v")
      .resolve("vecs").toString
    // --buckets <n>: the fetch store's pruning granularity. Prunes only
    // when nBuckets >> shortlist size (k·rf·|probes| ids hash into at
    // most that many buckets), so the default matches the q120 fixture
    // and the pruning regime is measured with an explicit larger value.
    val bi = args.indexOf("--buckets")
    val nBuckets =
      if (bi >= 0 && bi + 1 < args.length) args(bi + 1).toInt else 64
    val tVecBuild = time {
      SimilarityOps.vectorStore(spark, e, vecPath, nBuckets); ()
    }
    def inline = SimilarityOps.ivfPqTopK(probes, e, cents, cbs,
      k = 5, nprobe = 3, refineFactor = 8)
    def stored = SimilarityOps.ivfPqTopKFromStore(probes,
      SimilarityOps.readAnnIndexStore(spark, path), e, cents, cbs,
      k = 5, nprobe = 3, refineFactor = 8)
    def fetched = SimilarityOps.ivfPqTopKFromStores(probes,
      SimilarityOps.readAnnIndexStore(spark, path),
      SimilarityOps.readVectorStore(spark, vecPath), nBuckets, cents, cbs,
      k = 5, nprobe = 3, refineFactor = 8)
    sink(inline); sink(stored); sink(fetched) // warmup
    val as = (1 to reps).map(_ => time(sink(inline)))
    val bs = (1 to reps).map(_ => time(sink(stored)))
    val cs = (1 to reps).map(_ => time(sink(fetched)))
    println(f"""{"n_probes":$nProbes,"build":$tBuild%.3f,"vec_build":$tVecBuild%.3f,"append_1pct":$tAppend%.3f,"inline_min":${as.min}%.3f,"stored_min":${bs.min}%.3f,"fetched_min":${cs.min}%.3f,"stored_speedup":${as.min / bs.min}%.2f,"fetched_speedup":${as.min / cs.min}%.2f}""")
    spark.stop()
  }
}
