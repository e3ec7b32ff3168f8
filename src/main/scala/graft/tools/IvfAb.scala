package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.SimilarityOps

/** Controlled same-JVM A/B of the IVF scoring paths: single-stage exact
  * ([[SimilarityOps.ivfTopKWithCentroids]], the default) vs two-stage
  * int8 coarse + exact re-rank ([[SimilarityOps.ivfTopKWithCentroidsInt8]]).
  * Same session, interleaved reps — machine drift cancels out, unlike
  * cross-round ScaleCurve comparisons. This harness is what caught the
  * r9 de-JIT: the greatest+coalesce cell assignment put the whole scoring
  * join into interpreted bytecode (11.6 s for a 600k-pair join that takes
  * 0.27 s compiled) — see SCALING.md.
  *
  *   SPARK_GRAFT_CPUS=16 sbt "runMain graft.tools.IvfAb <dir> <nProbes> <reps>"
  */
object IvfAb {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_scale/x10"
    val nProbes = if (args.length > 1) args(1).toLong else 100L
    val reps = if (args.length > 2) args(2).toInt else 3
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
    val e = spark.read.parquet(s"$dir/embeddings.parquet").drop("label")
    val probes = e.filter(col("vec_id") < nProbes)
    val cents = SimilarityOps.fitCentroids(e, "embedding", nCells = 10)
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def exact = SimilarityOps.ivfTopKWithCentroids(probes, e, cents, 5, 3)
    def int8 = SimilarityOps.ivfTopKWithCentroidsInt8(probes, e, cents, 5, 3)
    time(exact); time(int8) // warmup
    val as = (1 to reps).map(_ => time(exact))
    val bs = (1 to reps).map(_ => time(int8))
    println(f"""{"n_probes":$nProbes,"exact_min":${as.min}%.3f,"int8_min":${bs.min}%.3f,"int8_speedup":${as.min / bs.min}%.2f}""")
    spark.stop()
  }
}
