package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.SimilarityOps

/** Controlled same-JVM A/B of the banded self-join formulations behind
  * q74 (knnGraph) and q27/q56/q59/q60/q75 (lshNearDupPairs):
  *
  *   A (score-per-collision, the original): the band join carries unit
  *     vectors, every band collision computes the dot, distinct
  *     de-duplicates the SCORED pairs;
  *   B (score-once): the band join carries only ids, pairs de-duplicate
  *     before scoring, unit vectors join back once per side.
  *
  * Same session, interleaved reps, ScaleGen corpora — so machine drift
  * and corpus structure cancel, and the 1× vs 10× ratio shows which form
  * degrades slower. Parity (identical row sets, sims included) is
  * asserted at 1× before any timing — a faster wrong answer is not a
  * candidate.
  *
  *   SPARK_GRAFT_CPUS=16 sbt "runMain graft.tools.KnnAb [baseDir] [workDir] [reps]"
  */
object KnnAb {
  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val workDir = if (args.length > 1) args(1) else "/tmp/graft_scale"
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

    val dirs = Seq(1, 10).map { n =>
      val d = s"$workDir/x$n"
      ScaleGen.generate(spark, baseDir, d, n)
      n -> d
    }.toMap
    def embs(n: Int): DataFrame =
      spark.read.parquet(s"${dirs(n)}/embeddings.parquet").drop("label")

    // -- parity at 1×: both forms must emit identical row sets ----------
    val e1 = embs(1)
    def canon(df: DataFrame): Array[String] =
      df.collect().map(_.mkString(",")).sorted
    val knnA = canon(SimilarityOps.knnGraphPerCollision(e1, k = 3))
    val knnB = canon(SimilarityOps.knnGraphScoreOnce(e1, k = 3))
    require(knnA.sameElements(knnB),
      s"knnGraph parity broken: A=${knnA.length} rows, B=${knnB.length}")
    val lshA = canon(SimilarityOps.lshNearDupPairs(e1, minSim = 0.3))
    val lshB = canon(SimilarityOps.lshNearDupPairsScoreOnce(e1, minSim = 0.3))
    require(lshA.sameElements(lshB),
      s"lshNearDupPairs parity broken: A=${lshA.length}, B=${lshB.length}")
    println(s"parity ok: knn ${knnA.length} rows, lsh ${lshA.length} rows")

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (n <- Seq(1, 10)) {
      val e = embs(n)
      def kA = SimilarityOps.knnGraphPerCollision(e, k = 3)
      def kB = SimilarityOps.knnGraphScoreOnce(e, k = 3)
      def lA = SimilarityOps.lshNearDupPairs(e, minSim = 0.3)
      def lB = SimilarityOps.lshNearDupPairsScoreOnce(e, minSim = 0.3)
      time(kA); time(kB); time(lA); time(lB) // warmup
      val (kas, kbs, las, lbs) = (
        (1 to reps).map(_ => time(kA)),
        (1 to reps).map(_ => time(kB)),
        (1 to reps).map(_ => time(lA)),
        (1 to reps).map(_ => time(lB)))
      println(f"""{"scale":$n,"knn_per_collision_min":${kas.min}%.3f,""" +
        f""""knn_score_once_min":${kbs.min}%.3f,""" +
        f""""knn_speedup":${kas.min / kbs.min}%.2f,""" +
        f""""lsh_per_collision_min":${las.min}%.3f,""" +
        f""""lsh_score_once_min":${lbs.min}%.3f,""" +
        f""""lsh_speedup":${las.min / lbs.min}%.2f}""")
    }
    spark.stop()
  }
}
