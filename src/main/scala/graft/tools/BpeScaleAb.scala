package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Bpe, MergeIndex}

/** Encode cost vs VOCABULARY SIZE (VERDICT r15 task 1's measurement):
  * fits BPE merges at several vocabulary budgets on the long-doc /
  * wide-vocab synthetic corpus ([[ScaleGen.generateLongDocs]] — the
  * fixture's 31-word vocabulary saturates at 89 merges, far below a
  * production 8k–32k vocabulary), then times the NAIVE run-every-merge
  * encoder against the pair-indexed [[MergeIndex]] over every distinct
  * corpus word, memo off (the memo-miss path is exactly what vocabulary
  * scale stresses). Also writes each fitted merges list as TSV so
  * `tools/bpe_oracle_scale.py` can time the recursive-CTE oracle rebuild
  * at the same sizes — the honest boundary of where the SQL oracle stops
  * being the verification tool and the indexed≡naive differential spec
  * takes over.
  *
  *   sbt "runMain graft.tools.BpeScaleAb [corpusDir] [outDir] [sizes]"
  *
  * Deterministic end to end: the corpus, the fit, and the timing loops
  * carry no RNG (reps interleave; min-of-reps reported).
  */
object BpeScaleAb {
  def main(args: Array[String]): Unit = {
    val corpusDir = if (args.length > 0) args(0) else "/tmp/graft_longdoc"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_bpescale"
    val sizes = (if (args.length > 2) args(2) else "48,1024,8192")
      .split(",").map(_.trim.toInt).toSeq
    val reps = 3
    val fitWords = 4096 // bounded histogram probe for the fit

    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    ScaleGen.generateLongDocs(spark, corpusDir, nDocs = 2000,
      wordsPerDoc = 500, vocabSize = 50000)
    val d = spark.read.parquet(s"$corpusDir/documents.parquet")
    val hist = d.select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(65536)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    println(s"corpus vocabulary: ${hist.size} distinct words")
    val words = hist.map(_._1).toArray
    Files.createDirectories(Paths.get(outDir))

    def time(f: => Long): (Double, Long) = {
      var best = Double.MaxValue
      var sum = 0L
      (0 until reps).foreach { _ =>
        val t0 = System.nanoTime()
        sum = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, sum)
    }

    val rows = sizes.map { n =>
      val tFit0 = System.nanoTime()
      val merges = Bpe.fit(hist.take(fitWords), n)
      val fitSec = (System.nanoTime() - tFit0) / 1e9
      // persist for the DuckDB oracle-scale measurement
      val tsv = merges.map { case (l, r) => s"$l\t$r" }.mkString("\n")
      Files.writeString(Paths.get(s"$outDir/merges_$n.tsv"), tsv)

      val idx = new MergeIndex(merges)
      // checksum both ways: proves the timed loops computed the same
      // thing (the differential spec proves it exhaustively; this keeps
      // the measurement itself honest against dead-code elimination)
      val (tNaive, sumNaive) = time {
        var s = 0L; var i = 0
        while (i < words.length) {
          s += Bpe.pieceCount(words(i), merges); i += 1
        }
        s
      }
      val (tIdx, sumIdx) = time {
        var s = 0L; var i = 0
        while (i < words.length) { s += idx.encode(words(i)).length; i += 1 }
        s
      }
      require(sumNaive == sumIdx, s"differential breach at $n merges")
      val r = (n, merges.size, fitSec, tNaive, tIdx,
        tNaive * 1e6 / words.length, tIdx * 1e6 / words.length)
      println(f"size=$n fitted=${merges.size} fit=${fitSec}%.1fs " +
        f"naive=${tNaive}%.3fs indexed=${tIdx}%.3fs " +
        f"naive_us_per_word=${r._6}%.2f indexed_us_per_word=${r._7}%.2f")
      r
    }

    def j(r: (Int, Int, Double, Double, Double, Double, Double)) =
      s"""{"requested":${r._1},"fitted":${r._2},""" +
        s""""fit_sec":${math.rint(r._3 * 100) / 100},""" +
        s""""naive_sec":${math.rint(r._4 * 1000) / 1000},""" +
        s""""indexed_sec":${math.rint(r._5 * 1000) / 1000},""" +
        s""""naive_us_per_word":${math.rint(r._6 * 100) / 100},""" +
        s""""indexed_us_per_word":${math.rint(r._7 * 100) / 100}}"""
    println(s"""{"metric":"bpe_encode_vs_vocab",""" +
      s""""distinct_words":${words.length},""" +
      s""""rows":[${rows.map(j).mkString(",")}]}""")
    spark.stop()
  }
}
