package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.RetrievalOps

/** Controlled same-JVM A/B of the lexical retrieval paths under a LOOP —
  * the measurement VERDICT r14 task 7 asked for: SCALING.md's r14 rows
  * derive the store's value from "a decontamination loop issues MANY
  * calls against one store", but only the single-call level/slope were
  * measured. This times N sequential probe BATCHES (each batch a fresh
  * eval slice, the way a decontamination or seed-expansion loop actually
  * iterates) through
  *
  *   inline — [[RetrievalOps.bm25PerQuery]]: re-tokenizes the corpus
  *            EVERY call (N full tokenize passes per loop);
  *   store  — [[RetrievalOps.bm25PerQueryFromStore]] over one pre-built
  *            [[RetrievalOps.lexicalStatsStore]] (build untimed and
  *            AMORTIZED over the loop: reported both excluded and
  *            included).
  *
  * Reps interleave so machine drift cancels (the AnnStoreAb pattern).
  * Probe batches rotate deterministically over the corpus vocabulary —
  * no RNG, identical batches on both paths.
  *
  * r16: the r15 run honestly recorded the sf0.1 fixture as the store's
  * ADVERSARIAL regime — a 31-word vocabulary makes every probe term's
  * df ≈ corpus, so pruning prunes nothing. `--gen-longdoc` measures the
  * claimed FAVORABLE regime instead: long documents (tokenize-dominant
  * inline cost) over a wide vocabulary ([[ScaleGen.generateLongDocs]]),
  * and `--probe-tail` draws the probe terms from the RARE end of the
  * frequency-ordered vocabulary (an eval set's distinctive terms), so
  * Σ df(probe) is genuinely small.
  *
  *   SPARK_GRAFT_CPUS=16 sbt "runMain graft.tools.LexLoopAb <dir> <nBatches> <reps> [--gen-longdoc] [--probe-tail]"
  */
object LexLoopAb {
  def main(args: Array[String]): Unit = {
    // positionals are the non-flag args, so any flag can appear without
    // spelling out all three defaults ("LexLoopAb /dir --gen-longdoc"
    // must not parse the flag as nBatches)
    val pos = args.filterNot(_.startsWith("--"))
    val dir = if (pos.length > 0) pos(0) else "/root/testdata/sf0.1"
    val nBatches = if (pos.length > 1) pos(1).toInt else 10
    val reps = if (pos.length > 2) pos(2).toInt else 3
    // --gen-longdoc[=nDocs,wordsPerDoc,vocabSize] (defaults 5000,1000,50000)
    val genSpec = args.find(_.startsWith("--gen-longdoc"))
    val genLongDoc = genSpec.isDefined
    val (genDocs, genWords, genVocab) = genSpec match {
      case Some(s) if s.contains("=") =>
        val p = try s.split("=", 2)(1).split(",").map(_.trim.toInt)
          catch { case _: NumberFormatException =>
            sys.error(s"LexLoopAb: --gen-longdoc expects three integers " +
              s"nDocs,wordsPerDoc,vocabSize — got '$s'")
          }
        require(p.length == 3,
          s"LexLoopAb: --gen-longdoc expects nDocs,wordsPerDoc,vocabSize " +
            s"(three comma-separated integers), got '$s'")
        (p(0), p(1), p(2))
      case _ => (5000, 1000, 50000)
    }
    val probeTail = args.contains("--probe-tail")
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
    import spark.implicits._

    if (genLongDoc)
      ScaleGen.generateLongDocs(spark, dir, nDocs = genDocs,
        wordsPerDoc = genWords, vocabSize = genVocab)
    val d = spark.read.parquet(s"$dir/documents.parquet")
    // the corpus vocabulary, most frequent first — the probe batches
    // rotate through it deterministically (collect bounded: the widest
    // synthetic vocabulary is 50k words, histogram-scale)
    val vocab = d.select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(65536)
      .collect().map(_.getString(0)).toSeq
    def probeBatch(i: Int): DataFrame = {
      // 4 queries × 3 terms per batch, sliding over the vocabulary so
      // every batch prunes DIFFERENT term buckets (a loop's eval slices
      // are disjoint-ish, not identical); --probe-tail indexes from the
      // RARE end (small df — the favorable-regime probe shape)
      val rows = (0 until 4).flatMap { q =>
        (0 until 3).map { t =>
          val k = (i * 7 + q * 3 + t) % vocab.size
          val idx = if (probeTail) vocab.size - 1 - k else k
          (i * 4 + q, vocab(idx))
        }
      }
      rows.toDF("query_id", "term")
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // one-time store build — the cost the loop amortizes
    val path = java.nio.file.Files.createTempDirectory("graft-lexloop")
      .resolve("stats").toString
    val tBuild = time {
      RetrievalOps.lexicalStatsStore(spark, d, path, "doc_id", "text")
      ()
    }
    val stats = RetrievalOps.readLexicalStats(spark, path)

    def inlineLoop(): Unit = (0 until nBatches).foreach { i =>
      sink(RetrievalOps.bm25PerQuery(d, probeBatch(i), "query_id",
        "term", "doc_id", "text", k = 5))
    }
    def storeLoop(): Unit = (0 until nBatches).foreach { i =>
      sink(RetrievalOps.bm25PerQueryFromStore(stats, probeBatch(i),
        "query_id", "term", "doc_id", k = 5))
    }

    // warm both paths once (JIT/codegen caches), then interleave reps
    inlineLoop(); storeLoop()
    val inl = Array.fill(reps)(0.0)
    val sto = Array.fill(reps)(0.0)
    (0 until reps).foreach { r =>
      inl(r) = time(inlineLoop())
      sto(r) = time(storeLoop())
    }
    val tInl = inl.min
    val tSto = sto.min
    def r3(x: Double) = math.rint(x * 1000) / 1000
    println(s"""{"metric":"lex_loop_ab","dir":"$dir",""" +
      s""""longdoc":$genLongDoc,"probe_tail":$probeTail,""" +
      s""""n_batches":$nBatches,"reps":$reps,""" +
      s""""store_build_sec":${r3(tBuild)},""" +
      s""""inline_loop_sec":${r3(tInl)},""" +
      s""""store_loop_sec":${r3(tSto)},""" +
      s""""store_loop_incl_build_sec":${r3(tSto + tBuild)},""" +
      s""""per_call_inline":${r3(tInl / nBatches)},""" +
      s""""per_call_store":${r3(tSto / nBatches)}}""")
    spark.stop()
  }
}
