package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, 100L), (8L, 300L), (16L, 200L), (24L, 50L), // shard 0
    (1L, 400L), (9L, 200L)                           // shard 1
  ).toDF("doc_id", "n")

  test("packBins: concat-and-chunk bin = floor(prefix_sum / budget)") {
    val r = PackOps.packBins(docs, "doc_id", col("n"), budget = 512, nShards = 8)
      .select("doc_id", "shard", "bin")
      .collect().map(x => x.getLong(0) -> ((x.getInt(1), x.getInt(2)))).toMap
    // shard 0 prefix sums before each doc: 0, 100, 400, 600
    assert(r(0L) == ((0, 0)))
    assert(r(8L) == ((0, 0)))
    assert(r(16L) == ((0, 0)))
    assert(r(24L) == ((0, 1))) // starts at 600 >= 512
    // shard 1: prefix 0, 400
    assert(r(1L) == ((1, 0)))
    assert(r(9L) == ((1, 0)))
  }

  test("packSummary conserves documents and tokens") {
    val s = PackOps.packSummary(docs, "doc_id", col("n"), 512, 8)
    val tot = s.agg(sum("n_docs"), sum("n_tokens")).head
    assert(tot.getLong(0) == 6L)
    assert(tot.getLong(1) == 1250L)
    // bins within a shard are contiguous from 0
    val bins = s.filter(col("shard") === 0).select("bin")
      .collect().map(_.getInt(0)).sorted
    assert(bins.sameElements(Array(0, 1)))
  }

  test("bin assignment is deterministic in (id, budget, shards) only") {
    // same rows, shuffled input order → identical assignment
    val shuffled = docs.orderBy(rand(7))
    val a = PackOps.packBins(docs, "doc_id", col("n"), 512, 8)
      .select("doc_id", "bin").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = PackOps.packBins(shuffled, "doc_id", col("n"), 512, 8)
      .select("doc_id", "bin").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a == b)
  }

  test("property: random corpora conserve docs/tokens; bins start at 0") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val rows = (0 until 200).map(i =>
        (i.toLong, (rnd.nextInt(500) + 1).toLong))
      val total = rows.map(_._2).sum
      val budget = rnd.nextInt(900) + 100
      val s = PackOps.packSummary(rows.toDF("doc_id", "n"), "doc_id",
        col("n"), budget, 8).collect()
      assert(s.map(_.getAs[Long]("n_docs")).sum == 200L)
      assert(s.map(_.getAs[Long]("n_tokens")).sum == total)
      // a huge doc may SKIP bins (its successor starts several budgets
      // later) but every shard's first bin is 0 and ids never exceed
      // floor(shard total / budget)
      for ((_, group) <- s.groupBy(_.getInt(0))) {
        val bins = group.map(_.getInt(1)).sorted
        assert(bins.head == 0)
        val shardTotal = group.map(_.getAs[Long]("n_tokens")).sum
        assert(bins.last <= shardTotal / budget)
      }
    }
  }

  test("packBins rejects a non-integral id column loudly") {
    // pmod on a string id would NULL every shard and funnel the corpus
    // through one window partition — fail at the call instead
    val docs = Seq(("a", "x y"), ("b", "z")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      PackOps.packBins(docs, "doc_id",
        org.apache.spark.sql.functions.lit(2), budget = 4, nShards = 2))
    assert(e.getMessage.contains("integral"))
  }

  test("packBins rejects non-positive nShards and budget loudly") {
    // pmod(id, 0) is NULL — the same silent single-partition funnel the
    // id-type require guards against
    val docs = Seq((1L, "x y"), (2L, "z")).toDF("doc_id", "text")
    val lit2 = org.apache.spark.sql.functions.lit(2)
    assert(intercept[IllegalArgumentException](
      PackOps.packBins(docs, "doc_id", lit2, budget = 4, nShards = 0))
      .getMessage.contains("nShards"))
    assert(intercept[IllegalArgumentException](
      PackOps.packBins(docs, "doc_id", lit2, budget = 0, nShards = 2))
      .getMessage.contains("budget"))
  }

  test("plan: one exchange on shard, summary reuses it") {
    val plan = PackOps.packSummary(docs, "doc_id", col("n"), 512, 8)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected single shard exchange:\n$plan")
  }

  test("packTokenStreams: per-bin streams carry every document's pieces " +
      "in id order with position-faithful <|doc|> boundaries; n_tokens " +
      "counts exactly the stream's tokens; zero-piece docs keep their " +
      "boundary slot") {
    val d = Seq(
      (0L, Seq("a", "b", "c")),   // shard 0
      (8L, Seq.empty[String]),    // shard 0, zero pieces
      (16L, Seq("xy")),           // shard 0
      (1L, Seq("q", "r")),        // shard 1
      (9L, null)                  // shard 1, NULL pieces — normalizes to
                                  // an empty segment, NOT a phantom
                                  // (shard, NULL) bin
    ).toDF("doc_id", "pieces")
    val r = PackOps.packTokenStreams(d, "doc_id", col("pieces"),
        budget = 512, nShards = 8)
      .collect().map(x => (x.getInt(0), x.getInt(1)) ->
        ((x.getLong(2), x.getLong(3), x.getString(6)))).toMap
    assert(r.size == 2, r) // no NULL-bin row
    assert(r((0, 0)) == ((3L, 4L, "a b c <|doc|>  <|doc|> xy")))
    assert(r((1, 0)) == ((2L, 2L, "q r <|doc|> ")))
    // n_tokens ≡ the stream's own token count (boundaries excluded)
    r.values.foreach { case (_, nTok, stream) =>
      val toks = stream.split(" ").filter(t => t.nonEmpty && t != "<|doc|>")
      assert(toks.length.toLong == nTok, stream)
    }
  }

  test("packTokenStreams: the stream is the subwordPieces reassembly on " +
      "real fixture text, and the plan pays ONE exchange (the bin " +
      "aggregate rides the shard window's partitioning)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = PackOps.packTokenStreams(d, "doc_id",
      TextOps.subwordPieces(col("text")), budget = 512, nShards = 4)
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected single shard exchange:\n$plan")
    // token conservation: Σ bin n_tokens = Σ doc subword counts
    val binTokens = out.agg(sum(col("n_tokens"))).head().getLong(0)
    val docTokens = d.agg(sum(TextOps.subwordTokenCount(col("text"))))
      .head().getLong(0)
    assert(binTokens == docTokens)
    // every piece of a sampled doc appears contiguously in its bin
    val doc = d.select(col("doc_id"),
        TextOps.subwordPieces(col("text")).as("p"))
      .orderBy(col("doc_id")).head()
    val expect = doc.getSeq[String](1).mkString(" ")
    val stream = out
      .filter(col("first_id") <= doc.getLong(0) &&
        col("last_id") >= doc.getLong(0) &&
        pmod(lit(doc.getLong(0)), lit(4)) === col("shard"))
      .collect().map(_.getString(6))
    assert(stream.exists(_.contains(expect)), s"$expect not in any stream")
  }

  test("packTokenStreams withBoundaries: hand-checked ids/offsets/" +
      "lengths incl. zero-piece and NULL-piece docs; the default " +
      "schema is unchanged") {
    val d = Seq(
      (0L, Seq("a", "b", "c")), (8L, Seq.empty[String]),
      (16L, Seq("xy")), (1L, Seq("q", "r")), (9L, null)
    ).toDF("doc_id", "pieces")
    val r = PackOps.packTokenStreams(d, "doc_id", col("pieces"),
        budget = 512, nShards = 8, withBoundaries = true)
      .collect().map(x => (x.getInt(0), x.getInt(1)) ->
        ((x.getSeq[Long](7), x.getSeq[Int](8), x.getSeq[Int](9)))).toMap
    // shard 0: docs 0 (3 tok), 8 (0), 16 (1) → the zero-length doc 8
    // still claims a boundary slot: offsets 0, 3+1=4, 4+0+1=5
    assert(r((0, 0)) == ((Seq(0L, 8L, 16L), Seq(0, 4, 5), Seq(3, 0, 1))))
    // shard 1: docs 1 (2 tok), 9 (NULL → 0 tok)
    assert(r((1, 0)) == ((Seq(1L, 9L), Seq(0, 3), Seq(2, 0))))
    val cols = PackOps.packTokenStreams(d, "doc_id", col("pieces"),
      budget = 512, nShards = 8).columns.toSeq
    assert(!cols.contains("doc_ids"), cols)
  }

  test("packTokenStreams withBoundaries: invariants on real fixture " +
      "text (offsets start at 0, advance by length+1, Σ lengths = " +
      "n_tokens, array sizes = n_docs) and the plan STILL pays one " +
      "exchange — the arrays ride the same aggregate") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = PackOps.packTokenStreams(d, "doc_id",
      TextOps.subwordPieces(col("text")), budget = 512, nShards = 4,
      withBoundaries = true)
    val plan = out.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"expected single shard exchange:\n$plan")
    out.collect().foreach { x =>
      val (nDocs, nTok) = (x.getLong(2), x.getLong(3))
      val ids = x.getSeq[Long](7)
      val offs = x.getSeq[Int](8)
      val lens = x.getSeq[Int](9)
      assert(ids.size == nDocs && offs.size == nDocs && lens.size == nDocs)
      assert(ids == ids.sorted) // stream order is id order
      assert(offs.head == 0)
      offs.zip(lens).sliding(2).foreach {
        case Seq((o1, l1), (o2, _)) => assert(o2 == o1 + l1 + 1)
        case _ => ()
      }
      assert(lens.map(_.toLong).sum == nTok)
      // the i-th stream segment has exactly lengths(i) tokens
      val segs = x.getString(6).split(" <\\|doc\\|> ", -1)
      assert(segs.length == nDocs)
      segs.zip(lens).foreach { case (seg, l) =>
        assert(seg.split(" ").count(_.nonEmpty) == l, s"'$seg' vs $l") }
    }
  }

  test("epochShuffle: reproducible per seed, permuted across seeds, " +
      "(shard, ord) is a dense total order") {
    import spark.implicits._
    val d = (1L to 200L).toDF("doc_id")
    def run(seed: Long) = PackOps.epochShuffle(d, "doc_id", seed, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    val a1 = run(7L); val a2 = run(7L); val b = run(8L)
    assert(a1.toSeq == a2.toSeq) // same seed → identical epoch order
    assert(a1.toSeq != b.toSeq)  // new seed → a different permutation
    assert(a1.length == 200)
    // within each shard, ord is exactly 1..count (dense, no gaps/dups)
    a1.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length).toSeq)
    }
    // md5-coin sharding spreads uniformly-ish (no empty shard at n=200)
    assert(a1.map(_._2).distinct.length == 4)
  }

  test("epochShuffle → shard writer layout adds NO further exchange " +
      "(the window's partitioning IS the write layout)") {
    import spark.implicits._
    val shuffled = PackOps.epochShuffle((1L to 500L).toDF("doc_id"),
      "doc_id", 7L, 8)
    val writer = shuffled.repartition(col("shard"))
      .sortWithinPartitions("ord")
    val p = writer.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1,
      s"expected the window exchange only, got $exchanges:\n$p")
  }

  test("epochShuffle rejects a non-positive shard count") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException](
      PackOps.epochShuffle((1L to 3L).toDF("doc_id"), "doc_id", 1L, 0))
    assert(e.getMessage.contains("nShards"))
  }

  private def epochDocs = {
    val rnd = new scala.util.Random(21)
    ((1L to 40L).map(i => (i, "a", rnd.nextInt(30).toLong + 5)) ++
      (101L to 140L).map(i => (i, "b", rnd.nextInt(30).toLong + 5)))
      .toDF("doc_id", "src", "n")
  }

  test("epochPack: instances per doc equal the schedule's n_repeats; " +
      "scheduled tokens conserve; repeated copies scatter across shards") {
    val supplyA = epochDocs.filter(col("src") === "a")
      .agg(sum("n")).head.getLong(0)
    val targets = Map("a" -> (3 * supplyA + supplyA / 2), "b" -> 200L)
    val sched = DedupOps.repetitionSchedule(epochDocs, "doc_id", "src",
        col("n"), targets)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val inst = PackOps.epochPack(epochDocs, "doc_id", "src", col("n"),
        targets, seed = 5L, budget = 256, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5)))
    // exactly n_repeats instances per doc, rep_idx dense 1..n_repeats
    inst.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.length.toLong == sched(id), s"doc $id")
      assert(rows.map(_._2).sorted.toSeq == (1L to sched(id)).toSeq)
    }
    assert(sched.filter(_._2 > 0).keySet == inst.map(_._1).toSet)
    // token conservation: Σ instance tokens == Σ n_repeats·n_tok
    val schedTok = epochDocs.collect()
      .map(r => sched(r.getLong(0)) * r.getLong(2)).sum
    assert(inst.map(_._3).sum == schedTok)
    // the anti-adjacency property: docs repeating ≥3 times spread over
    // >1 shard in the (deterministic) committed seed — a naive
    // array_repeat concat would put every copy in ONE bin back-to-back
    val multi = inst.groupBy(_._1).filter(_._2.length >= 3)
    assert(multi.nonEmpty)
    val spread = multi.count(_._2.map(_._4).distinct.length > 1)
    assert(spread * 2 > multi.size,
      s"most repeated docs must scatter: $spread of ${multi.size}")
    // bins are dense from 0 within each shard
    inst.groupBy(_._4).foreach { case (sh, rows) =>
      val bins = rows.map(_._5).distinct.sorted
      assert(bins.toSeq == (0 to bins.max).toSeq, s"shard $sh bins: $bins")
    }
  }

  test("epochPack: reproducible per seed, re-permuted across seeds") {
    val targets = Map("a" -> 2000L, "b" -> 500L)
    def run(seed: Long) = PackOps.epochPack(epochDocs, "doc_id", "src",
        col("n"), targets, seed, budget = 256, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(4),
        r.getInt(5))).sorted.toSeq
    assert(run(5L) == run(5L))
    assert(run(5L) != run(6L)) // same instances, different layout
    assert(run(5L).map(r => (r._1, r._2)) == run(6L).map(r => (r._1, r._2)))
  }

  test("packEfficiency: exact integer fill accounting — straddlers " +
      "overflow their bin, the last bin runs under, fill_ratio is one " +
      "division") {
    // shard 0 (docs 0,8,16,24; budget 512): prefix 0,100,400,600 →
    // bins 0,0,0,1; bin 0 holds 600 tokens (overflow: doc 16 straddles),
    // bin 1 holds 50 (the under-full tail)
    val r = PackOps.packEfficiency(docs, "doc_id", col("n"),
        budget = 512, nShards = 8)
      .orderBy("shard")
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getDouble(5), x.getLong(6)))
    // shard 1 (docs 1,9): prefix 0,400 → one bin of 600 — overflowing
    assert(r.toSeq == Seq(
      (0, 2L, 4L, 650L, 1024L, 0.634766, 1L),
      (1, 1L, 2L, 600L, 512L, 1.171875, 1L)), r.toSeq)
  }

  // --- curriculumOrder (q165) -----------------------------------------

  private def scoredDocs = Seq(
    // (doc_id, n_tok, score): shard 0 packs docs 0,8 into bin 0 and 16
    // into bin 1 (budget 512); shard 1 packs 1,9 into bin 0
    (0L, 300L, 0.9), (8L, 300L, 0.5), (16L, 200L, 0.2), // s0: b0 b0 b1
    (1L, 400L, 0.8), (9L, 200L, 0.6)                    // s1: b0 b0
  ).toDF("doc_id", "n_tok", "score")

  test("curriculumOrder: bin rollups are exact integer micro-score " +
      "means and positions follow the quality order (high first)") {
    val r = PackOps.curriculumOrder(scoredDocs, "doc_id", col("n_tok"),
        col("score"), budget = 512, nShards = 8)
      .orderBy("curriculum_pos")
      .collect().map(x => (x.getInt(0), x.getInt(1), x.getLong(2),
        x.getLong(3), x.getDouble(4), x.getLong(5)))
    // bins: (s0,b0) mean(0.9,0.5)=0.7; (s1,b0) mean(0.8,0.6)=0.7;
    // (s0,b1) 0.2. Tie at 0.7 breaks by (shard, bin): s0 first.
    assert(r.toSeq == Seq(
      (0, 0, 2L, 600L, 0.7, 1L),
      (1, 0, 2L, 600L, 0.7, 2L),
      (0, 1, 1L, 200L, 0.2, 3L)), r.toSeq)
  }

  test("curriculumOrder: highFirst=false reverses the schedule; the " +
      "two-phase positions are bucketing-independent (nBuckets=1 == " +
      "nBuckets=4096)") {
    def positions(nb: Int, hf: Boolean) =
      PackOps.curriculumOrder(scoredDocs, "doc_id", col("n_tok"),
          col("score"), budget = 512, nShards = 8, highFirst = hf,
          nBuckets = nb)
        .orderBy("curriculum_pos")
        .collect().map(x => (x.getInt(0), x.getInt(1), x.getLong(5))).toSeq
    val asc = positions(4096, hf = false)
    assert(asc == Seq((0, 1, 1L), (0, 0, 2L), (1, 0, 3L)), asc)
    assert(positions(1, hf = true) == positions(4096, hf = true))
    assert(positions(1, hf = false) == positions(4096, hf = false))
    assert(positions(3, hf = true) == positions(4096, hf = true))
  }

  test("curriculumOrder: NULL and NaN scores don't poison the mean " +
      "(they skip the sum AND the divisor); an all-NULL bin is excluded") {
    val d = Seq(
      (0L, 300L, Some(0.9)),
      (8L, 300L, None),                  // s0 b0: NULL skips
      (16L, 100L, Some(Double.NaN)),     // s0 b1: NaN == NULL here
      (2L, 100L, Option.empty[Double])   // s2 b0: all-NULL
    ).toDF("doc_id", "n_tok", "score")
    val r = PackOps.curriculumOrder(d, "doc_id", col("n_tok"),
        col("score"), budget = 512, nShards = 8)
      .collect().map(x => ((x.getInt(0), x.getInt(1)),
        (x.getLong(2), x.getDouble(4), x.getLong(5)))).toMap
    // (0,1) holds only the NaN-scored doc → excluded like the all-NULL
    // bin; (0,0)'s mean skips its NULL row but n_docs still counts it
    assert(r.keySet == Set((0, 0)), r)
    assert(r((0, 0)) == ((2L, 0.9, 1L)), r)
  }

  test("curriculumOrder validates its arguments loudly") {
    def msg(f: => Any): String =
      intercept[IllegalArgumentException](f).getMessage
    assert(msg(PackOps.curriculumOrder(scoredDocs, "doc_id",
      col("n_tok"), col("score"), 512, 8, nBuckets = 0))
      .contains("nBuckets"))
    assert(msg(PackOps.curriculumOrder(scoredDocs, "doc_id",
      col("n_tok"), col("score"), 512, 8, scoreLo = 1.0, scoreHi = 1.0))
      .contains("empty"))
  }
}
