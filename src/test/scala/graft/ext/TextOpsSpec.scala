package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("tokens lowercases and splits on whitespace runs") {
    val r = one("The  Quick\tbrown Fox")
      .select(TextOps.tokens(col("text"))).head.getSeq[String](0)
    assert(r == Seq("the", "quick", "brown", "fox"))
  }

  test("shingles: k-grams in order; short docs yield empty") {
    val r = one("a b c d")
      .select(TextOps.shingles(TextOps.tokens(col("text")), 3))
      .head.getSeq[String](0)
    assert(r == Seq("a b c", "b c d"))
    val short = one("a b")
      .select(TextOps.shingles(TextOps.tokens(col("text")), 3))
      .head.getSeq[String](0)
    assert(short.isEmpty)
  }

  test("slidingChunks: stride starts, overlap, truncated tail, full " +
      "coverage; short doc emits one chunk; map-only plan") {
    val docs = Seq(
      (1L, (0 until 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c"))                                     // short: 1 chunk
      .toDF("doc_id", "text")
    val rows = TextOps.slidingChunks(docs, "doc_id", "text",
        chunkTokens = 4, strideTokens = 3)
      .orderBy("doc_id", "chunk_idx").collect()
    val d1 = rows.filter(_.getLong(0) == 1L)
    // starts: 0,3,6,9 (9 < 10, the last stride multiple below nTokens)
    assert(d1.map(_.getInt(2)).toSeq == Seq(0, 3, 6, 9))
    assert(d1.map(_.getInt(3)).toSeq == Seq(4, 4, 4, 1), "tail truncates")
    assert(d1.head.getString(4) == "t0 t1 t2 t3")
    assert(d1(1).getString(4) == "t3 t4 t5 t6", "overlap = chunk - stride")
    // every token appears in at least one chunk
    val covered = d1.flatMap(_.getString(4).split(" ")).toSet
    assert(covered == (0 until 10).map(i => s"t$i").toSet)
    val d2 = rows.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2.head.getString(4) == "a b c")
    // a stride wider than the chunk would drop tokens — refused
    intercept[IllegalArgumentException] {
      TextOps.slidingChunks(docs, "doc_id", "text", 4, 5)
    }
    // map-only: no exchange anywhere in the chunker itself
    val p = TextOps.slidingChunks(docs, "doc_id", "text", 4, 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunker must not shuffle:\n$p")
  }

  test("bpe tokens split letter runs, digit runs, punctuation marks") {
    val r = one("ab12, cd!").select(TextOps.bpeTokens(col("text")))
      .head.getSeq[String](0)
    assert(r == Seq("ab", "12", ",", "cd", "!"))
  }

  test("docFingerprint is whitespace-insensitive and case-insensitive") {
    val fp1 = one("Hello  World").select(TextOps.docFingerprint(col("text"))).head.getString(0)
    val fp2 = one("hello world").select(TextOps.docFingerprint(col("text"))).head.getString(0)
    val fp3 = one("hello there").select(TextOps.docFingerprint(col("text"))).head.getString(0)
    assert(fp1 == fp2)
    assert(fp1 != fp3)
  }

  test("minShingleFingerprint collides iff some shingle is shared") {
    val base = "one two three four five six seven"
    val overlap = "zero one two three four five xx"   // shares "one two three four five"
    val fps = Seq(base, overlap).toDF("text")
      .select(TextOps.minShingleFingerprint(TextOps.tokens(col("text")), 5))
      .collect().map(_.getString(0))
    // not guaranteed equal (min may come from a non-shared shingle), but
    // both must be valid md5 hex
    assert(fps.forall(_.matches("[0-9a-f]{32}")))
  }

  test("stopword/punct ratios and quality score are in range") {
    val r = one("the cat, and the dog!").select(
      TextOps.stopwordRatio(TextOps.tokens(col("text"))).as("sr"),
      TextOps.punctRatio(col("text")).as("pr"),
      TextOps.qualityScore(col("text")).as("q")).head
    assert(r.getDouble(0) == 0.6)  // "the","and","the" of 5 tokens = 3/5
    assert(r.getDouble(1) > 0 && r.getDouble(1) < 0.2)
    assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1)
  }

  test("repetitionMetrics: degenerate doc flagged, varied doc passes") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val r = TextOps.repetitionMetrics(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: one token repeated — every signal saturates
    assert(r(0).getAs[Double]("top_tok_frac") == 1.0)
    assert(r(0).getAs[Double]("dup_2gram_frac") == 0.8)   // 5 bigrams, 1 distinct
    assert(r(0).getAs[Double]("dup_3gram_frac") == 0.75)  // 4 trigrams, 1 distinct
    assert(r(0).getAs[Boolean]("repetitive"))
    // doc 2: all-distinct tokens — no duplicate n-grams, low top fraction
    assert(r(1).getAs[Double]("top_tok_frac") == 0.125)
    assert(r(1).getAs[Double]("dup_2gram_frac") == 0.0)
    assert(r(1).getAs[Double]("dup_3gram_frac") == 0.0)
    assert(!r(1).getAs[Boolean]("repetitive"))
  }

  test("repetitionMetrics: doc shorter than k yields null fraction") {
    val r = TextOps.repetitionMetrics(
        Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", "text").head
    assert(r.getAs[Double]("dup_2gram_frac") == 0.0) // one bigram, distinct
    assert(r.isNullAt(r.fieldIndex("dup_3gram_frac"))) // no trigrams exist
    // top_tok_frac 0.5 still trips the gate (null OR true = true)
    assert(r.getAs[Boolean]("repetitive"))
  }

  test("contaminationFlags: shared k-gram flags, disjoint doc stays clean") {
    val evalSet = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma x y"), // shares "alpha beta gamma"
      (2L, "p q r s t")).toDF("doc_id", "text")
    val r = TextOps.contaminationFlags(train, evalSet, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_hit_grams") == 1L)
    assert(r(0).getAs[Boolean]("contaminated"))
    assert(r(1).getAs[Long]("n_hit_grams") == 0L)
    assert(!r(1).getAs[Boolean]("contaminated"))
  }

  test("evalOverlapReport: per-eval-doc distinct-gram overlap fraction; " +
      "gramless docs keep n_grams=0 with a NULL fraction; the train " +
      "gram stream is cut by a BROADCAST before any shuffle") {
    val evalSet = Seq(
      (100L, "alpha beta gamma delta"), // 2 grams, 1 in train → 0.5
      (101L, "p q r"),                  // 1 gram, absent → 0.0
      (102L, "x y"),                    // < k tokens → gramless
      (103L, null: String)              // null text → gramless
    ).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma x y"),
      (2L, "alpha beta gamma z")).toDF("doc_id", "text")
    val out = TextOps.evalOverlapReport(train, evalSet, "doc_id", "text",
      k = 3)
    val r = out.orderBy("doc_id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(100L, 101L, 102L, 103L))
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getDouble(3)) ==
      ((2L, 1L, 0.5)))
    assert((r(1).getLong(1), r(1).getLong(2), r(1).getDouble(3)) ==
      ((1L, 0L, 0.0)))
    assert(r(2).getLong(1) == 0L && r(2).isNullAt(3))
    assert(r(3).getLong(1) == 0L && r(3).isNullAt(3))
    // a train gram appearing in MANY train docs counts the eval gram
    // once (the hit set is distinct grams, not occurrences)
    // plan: the train side joins the broadcast eval gram set (no
    // corpus-gram shuffle reaches the aggregate)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan.take(2000))
  }

  test("contaminationFlags counts distinct grams once per doc") {
    // the shared gram occurs twice in the train doc — distinct-per-doc
    // semantics count it once
    val evalSet = Seq((100L, "a b c")).toDF("doc_id", "text")
    val train = Seq((1L, "a b c z a b c")).toDF("doc_id", "text")
    val r = TextOps.contaminationFlags(train, evalSet, "doc_id", "text", k = 3)
      .head
    assert(r.getAs[Long]("n_hit_grams") == 1L)
  }

  test("vocabCoverage: OOV counted per doc, alphabetical cutoff tie-break") {
    val docs = Seq(
      (1L, "x x x y y z"),  // corpus freq: x=4, y=3, z=1, q=1
      (2L, "x y q")).toDF("doc_id", "text")
    val r = TextOps.vocabCoverage(docs, "doc_id", "text", vocabSize = 2)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_tokens") == 6L)
    assert(r(0).getAs[Long]("n_oov") == 1L)  // z outside {x, y}
    assert(r(1).getAs[Long]("n_oov") == 1L)  // q outside {x, y}
    assert(r(1).getAs[Double]("oov_rate") == 0.3333)
    // third vocab slot: q and z tie at freq 1 → 'q' wins alphabetically
    val r3 = TextOps.vocabCoverage(docs, "doc_id", "text", vocabSize = 3)
      .orderBy("doc_id").collect()
    assert(r3(0).getAs[Long]("n_oov") == 1L)  // z still OOV
    assert(r3(1).getAs[Long]("n_oov") == 0L)  // q now in vocab
  }

  test("lmScore: rare-token docs score low and get flagged") {
    val docs = Seq(
      (1L, "a a a b"),  // common tokens → high avg logp
      (2L, "b c")       // contains the rarest token → low avg logp
    ).toDF("doc_id", "text")
    // corpus freqs: a=3, b=2, c=1; total=6
    val r = TextOps.lmScore(docs, "doc_id", "text", minAvgLogp = -1.0)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Double]("avg_logp") ==
      math.rint((3 * math.log(3.0 / 6) + math.log(2.0 / 6)) / 4 * 1e4) / 1e4)
    assert(!r(0).getAs[Boolean]("lm_outlier"))
    assert(r(1).getAs[Double]("avg_logp") < -1.4)
    assert(r(1).getAs[Boolean]("lm_outlier"))
  }

  test("vocabCoverage and lmScore keep NULL-text docs in the output") {
    // a per-doc metric table must cover every input doc — a plain explode
    // silently dropped NULL-text rows where repetitionMetrics kept them
    val docs = Seq((1L, Some("a a b")), (2L, None))
      .toDF("doc_id", "text")
    val vc = TextOps.vocabCoverage(docs, "doc_id", "text", vocabSize = 2)
      .orderBy("doc_id").collect()
    assert(vc.length == 2)
    assert(vc(1).getAs[Long]("n_tokens") == 0L)
    assert(vc(1).isNullAt(vc(1).fieldIndex("oov_rate")))
    val lm = TextOps.lmScore(docs, "doc_id", "text", minAvgLogp = -1.0)
      .orderBy("doc_id").collect()
    assert(lm.length == 2)
    assert(lm(1).getAs[Long]("n_toks") == 0L)
    assert(lm(1).isNullAt(lm(1).fieldIndex("avg_logp")))
  }

  test("langId picks max-overlap profile with alphabetical tie-break") {
    val en = one("the cat is on a mat")
      .select(TextOps.langId(TextOps.tokens(col("text")))).head.getString(0)
    assert(en == "en")
    val fr = one("le chat et les chiens est un")
      .select(TextOps.langId(TextOps.tokens(col("text")))).head.getString(0)
    assert(fr == "fr")
    // no profile word at all → every score 0 → tie → alphabetically first
    val tie = one("xyzzy plugh")
      .select(TextOps.langId(TextOps.tokens(col("text")))).head.getString(0)
    assert(tie == "de")
  }

  test("punctRatio and qualityScore: empty text yields NULL, " +
      "not an ANSI DIVIDE_BY_ZERO") {
    // DuckDB's 0/0 is NULL; a bare Spark divide raises under ANSI mode —
    // the guard must produce the oracle's NULL (gates treat NULL as reject)
    val r = one("")
      .select(TextOps.punctRatio(col("text")).as("pr"),
        TextOps.qualityScore(col("text")).as("q"))
      .head
    assert(r.isNullAt(0) && r.isNullAt(1))
    // and NULL text still propagates NULL
    val n = Seq(Option.empty[String]).toDF("text")
      .select(TextOps.punctRatio(col("text"))).head
    assert(n.isNullAt(0))
  }

  test("redactPii: email, ip, and phone each redact; counts agree with " +
      "the markers emitted") {
    val txt = "mail a.b+c@ex-1.co now, ping 192.168.0.1 or call +44-555-0199"
    val row = one(txt).select(
      Seq(TextOps.redactPii(col("text")).as("r")) ++
        TextOps.piiCounts(col("text")).map { case (nm, c) => c.as(nm) }: _*)
      .head
    assert(row.getString(0) ==
      "mail <EMAIL> now, ping <IP> or call <PHONE>")
    assert((row.getInt(1), row.getInt(2), row.getInt(3)) == ((1, 1, 1)))
  }

  test("redactPii leaves near-misses untouched (scrub must not corrupt " +
      "non-PII text)") {
    val cases = Seq(
      "version 1.2.3 released",        // 3 dotted groups, not an ipv4
      "not@anemail",                   // no TLD
      "meet at 12-345 main st",        // digit runs too short for a phone
      "pi is 3.14159 and e is 2.71828" // decimals
    )
    cases.foreach { c =>
      val out = one(c).select(TextOps.redactPii(col("text"))).head.getString(0)
      assert(out == c, s"corrupted: '$c' -> '$out'")
    }
    // NULL text propagates NULL, and counts stay NULL (not 0): a gate
    // must SEE the null, same contract as punctRatio
    val n = Seq(Option.empty[String]).toDF("text")
      .select(Seq(TextOps.redactPii(col("text")).as("r")) ++
        TextOps.piiCounts(col("text")).map { case (nm, c) => c.as(nm) }: _*)
      .head
    (0 to 3).foreach(i => assert(n.isNullAt(i)))
  }

  test("piiCounts stage order: an ip inside an already-redacted email is " +
      "not double-counted") {
    // the mailbox text embeds an ipv4-shaped host; the email pass consumes
    // it, so n_ips must be 0 — counting on the raw text would say 1
    val txt = "root@10.0.0.1.example.com"
    val row = one(txt).select(
      TextOps.piiCounts(col("text")).map { case (nm, c) => c.as(nm) }: _*)
      .head
    assert((row.getInt(0), row.getInt(1), row.getInt(2)) == ((1, 0, 0)))
  }

  test("boilerplateMetrics: shared template flagged, unique docs pass, " +
      "short docs survive with null frac") {
    val template = "all rights reserved contact legal department now"
    val docs = Seq(
      (1L, template), (2L, template), (3L, template),
      (4L, template + " plus unique suffix content here"),
      (5L, "a wholly original document with distinct phrasing throughout"),
      (6L, "too short"),
      (7L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val m = TextOps.boilerplateMetrics(docs, "doc_id", "text",
        k = 3, maxDf = 2, maxCommonFrac = 0.5)
      .orderBy(col("doc_id")).collect()
    assert(m.length == 7) // no input row dropped
    val byId = m.map(r => r.getLong(0) -> r).toMap
    // docs 1-3: every shingle shared by 4 docs > maxDf=2 → frac 1.0, flagged
    Seq(1L, 2L, 3L).foreach { id =>
      assert(byId(id).getDouble(3) == 1.0 && byId(id).getBoolean(4))
    }
    // doc 4: the template's 5 interior shingles are common (df=4), the
    // suffix and bridging shingles are df=1 → 5 of 10 = 0.5, NOT flagged
    // (strict >)
    assert(byId(4L).getDouble(3) == 0.5 && !byId(4L).getBoolean(4))
    // doc 5: nothing shared
    assert(byId(5L).getDouble(3) == 0.0 && !byId(5L).getBoolean(4))
    // docs 6-7: no shingles → 0 counts, null frac, unflagged
    Seq(6L, 7L).foreach { id =>
      val r = byId(id)
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L)
      assert(r.isNullAt(3) && !r.getBoolean(4))
    }
  }

  test("lmScoreBackoff: seen bigrams score c2/c1, unseen back off to " +
      "alpha-scaled add-one unigrams, held-out words stay finite") {
    val train = Seq((100L, "the cat sat"), (101L, "the cat ran"))
      .toDF("doc_id", "text") // T=6 tokens, V=4 vocab
    val score = Seq(
      (1L, "the cat sat"), // (2+1)/10, c2(the cat)/c1(the)=2/2, c2/c1=1/2
      (2L, "dog cat"),     // unseen word (0+1)/10; unseen bigram 0.4*3/10
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val r = TextOps.lmScoreBackoff(score, train, "doc_id", "text",
        minAvgLogp = -1.0)
      .orderBy(col("doc_id")).collect()
    assert(r(0).getLong(1) == 3L)
    val exp1 = BigDecimal((math.log(0.3) + math.log(1.0) + math.log(0.5)) / 3)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(0).getDouble(2) == exp1 && !r(0).getBoolean(3))
    assert(r(1).getLong(1) == 2L)
    val exp2 = BigDecimal((math.log(0.1) + math.log(0.4 * 0.3)) / 2)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(1).getDouble(2) == exp2 && r(1).getBoolean(3))
    // null-text doc keeps its row: 0 tokens, null score, null flag
    assert(r(2).getLong(1) == 0L && r(2).isNullAt(2) && r(2).isNullAt(3))
  }

  test("crossDocSpanStats: position-weighted coverage, cross-doc only, " +
      "short and null docs survive") {
    val docs = Seq(
      (1L, "a b c d e f"),          // grams: abcde (shared), bcdef
      (2L, "a b c d e x"),          // grams: abcde (shared), bcdex
      (3L, "p q r s t u v"),        // 3 unique grams
      (4L, "a b"),                  // too short: 0 grams
      (5L, "z z z z z z z z z z"),  // 6 positions of ONE within-doc gram
      (6L, "a b c d e"),            // 1 gram, shared → frac 1.0, flagged
      (7L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val m = TextOps.crossDocSpanStats(docs, "doc_id", "text",
        n = 5, minDocs = 2L, maxFrac = 0.5)
      .orderBy(col("doc_id")).collect()
    assert(m.length == 7)
    val byId = m.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), Option(r.get(3)), r.getBoolean(4)))).toMap
    // docs 1-2: one of two positions covered → 0.5, NOT flagged (strict >)
    assert(byId(1L) == ((2L, 1L, Some(0.5), false)))
    assert(byId(2L) == ((2L, 1L, Some(0.5), false)))
    assert(byId(3L) == ((3L, 0L, Some(0.0), false)))
    assert(byId(4L) == ((0L, 0L, None, false)))
    // doc 5: the gram repeats 6x WITHIN one doc but exists in only one
    // distinct doc — not shared (that's repetitionMetrics' signal)
    assert(byId(5L) == ((6L, 0L, Some(0.0), false)))
    assert(byId(6L) == ((1L, 1L, Some(1.0), true)))
    assert(byId(7L) == ((0L, 0L, None, false)))
  }

  test("crossDocSpanStats counts every covered POSITION, not distinct " +
      "grams (the coverage semantics boilerplateMetrics lacks)") {
    val docs = Seq(
      (1L, "x y z x y z x y z"),  // 5 positions; xyzxy at 1 and 4, yzxyz
                                  // at 2 and 5, zxyzx at 3
      (2L, "x y z x y")           // the single gram xyzxy — shared with doc 1
    ).toDF("doc_id", "text")
    val m = TextOps.crossDocSpanStats(docs, "doc_id", "text",
        n = 5, minDocs = 2L, maxFrac = 0.5)
      .orderBy(col("doc_id")).collect()
    // doc 1: BOTH xyzxy positions count as shared → 2 of 5
    assert(m(0).getLong(1) == 5L && m(0).getLong(2) == 2L)
    assert(m(0).getDouble(3) == 0.4)
    assert(m(1).getLong(1) == 1L && m(1).getLong(2) == 1L)
    assert(m(1).getBoolean(4))
  }

  test("cutSharedSpans: a doc that is 90% one shared paragraph keeps its " +
      "novel 10%; the corpus-wide first occurrence stays intact") {
    // paragraph P = 18 tokens; doc 1 = P + 2 novel tokens (the first
    // occurrence), doc 2 = 2 novel tokens + P (90% copied), doc 3 novel
    val p = (1 to 18).map(i => s"para$i").mkString(" ")
    val docs = Seq(
      (1L, s"$p coda1 coda2"),
      (2L, s"intro1 intro2 $p"),
      (3L, "entirely novel words with no overlap at all"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val r = TextOps.cutSharedSpans(docs, "doc_id", "text", n = 5)
      .orderBy(col("doc_id")).collect()
    // doc 1 holds every keeper gram: fully intact
    assert(r(0).getLong(1) == 20L && r(0).getLong(2) == 20L)
    assert(r(0).getString(3) == s"$p coda1 coda2")
    // doc 2: the copied 18 tokens cut, the novel 10% survives in place
    assert(r(1).getLong(1) == 20L && r(1).getLong(2) == 2L)
    assert(r(1).getString(3) == "intro1 intro2")
    // novel doc untouched; null-text doc keeps its row
    assert(r(2).getLong(2) == 8L &&
      r(2).getString(3) == "entirely novel words with no overlap at all")
    assert(r(3).getLong(1) == 0L && r(3).getLong(2) == 0L && r(3).isNullAt(3))
  }

  test("cutSharedSpans: a doc repeating its own span keeps only the first " +
      "copy; a span shared by three docs survives exactly once corpus-wide") {
    val p = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (5L, s"$p mid1 mid2 $p"),   // within-doc repeat: second copy cut
      (6L, s"lead1 lead2 $p"),    // third holder of P: cut
      (7L, s"$p tail1")           // doc 5 is lexicographically first
    ).toDF("doc_id", "text")
    val r = TextOps.cutSharedSpans(docs, "doc_id", "text", n = 5)
      .orderBy(col("doc_id")).collect()
    assert(r(0).getLong(1) == 22L && r(0).getLong(2) == 12L)
    assert(r(0).getString(3) == s"$p mid1 mid2")
    assert(r(1).getString(3) == "lead1 lead2")
    assert(r(2).getString(3) == "tail1")
    // exactly ONE copy of the paragraph survives across the corpus
    val kept = r.map(_.getString(3)).mkString(" ")
    assert("w1 w2 w3".r.findAllIn(kept).size == 1)
  }

  test("boilerplateMetrics counts a repeated within-doc shingle once " +
      "(df is document frequency, not occurrence count)") {
    val docs = Seq(
      (1L, "spam spam spam spam spam"), // one distinct shingle, df=1
      (2L, "fresh words only in here")
    ).toDF("doc_id", "text")
    val m = TextOps.boilerplateMetrics(docs, "doc_id", "text",
        k = 3, maxDf = 1, maxCommonFrac = 0.5)
      .orderBy(col("doc_id")).collect()
    // doc 1's "spam spam spam" appears 3x within the doc but in only ONE
    // doc: df=1, not > maxDf=1 → not common
    assert(m(0).getLong(1) == 1L && m(0).getLong(2) == 0L)
  }

  test("dsirWeights: target-like docs outweigh off-distribution docs, " +
      "n_feats counts unigrams+bigrams, null doc keeps its row") {
    val docs = Seq(
      (1L, "the cat sat", true),   // target slice
      (2L, "the cat ran", true),   // target slice
      (3L, "the cat sat", false),  // raw doc that matches the target
      (4L, "zz yy xx", false),     // raw doc off-distribution
      (5L, null.asInstanceOf[String], false)
    ).toDF("doc_id", "text", "is_tgt")
    val r = TextOps.dsirWeights(docs, col("is_tgt"), "doc_id", "text",
        nBuckets = 64)
      .orderBy(col("doc_id")).collect()
    val byId = r.map(x => x.getLong(0) ->
      (x.getLong(1), if (x.isNullAt(2)) Double.NaN else x.getDouble(2))).toMap
    // 3 tokens + 2 bigrams
    assert(byId(1L)._1 == 5L && byId(3L)._1 == 5L && byId(4L)._1 == 5L)
    // in-distribution beats off-distribution, decisively
    assert(byId(3L)._2 > byId(4L)._2,
      s"target-like doc should outweigh: $byId")
    assert(byId(4L)._2 < 0, "off-distribution weight should be negative")
    assert(byId(5L)._1 == 0L && byId(5L)._2.isNaN)
  }

  test("collapseTokenRuns: runs collapse to first occurrence, " +
      "non-adjacent repeats survive, null doc keeps its row") {
    val docs = Seq(
      (1L, "batch batch batch stream batch"), // run of 3 + a LATER repeat
      (2L, "a a a a a"),                      // whole doc is one run
      (3L, "x y x y"),                        // period-2: out of scope, kept
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val r = TextOps.collapseTokenRuns(docs, "doc_id", "text")
      .orderBy(col("doc_id")).collect()
    assert(r(0).getString(3) == "batch stream batch")
    assert(r(0).getLong(1) == 5L && r(0).getLong(2) == 3L)
    assert(r(1).getString(3) == "a" && r(1).getLong(2) == 1L)
    assert(r(2).getString(3) == "x y x y")
    assert(r(3).getLong(1) == 0L && r(3).getLong(2) == 0L &&
      r(3).isNullAt(3))
  }

  test("perplexityBuckets: equal-mass thirds by model score, head = the " +
      "docs the reference LM likes best, boundary ties share a bucket") {
    // train slice = docs 100/101 ("the cat …"); scored corpus (train rows
    // included, like CCNet) = 9 docs at three clearly separated score
    // levels of 3 docs each, so the disc thirds land exactly on the levels
    val docs = Seq(
      (100L, "the cat sat"), (101L, "the cat ran"),
      (1L, "the cat sat"),                               // in-domain: high
      (3L, "the dog sat"), (4L, "the dog sat"),
      (7L, "the dog sat"),                               // mixed: middle
      (5L, "zz yy xx ww"), (6L, "zz yy xx ww"),
      (8L, "zz yy xx ww")                                // unseen: low
    ).toDF("doc_id", "text")
    val r = TextOps.perplexityBuckets(docs, col("doc_id") >= 100L,
        "doc_id", "text")
      .orderBy(col("doc_id")).collect()
    assert(r.length == 9)
    val byId = r.map(x => x.getLong(0) -> x.getString(3)).toMap
    assert(Seq(5L, 6L, 8L).forall(byId(_) == "tail"), s"tail: $byId")
    assert(Seq(3L, 4L, 7L).forall(byId(_) == "middle"), s"middle: $byId")
    // ties share a bucket: doc 1 scores identically to its train twin 100,
    // and "the cat ran" backs into the same avg as "the cat sat"
    assert(Seq(1L, 100L, 101L).forall(byId(_) == "head"), s"head: $byId")
    // head scores dominate tail scores
    val s = r.map(x => x.getString(3) -> x.getDouble(2))
    assert(s.filter(_._1 == "head").map(_._2).min >
      s.filter(_._1 == "tail").map(_._2).max)
  }

  test("perplexityBuckets: null-text docs get the explicit 'null' bucket " +
      "and do not shift the thresholds for scoreable docs") {
    val base = Seq(
      (100L, "the cat sat"), (101L, "the cat ran"),
      (1L, "the cat sat"),
      (3L, "the dog sat"), (4L, "the dog sat"), (7L, "the dog sat"),
      (5L, "zz yy xx ww"), (6L, "zz yy xx ww"), (8L, "zz yy xx ww"))
    val withNulls = base ++ Seq((50L, null.asInstanceOf[String]),
      (51L, null.asInstanceOf[String]), (52L, null.asInstanceOf[String]))
    def buckets(rows: Seq[(Long, String)]): Map[Long, String] =
      TextOps.perplexityBuckets(rows.toDF("doc_id", "text"),
          col("doc_id") >= 100L, "doc_id", "text")
        .collect().map(x => x.getLong(0) -> x.getString(3)).toMap
    val clean = buckets(base)
    val dirty = buckets(withNulls)
    // the three unscoreable docs land in 'null' — NOT in head, the slice
    // CCNet keeps — and every scoreable doc's bucket is unchanged: the
    // nulls were excluded from the histogram and the threshold count
    assert(Seq(50L, 51L, 52L).forall(dirty(_) == "null"), s"$dirty")
    assert(base.forall { case (id, _) => dirty(id) == clean(id) },
      s"thresholds shifted: clean=$clean dirty=$dirty")
  }

  test("period-p repeats via composition: collapseTokenRuns then " +
      "chunkDedup removes pagination chrome that neither handles alone") {
    // collapseTokenRuns documents period > 1 as out of scope; THIS is the
    // documented composition for it. The fixture is scraped pagination
    // chrome: a stuttered 4-token nav block repeated between unique
    // paragraphs. Run collapse removes the stutter (making the chrome a
    // clean aligned block), then chunk dedup at the block size removes
    // the period-4 repeats corpus-wide.
    val chrome = "nav nav nav home about contact" // stutter + 4-token block
    val docs = Seq(
      (1L, s"$chrome alpha beta gamma delta $chrome epsilon zeta eta theta"),
      (2L, s"$chrome iota kappa lambda mu")
    ).toDF("doc_id", "text")
    val collapsed = TextOps.collapseTokenRuns(docs, "doc_id", "text")
      .select(col("doc_id"), col("clean_text").as("text"))
    val r = DedupOps.chunkDedup(collapsed, "doc_id", "text",
        chunkTokens = 4)
      .orderBy("doc_id").collect()
    // doc 1: [chrome, p1, chrome, p2] → the second chrome block is a
    // corpus-wide repeat and is cut; doc 2's chrome is also a repeat of
    // doc 1's first occurrence
    assert(r(0).getString(3) ==
      "nav home about contact alpha beta gamma delta epsilon zeta eta theta")
    assert(r(1).getString(3) == "iota kappa lambda mu")
    // neither operator alone removes the period-4 repeat: run collapse
    // keeps both chrome blocks (non-adjacent), and chunk dedup WITHOUT
    // the collapse sees misaligned stuttered blocks that don't collide
    val runsOnly = TextOps.collapseTokenRuns(docs, "doc_id", "text")
      .filter(col("doc_id") === 1L).head().getString(3)
    assert(runsOnly.split(" ").count(_ == "home") == 2)
    val chunksOnly = DedupOps.chunkDedup(docs, "doc_id", "text",
        chunkTokens = 4)
      .filter(col("doc_id") === 1L).head().getString(3)
    assert(chunksOnly.split(" ").count(_ == "nav") > 2,
      s"stutter should misalign the raw chunks: $chunksOnly")
  }

  test("dsirWeights: an empty target slice yields finite (all-negative-" +
      "or-zero) weights via the coalesced total, not silent nulls") {
    val docs = Seq(
      (1L, "the cat sat", false),
      (2L, "zz yy xx", false)
    ).toDF("doc_id", "text", "is_tgt")
    val r = TextOps.dsirWeights(docs, col("is_tgt"), "doc_id", "text",
        nBuckets = 64)
      .orderBy(col("doc_id")).collect()
    assert(r.length == 2)
    r.foreach { row =>
      assert(!row.isNullAt(2), s"log_w must be finite, got $row")
      assert(!row.getDouble(2).isNaN && !row.getDouble(2).isInfinite)
    }
  }
}
