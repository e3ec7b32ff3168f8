package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The learned subword tokenizer (q150): the encode algorithm's pinned
  * semantics, fit determinism, the whitespace-degeneracy differential,
  * and the native expression's parity with the driver-side encoder.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("encode: merges apply in rank order, once each, with the " +
      "String.replace pass semantics (hand-derived states)") {
    val merges = Seq(("a", "n"), ("s", "c"), ("sc", "an"))
    assert(Bpe.encodeState("scan", merges) == " scan ")
    assert(Bpe.pieces("scan", merges) == Seq("scan"))
    assert(Bpe.pieceCount("scan", merges) == 1)
    // rank order matters: (s,c) fires only after (a,n) freed nothing for
    // it here, but (sc,an) can only fire because BOTH ran before it
    assert(Bpe.pieces("scans", merges) == Seq("scan", "s"))
    // untouched word: one piece per codepoint
    assert(Bpe.pieceCount("xyz", merges) == 3)
    assert(Bpe.pieces("xyz", merges) == Seq("x", "y", "z"))
    // the empty word (a leading-whitespace split token) counts 0
    assert(Bpe.pieceCount("", merges) == 0)
  }

  test("the boundary-sharing divergence from classic BPE is PINNED: " +
      "consecutive occurrences sharing a delimiter merge once per pass " +
      "(both engines' replace agree on this — q150's oracle rebuilds it)") {
    // " b a n a n a ": the second ' a n ' shares the first's trailing
    // space, so single-pass replace leaves it — 5 pieces, not 4
    assert(Bpe.pieces("banana", Seq(("a", "n"))) ==
      Seq("b", "an", "a", "n", "a"))
    // java.lang.String.replace IS the definition
    assert(" b a n a n a ".replace(" a n ", " an ") == " b an a n a ")
  }

  test("whitespace ≡ the fully-fused degenerate vocabulary: with merges " +
      "that fuse every corpus word to one piece, subwordTokenCount " +
      "equals the whitespace token count (the w≡1 differential)") {
    // corpus over {ab, cd, abcd}: merges fusing each word completely
    // (adjacent-distinct characters, so the single-pass boundary rule
    // never blocks a merge)
    val merges = Seq(("a", "b"), ("c", "d"), ("ab", "cd"))
    assert(Bpe.pieceCount("ab", merges) == 1)
    assert(Bpe.pieceCount("cd", merges) == 1)
    assert(Bpe.pieceCount("abcd", merges) == 1)
    val docs = Seq("ab abcd cd", "abcd abcd", "cd", "ab ab ab ab")
      .toDF("text")
    val got = docs.select(
        TextOps.subwordTokenCount(col("text"), merges).as("sub"),
        size(TextOps.tokens(col("text"))).cast("long").as("ws"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.foreach { case (sub, ws) => assert(sub == ws, got.toSeq) }
  }

  test("the committed artifact on the fixture: subword counts are " +
      "bounded below by whitespace counts (pieces ≥ 1 per word) and " +
      "strictly exceed them somewhere (rarer words stay multi-piece)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val counts = d.select(
        TextOps.subwordTokenCount(col("text")).as("sub"),
        size(TextOps.tokens(col("text"))).cast("long").as("ws"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(counts.nonEmpty)
    counts.foreach { case (sub, ws) => assert(sub >= ws, (sub, ws)) }
    assert(counts.exists { case (sub, ws) => sub > ws },
      "every word fused — the committed vocabulary is degenerate")
  }

  test("the native expression equals the driver-side encoder word-for-" +
      "word; NULL text is NULL; whitespace-only text is 0") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    val viaExpr = d.select(col("doc_id"),
        TextOps.subwordTokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDriver = d.select(col("doc_id"), col("text")).collect()
      .map { r =>
        val words = r.getString(1).toLowerCase(java.util.Locale.ROOT)
          .split("\\s+", -1)
        r.getLong(0) ->
          words.map(w => Bpe.pieceCount(w, BpeMerges.merges).toLong).sum
      }.toMap
    assert(viaExpr == viaDriver)
    val edge = Seq((1L, null: String), (2L, "   "), (3L, ""))
      .toDF("id", "text")
      .select(col("id"), TextOps.subwordTokenCount(col("text")).as("n"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(edge == Map(1L -> -1L, 2L -> 0L, 3L -> 0L))
  }

  test("fit is deterministic and input-order independent; ties break on " +
      "the lexicographically smallest pair; minCount stops noise merges") {
    val hist = Seq(("scan", 10L), ("scala", 7L), ("span", 5L),
      ("batch", 3L), ("zz", 1L))
    val m1 = Bpe.fit(hist, nMerges = 16)
    val m2 = Bpe.fit(hist, nMerges = 16)
    val m3 = Bpe.fit(hist.reverse, nMerges = 16)
    assert(m1 == m2 && m1 == m3)
    // (s,c) and (c,a) both score 17 (scan + scala): the tie breaks on
    // the lexicographically smallest pair — (c,a)
    assert(m1.head == ("c", "a"))
    // ("zz" alone): pair (z,z) has weight 1 < minCount → never merged
    assert(!m1.contains(("z", "z")))
    assert(Bpe.pieceCount("zz", m1) == 2)
    // fully converged vocab: the top word fuses to one piece
    assert(Bpe.pieceCount("scan", m1) == 1)
  }

  test("fit scores a pair by what the merge can ACTUALLY apply: the " +
      "non-overlapping blocked walk, not a sliding window (run-heavy " +
      "selection fix — VERDICT r15 'What's wrong' #1)") {
    // "aaaa" has THREE (a,a) windows but replace fuses only ONE
    // (" a a a a " → " aa a a "); a window count would score (a,a) at
    // 3×2=6 and out-vote (b,c)'s honest 3 — the fixed fit must pick
    // (b,c) first because one (a,a) merge buys only 2 fusions corpus-wide
    val hist = Seq(("aaaa", 2L), ("bc", 3L))
    val m = Bpe.fit(hist, nMerges = 1, minCount = 1L)
    assert(m == Seq(("b", "c")))
    // and the selected score equals the applied count: after one (a,a)
    // merge, "aaaa" really is [aa, a, a]
    assert(Bpe.pieces("aaaa", Seq(("a", "a"))) == Seq("aa", "a", "a"))
    // the 4-run blocks even the SECOND selection of (a,a) at rank 2's
    // state (" aa a a " has (a,a) once at the tail) — fit stays exact
    val m2 = Bpe.fit(Seq(("aaaa", 1L)), nMerges = 8, minCount = 1L)
    assert(Bpe.pieces("aaaa", m2).size == 1, (m2, Bpe.pieces("aaaa", m2)))
  }

  test("the generational memo survives overflow: counts unchanged across " +
      "the swap, the hot word stays resident, eviction never clears " +
      "everything (VERDICT r15 'What's wrong' #2)") {
    val merges = Seq(("a", "b"), ("ab", "c"))
    val enc = new SubwordEncoder(merges, cacheCap = 8)
    // 40 distinct words — 5× the cap — interleaved with one hot word
    val words = (0 until 40).map(i => s"abc$i")
    words.foreach { w =>
      assert(enc.pieceArray("abc").toSeq == Seq("abc")) // the hot word
      assert(enc.pieceArray(w).toSeq == Bpe.pieces(w, merges), w)
    }
    // recheck every word AFTER the swaps: values are re-derived or
    // served from a generation, identically either way
    words.foreach { w =>
      assert(enc.pieceCount(w) == Bpe.pieceCount(w, merges), w)
    }
    val (hot, cold) = enc.generationSizes
    assert(hot <= 9 && cold <= 9, (hot, cold)) // bounded: ≤ cap (+1 racer)
    assert(hot + cold > 0)
    // the overflow path through the EXPRESSION: a tiny cap, many words
    val d = words.map(w => s"abc $w abc").toDF("text")
    val got = d.select(org.apache.spark.sql.graft.SubwordFunctions
        .subwordTokenCount(col("text"), merges, 4).as("n"))
      .collect().map(_.getLong(0))
    val want = words.map(w => 2L + Bpe.pieceCount(w, merges))
    assert(got.toSeq == want)
  }

  test("subwordPieces: the full piece stream in document order; " +
      "size ≡ subwordTokenCount; NULL → NULL; whitespace-only → empty") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    val rows = d.select(col("doc_id"), col("text"),
        TextOps.subwordPieces(col("text")).as("p"),
        TextOps.subwordTokenCount(col("text")).as("n"))
      .collect()
    rows.foreach { r =>
      val pieces = r.getSeq[String](2)
      assert(pieces.size.toLong == r.getLong(3))
      val want = r.getString(1).toLowerCase(java.util.Locale.ROOT)
        .split("\\s+", -1).filter(_.nonEmpty)
        .flatMap(w => Bpe.pieces(w, BpeMerges.merges)).toSeq
      assert(pieces == want, r.getLong(0))
    }
    val edge = Seq((1L, null: String), (2L, "   "))
      .toDF("id", "text")
      .select(col("id"), TextOps.subwordPieces(col("text")).as("p"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    assert(edge(1L) == null && edge(2L) == Seq.empty)
  }

  test("Bpe.vocabulary: sorted alphabet first, merge outputs in rank " +
      "order, duplicate outputs deduped (one piece, one id); the " +
      "committed vocabulary COVERS every piece the fixture can emit, " +
      "and out-of-alphabet pieces map to -1") {
    // two merges producing the SAME string "abc": first occurrence wins
    val v = Bpe.vocabulary(Seq("b", "a", "c"),
      Seq(("a", "b"), ("ab", "c"), ("a", "bc"), ("b", "c")))
    assert(v == Seq("a", "b", "c", "ab", "abc", "bc"))
    // the committed artifact: every piece of every fixture word has an
    // id ≥ 0 (an encode piece is a base char or a merge output — the
    // closure property q160 rides)
    val vocab = Bpe.vocabulary(BpeMerges.alphabet, BpeMerges.merges)
    val idOf = vocab.zipWithIndex.toMap
    assert(BpeMerges.alphabet.sorted.zipWithIndex.forall {
      case (a, i) => idOf(a) == i
    })
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val words = d.select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0).distinct()
      .collect().map(_.getString(0))
    words.foreach { w =>
      Bpe.pieces(w, BpeMerges.merges).foreach { p =>
        assert(idOf.contains(p), s"piece '$p' of '$w' has no id")
      }
    }
    // out-of-alphabet text: its pieces are NOT in the vocabulary, but
    // the codepoint fallback still ids them — NO text maps to -1
    val oov = Bpe.pieces("zürich", BpeMerges.merges)
    assert(oov.exists(p => !idOf.contains(p)))
    oov.foreach { p =>
      val id = Bpe.tokenId(idOf, vocab.size, p)
      assert(id >= 0, s"piece '$p' mapped to $id")
      if (!idOf.contains(p)) assert(id >= vocab.size, s"'$p' -> $id")
    }
  }

  test("codepoint-fallback ids: decode(encode) round-trips on ANY text " +
      "(alphabet-covered, out-of-alphabet, astral-plane); fallback ids " +
      "never collide with vocabulary ids; a multi-codepoint OOV piece " +
      "and a negative id fail loudly") {
    val vocab = Bpe.vocabulary(BpeMerges.alphabet, BpeMerges.merges)
      .toIndexedSeq
    val idOf = vocab.zipWithIndex.toMap
    def roundTrip(word: String): Unit = {
      val pieces = Bpe.pieces(word, BpeMerges.merges)
      val ids = pieces.map(p => Bpe.tokenId(idOf, vocab.size, p))
      assert(ids.forall(_ >= 0), s"'$word' -> $ids")
      assert(ids.map(Bpe.decodeId(vocab, _)).mkString == word,
        s"'$word' did not round-trip via $ids")
    }
    Seq("merge", "vector", "zürich", "x9z!", "𝄞clef", "日本語",
      "tab\tand~`", "order", "z").foreach(roundTrip)
    // deterministic pseudo-random unicode words (no RNG seed drift):
    // cycle through a codepoint pool spanning ascii, latin-1, CJK, astral
    val pool = Array(97, 98, 122, 48, 252, 8364, 26085, 119070, 33, 95)
    (0 until 200).foreach { i =>
      val len = i % 7 + 1
      val w = new StringBuilder
      (0 until len).foreach(j => w.appendAll(
        Character.toChars(pool((i * 31 + j * 7) % pool.length))))
      roundTrip(w.toString)
    }
    // fallback ids sit strictly past the vocabulary
    assert(Bpe.tokenId(idOf, vocab.size, "z") == vocab.size + 'z'.toInt)
    intercept[IllegalArgumentException](
      Bpe.tokenId(idOf, vocab.size, "zz"))
    intercept[IllegalArgumentException](Bpe.decodeId(vocab, -1))
  }

  test("subwordTokenCountByLang: each language prices with ITS " +
      "committed vocabulary (differential vs the single-vocab " +
      "expression), unknown languages and 'und' fall back to the " +
      "global merges, NULLs null the row; map-only plan") {
    import graft.ext.BpeMergesByLang
    val texts = Seq("merge the vector order", "slow query batch scan",
      "hash join filter row table", "")
    val langs = BpeMergesByLang.langs :+ "und" :+ "xx"
    val rows = for (t <- texts; l <- langs) yield (t, l)
    val df = rows.toDF("text", "lang")
      .withColumn("by_lang",
        TextOps.subwordTokenCountByLang(col("text"), col("lang")))
    // differential: dispatch ≡ the explicitly-selected vocabulary
    langs.foreach { l =>
      val merges = BpeMergesByLang.merges.getOrElse(l, BpeMerges.merges)
      val got = df.filter(col("lang") === l)
        .select(col("by_lang"),
          TextOps.subwordTokenCount(col("text"), merges).as("direct"))
        .collect()
      got.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"lang=$l: ${r.getLong(0)} vs ${r.getLong(1)}"))
    }
    // the vocabularies genuinely differ: at least one text prices
    // differently under some pair of languages
    val spread = df.filter(col("text") =!= "")
      .groupBy(col("text"))
      .agg(countDistinct(col("by_lang")).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(spread > 1, "per-lang vocabularies priced everything equally")
    // NULL text / NULL lang → NULL
    val nulls = Seq((null, "en"), ("merge", null),
        (null, null)).asInstanceOf[Seq[(String, String)]]
      .toDF("text", "lang")
      .select(TextOps.subwordTokenCountByLang(col("text"), col("lang")))
      .collect()
    assert(nulls.forall(_.isNullAt(0)), nulls.toSeq)
    // map-only: no exchange, the expression inside the scan's project
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(TextOps.subwordTokenCountByLang(col("text"), col("lang")))
    import org.apache.spark.sql.execution.ExplainMode
    val plan = d.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("subword_token_count_by_lang"), plan)
  }

  test("q150 plan: the encode is map-only — no shuffle below the budget " +
      "histogram's aggregate, the expression inside the scan's project") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val counted = d.select(col("doc_id"),
      TextOps.subwordTokenCount(col("text")).as("n"))
    import org.apache.spark.sql.execution.ExplainMode
    val plan = counted.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("Exchange"),
      s"the encode pass must not shuffle:\n$plan")
    assert(plan.contains("subword_token_count"), plan)
  }
}
