package graft.ext

/** Learned subword tokenization — the pricing tokenizer for the budget/
  * packing/mixture family (SURVEY.md §2.C). Whitespace tokens misprice
  * what a trainer actually pays by a corpus-dependent 1.3–1.6×; this
  * closes that bias with a BPE-style vocabulary FIT ONCE on a sample and
  * committed as a literal merges artifact ([[BpeMerges]], the
  * [[IvfCentroids]] discipline), applied map-only at query time.
  *
  * THE ALGORITHM (shared, exactly, by the Scala encoder and the DuckDB
  * oracle — deterministic and cross-engine bit-exact, which is the
  * property a differential pipeline needs):
  *
  *   - a word is one whitespace token of the lowercased text (the
  *     [[TextOps.tokens]] split semantics);
  *   - a word's state is its codepoints joined and delimited by single
  *     spaces: "scan" → " s c a n " (words contain no whitespace by
  *     construction, so the space is a safe in-band separator; the empty
  *     token a leading-whitespace split emits states as " " → 0 pieces);
  *   - each merge (l, r), IN RANK ORDER and ONCE each, rewrites every
  *     left-to-right non-overlapping occurrence of " l r " to " lr " —
  *     the exact semantics of `java.lang.String.replace` AND DuckDB's
  *     `replace`, which is what makes the oracle a 1:1 rebuild;
  *   - the word's piece count is its delimiter count − 1.
  *
  * Two DOCUMENTED divergences from classic iterate-to-fixpoint BPE
  * (Sennrich et al. 2016), both deliberate: (1) each merge applies once
  * in rank order, so a pair re-created by a later merge is not revisited;
  * (2) consecutive occurrences sharing a boundary delimiter (" a a a ")
  * merge only the first per pass, because the shared space is consumed —
  * both engines' `replace` agree on this. Token PRICING needs a
  * deterministic, reproducible count, not generation-grade segmentation;
  * where the two variants differ the count differs by ≤1 piece per run
  * of repeats.
  *
  * Scale shape: the encoder is a per-row scalar (a native expression,
  * [[org.apache.spark.sql.graft.SubwordTokenCount]]) — map-only over the
  * corpus scan, no shuffle, no fit job at query time. Training cost
  * lives in the one-time tool run ([[graft.tools.FitBpe]]).
  */
object Bpe {

  /** The delimited initial state of a word: " c₁ c₂ … " (codepoint-wise,
    * so astral-plane characters survive intact); "" → " ".
    */
  def initState(word: String): String = {
    val sb = new java.lang.StringBuilder(word.length * 2 + 1)
    sb.append(' ')
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      sb.appendCodePoint(cp)
      sb.append(' ')
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** One merge pass: every left-to-right non-overlapping " l r " → " lr "
    * (String.replace — the DuckDB `replace` semantics, see the object
    * Scaladoc).
    */
  def applyMerge(state: String, l: String, r: String): String =
    state.replace(" " + l + " " + r + " ", " " + l + r + " ")

  /** Encode a word: all merges, in rank order, once each. */
  def encodeState(word: String, merges: Seq[(String, String)]): String = {
    var s = initState(word)
    val it = merges.iterator
    while (it.hasNext) {
      val (l, r) = it.next()
      // cheap guard: most merges touch few words; skip the rebuild when
      // the left side cannot occur at all
      if (s.length > 2) s = applyMerge(s, l, r)
    }
    s
  }

  /** Subword pieces of a word (spec/debug surface). */
  def pieces(word: String, merges: Seq[(String, String)]): Seq[String] =
    encodeState(word, merges).split(' ').filter(_.nonEmpty).toSeq

  /** Piece count = delimiters − 1 (the formula the DuckDB oracle uses on
    * the same state string); the empty word counts 0.
    */
  def pieceCount(word: String, merges: Seq[(String, String)]): Int = {
    val s = encodeState(word, merges)
    var n = 0
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') n += 1; i += 1 }
    math.max(0, n - 1)
  }

  /** Fit `nMerges` BPE merges from a (word, count) histogram — driver-
    * side over a BOUNDED sample (the caller collects a capped word
    * histogram; [[graft.tools.FitBpe]] caps at 32768 rows — histogram-
    * scale, the bounded-probe discipline). Deterministic: pair scores
    * are exact longs, ties break on the lexicographically smallest
    * (l, r); no RNG anywhere. Stops early when no pair reaches
    * `minCount` (further merges would memorize noise). Pair occurrences
    * are counted on the SAME single-pass replace states the encoder
    * produces, so the fit optimizes exactly the segmentation that will
    * be served.
    */
  def fit(wordCounts: Seq[(String, Long)], nMerges: Int,
          minCount: Long = 2L): Seq[(String, String)] = {
    require(nMerges >= 0, "Bpe.fit: nMerges must be non-negative")
    var states = wordCounts.map { case (w, c) => (initState(w), c) }
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < nMerges && !done) {
      val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
      states.foreach { case (st, c) =>
        val toks = st.split(' ').filter(_.nonEmpty)
        var i = 0
        while (i + 1 < toks.length) {
          val p = (toks(i), toks(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val (best, cnt) = pairCounts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }
        if (cnt < minCount) done = true
        else {
          merges += best
          states = states.map { case (st, c) =>
            (applyMerge(st, best._1, best._2), c)
          }
          k += 1
        }
      }
    }
    merges.result()
  }
}
