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

  /** A word's initial piece array: one piece per codepoint (the array
    * form of [[initState]]; "" → empty).
    */
  def codepointPieces(word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    val out = Array.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** One merge pass in piece-array form — EXACTLY [[applyMerge]]'s
    * String.replace semantics, re-derived: a replace occurrence spans the
    * delimiter before `l` through the delimiter after `r`, and the search
    * continues after the occurrence's end, so the consumed trailing
    * delimiter (= the delimiter before the NEXT piece) blocks a match
    * whose left piece immediately follows a fusion. Concretely: after
    * fusing at left index i, the pair at left index i+2 is blocked (its
    * leading delimiter was the previous occurrence's trailing one); i+3
    * onward is free. The `blocked` flag encodes exactly that.
    */
  def fusePass(pieces: Array[String], l: String, r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    var blocked = false
    while (i < pieces.length) {
      if (!blocked && i + 1 < pieces.length &&
          pieces(i) == l && pieces(i + 1) == r) {
        out += l + r
        i += 2
        blocked = true
      } else {
        out += pieces(i)
        i += 1
        blocked = false
      }
    }
    out.result()
  }


  /** The deterministic TOKEN-ID vocabulary of a committed artifact:
    * ids 0..|alphabet|−1 for the sorted base characters, then one id
    * per merge output (l+r) in RANK ORDER, first occurrence winning
    * when two merges produce the same piece string (e.g. (a,bc) and
    * (ab,c) both yielding "abc" — one piece, one id). Every piece an
    * encode can emit over alphabet-covered text is in this vocabulary
    * (an encode piece is either a base character or some merge's
    * output); out-of-alphabet pieces map to −1/<unk> at the call sites.
    * Pure function of the committed literals — both engines rebuild
    * the same (piece, id) table.
    */
  def vocabulary(alphabet: Seq[String],
                 merges: Seq[(String, String)]): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    alphabet.sorted.foreach(seen += _)
    merges.foreach { case (l, r) => seen += (l + r) }
    seen.toSeq
  }

  /** TOTAL token-id mapping with codepoint fallback (q160 — VERDICT r16
    * task 7, the byte-fallback idea at codepoint granularity): a piece
    * in the committed vocabulary keeps its vocabulary id; an
    * out-of-vocabulary piece falls back to `vocabSize + codepoint`. The
    * fallback is well-defined because an OOV piece is ALWAYS a single
    * codepoint: [[initState]] splits words into codepoints and every
    * merge output is a string of alphabet characters, so a non-alphabet
    * codepoint can never fuse with anything — it rides the encode as
    * itself. Fallback ids start past the vocabulary (collision-free by
    * construction) and [[decodeId]] inverts them arithmetically — no
    * table, no RNG, same rule in the DuckDB oracle (`unicode(piece)`).
    * NO text maps to −1; decode(encode(text)) round-trips on anything.
    */
  def tokenId(idOf: Map[String, Int], vocabSize: Int,
              piece: String): Int =
    idOf.getOrElse(piece, {
      require(piece.codePointCount(0, piece.length) == 1,
        s"tokenId: out-of-vocabulary piece '$piece' is not a single " +
          "codepoint — it cannot come from this artifact's encode")
      vocabSize + piece.codePointAt(0)
    })

  /** Inverse of [[tokenId]]: vocabulary ids look up their piece,
    * fallback ids decode arithmetically to their codepoint.
    */
  def decodeId(vocab: IndexedSeq[String], id: Int): String =
    if (id >= 0 && id < vocab.length) vocab(id)
    else {
      require(id >= vocab.length,
        s"decodeId: negative id $id is not a token id")
      new String(Character.toChars(id - vocab.length))
    }

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
    * produces, AND with the same non-overlapping left-to-right walk the
    * replace performs — so a pair's score is exactly the number of
    * fusions selecting it would buy (" a a a " scores (a,a) once, not
    * twice), and the fit optimizes exactly the segmentation served.
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
        // score each pair by its NON-OVERLAPPING fusable count — the
        // same blocked left-to-right walk applyMerge performs (fusing at
        // i consumes i+1 and blocks the pair at left index i+2, so the
        // next countable occurrence is ≥ i+3). A sliding window would
        // over-score run-heavy pairs the single-pass replace cannot
        // actually merge (" a a a " has two (a,a) windows, one fusion).
        // Streaming: positions arrive ascending, so a per-pair
        // last-kept index IS the greedy walk — no position buffers.
        val lastKept = scala.collection.mutable.Map[(String, String), Int]()
        var i = 0
        while (i + 1 < toks.length) {
          val p = (toks(i), toks(i + 1))
          val lk = lastKept.getOrElse(p, Int.MinValue)
          if (lk == Int.MinValue || i >= lk + 3) {
            pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
            lastKept(p) = i
          }
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

/** Pair-indexed encoder over a fixed merges list: hash (l, r) → ranks,
  * then apply ONLY the merges whose pair is actually present, in rank
  * order — provably the same result as [[Bpe.encodeState]]'s run-every-
  * merge loop, because a merge whose pair is absent is a no-op replace
  * and the present-pair set only changes when a merge APPLIES.
  *
  * Cost: O(|word| · merges-applied) hash probes instead of
  * O(|merges| · |word|) replace passes — per-word encode cost is
  * INDEPENDENT of vocabulary size (merges-applied ≤ |word| − 1, each
  * fusion shrinks the piece array), which is what makes a production
  * 8k–32k-merge vocabulary servable (the naive loop pays thousands of
  * full passes per cache-miss word; see SCALING.md's encode-vs-vocab
  * row). The differential spec (BpeSpec) pins indexed ≡ naive on
  * generated words, generated merges lists (including duplicate pairs —
  * a pair RE-CREATED by a later multi-char fusion can legitimately be
  * selected again at a later rank, hence ranks is an array), and the
  * committed artifact over the fixture corpus.
  */
final class MergeIndex(merges0: Seq[(String, String)]) extends Serializable {
  private val merges: Array[(String, String)] = merges0.toArray
  // (l, r) → ascending ranks where this pair merges
  private val ranks: scala.collection.mutable.HashMap[(String, String), Array[Int]] = {
    val m = scala.collection.mutable.HashMap[(String, String),
      scala.collection.mutable.ArrayBuffer[Int]]()
    var i = 0
    while (i < merges.length) {
      m.getOrElseUpdate(merges(i),
        new scala.collection.mutable.ArrayBuffer[Int]) += i
      i += 1
    }
    m.map { case (p, b) => (p, b.toArray) } // already ascending
  }

  def size: Int = merges.length

  /** Smallest rank strictly greater than `after` whose pair is adjacent
    * in `pieces`; −1 when no further merge applies.
    */
  private def nextRank(pieces: Array[String], after: Int): Int = {
    var best = Int.MaxValue
    var i = 0
    while (i + 1 < pieces.length) {
      ranks.getOrElse((pieces(i), pieces(i + 1)), null) match {
        case null => ()
        case arr =>
          // first rank > after (arr is ascending and tiny — linear scan)
          var j = 0
          while (j < arr.length && arr(j) <= after) j += 1
          if (j < arr.length && arr(j) < best) best = arr(j)
      }
      i += 1
    }
    if (best == Int.MaxValue) -1 else best
  }

  /** Encode a word to its piece array — bit-identical to
    * [[Bpe.pieces]](word, merges).
    */
  def encode(word: String): Array[String] = {
    var pieces = Bpe.codepointPieces(word)
    if (pieces.length < 2) return pieces
    var k = nextRank(pieces, -1)
    while (k >= 0) {
      val (l, r) = merges(k)
      pieces = Bpe.fusePass(pieces, l, r)
      k = if (pieces.length < 2) -1 else nextRank(pieces, k)
    }
    pieces
  }
}

/** The shared per-executor word→pieces memo over a [[MergeIndex]]:
  * generational (two-segment) eviction instead of a full clear, so a
  * corpus with more than `cacheCap` distinct words per executor evicts
  * the cold tail while the Zipf head stays resident (a hot word is
  * re-promoted into the new generation on its next access; a full clear
  * refaulted the ENTIRE head at one encode each per clear-storm).
  * Resident bound: ≤ 2 × cacheCap entries. Thread-safe: both segments
  * are concurrent maps and the swap is synchronized; a racing reader at
  * worst re-encodes a word (idempotent — the encode is deterministic).
  */
final class SubwordEncoder(merges: Seq[(String, String)],
                           cacheCap: Int = 65536) extends Serializable {
  private val index = new MergeIndex(merges)
  @transient @volatile private var hot =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  @transient @volatile private var cold =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  private def readResolve(): Object =
    new SubwordEncoder(merges, cacheCap) // fresh maps after deserialization

  def pieceArray(word: String): Array[String] = {
    var a = hot.get(word)
    if (a == null) {
      a = cold.get(word)
      if (a == null) a = index.encode(word)
      if (hot.size >= cacheCap) synchronized {
        if (hot.size >= cacheCap) {
          cold = hot
          hot = new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
        }
      }
      hot.put(word, a)
      ()
    }
    a
  }

  def pieceCount(word: String): Int = pieceArray(word).length

  /** Spec hook: current generation sizes (hot, cold). */
  private[graft] def generationSizes: (Int, Int) = (hot.size, cold.size)
}
