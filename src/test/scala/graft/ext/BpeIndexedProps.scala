package graft.ext

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** The differential that licenses serving the PAIR-INDEXED encoder
  * (VERDICT r15 task 1): [[MergeIndex.encode]] must be bit-identical to
  * the naive run-every-merge [[Bpe.encodeState]] loop — the committed
  * semantics q150/q152/q153's oracles rebuild in SQL — on
  *
  *   - generated words over a small alphabet (so merges actually fire,
  *     including astral-plane codepoints for the codepoint-wise split),
  *   - generated merge lists (random pairs, so absent pairs / no-op
  *     merges and DUPLICATE pairs — a pair re-created by a later fusion
  *     and legitimately selectable again — are both exercised),
  *   - FITTED merge lists (realistic rank chains where later merges
  *     consume earlier merges' outputs),
  *
  * plus the run-heavy boundary-sharing states (" a a a ") where the
  * blocked walk diverges from a sliding window. No Spark in the loop:
  * both sides are plain driver code, so a drift in either fails here
  * before any query sees it.
  */
object BpeIndexedProps extends Properties("BpeIndexedDiff") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(300)

  // 'a'/'b'/'c' make fusions and runs common; the astral "𝕒" pins the
  // codepoint-wise initial split
  private val alpha: Gen[String] =
    Gen.frequency((5, Gen.oneOf("a", "b", "c")), (1, Gen.const("𝕒")))

  private val word: Gen[String] = for {
    n <- Gen.choose(0, 12)
    cs <- Gen.listOfN(n, alpha)
  } yield cs.mkString

  private val piece: Gen[String] = for {
    n <- Gen.choose(1, 3)
    cs <- Gen.listOfN(n, alpha)
  } yield cs.mkString

  private val randomMerges: Gen[Seq[(String, String)]] = for {
    n <- Gen.choose(0, 20)
    ms <- Gen.listOfN(n, Gen.zip(piece, piece))
  } yield ms

  private val fittedMerges: Gen[Seq[(String, String)]] = for {
    nw <- Gen.choose(1, 8)
    ws <- Gen.listOfN(nw, word)
    k <- Gen.choose(0, 24)
  } yield Bpe.fit(ws.filter(_.nonEmpty).map(w => (w, 3L)), k, minCount = 1L)

  private val merges: Gen[Seq[(String, String)]] =
    Gen.oneOf(randomMerges, fittedMerges)

  private def indexedEq(w: String, ms: Seq[(String, String)]): Prop = {
    val naive = Bpe.pieces(w, ms)
    val indexed = new MergeIndex(ms).encode(w).toSeq
    (naive == indexed) :| s"word=$w merges=$ms naive=$naive indexed=$indexed"
  }

  property("indexed encode ≡ naive encode on generated words × merges") =
    Prop.forAll(word, merges)(indexedEq)

  property("indexed encode ≡ naive on run-heavy words (the blocked-walk " +
      "boundary regime) under a duplicate-pair merges list") = {
    val runs = Gen.oneOf("aaaa", "aaaaa", "abab", "ababab", "aabbaabb",
      "aaabbb")
    // (a,a) appears TWICE: the second rank can fire only on runs the
    // first pass's boundary rule left behind
    val ms = Seq(("a", "a"), ("b", "b"), ("a", "a"), ("aa", "aa"))
    Prop.forAll(runs)(w => indexedEq(w, ms))
  }

  property("the committed artifact over every fixture word: indexed ≡ " +
      "naive, counts included") = {
    val d = graft.SparkTestSession.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    import org.apache.spark.sql.functions._
    val words = d
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0).distinct()
      .collect().map(_.getString(0)).toSeq
    val idx = new MergeIndex(BpeMerges.merges)
    Prop.all(words.map { w =>
      val naive = Bpe.pieces(w, BpeMerges.merges)
      val ind = idx.encode(w).toSeq
      (naive == ind && ind.size == Bpe.pieceCount(w, BpeMerges.merges)) :|
        s"word=$w naive=$naive indexed=$ind"
    }: _*)
  }
}
