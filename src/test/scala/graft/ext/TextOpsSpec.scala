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
}
