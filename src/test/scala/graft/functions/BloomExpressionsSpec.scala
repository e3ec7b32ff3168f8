package graft.functions

import graft.SparkTestSession
import graft.ext.TextOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomFunctions
import org.scalatest.funsuite.AnyFunSuite

/** The BloomRetain kernel and the contaminationFlagsBloom operator built
  * on it. The operator's whole claim is OUTPUT-IDENTITY with the exact
  * broadcast-join formulation (no false negatives from the Bloom pass;
  * the confirm join kills false positives), so the load-bearing tests
  * are equivalence tests — including one that FORCES false positives
  * with an undersized filter.
  */
class BloomExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bloomOf(items: Seq[String], n: Long = 100, fpp: Double = 0.01) = {
    val f = org.apache.spark.util.sketch.BloomFilter.create(n, fpp)
    items.foreach(f.putString)
    spark.sparkContext.broadcast(BloomFunctions.serialize(f))
  }

  test("bloomRetain: members survive, definite non-members drop") {
    val b = bloomOf(Seq("alpha", "gamma"))
    val r = Seq(Seq("alpha", "beta", "gamma", "delta")).toDF("a")
      .select(BloomFunctions.bloomRetain(col("a"), b).as("r"))
      .head.getSeq[String](0)
    // fpp 1% on 4 probes: beta/delta surviving is possible but the
    // members MUST be present (no false negatives, the hard guarantee)
    assert(r.contains("alpha") && r.contains("gamma"))
    assert(r.forall(Seq("alpha", "beta", "gamma", "delta").contains))
  }

  test("bloomRetain: null elements drop as non-members; null array is null") {
    val b = bloomOf(Seq("x"))
    val df = Seq(Tuple1(Seq[String]("x", null, "y"))).toDF("a")
    val r = df.select(BloomFunctions.bloomRetain(col("a"), b).as("r"))
      .head.getSeq[String](0)
    assert(r.contains("x") && !r.contains(null))
    val nullRow = Seq(Tuple1(null: Seq[String])).toDF("a")
      .select(BloomFunctions.bloomRetain(col("a"), b).as("r")).head
    assert(nullRow.isNullAt(0))
  }

  test("bloomRetain agrees between codegen and interpreted eval") {
    val b = bloomOf(Seq("p q", "r s"))
    val df = Seq(Seq("p q", "zz", "r s")).toDF("a")
    def run(): Seq[String] =
      df.select(BloomFunctions.bloomRetain(col("a"), b)).head.getSeq[String](0)
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val gen = try run()
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try run()
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    assert(gen == interp)
    assert(gen.contains("p q") && gen.contains("r s"))
  }

  test("stat.bloomFilter string membership round-trips through bloomRetain") {
    // the operator builds its filter with df.stat.bloomFilter — pin that
    // the put-side encoding (putString) matches the probe-side encoding
    // (mightContainBinary over UTF-8 bytes), incl. non-ASCII
    val banned = Seq("alpha beta", "süß grüß", "日本 語").toDF("g")
    val b = spark.sparkContext.broadcast(BloomFunctions.serialize(
      banned.stat.bloomFilter("g", 3, 0.01)))
    val r = Seq(Seq("alpha beta", "süß grüß", "日本 語")).toDF("a")
      .select(BloomFunctions.bloomRetain(col("a"), b)).head.getSeq[String](0)
    assert(r == Seq("alpha beta", "süß grüß", "日本 語"))
  }

  test("the deserialized filter is cached per broadcast, not per expression") {
    // the expression rides the task binary — without the JVM-wide cache
    // a ~GB filter would be rebuilt per task and held per task slot
    val b = bloomOf(Seq("x y"))
    val f1 = org.apache.spark.sql.graft.BloomRetain.filterFor(b)
    val f2 = org.apache.spark.sql.graft.BloomRetain.filterFor(b)
    assert(f1 eq f2)
    val other = bloomOf(Seq("p q"))
    assert(!(org.apache.spark.sql.graft.BloomRetain.filterFor(other) eq f1))
  }

  test("contaminationFlagsBloom ≡ contaminationFlags on a mixed corpus") {
    val evalSet = Seq(
      (100L, "alpha beta gamma delta"),
      (101L, "one two three four five")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma x y"),        // 1 shared 3-gram
      (2L, "p q r s t"),                   // clean
      (3L, "one two three four z"),        // 2 shared 3-grams
      (4L, "zz one two three four five"),  // 3 shared
      (5L, "entirely different words here")).toDF("doc_id", "text")
    val exact = TextOps.contaminationFlags(train, evalSet, "doc_id", "text", 3)
      .orderBy("doc_id").collect().toSeq
    val bloom = TextOps.contaminationFlagsBloom(train, evalSet, "doc_id",
        "text", 3)
      .orderBy("doc_id").collect().toSeq
    assert(bloom == exact)
  }

  test("exactness survives a saturated filter (forced false positives)") {
    // fpp 0.5 on an overfull filter: nearly everything survives the
    // Bloom pass — the confirm join must still produce the exact answer
    val evalSet = Seq((100L, "a b c")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "a b c z a b c"),
      (2L, "m n o p q r s t u v w x y z aa bb cc dd")).toDF("doc_id", "text")
    val exact = TextOps.contaminationFlags(train, evalSet, "doc_id", "text", 3)
      .orderBy("doc_id").collect().toSeq
    val bloom = TextOps.contaminationFlagsBloom(train, evalSet, "doc_id",
        "text", 3, fpp = 0.5)
      .orderBy("doc_id").collect().toSeq
    assert(bloom == exact)
  }

  test("clean documents produce zero candidate rows (the map-side gate)") {
    // the 100 TB property in miniature: with no contamination at all,
    // the candidate stream into the confirm join is EMPTY
    val evalSet = Seq((100L, "alpha beta gamma")).toDF("doc_id", "text")
    val train = Seq((1L, "p q r s t"), (2L, "u v w x y")).toDF("doc_id", "text")
    val b = spark.sparkContext.broadcast(BloomFunctions.serialize(
      evalSet.select(explode(TextOps.shingles(TextOps.tokens(col("text")), 3))
        .as("g")).distinct().stat.bloomFilter("g", 10, 0.01)))
    val candidates = train
      .select(col("doc_id"), BloomFunctions.bloomRetain(
        TextOps.shingles(TextOps.tokens(col("text")), 3), b).as("c"))
      .filter(size(col("c")) > 0)
    assert(candidates.count() == 0)
    // and the full operator still reports every doc, all clean
    val r = TextOps.contaminationFlagsBloom(train, evalSet, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
    assert(r.length == 2 && r.forall(!_.getAs[Boolean]("contaminated")))
  }
}
