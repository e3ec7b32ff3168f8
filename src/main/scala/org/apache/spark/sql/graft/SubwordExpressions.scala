// Hosted under org.apache.spark.sql for the same private[sql] access
// reasons as VectorExpressions.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Total learned-subword token count of a text: Σ over its whitespace
  * words of the BPE piece count under the supplied merges (the
  * [[graft.ext.Bpe]] algorithm — single-pass rank-order merges with
  * String.replace semantics, cross-engine exact against DuckDB's
  * `replace`). NULL text → NULL; empty/whitespace-only text → 0.
  *
  * This is the pricing scalar of the budget/packing family
  * (q150/tokenBudgetSelect's `nTokCol`): a native expression rather than
  * a UDF so it stays inside whole-stage codegen (the generated code calls
  * [[compute]] through a reference object — the NearestCell pattern; a
  * merges-table when-chain would de-JIT, the q31 lesson). Word encodes
  * go through the PAIR-INDEXED encoder ([[graft.ext.MergeIndex]] — cost
  * independent of vocabulary size) and memoize in a bounded GENERATIONAL
  * per-expression cache ([[graft.ext.SubwordEncoder]]): natural text is
  * Zipf-distributed, so the hit rate is near 1 after the first rows and
  * the per-row cost is one whitespace split + hash lookups; a corpus
  * with more distinct words than the cap evicts the cold generation
  * rather than clearing the resident head.
  */
case class SubwordTokenCount(child: Expression,
                             merges: Seq[(String, String)],
                             cacheCap: Int = 65536)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "subword_token_count"

  // shared across this expression's tasks on an executor (codegen
  // references the expression object)
  @transient private lazy val enc =
    new graft.ext.SubwordEncoder(merges, cacheCap)

  def compute(s: UTF8String): Long = {
    // EXACTLY the TextOps.tokens split semantics (split(lower(text),
    // '\s+'), limit −1): leading whitespace yields an empty first word
    // and trailing whitespace an empty last word — both count 0 pieces,
    // so the oracle's unnest-based sum agrees either way
    val words = s.toString.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+", -1)
    var total = 0L
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) total += enc.pieceCount(w)
      i += 1
    }
    total
  }

  override protected def nullSafeEval(s: Any): Any =
    compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("subwordCount", this,
      classOf[SubwordTokenCount].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : SubwordTokenCount = copy(child = newChild)
}

/** The PIECES sibling of [[SubwordTokenCount]]: the text's full learned-
  * subword piece sequence as array<string> — every whitespace word's BPE
  * pieces, concatenated in document order (the token-id stream a trainer
  * ultimately loads, before id assignment). Same split semantics, same
  * pair-indexed encoder, same generational memo; `size(subword_pieces)`
  * ≡ `subword_token_count` by construction (spec-pinned). NULL text →
  * NULL; empty/whitespace-only text → empty array.
  */
case class SubwordPieces(child: Expression,
                         merges: Seq[(String, String)],
                         cacheCap: Int = 65536)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "subword_pieces"

  @transient private lazy val enc =
    new graft.ext.SubwordEncoder(merges, cacheCap)

  def compute(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val words = s.toString.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+", -1)
    val out = Array.newBuilder[Any]
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) {
        val ps = enc.pieceArray(w)
        var j = 0
        while (j < ps.length) { out += UTF8String.fromString(ps(j)); j += 1 }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.result())
  }

  override protected def nullSafeEval(s: Any): Any =
    compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("subwordPieces", this,
      classOf[SubwordPieces].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : SubwordPieces = copy(child = newChild)
}

/** Trained-classifier quality score of a text (q151): logistic
  * regression over hashed n-gram buckets, served map-only —
  *
  *   score = σ( (Σ_{g ∈ grams(text)} w[bucket(g)]) / |grams| + bias )
  *
  * with grams = unigrams ∪ adjacent bigram shingles of the lowercased
  * whitespace tokens and bucket(g) = first-8-md5-hex-chars mod nBuckets
  * — EXACTLY the [[graft.ext.TextOps.dsirWeights]] feature map, which is
  * md5-based precisely so a DuckDB oracle rebuilds the same buckets and
  * the score reduces to a SQL dot product over the committed weights
  * ([[graft.ext.QualityLrWeights]]). Empty text is NOT gramless: the
  * limit-−1 split always yields ≥1 word, so "" hashes the "" gram and
  * scores σ(w[bucket("")] + bias) — cross-engine consistent, because the
  * oracle's regexp_split_to_array emits the same "" gram. NULL text is
  * NULL. Accumulation order is document
  * order here and bucket-grouped in the oracle — callers round (q151
  * rounds at 6; fold-order jitter ~1e-15).
  *
  * Native expression, not a UDF, for the same whole-stage-codegen
  * reasons as [[SubwordTokenCount]]; the weights ride the expression
  * object (a 256-double array — nothing to join, nothing to broadcast).
  */
case class HashedGramScore(child: Expression, weights: Seq[Double],
                           bias: Double)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "hashed_gram_score"

  @transient private lazy val wArr: Array[Double] = weights.toArray
  @transient private lazy val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def bucketOf(g: String): Int = {
    val d = md5.get()
    d.reset()
    val h = d.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 8 hex chars = the top 4 bytes as an unsigned 32-bit value
    val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    (v % wArr.length).toInt
  }

  def compute(s: UTF8String): Double = {
    // the tokens()/dsirWeights split semantics: limit −1, empties kept
    // (they are grams there too — the fixture is trimmed, but the maps
    // must agree on untrimmed input)
    val words = s.toString.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+", -1)
    var acc = 0.0
    var n = 0
    var i = 0
    while (i < words.length) {
      acc += wArr(bucketOf(words(i)))
      n += 1
      if (i + 1 < words.length) {
        acc += wArr(bucketOf(words(i) + " " + words(i + 1)))
        n += 1
      }
      i += 1
    }
    // n ≥ 1 always (the limit-−1 split yields at least one word — see the
    // Scaladoc's empty-text note), so the mean is well-defined
    val z = acc / n + bias
    1.0 / (1.0 + math.exp(-z))
  }

  override protected def nullSafeEval(s: Any): Any =
    compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramScore", this,
      classOf[HashedGramScore].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : HashedGramScore = copy(child = newChild)
}

/** The MULTICLASS sibling of [[HashedGramScore]]: one pass hashes the
  * grams ONCE and dots them against EVERY class's weight vector
  * (one-vs-rest language ID, q154 — k separate HashedGramScore columns
  * would md5 the text k times). Returns array<double> of the per-class
  * sigmoids, in the classes' declared order. NULL text → NULL.
  */
case class HashedGramScoreVec(child: Expression,
                              weights: Seq[Seq[Double]],
                              biases: Seq[Double])
    extends UnaryExpression with ExpectsInputTypes {
  require(weights.nonEmpty && weights.size == biases.size,
    "hashed_gram_score_vec: one weight vector and bias per class")
  require(weights.forall(_.size == weights.head.size),
    "hashed_gram_score_vec: all classes share one bucket count")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "hashed_gram_score_vec"

  @transient private lazy val wArr: Array[Array[Double]] =
    weights.map(_.toArray).toArray
  @transient private lazy val bArr: Array[Double] = biases.toArray
  @transient private lazy val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def bucketOf(g: String): Int = {
    val d = md5.get()
    d.reset()
    val h = d.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    (v % wArr(0).length).toInt
  }

  def compute(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val words = s.toString.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+", -1)
    val acc = new Array[Double](wArr.length)
    var n = 0
    def add(g: String): Unit = {
      val b = bucketOf(g)
      var c = 0
      while (c < wArr.length) { acc(c) += wArr(c)(b); c += 1 }
      n += 1
    }
    var i = 0
    while (i < words.length) {
      add(words(i))
      if (i + 1 < words.length) add(words(i) + " " + words(i + 1))
      i += 1
    }
    val out = new Array[Double](wArr.length)
    var c = 0
    while (c < wArr.length) {
      // n ≥ 1 always — same limit-−1 split note as HashedGramScore
      val z = acc(c) / n + bArr(c)
      out(c) = 1.0 / (1.0 + math.exp(-z))
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(s: Any): Any =
    compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramScoreVec", this,
      classOf[HashedGramScoreVec].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : HashedGramScoreVec = copy(child = newChild)
}

/** [[SubwordTokenCount]] dispatched by a LANGUAGE column (q174): one
  * expression holding every per-language encoder plus the global
  * fallback, so per-language pricing is a single reference-object call
  * — NOT a when-chain of five separate encode expressions, which blows
  * the generated processNext() past Janino's method limit and de-JITs
  * the whole stage (observed: the q174 projection fused with the
  * langid/classifier scorers fell back to interpreted execution).
  * A language with no committed vocabulary — 'und' by construction —
  * prices with the fallback merges. NULL text or NULL language → NULL
  * (callers materialize the language first; q174's pred_lang is never
  * null — 'und' is a real value, not an absence).
  */
case class SubwordTokenCountByLang(left: Expression, right: Expression,
                                   byLang: Map[String, Seq[(String, String)]],
                                   fallback: Seq[(String, String)],
                                   cacheCap: Int = 65536)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "subword_token_count_by_lang"

  @transient private lazy val encs
      : Map[String, graft.ext.SubwordEncoder] =
    byLang.map { case (l, m) =>
      l -> new graft.ext.SubwordEncoder(m, cacheCap) }
  @transient private lazy val fallbackEnc =
    new graft.ext.SubwordEncoder(fallback, cacheCap)

  def compute(s: UTF8String, lang: UTF8String): Long = {
    val enc = encs.getOrElse(lang.toString, fallbackEnc)
    val words = s.toString.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+", -1)
    var total = 0L
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) total += enc.pieceCount(w)
      i += 1
    }
    total
  }

  override protected def nullSafeEval(t: Any, l: Any): Any =
    compute(t.asInstanceOf[UTF8String], l.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("subwordCountByLang", this,
      classOf[SubwordTokenCountByLang].getName)
    nullSafeCodeGen(ctx, ev,
      (t, l) => s"${ev.value} = $ref.compute($t, $l);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SubwordTokenCountByLang =
    copy(left = newLeft, right = newRight)
}

object SubwordFunctions {
  def subwordTokenCount(text: Column,
                        merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(SubwordTokenCount(
      ExpressionUtils.expression(text), merges))

  /** Spec hook: explicit memo cap, to exercise the generational-eviction
    * overflow path at test scale.
    */
  def subwordTokenCount(text: Column, merges: Seq[(String, String)],
                        cacheCap: Int): Column =
    ExpressionUtils.column(SubwordTokenCount(
      ExpressionUtils.expression(text), merges, cacheCap))

  def subwordPieces(text: Column,
                    merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(SubwordPieces(
      ExpressionUtils.expression(text), merges))

  def subwordTokenCountByLang(text: Column, lang: Column,
                              byLang: Map[String, Seq[(String, String)]],
                              fallback: Seq[(String, String)]): Column =
    ExpressionUtils.column(SubwordTokenCountByLang(
      ExpressionUtils.expression(text), ExpressionUtils.expression(lang),
      byLang, fallback))

  def hashedGramScore(text: Column, weights: Seq[Double],
                      bias: Double): Column =
    ExpressionUtils.column(HashedGramScore(
      ExpressionUtils.expression(text), weights, bias))

  def hashedGramScoreVec(text: Column, weights: Seq[Seq[Double]],
                         biases: Seq[Double]): Column =
    ExpressionUtils.column(HashedGramScoreVec(
      ExpressionUtils.expression(text), weights, biases))
}
