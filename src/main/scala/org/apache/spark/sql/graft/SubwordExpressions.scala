// Hosted under org.apache.spark.sql for the same private[sql] access
// reasons as VectorExpressions.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
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
  * memoize in a bounded per-expression cache: natural text is Zipf-
  * distributed, so the hit rate is near 1 after the first rows and the
  * per-row cost is one whitespace split + hash lookups.
  */
case class SubwordTokenCount(child: Expression,
                             merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "subword_token_count"

  // shared across this expression's tasks on an executor (codegen
  // references the expression object): concurrent, and bounded so an
  // unbounded-vocabulary pathology cannot grow it without limit
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Integer]()
  private final val CacheCap = 65536

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
      if (w.nonEmpty) {
        var n = cache.get(w)
        if (n == null) {
          if (cache.size > CacheCap) cache.clear()
          n = Int.box(graft.ext.Bpe.pieceCount(w, merges))
          cache.put(w, n)
          ()
        }
        total += n.intValue()
      }
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

object SubwordFunctions {
  def subwordTokenCount(text: Column,
                        merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(SubwordTokenCount(
      ExpressionUtils.expression(text), merges))
}
