// Hosted under org.apache.spark.sql for the same private[sql] access
// reasons as VectorExpressions.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Length, RuntimeReplaceable, Size, TernaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's `len(x)` is overloaded over strings AND lists, so the dialect
  * shim cannot rename it textually (the right Spark function depends on
  * the argument's type, unknown before analysis). Instead `len` is
  * registered as a real function (GraftExtensions) that dispatches on the
  * resolved input type at analysis time and replaces itself with the
  * matching codegen'd builtin — `length` for string/binary, `size` for
  * array/map. Divergence kept: Spark's length/size return INT where
  * DuckDB returns BIGINT.
  */
case class Len(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {

  override lazy val replacement: Expression = child.dataType match {
    case _: ArrayType | _: MapType => Size(child, legacySizeOfNull = false)
    case _ => Length(child) // string/binary; anything else fails length's
                            // own type check, with a clear message
  }

  override def prettyName: String = "len"
  override protected def withNewChildInternal(newChild: Expression): Len =
    copy(child = newChild)
}

/** DuckDB's 3-arg `regexp_replace` replaces the FIRST match only (its `g`
  * flag makes it global); Spark's builtin of the same name is always
  * global, so leaving the DuckDB form un-mapped would silently change
  * semantics through the name collision. The dialect shim maps the 3-arg
  * DuckDB form here instead. Replacement-string backreferences follow
  * Spark/Java syntax ($1), consistent with the shim-mapped global form.
  * (reference delegation point: /root/reference/src/node.rs:176 — model
  * SQL executes with DuckDB regexp semantics)
  */
case class RegexpReplaceFirst(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType, StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "regexp_replace_first"

  override protected def nullSafeEval(s: Any, re: Any, r: Any): Any =
    RegexpReplaceFirst.replaceFirst(s.asInstanceOf[UTF8String],
      re.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, re, r) =>
      s"${ev.value} = org.apache.spark.sql.graft.RegexpReplaceFirst$$" +
        s".MODULE$$.replaceFirst($s, $re, $r);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): RegexpReplaceFirst =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object RegexpReplaceFirst {
  // per-executor compiled-pattern cache; bounded so a regex-per-row
  // pathology cannot grow it without limit
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()

  def replaceFirst(s: UTF8String, re: UTF8String, r: UTF8String): UTF8String = {
    if (cache.size > 128) cache.clear()
    val p = cache.computeIfAbsent(re.toString, java.util.regex.Pattern.compile(_))
    UTF8String.fromString(p.matcher(s.toString).replaceFirst(r.toString))
  }
}
