// Hosted under org.apache.spark.sql for the same private[sql] access
// reasons as VectorExpressions.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, Length, RuntimeReplaceable, Size}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

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
