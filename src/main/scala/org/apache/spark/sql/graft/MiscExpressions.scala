// Hosted under org.apache.spark.sql for the same private[sql] access
// reasons as VectorExpressions.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ImplicitCastInputTypes, Length, RuntimeReplaceable, Size, TernaryExpression}
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

/** DuckDB's `date_diff('part', start, end)` counts PART-BOUNDARY CROSSINGS
  * between start and end — `date_diff('day', 23:59, 00:01)` is 1 — where
  * Spark's `timestampdiff` counts COMPLETE elapsed units (0 for the same
  * pair). No Spark builtin has the boundary semantics, so the dialect shim
  * maps the 3-arg DuckDB form here. Boundary crossing = difference of the
  * unit-truncated values, computed on the naive (session-UTC) calendar —
  * the shim's sessions pin spark.sql.session.timeZone=UTC, matching
  * DuckDB's timezone-naive TIMESTAMP. DATE arguments arrive through the
  * implicit DATE→TIMESTAMP cast. Weeks start Monday (ISO), as in DuckDB.
  * (reference delegation point: /root/reference/src/node.rs:176 — model
  * SQL executes with DuckDB date semantics)
  */
case class DateDiffBoundary(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, TimestampType, TimestampType)
  override def dataType: DataType = LongType
  override def prettyName: String = "date_diff_boundary"

  override protected def nullSafeEval(u: Any, s: Any, e: Any): Any =
    DateDiffBoundary.diff(u.asInstanceOf[UTF8String],
      s.asInstanceOf[Long], e.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (u, s, e) =>
      s"${ev.value} = org.apache.spark.sql.graft.DateDiffBoundary$$" +
        s".MODULE$$.diff($u, $s, $e);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): DateDiffBoundary =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object DateDiffBoundary {
  private final val MicrosPerDay = 86400L * 1000000L

  private def epochDay(micros: Long): Long = Math.floorDiv(micros, MicrosPerDay)
  private def localDate(micros: Long): java.time.LocalDate =
    java.time.LocalDate.ofEpochDay(epochDay(micros))
  private def floorDiffBy(s: Long, e: Long, unitMicros: Long): Long =
    Math.floorDiv(e, unitMicros) - Math.floorDiv(s, unitMicros)

  /** Boundary crossings of `unit` from startMicros to endMicros (negative
    * when end < start), micros naive-UTC since epoch. Part names accept
    * DuckDB's singular/plural/abbreviated spellings; anything else fails
    * loudly — a silent 0 would corrupt downstream arithmetic.
    */
  def diff(unit: UTF8String, startMicros: Long, endMicros: Long): Long =
    unit.toString.toLowerCase(java.util.Locale.ROOT) match {
      case "year" | "years" | "yr" | "yrs" | "y" =>
        localDate(endMicros).getYear.toLong - localDate(startMicros).getYear
      case "quarter" | "quarters" =>
        def q(m: Long) = { val d = localDate(m)
          d.getYear * 4L + (d.getMonthValue - 1) / 3 }
        q(endMicros) - q(startMicros)
      case "month" | "months" | "mon" | "mons" =>
        def mo(m: Long) = { val d = localDate(m)
          d.getYear * 12L + d.getMonthValue }
        mo(endMicros) - mo(startMicros)
      case "week" | "weeks" | "w" =>
        // epoch day 0 = Thursday 1970-01-01; +3 aligns to Monday starts
        Math.floorDiv(epochDay(endMicros) + 3, 7) -
          Math.floorDiv(epochDay(startMicros) + 3, 7)
      case "day" | "days" | "d" =>
        epochDay(endMicros) - epochDay(startMicros)
      case "hour" | "hours" | "hr" | "hrs" | "h" =>
        floorDiffBy(startMicros, endMicros, 3600L * 1000000L)
      case "minute" | "minutes" | "min" | "mins" =>
        floorDiffBy(startMicros, endMicros, 60L * 1000000L)
      case "second" | "seconds" | "sec" | "secs" | "s" =>
        floorDiffBy(startMicros, endMicros, 1000000L)
      case "millisecond" | "milliseconds" | "ms" | "msec" =>
        floorDiffBy(startMicros, endMicros, 1000L)
      case "microsecond" | "microseconds" | "us" | "usec" =>
        endMicros - startMicros
      case other => throw new IllegalArgumentException(
        s"date_diff_boundary: unsupported part '$other' (year quarter month " +
          "week day hour minute second millisecond microsecond)")
    }
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
