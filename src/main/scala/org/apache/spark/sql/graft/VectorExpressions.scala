// Hosted under org.apache.spark.sql so the expressions can use the
// private[sql] pieces of the expression API (AbstractDataType for
// ExpectsInputTypes, ExpressionUtils for Expression↔Column) — the same
// approach established Spark extension libraries take.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-similarity hot path
  * (SURVEY.md §4 "candidate custom pieces").
  *
  * Spark's higher-order functions (transform/aggregate/zip_with) are
  * CodegenFallback — every element access goes through an interpreted
  * lambda with boxing. These expressions generate a tight primitive loop
  * via doGenCode instead, and participate in whole-stage codegen, so the
  * per-pair cost in a near-dup or ANN join drops to the raw FLOPs.
  * Preference order per the design brief: built-in functions < native
  * Expression (this) < UDF — a ScalaUDF here would pay serialization on
  * every row pair.
  */

private[graft] object KernelNulls {
  /** Whether any input array can hold null ELEMENTS, read from the
    * resolved types. The kernels propagate an element null to a null
    * result (matching the higher-order-function formulations they
    * replaced), but the per-element isNullAt branch defeats SIMD in the
    * hot loops — measured 1.6× on the dot-bound IVF query. Inputs with
    * containsNull = false (normalize() output, literal centroid arrays —
    * i.e. every internal pipeline) skip the checks entirely; only
    * SQL-facing calls over nullable arrays pay them.
    *
    * Casts between plain-numeric element types are looked through: the
    * Column-API `.cast("array<double>")` wrapper reports
    * containsNull = true even over a null-free child, but float↔double↔
    * integral element casts cannot CREATE a null (decimal/string casts
    * can under non-ANSI overflow, so they are not unwrapped).
    */
  private val neverNullCast: Set[DataType] = Set(
    FloatType, DoubleType, IntegerType, LongType, ShortType, ByteType)

  private def holds(e: Expression): Boolean = e match {
    case c: org.apache.spark.sql.catalyst.expressions.Cast =>
      (c.child.dataType, c.dataType) match {
        case (ArrayType(f, _), ArrayType(t, _))
            if neverNullCast(f) && neverNullCast(t) => holds(c.child)
        case _ => cn(e.dataType)
      }
    case _ => cn(e.dataType)
  }
  private def cn(dt: DataType): Boolean = dt match {
    case ArrayType(_, c) => c
    case _ => true
  }
  def mayHoldNullElements(inputs: Expression*): Boolean = inputs.exists(holds)
}

/** dot(a, b) over array<double>: the pairwise kernel after unit
  * normalization (see SimilarityOps.withUnitVec). Null/length handling:
  * null input → null; lengths may differ (min is used), matching the
  * higher-order-function formulation it replaces.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  // a null ELEMENT nulls the result, like the zip_with/aggregate
  // formulation this replaces (getDouble would silently read 0.0);
  // the branch is compiled out when the types rule element nulls out
  @transient private lazy val checkNulls =
    KernelNulls.mayHoldNullElements(left, right)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    if (checkNulls) {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i); i += 1
      }
    } else
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val guard =
        if (checkNulls)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $guard
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |if (!${ev.isNull}) ${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Fused cosine similarity over raw array<float> embeddings: dot product
  * and both norms in ONE traversal (no normalization pre-pass needed),
  * accumulating in double — numerically identical to
  * dot(a,b)/(norm(a)*norm(b)) with per-element float→double promotion,
  * which is what the DuckDB oracle (list_cosine_similarity on DOUBLE[])
  * computes. Zero-norm input → null (no finite cosine exists).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  @transient private lazy val checkNulls =
    KernelNulls.mayHoldNullElements(left, right)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i)))
        return null // null element
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val guard =
        if (checkNulls)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $guard
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |if (${ev.isNull}) {
         |} else if ($na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Unit-normalize an array<float> embedding into array<double> in one
  * fused traversal (norm accumulation + divide). Replaces the interpreted
  * `transform(e, x -> x / norm)` + `aggregate` pair, which costs ~0.3 ms
  * per ROW via lambda dispatch — this is a primitive loop inside
  * whole-stage codegen. Element arithmetic is identical (float→double
  * promotion, then divide by sqrt of the double sum of squares), so
  * downstream dot products are bitwise-unchanged. Zero-norm → null.
  */
case class VectorNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vector_normalize"

  @transient private lazy val checkNulls =
    KernelNulls.mayHoldNullElements(child)

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && x.isNullAt(i))
        return null // null element, like transform+aggregate
      val v = x.getFloat(i).toDouble; ss += v * v; i += 1
    }
    if (ss == 0.0) null
    else {
      val nrm = math.sqrt(ss)
      val out = new Array[Double](n)
      i = 0
      while (i < n) { out(i) = x.getFloat(i).toDouble / nrm; i += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ss = ctx.freshName("ss")
      val nrm = ctx.freshName("nrm")
      val out = ctx.freshName("out")
      val v = ctx.freshName("v")
      val guard =
        if (checkNulls) s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $guard
         |  double $v = (double) $a.getFloat($i);
         |  $ss += $v * $v;
         |}
         |if (${ev.isNull}) {
         |} else if ($ss == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $nrm = java.lang.Math.sqrt($ss);
         |  double[] $out = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = (double) $a.getFloat($i) / $nrm;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VectorNormalize =
    copy(child = newChild)
}

/** k-token shingles of an array<string>: out[i] = tokens[i..i+k-1] joined
  * by a single space; fewer than k tokens → empty array. Equivalent to the
  * higher-order formulation
  * `transform(sequence(1, n-k+1), i -> concat_ws(' ', slice(toks, i, k)))`
  * but codegen'd — the interpreted version pays lambda dispatch plus an
  * O(k) slice copy per shingle (~0.75 ms per document on the bench corpus,
  * the single largest cost in the MinHash pipeline).
  */
case class Shingles(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k > 0, s"shingles: k must be positive, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  // Called from generated code via addReferenceObj — must be public.
  def shingleAt(x: ArrayData, i: Int): org.apache.spark.unsafe.types.UTF8String = {
    val parts = new Array[org.apache.spark.unsafe.types.UTF8String](k)
    var j = 0
    while (j < k) { parts(j) = x.getUTF8String(i + j); j += 1 }
    org.apache.spark.unsafe.types.UTF8String.concatWs(
      org.apache.spark.unsafe.types.UTF8String.fromString(" "), parts: _*)
  }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements() - k + 1
    if (n <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) { out(i) = shingleAt(x, i); i += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The per-shingle concat lives in a helper on the expression instance;
    // the generated loop stays primitive.
    val ref = ctx.addReferenceObj("shingleExpr", this, classOf[Shingles].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements() - ${k - 1};
         |if ($n < 0) $n = 0;
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $ref.shingleAt($a, $i);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

/** Count of array elements contained in a constant string set (duplicates
  * counted — unlike `size(array_intersect(...))`, which dedups). Replaces
  * the interpreted `size(filter(toks, t -> t IN (...)))` formulation:
  * higher-order `filter` is CodegenFallback, paying a lambda dispatch per
  * token; this is a primitive loop over a pre-built hash set. Null
  * elements don't match; null array → null.
  */
case class ArrayCountIn(child: Expression, words: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "array_count_in"

  @transient private lazy val set: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](words.size * 2)
    words.foreach(w => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
    s
  }

  // Called from generated code via addReferenceObj — must be public.
  def contains(v: org.apache.spark.unsafe.types.UTF8String): Boolean =
    v != null && set.contains(v)

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && set.contains(x.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("countInExpr", this, classOf[ArrayCountIn].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = $a.numElements();
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $ref.contains($a.getUTF8String($i))) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayCountIn =
    copy(child = newChild)
}

/** Non-overlapping k-token chunks of an array<string>:
  * out[j] = tokens[j*k .. min((j+1)*k, n)-1] joined by a single space, so
  * the trailing partial chunk IS included (unlike [[Shingles]], which
  * slides by 1 and drops tails — chunking must cover every token exactly
  * once). ceil(n/k) chunks; empty input → empty array. This is the
  * unit-of-work splitter for sub-document (C4-style line/passage) dedup.
  */
case class TokenChunks(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k > 0, "chunk size must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_chunks"

  // Called from generated code via addReferenceObj — must be public.
  def chunkAt(x: ArrayData, j: Int): org.apache.spark.unsafe.types.UTF8String = {
    val start = j * k
    val end = math.min(start + k, x.numElements())
    val parts = new Array[org.apache.spark.unsafe.types.UTF8String](end - start)
    var i = start
    while (i < end) { parts(i - start) = x.getUTF8String(i); i += 1 }
    org.apache.spark.unsafe.types.UTF8String.concatWs(
      org.apache.spark.unsafe.types.UTF8String.fromString(" "), parts: _*)
  }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = (x.numElements() + k - 1) / k
    val out = new Array[Any](n)
    var j = 0
    while (j < n) { out(j) = chunkAt(x, j); j += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("chunkExpr", this, classOf[TokenChunks].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $n = ($a.numElements() + ${k - 1}) / $k;
         |Object[] $out = new Object[$n];
         |for (int $j = 0; $j < $n; $j++) {
         |  $out[$j] = $ref.chunkAt($a, $j);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TokenChunks =
    copy(child = newChild)
}

/** Int8 quantization statistics over an array<float> embedding, fused in
  * one traversal: out = [scale, max_abs_err, rmse] where
  * scale = max|x| / 127, q_i = floor(x_i/scale + 0.5) (explicit half-up —
  * identical in every engine, unlike banker's rounding), and the errors
  * are |q_i*scale - x_i| with float→double promotion. The sum of squared
  * errors accumulates in ascending element order, so a DuckDB
  * `list_dot_product(err, err)` reproduces it bitwise (the same property
  * q52's oracle relies on). Nothing clips: the max-magnitude element maps
  * to exactly ±127. Zero/empty vector → [0,0,0] (quantizes exactly).
  *
  * This is the storage-planning primitive for embedding corpora: int8
  * cuts a 100 TB float corpus to 25 TB, and this expression is the
  * map-only audit pass that bounds the recall impact before committing.
  */
case class Int8QuantStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "int8_quant_stats"

  @transient private lazy val checkNulls =
    KernelNulls.mayHoldNullElements(child)

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      // null ELEMENT nulls the stats, like the sibling kernels — the SQL
      // registration makes arbitrary user arrays reachable here
      if (checkNulls && x.isNullAt(i)) return null
      val v = math.abs(x.getFloat(i).toDouble)
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    val scale = maxAbs / 127.0
    if (n == 0 || scale == 0.0) new GenericArrayData(Array(0.0, 0.0, 0.0))
    else {
      var maxErr = 0.0
      var sumSq = 0.0
      i = 0
      while (i < n) {
        val v = x.getFloat(i).toDouble
        val q = math.floor(v / scale + 0.5)
        val e = math.abs(q * scale - v)
        if (e > maxErr) maxErr = e
        sumSq += e * e
        i += 1
      }
      new GenericArrayData(Array(scale, maxErr, math.sqrt(sumSq / n)))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val maxAbs = ctx.freshName("maxAbs")
      val scale = ctx.freshName("scale")
      val maxErr = ctx.freshName("maxErr")
      val sumSq = ctx.freshName("sumSq")
      val v = ctx.freshName("v")
      val e = ctx.freshName("e")
      val guard =
        if (checkNulls) s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |double $maxAbs = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $guard
         |  double $v = java.lang.Math.abs((double) $a.getFloat($i));
         |  if ($v > $maxAbs) $maxAbs = $v;
         |}
         |double $scale = $maxAbs / 127.0;
         |if (${ev.isNull}) {
         |} else if ($n == 0 || $scale == 0.0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    new double[]{0.0, 0.0, 0.0});
         |} else {
         |  double $maxErr = 0.0;
         |  double $sumSq = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $v = (double) $a.getFloat($i);
         |    double $e = java.lang.Math.abs(
         |      java.lang.Math.floor($v / $scale + 0.5) * $scale - $v);
         |    if ($e > $maxErr) $maxErr = $e;
         |    $sumSq += $e * $e;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    new double[]{$scale, $maxErr, java.lang.Math.sqrt($sumSq / $n)});
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8QuantStats =
    copy(child = newChild)
}

/** Column-API entry points for the native expressions. */
/** All sign-bit LSH band values of one vector in ONE compiled loop:
  * band b's value has bit i set iff dot(u, planes[b*bitsPerBand+i]) > 0 —
  * bit-identical to the equivalent tree of [[DotProduct]]-vs-literal
  * expressions it replaces (same min-length guard, same left-to-right
  * accumulation), which is what the q52/q60/q74 oracles encode.
  *
  * Why one expression instead of that tree: at 8 bands × 8 bits the tree
  * is 64 unrolled dot products in a single generated consume path — past
  * the JVM's huge-method JIT limit, so the whole stage runs INTERPRETED
  * and the signature pass dominates the join it feeds (measured 5× slower
  * at 10× corpus in the SCALING.md investigation, despite 13× fewer
  * candidate pairs). Here the planes live in one referenced object and
  * the loop is ~30 bytecodes, JIT-friendly at any nBands × bitsPerBand.
  */
case class BandSignatures(child: Expression, planes: Seq[Seq[Double]],
    bitsPerBand: Int) extends UnaryExpression with ExpectsInputTypes {

  require(bitsPerBand >= 1 && bitsPerBand <= 31 &&
    planes.nonEmpty && planes.length % bitsPerBand == 0,
    s"BandSignatures: ${planes.length} planes not divisible by $bitsPerBand bits")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "band_signatures"

  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  @transient private lazy val checkNulls =
    KernelNulls.mayHoldNullElements(child)

  def compute(u: ArrayData): ArrayData = {
    val nBands = planeArr.length / bitsPerBand
    val doCheck = checkNulls // hoist the lazy-val read out of the loops
    val out = new Array[Int](nBands)
    var b = 0
    while (b < nBands) {
      var v = 0
      var i = 0
      while (i < bitsPerBand) {
        val p = planeArr(b * bitsPerBand + i)
        val n = math.min(u.numElements(), p.length)
        var s = 0.0
        var d = 0
        var nullDot = false
        if (doCheck) {
          while (d < n) {
            // null ELEMENT nulls this dot, so `when(null > 0)` in the tree
            // this replaces leaves the bit unset — keep bit-identity
            if (u.isNullAt(d)) { nullDot = true; d = n }
            else { s += u.getDouble(d) * p(d); d += 1 }
          }
        } else
          while (d < n) { s += u.getDouble(d) * p(d); d += 1 }
        if (!nullDot && s > 0) v |= 1 << i
        i += 1
      }
      out(b) = v
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bandSigs", this,
      classOf[BandSignatures].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BandSignatures =
    copy(child = newChild)
}

/** Nearest-centroid assignment fused into one kernel: argmax over
  * `cents` of dot(v, cent_i), ties to the LOWEST cell id — bit-identical
  * to the greatest+coalesce(when) expression tree it replaces, which
  * could not survive codegen at realistic cell counts: without common
  * subexpression elimination each `when(dot_i = greatest(dot_1..dot_n))`
  * branch re-inlined every dot loop (~n² unrolled loops), blowing the
  * generated join-stage method past the JVM's JIT limit and de-compiling
  * the whole stage — measured 11.6 s vs 0.4 s on the 10× IVF scoring
  * join (the BandSignatures lesson, second instance). The centroids live
  * in ONE referenced object; the compiled loop is ~n·dim multiply-adds.
  * Min-length semantics per cell like [[DotProduct]]; a null input or
  * null element yields a null cell.
  */
case class NearestCell(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cell"

  @transient private lazy val centArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  @transient private lazy val checkNulls =
    KernelNulls.mayHoldNullElements(child)

  def compute(a: ArrayData): Any = {
    var best = 0.0
    var bestCell = -1
    var c = 0
    while (c < centArr.length) {
      val p = centArr(c)
      val n = math.min(a.numElements(), p.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        if (checkNulls && a.isNullAt(i)) return null
        s += a.getDouble(i) * p(i); i += 1
      }
      // a NaN dot (NaN/±Inf component in the vector) makes the argmax
      // meaningless: return null so the cell join QUARANTINES the row
      // instead of silently assigning it (Java's `s > best` is false for
      // NaN, which would otherwise dump every such vector into cell 0,
      // poisoning that centroid in fitCentroids and — since Spark sorts
      // NaN sims as largest — rank-1 of every cell-0 probe)
      if (java.lang.Double.isNaN(s)) return null
      if (bestCell < 0 || s > best) { best = s; bestCell = c }
      c += 1
    }
    if (bestCell < 0) null else bestCell
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCell", this,
      classOf[NearestCell].getName)
    val tmp = ctx.freshName("tmp")
    nullSafeCodeGen(ctx, ev, a => s"""
       |Object $tmp = $ref.compute($a);
       |if ($tmp == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ((java.lang.Integer) $tmp).intValue(); }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

/** Int8 quantization of a UNIT vector (components in [−1, 1]) at the
  * fixed scale 127: q_i = floor(x_i·127 + 0.5), clamped to ±127 — the
  * same explicit half-up rounding as [[Int8QuantStats]]. The fixed scale
  * is what makes the two-stage ANN rescoring cheap: no per-vector scale
  * column travels with the bytes, and the coarse similarity of two unit
  * vectors is just int8_dot/(127·127). 8× smaller join payload than the
  * double array it stands in for.
  */
case class Int8UnitQuantize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "int8_unit_quantize"

  @transient private lazy val checkNulls =
    KernelNulls.mayHoldNullElements(child)

  def compute(a: ArrayData): Any = {
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (checkNulls && a.isNullAt(i)) return null
      val v = math.floor(a.getDouble(i) * 127.0 + 0.5)
      out(i) = math.max(-127.0, math.min(127.0, v)).toByte
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("i8quant", this,
      classOf[Int8UnitQuantize].getName)
    val tmp = ctx.freshName("tmp")
    nullSafeCodeGen(ctx, ev, a => s"""
       |Object $tmp = $ref.compute($a);
       |if ($tmp == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Int8UnitQuantize =
    copy(child = newChild)
}

/** Per-probe ADC lookup table (Jégou et al. 2011 §V-A: the asymmetric
  * distances to every codebook centroid are computed ONCE per query,
  * then each database vector costs m table reads): `tab[mi·ksub + c] =
  * dot(sub_mi(probe), cb_mi[c])` for every subspace `mi` and code `c` —
  * m·ksub partial dots per PROBE instead of m sub-vector dots per
  * (probe, candidate) PAIR. Computed probe-side before the broadcast,
  * so the pair-scoring hot loop collapses to [[AdcScore]]'s m array
  * reads.
  *
  * The per-pair tree this hoists (m inlined slice loops, each indexing
  * a ksub-row nested-array literal) blew the generated consume method
  * past the JIT limit at m=16 and de-compiled the ADC join stage — the
  * [[NearestCell]] de-JIT lesson, third instance (20.6 s → sub-second
  * on the 30× corpus, SCALING.md r13). Bit-identical FP sequence to
  * that tree: each entry accumulates ascending-j with [[DotProduct]]'s
  * min-length semantics over `slice(u, mi·dsub+1, dsub)`, and a null
  * probe element in any read position nulls the whole table exactly
  * where it nulled the pair sum.
  */
case class AdcTable(child: Expression, cbs: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with ExpectsInputTypes {

  require(cbs.nonEmpty && cbs.head.nonEmpty &&
    cbs.forall(_.length == cbs.head.length),
    "AdcTable: codebooks must be non-empty with equal code counts")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "adc_table"

  @transient private lazy val cbArr: Array[Array[Array[Double]]] =
    cbs.map(_.map(_.toArray).toArray).toArray

  private val ksub = cbs.head.length
  private val dsub = cbs.head.head.length

  @transient private lazy val checkNulls =
    KernelNulls.mayHoldNullElements(child)

  def compute(u: ArrayData): Any = {
    val m = cbArr.length
    val uLen = u.numElements()
    val doCheck = checkNulls
    val out = new Array[Double](m * ksub)
    var mi = 0
    while (mi < m) {
      val off = mi * dsub
      // slice(u, off+1, dsub) length, then DotProduct's min with the row
      val sliceLen = math.max(0, math.min(dsub, uLen - off))
      val cb = cbArr(mi)
      var c = 0
      while (c < ksub) {
        val row = cb(c)
        val n = math.min(sliceLen, row.length)
        var s = 0.0
        var j = 0
        while (j < n) {
          if (doCheck && u.isNullAt(off + j)) return null
          s += u.getDouble(off + j) * row(j); j += 1
        }
        out(mi * ksub + c) = s
        c += 1
      }
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcTable", this, classOf[AdcTable].getName)
    val tmp = ctx.freshName("tmp")
    nullSafeCodeGen(ctx, ev, a => s"""
       |Object $tmp = $ref.compute($a);
       |if ($tmp == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): AdcTable =
    copy(child = newChild)
}

/** The pair-side half of [[AdcTable]]: sim̂ = Σ_mi tab[mi·ksub +
  * codes[mi]] — m indexed reads and adds per (probe, candidate) pair,
  * accumulated in ascending-mi order starting FROM the first entry
  * (the exact left fold of the `reduce(_ + _)` Add tree it replaces,
  * so the FP result is bitwise identical — no spurious leading
  * `0.0 +`). A null code element nulls the score (the old
  * `element_at` → null → null-sum path); an out-of-range code —
  * impossible by construction, codes come from the same codebooks —
  * also nulls rather than reading a wrong entry. The loop is branch-
  * light primitive reads, inlined into the join stage's generated
  * consume: the whole ADC hot path stays inside whole-stage codegen
  * no matter how large m·ksub is, because the table is DATA (one
  * broadcast column), not expression-tree literals.
  */
case class AdcScore(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(ksub > 0, s"AdcScore: ksub=$ksub must be positive")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_score"

  @transient private lazy val checkTabNulls =
    KernelNulls.mayHoldNullElements(left)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val tab = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val nt = tab.numElements()
    var s = 0.0
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i)) return null
      val idx = i * ksub + codes.getInt(i)
      if (idx < 0 || idx >= nt) return null
      if (checkTabNulls && tab.isNullAt(idx)) return null
      val d = tab.getDouble(idx)
      s = if (i == 0) d else s + d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tab, codes) => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val nt = ctx.freshName("nt")
      val s = ctx.freshName("s")
      val idx = ctx.freshName("idx")
      val d = ctx.freshName("d")
      val tabGuard =
        if (checkTabNulls)
          s"if ($tab.isNullAt($idx)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $m = $codes.numElements();
         |int $nt = $tab.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  if ($codes.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  int $idx = $i * $ksub + $codes.getInt($i);
         |  if ($idx < 0 || $idx >= $nt) { ${ev.isNull} = true; break; }
         |  $tabGuard
         |  double $d = $tab.getDouble($idx);
         |  $s = ($i == 0) ? $d : $s + $d;
         |}
         |if (!${ev.isNull}) ${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)
}

/** Integer dot product over two array<tinyint> quantized vectors — the
  * coarse-scoring kernel of the two-stage ANN path. Accumulates in long
  * (no overflow at any realistic dimension), min-length semantics like
  * [[DotProduct]]. The loop is pure int multiply-add over unboxed bytes:
  * no FP pipeline, 1/8th the memory traffic of the double kernel.
  */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(ByteType), ArrayType(ByteType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "int8_dot"

  @transient private lazy val checkNulls =
    KernelNulls.mayHoldNullElements(left, right)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    if (checkNulls) {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getByte(i) * y.getByte(i); i += 1
      }
    } else
      while (i < n) { s += x.getByte(i) * y.getByte(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val guard =
        if (checkNulls)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $guard
         |  $s += $a.getByte($i) * $b.getByte($i);
         |}
         |if (!${ev.isNull}) ${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Dot =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def normalize(a: Column): Column =
    ExpressionUtils.column(VectorNormalize(ExpressionUtils.expression(a)))

  def shingles(toks: Column, k: Int): Column =
    ExpressionUtils.column(Shingles(ExpressionUtils.expression(toks), k))

  def arrayCountIn(arr: Column, words: Seq[String]): Column =
    ExpressionUtils.column(ArrayCountIn(ExpressionUtils.expression(arr), words))

  def int8QuantStats(a: Column): Column =
    ExpressionUtils.column(Int8QuantStats(ExpressionUtils.expression(a)))

  def tokenChunks(toks: Column, k: Int): Column =
    ExpressionUtils.column(TokenChunks(ExpressionUtils.expression(toks), k))

  def bandSignatures(u: Column, planes: Seq[Seq[Double]],
      bitsPerBand: Int): Column =
    ExpressionUtils.column(BandSignatures(
      ExpressionUtils.expression(u), planes, bitsPerBand))

  def nearestCell(u: Column, cents: Seq[Seq[Double]]): Column =
    ExpressionUtils.column(NearestCell(ExpressionUtils.expression(u), cents))

  def int8UnitQuantize(u: Column): Column =
    ExpressionUtils.column(Int8UnitQuantize(ExpressionUtils.expression(u)))

  def int8Dot(a: Column, b: Column): Column =
    ExpressionUtils.column(Int8Dot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def adcTable(u: Column, cbs: Seq[Seq[Seq[Double]]]): Column =
    ExpressionUtils.column(AdcTable(ExpressionUtils.expression(u), cbs))

  def adcScore(tab: Column, codes: Column, ksub: Int): Column =
    ExpressionUtils.column(AdcScore(
      ExpressionUtils.expression(tab), ExpressionUtils.expression(codes), ksub))
}
