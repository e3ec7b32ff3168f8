// Hosted under org.apache.spark.sql for the same private[sql] access
// reasons as VectorExpressions.scala.
package org.apache.spark.sql.graft

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Retain the elements of an `array<string>` that MIGHT belong to a
  * pre-built Bloom filter: no false negatives ever, false positives at
  * the filter's configured fpp. One fused loop per row (the
  * BandSignatures pattern — the generated code stays a single helper
  * call no matter the array length), one filter deserialization per
  * JVM (broadcast bytes + a soft-reference cache keyed by broadcast id
  * — the expression itself rides the task binary, so per-instance state
  * would deserialize per task).
  *
  * Why a Broadcast and not a Literal child: the filter's size is set by
  * the banned-set cardinality, not the corpus — at 100 TB an eval-suite
  * n-gram filter runs 100 MB+. A Literal rides the task binary and is
  * re-shipped per STAGE; a Broadcast ships once per executor and is
  * cached. The expression compares by broadcast identity, which is
  * exactly right: two logically distinct filters must not canonicalize
  * together.
  *
  * Membership bytes are the element's UTF-8 encoding, matching what
  * `DataFrameStatFunctions.bloomFilter` puts for a string column, so a
  * filter built by `df.stat.bloomFilter` probes correctly here.
  *
  * Null elements are retained as non-members (a null gram is in no
  * banned set); a null array yields null.
  */
case class BloomRetain(child: Expression, bloom: Broadcast[Array[Byte]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bloom_retain"

  // Resolved through the JVM-wide cache, NOT deserialized per expression
  // instance: the expression rides the task binary, so a per-instance
  // lazy val would rebuild the bit array once per TASK and hold one copy
  // per concurrent task slot — at the ~GB filter sizes this operator
  // exists for, that is an executor OOM. The cache keys on broadcast id
  // (one filter per broadcast per JVM) and holds softly, so the filter
  // is reclaimable under memory pressure and rebuilt on demand.
  @transient private lazy val filter: BloomFilter =
    BloomRetain.filterFor(bloom)

  // Called from generated code via addReferenceObj — must be public.
  def retain(x: ArrayData): GenericArrayData = {
    val n = x.numElements()
    val out = new java.util.ArrayList[AnyRef](4)
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val s = x.getUTF8String(i)
        // clone: the UTF8String may point into a reused unsafe buffer;
        // the retained copy must own its bytes
        if (filter.mightContainBinary(s.getBytes)) out.add(s.clone())
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(a: Any): Any =
    retain(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref =
      ctx.addReferenceObj("bloomRetain", this, classOf[BloomRetain].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.retain($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomRetain =
    copy(child = newChild)
}

object BloomRetain {
  // (application id, broadcast id) → softly-held deserialized filter.
  // Broadcast ids are a PER-SparkContext counter, so a bare-id key
  // would serve a stale filter to a new context in the same JVM
  // (sequential sessions/test suites) — a silent no-false-negatives
  // break; the app id disambiguates. NOT keyed by Broadcast object
  // identity: executors deserialize a fresh wrapper per task, which
  // would defeat the cache entirely. SoftReference (not strong) so a
  // finished job's filter doesn't pin heap forever; the double-check
  // keeps it one-deserialization-per-JVM in the steady state.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[
      (String, Long), java.lang.ref.SoftReference[BloomFilter]]()

  private def keyOf(bloom: Broadcast[Array[Byte]]): (String, Long) = {
    val env = org.apache.spark.SparkEnv.get
    val app = if (env == null) "" else env.conf.get("spark.app.id", "")
    (app, bloom.id)
  }

  def filterFor(bloom: Broadcast[Array[Byte]]): BloomFilter = {
    val key = keyOf(bloom)
    val ref = cache.get(key)
    val hit = if (ref == null) null else ref.get()
    if (hit != null) hit
    else cache.synchronized {
      val ref2 = cache.get(key)
      val hit2 = if (ref2 == null) null else ref2.get()
      if (hit2 != null) hit2
      else {
        val f = BloomFilter.readFrom(new ByteArrayInputStream(bloom.value))
        cache.put(key, new java.lang.ref.SoftReference(f))
        f
      }
    }
  }
}

/** Bridge to `private[spark]` context state, hosted in this package for
  * the same access reasons as the expressions above.
  */
object SparkAccess {
  def activeContext: Option[org.apache.spark.SparkContext] =
    org.apache.spark.SparkContext.getActive
}

object BloomFunctions {
  def bloomRetain(arr: Column, bloom: Broadcast[Array[Byte]]): Column =
    ExpressionUtils.column(BloomRetain(ExpressionUtils.expression(arr), bloom))

  /** Serialize a sketch BloomFilter to broadcastable bytes. */
  def serialize(f: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    f.writeTo(bos)
    bos.toByteArray
  }
}
