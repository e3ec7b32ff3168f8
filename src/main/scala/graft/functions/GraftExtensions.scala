package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.graft.{ArrayCountIn, CosineSimilarity, DateDiffBoundary, DotProduct, Int8Dot, Int8QuantStats, Int8UnitQuantize, Len, RegexpReplaceFirst, Shingles, TokenChunks, VectorNormalize}
import org.apache.spark.unsafe.types.UTF8String

/** SparkSessionExtensions hook: registers graft's native expressions as SQL
  * functions, so pipeline model files (plain SQL) can call them:
  *
  *   SELECT cosine_sim(a.embedding, b.embedding) FROM ...
  *
  * Activate with .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * at session build, or post-hoc via [[GraftExtensions.register]] on an
  * existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // SparkSessionExtensions has no session-construction hook. Primary
    // path: extensions are applied during SparkSession construction,
    // AFTER the SparkContext exists — install the http(s) filesystems on
    // the active context's hadoopConfiguration right now, so even the
    // session's very first spark.read (whose file LISTING happens before
    // any analyzer rule runs) can resolve an http path.
    org.apache.spark.sql.graft.SparkAccess.activeContext.foreach { sc =>
      val hc = sc.hadoopConfiguration
      hc.setIfUnset("fs.http.impl",
        classOf[graft.sources.HttpFileSystem].getName)
      hc.setIfUnset("fs.https.impl",
        classOf[graft.sources.HttpsFileSystem].getName)
    }
    // Belt-and-braces for exotic orderings where no context was active
    // at extension time: check rules are built per-session WITH the
    // session. The rule itself checks nothing.
    ext.injectCheckRule { session =>
      graft.sources.HttpFileSystem.install(session)
      (_: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) => ()
    }
  }
}

object GraftExtensions {
  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      info("cosine_sim", classOf[CosineSimilarity]),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
    (FunctionIdentifier("dot_product"),
      info("dot_product", classOf[DotProduct]),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("vector_normalize"),
      info("vector_normalize", classOf[VectorNormalize]),
      (args: Seq[Expression]) => VectorNormalize(args(0))),
    // len(x): DuckDB's string/list-overloaded length — type-dispatching
    // RuntimeReplaceable, because a textual shim can't know the arg type
    (FunctionIdentifier("len"),
      info("len", classOf[Len]),
      (args: Seq[Expression]) => Len(args(0))),
    // shingles(toks, k): k must be a literal int (it shapes the codegen)
    (FunctionIdentifier("shingles"),
      info("shingles", classOf[Shingles]),
      (args: Seq[Expression]) => Shingles(args(0), args(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"shingles(toks, k): k must be an integer literal, got $other")
      })),
    // array_count_in(arr, 'w1,w2,...'): word set as a literal csv string
    (FunctionIdentifier("array_count_in"),
      info("array_count_in", classOf[ArrayCountIn]),
      (args: Seq[Expression]) => ArrayCountIn(args(0), args(1) match {
        case Literal(s: UTF8String, _) => s.toString.split(",").toSeq
        case other => throw new IllegalArgumentException(
          s"array_count_in(arr, words): words must be a string literal, got $other")
      })),
    // token_chunks(toks, k): k must be a literal int (it shapes the codegen)
    (FunctionIdentifier("token_chunks"),
      info("token_chunks", classOf[TokenChunks]),
      (args: Seq[Expression]) => TokenChunks(args(0), args(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"token_chunks(toks, k): k must be an integer literal, got $other")
      })),
    (FunctionIdentifier("int8_quant_stats"),
      info("int8_quant_stats", classOf[Int8QuantStats]),
      (args: Seq[Expression]) => Int8QuantStats(args(0))),
    // int8_unit_quantize(u) / int8_dot(qa, qb): the fixed-scale-127
    // storage + coarse-scoring pair for unit vectors (see
    // SimilarityOps.ivfTopKWithCentroidsInt8) — int8_dot(qa, qb)/(127²)
    // approximates the cosine of the unit vectors they quantized
    (FunctionIdentifier("int8_unit_quantize"),
      info("int8_unit_quantize", classOf[Int8UnitQuantize]),
      (args: Seq[Expression]) => Int8UnitQuantize(args(0))),
    (FunctionIdentifier("int8_dot"),
      info("int8_dot", classOf[Int8Dot]),
      (args: Seq[Expression]) => Int8Dot(args(0), args(1))),
    // regexp_replace_first(s, re, r): DuckDB's 3-arg regexp_replace
    // semantics (first match only) — the shim maps that form here
    (FunctionIdentifier("regexp_replace_first"),
      info("regexp_replace_first", classOf[RegexpReplaceFirst]),
      (args: Seq[Expression]) => RegexpReplaceFirst(args(0), args(1), args(2))),
    // date_diff_boundary('part', start, end): DuckDB's 3-arg date_diff
    // (boundary crossings, not complete units) — the shim maps that form
    (FunctionIdentifier("date_diff_boundary"),
      info("date_diff_boundary", classOf[DateDiffBoundary]),
      (args: Seq[Expression]) => DateDiffBoundary(args(0), args(1), args(2))),
    // redact_pii(text): the TextOps email/IP/phone scrub, callable from
    // pipeline model SQL. Same RegExpReplace chain in the same stage
    // order over the SHARED TextOps pattern constants, so the SQL
    // surface cannot drift from the DataFrame operator the q91 oracle
    // checks (a spec pins builder ≡ TextOps.redactPii output)
    (FunctionIdentifier("redact_pii"),
      info("redact_pii",
        classOf[org.apache.spark.sql.catalyst.expressions.RegExpReplace]),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.RegExpReplace
        import graft.ext.TextOps
        RegExpReplace(
          RegExpReplace(
            RegExpReplace(args(0),
              Literal(TextOps.EmailPattern), Literal("<EMAIL>")),
            Literal(TextOps.Ipv4Pattern), Literal("<IP>")),
          Literal(TextOps.PhonePattern), Literal("<PHONE>"))
      }))

  /** Register on an already-built session (tests, REPL). Every graft
    * session construction path funnels through here, so this is also
    * where the http(s) read-only filesystems are installed — the full
    * "graft surface" for a session is functions + sources.
    */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
    graft.sources.HttpFileSystem.install(spark)
  }
}
