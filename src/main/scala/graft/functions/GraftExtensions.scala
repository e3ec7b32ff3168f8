package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{CosineSimilarity, DotProduct}

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
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
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
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))

  /** Register on an already-built session (tests, REPL). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
}
