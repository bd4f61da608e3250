package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook exposing the native kernels to SQL:
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *   SELECT graft_cosine(a.embedding, b.embedding) FROM ...
  *
  * For an already-running session (extensions are applied only at session
  * construction), [[GraftExtensions.register]] installs the same functions
  * into the session's registry directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def two(name: String, build: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = { children =>
    require(children.length == 2, s"$name expects exactly 2 arguments, got ${children.length}")
    build(children(0), children(1))
  }

  /** (identifier, info, builder) triples — the injectFunction payload. */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[VectorKernels.DotProduct].getName, "graft_dot"),
      two("graft_dot", VectorKernels.DotProduct)),
    (FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[VectorKernels.CosineSimilarity].getName, "graft_cosine"),
      two("graft_cosine", VectorKernels.CosineSimilarity)))

  /** Install into a live session (idempotent — overwrites are replaces). */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
