package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL exposure of the compiled scalar kernels — native Catalyst
  * expressions (not UDFs), so the SQL forms codegen identically to the
  * Scala-API column wrappers:
  *
  * {{{
  *   SELECT graft_minhash_sig(text)      FROM documents   -- [k sig minima]
  *   SELECT graft_minhash_sig(text, 2, 4) FROM documents  -- n-gram 2, k 4
  *   SELECT graft_dot(a.embedding, b.embedding), graft_cosine(...)
  * }}}
  *
  * Injectable via `GraftSparkSessionExtension` (spark.sql.extensions) or
  * `ScalarSqlFunctions.register(spark)` at runtime.
  */
object ScalarSqlFunctions {

  private def intLit(fn: String, e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects integer literals for (n, k), got: $other")
  }

  private def minhashBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(text) => MinHashSigExpr(text, 3, 8)
    case Seq(text, n, k) =>
      MinHashSigExpr(text, intLit("graft_minhash_sig", n), intLit("graft_minhash_sig", k))
    case _ => throw new IllegalArgumentException(
      "graft_minhash_sig(text[, n, k]): wrong argument count")
  }

  private def binary(fn: String, mk: (Expression, Expression) => Expression)
      (args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => mk(a, b)
    case _ => throw new IllegalArgumentException(s"$fn(x, y): wrong argument count")
  }

  private def hilbertBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(x, y) => HilbertIndexExpr(x, y, 8)
    case Seq(x, y, b) => HilbertIndexExpr(x, y, intLit("graft_hilbert", b))
    case _ => throw new IllegalArgumentException(
      "graft_hilbert(x, y[, bits]): wrong argument count")
  }

  /** The injectable (name, info, builder) triples. */
  def descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("graft_hilbert"),
        new ExpressionInfo(getClass.getName, "graft_hilbert"),
        hilbertBuilder _),
      (FunctionIdentifier("graft_minhash_sig"),
        new ExpressionInfo(getClass.getName, "graft_minhash_sig"),
        minhashBuilder _),
      (FunctionIdentifier("graft_dot"),
        new ExpressionInfo(getClass.getName, "graft_dot"),
        binary("graft_dot", FloatDotExpr.apply) _),
      (FunctionIdentifier("graft_cosine"),
        new ExpressionInfo(getClass.getName, "graft_cosine"),
        binary("graft_cosine", FloatCosineExpr.apply) _)
    )

  /** Runtime registration into an existing session. */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
