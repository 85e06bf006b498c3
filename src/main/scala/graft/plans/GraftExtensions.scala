package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions registration for graft's native expressions —
  * lets SQL users call the fused kernels directly:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * spark.sql("SELECT graft_l2sq(qa, qb) FROM pairs")
  * }}}
  *
  * For an already-running session use `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(e.injectFunction)
}

object GraftExtensions {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val functions: Seq[FunctionDescription] = Seq(
    (new FunctionIdentifier("graft_l2sq"),
      new ExpressionInfo(classOf[IntVectorL2Sq].getName, "graft_l2sq"),
      (exprs: Seq[Expression]) => IntVectorL2Sq(exprs(0), exprs(1))),
    (new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[IntVectorDot].getName, "graft_dot"),
      (exprs: Seq[Expression]) => IntVectorDot(exprs(0), exprs(1))))

  /** Register the graft functions into a live session's registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
