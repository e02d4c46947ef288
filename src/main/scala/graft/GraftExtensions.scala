package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.ArrayDotProduct

/** Production `SparkSessionExtensions` hook: registers the engine's
  * custom expressions so a deployment enables them cluster-wide with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (the per-session `ArrayDotProduct.register(spark)` path remains for
  * programmatic use — both routes bind the same expression). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      { args: Seq[Expression] =>
        require(args.length == 2, "array_dot expects exactly 2 arguments")
        ArrayDotProduct(args.head, args(1))
      }))
  }
}
