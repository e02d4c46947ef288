package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{ArrayDotProduct, JaroWinklerSimilarity, KmvSketchAgg, Md5Prefix32}

/** Production `SparkSessionExtensions` hook: registers the engine's
  * custom expressions so a deployment enables them cluster-wide with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (the per-session `ArrayDotProduct.register(spark)` /
  * `Md5Prefix32.register(spark)` paths remain for programmatic use —
  * both routes bind the same expressions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      { args: Seq[Expression] =>
        require(args.length == 2, "array_dot expects exactly 2 arguments")
        ArrayDotProduct(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("md5_prefix32"),
      new ExpressionInfo(classOf[Md5Prefix32].getName, "md5_prefix32"),
      { args: Seq[Expression] =>
        require(args.length == 1, "md5_prefix32 expects exactly 1 argument")
        Md5Prefix32(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "kmv_sketch"),
      KmvSketchAgg.builder))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSimilarity].getName, "jaro_winkler"),
      { args: Seq[Expression] =>
        require(args.length == 2, "jaro_winkler expects exactly 2 arguments")
        JaroWinklerSimilarity(args.head, args(1))
      }))
    // the optimizer tier: HOF dot-product upgrade and manifest-driven
    // broadcast selection (same rules as graft.plans.GraftExtensions)
    ext.injectOptimizerRule(_ => graft.plans.DotProductRewrite)
    ext.injectOptimizerRule(_ => graft.plans.ManifestBroadcastJoins)
    ext.injectOptimizerRule(_ => graft.plans.MetadataAggregates)
  }
}
