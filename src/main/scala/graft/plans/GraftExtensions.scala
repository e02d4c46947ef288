package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{ArrayDotProduct, JaroWinklerSimilarity, KmvNdvAgg, KmvSketchAgg, Md5Prefix32}

/** The library's `spark.sql.extensions` entry point — the deployment
  * path for the custom tier: a cluster configured with
  *
  * {{{ spark.sql.extensions=graft.plans.GraftExtensions }}}
  *
  * gets the codegen'd SQL functions (`array_dot`, `md5_prefix32`,
  * `kmv_sketch`, `jaro_winkler`) PERMANENTLY in the function registry
  * (the per-session `register(spark)` calls remain for ad-hoc
  * sessions) plus the four optimizer rules: [[DotProductRewrite]]
  * (portable HOF dot products upgraded to the native expression
  * engine-wide), [[ManifestBroadcastJoins]] (join strategy chosen from
  * the transactional sink's commit-log row counts),
  * [[MetadataAggregates]] (whole count aggregates over tx-table scans
  * rewritten into commit-log answers), and [[MvRewrite]] (aggregates
  * over a tx-table scan redirected to a registered rollup table when
  * the view grain can answer them). Everything else in this library is
  * deliberately plain DataFrame code — built-in operators express the
  * semantics, so Catalyst needs no other help (SURVEY.md §7.3: prefer
  * composition, then expressions, then rules; whole custom physical
  * operators were never needed).
  *
  * `graft.GraftExtensions` is the same entry point under its legacy
  * name: BOTH classes fold over the ONE registry below
  * ([[GraftExtensions.injectAll]]), so the two spellings can never
  * diverge again (round 10 shipped them with different function/rule
  * sets — a deployment picked one name and silently lost either the
  * MV tier or `kmv_sketch`; `GraftExtensionsSpec` now pins identical
  * registration through both). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.injectAll(ext)
}

object GraftExtensions {

  private def build2(name: String, f: (Expression, Expression) => Expression)(
      args: Seq[Expression]): Expression = {
    require(args.length == 2, s"$name expects exactly 2 arguments")
    f(args.head, args(1))
  }

  private def build1(name: String, f: Expression => Expression)(
      args: Seq[Expression]): Expression = {
    require(args.length == 1, s"$name expects exactly 1 argument")
    f(args.head)
  }

  /** THE injected function descriptors — the single registry every
    * entry-point class folds over (and the same builders the
    * per-session `register` helpers use). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      build2("array_dot", ArrayDotProduct.apply) _),
    (FunctionIdentifier("md5_prefix32"),
      new ExpressionInfo(classOf[Md5Prefix32].getName, "md5_prefix32"),
      build1("md5_prefix32", Md5Prefix32.apply) _),
    (FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "kmv_sketch"),
      KmvSketchAgg.builder),
    (FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSimilarity].getName, "jaro_winkler"),
      build2("jaro_winkler", JaroWinklerSimilarity.apply) _),
    (FunctionIdentifier("ndv_estimate"),
      new ExpressionInfo(classOf[KmvNdvAgg].getName, "ndv_estimate"),
      KmvNdvAgg.builder))

  /** THE injected optimizer rules, in injection order. */
  val rules: Seq[Rule[LogicalPlan]] = Seq(
    DotProductRewrite,
    ManifestBroadcastJoins,
    MetadataAggregates,
    MvRewrite)

  /** THE injected ANALYZER resolution rules: the catalog→sink
    * substitution that serves `SELECT … FROM graft.<table>` from the
    * transactional tier's own snapshot plan (and lets every optimizer
    * rule above fire through pure SQL text). */
  val resolutionRules: Seq[org.apache.spark.sql.SparkSession => Rule[LogicalPlan]] =
    Seq(s => new GraftCatalogRelations(s))

  /** Folds the whole registry into `ext` — the one shared body behind
    * both entry-point classes. */
  def injectAll(ext: SparkSessionExtensions): Unit = {
    functions.foreach(ext.injectFunction)
    resolutionRules.foreach(r => ext.injectResolutionRule(s => r(s)))
    rules.foreach(r => ext.injectOptimizerRule(_ => r))
  }
}
