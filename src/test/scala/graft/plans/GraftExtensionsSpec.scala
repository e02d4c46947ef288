package graft.plans

import graft.SparkSpec
import graft.ext.SimilarityOps
import org.apache.spark.sql.functions._

/** The extensions tier: the HOF→native dot-product rewrite fires on
  * exactly the canonical portable form, produces bit-identical values,
  * and the `spark.sql.extensions` entry point assembles cleanly. */
class GraftExtensionsSpec extends SparkSpec {

  private val hofDot =
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  test("rewrite upgrades the portable HOF dot product and preserves values bit-for-bit") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ DotProductRewrite
    try {
      val e = SimilarityOps.embeddings(spark, sfSmoke)
        .select(col("vec_id"), col("embedding").as("a"),
          reverse(col("embedding")).as("b"))
      val viaHof = e.selectExpr("vec_id", s"$hofDot AS dot").orderBy("vec_id")
      // the optimized plan carries the native expression, not the HOF
      // (check every node's expressions, not just the root's)
      val optimized = viaHof.queryExecution.optimizedPlan
      def anywhere(p: Class[_]) = optimized.collectFirst {
        case n if n.expressions.exists(_.exists(p.isInstance)) => true
      }.isDefined
      assert(anywhere(classOf[graft.functions.ArrayDotProduct]),
        s"rewrite did not fire:\n$optimized")
      assert(!anywhere(
        classOf[org.apache.spark.sql.catalyst.expressions.ArrayAggregate]))
      // values identical to the directly-written native expression
      val direct = e.selectExpr("vec_id", "array_dot(a, b) AS dot").orderBy("vec_id")
      val (hv, dv) = (viaHof.collect(), direct.collect())
      assert(hv.length == dv.length && hv.length > 0)
      hv.zip(dv).foreach { case (h, d) =>
        assert(h.getDouble(1) == d.getDouble(1), s"value drift at vec ${h.getLong(0)}")
      }
    } finally spark.experimental.extraOptimizations = prev
  }

  test("rewrite leaves non-canonical folds alone") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ DotProductRewrite
    try {
      // seed 1.0 (not 0.0) — must stay an ArrayAggregate
      val other = SimilarityOps.embeddings(spark, sfSmoke)
        .select(col("embedding").as("a"), col("embedding").as("b"))
        .selectExpr(
          "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
            "CAST(1 AS DOUBLE), (acc, v) -> acc + v) AS notdot")
      assert(other.queryExecution.optimizedPlan.collectFirst {
        case n if n.expressions.exists(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ArrayAggregate])) => true
      }.isDefined)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("extensions entry point assembles: functions and rule inject without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
    // the injected builders construct the native expressions
    val Seq(dot, md5, kmv, jw, ndv) = GraftExtensions.functions
    assert(dot._1.funcName == "array_dot" && md5._1.funcName == "md5_prefix32" &&
      kmv._1.funcName == "kmv_sketch" && jw._1.funcName == "jaro_winkler" &&
      ndv._1.funcName == "ndv_estimate")
    val lit = org.apache.spark.sql.catalyst.expressions.Literal(1)
    assert(dot._3(Seq(lit, lit)).isInstanceOf[graft.functions.ArrayDotProduct])
    assert(md5._3(Seq(lit)).isInstanceOf[graft.functions.Md5Prefix32])
    assert(jw._3(Seq(lit, lit)).isInstanceOf[graft.functions.JaroWinklerSimilarity])
    intercept[IllegalArgumentException](dot._3(Seq(lit)))
  }

  test("both entry-point names register identical function and rule sets") {
    // round-10 defect: graft.GraftExtensions and graft.plans.GraftExtensions
    // drifted (one lacked MvRewrite, the other kmv_sketch) — a deployment
    // silently lost a tier depending on which config spelling it used.
    // Both must now fold the one shared registry.
    def registered(hook: org.apache.spark.sql.SparkSessionExtensions => Unit)
        : (Set[String], Seq[String]) = {
      val (fns, rules) =
        org.apache.spark.sql.GraftExtTestAccess.registered(hook)
      (fns, rules.map(_.getClass.getName))
    }
    val (fA, rA) = registered(new graft.GraftExtensions()(_))
    val (fB, rB) = registered(new GraftExtensions()(_))
    assert(fA == Set("array_dot", "md5_prefix32", "kmv_sketch", "jaro_winkler",
      "ndv_estimate"), s"unexpected function set: $fA")
    assert(fA == fB, s"function sets diverged: $fA vs $fB")
    assert(rA == Seq(DotProductRewrite, ManifestBroadcastJoins,
      MetadataAggregates, MvRewrite).map(_.getClass.getName),
      s"unexpected rule set: $rA")
    assert(rA == rB, s"rule sets diverged: $rA vs $rB")
  }
}
