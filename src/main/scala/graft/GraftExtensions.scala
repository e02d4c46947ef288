package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Production `SparkSessionExtensions` hook under its original name —
  * a deployment enables the whole custom tier cluster-wide with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * This is the SAME entry point as `graft.plans.GraftExtensions`: both
  * classes fold over the one shared registry
  * ([[graft.plans.GraftExtensions.injectAll]] — all four SQL functions
  * plus all four optimizer rules), so the two config spellings are
  * interchangeable and can never diverge (the per-session
  * `ArrayDotProduct.register(spark)` / `Md5Prefix32.register(spark)`
  * paths remain for programmatic use — every route binds the same
  * expressions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.plans.GraftExtensions.injectAll(ext)
}
