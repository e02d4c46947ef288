package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Test-only bridge into `private[sql]` SparkSessionExtensions
  * accessors, so GraftExtensionsSpec can compare what each entry-point
  * class actually registers (functions + optimizer rules) without
  * booting a full session per entry point. */
object GraftExtTestAccess {

  /** The function names `hook` injects (resolved against a clone of
    * the builtin registry) and the optimizer rules it builds. */
  def registered(hook: SparkSessionExtensions => Unit)
      : (Set[String], Seq[Rule[LogicalPlan]]) = {
    val ext = new SparkSessionExtensions
    hook(ext)
    val reg = FunctionRegistry.builtin.clone()
    val before = reg.listFunction().map(_.funcName).toSet
    ext.registerFunctions(reg)
    val fns = reg.listFunction().map(_.funcName).toSet -- before
    // the graft rule builders ignore the session, so null resolves fine
    (fns, ext.buildOptimizerRules(null))
  }
}
