package graft

/** Suite-wide physical-plan audit: EVERY registered query planned at
  * smoke scale, and none may contain an unconditioned CartesianProduct
  * — the one physical operator with no legitimate appearance anywhere
  * in this engine (bounded all-pairs work is expressed as a
  * BroadcastNestedLoopJoin over an explicitly small side, and only
  * where PlanShapeSpec exempts it). A new operator that accidentally
  * plans a cartesian fails here before it ever reaches a cluster —
  * the suite-wide generalization of PlanShapeSpec's per-operator pins.
  */
class GlobalPlanAuditSpec extends SparkSpec {

  test("no registered query plans an unconditioned cartesian product") {
    graft.util.SessionCache.invalidate(spark)
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfSmoke).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"queries planning a cartesian product: ${offenders.mkString(", ")}")
  }
}
