package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[aggregate]` [[CollectTopK]] — Spark's bounded
  * priority-queue top-k collect (partial-merge-capable, planned through
  * ObjectHashAggregate). Same minimal-reach pattern as
  * [[org.apache.spark.sql.GraftColumnBridge]]: one constructor call, no
  * other internals touched. `reverse = false` keeps the k LARGEST
  * elements under the child type's ordering (verified empirically:
  * reverse=true keeps the smallest). */
object GraftTopKBridge {
  def collectTopK(child: Expression, k: Int): AggregateFunction =
    CollectTopK(child, k, reverse = false)
}
