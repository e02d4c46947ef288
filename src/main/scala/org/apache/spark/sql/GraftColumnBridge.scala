package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * standard pattern for Spark extension libraries that construct typed
  * `Column`s around custom Catalyst expressions (Spark 4 removed the
  * public `new Column(expr)` constructor). Kept to the two minimal
  * conversions graft needs; no other internals are touched. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Bounded per-group top-k collect ([[CollectTopK]] is `private[sql]`;
    * constructed here for [[graft.functions.TopK]]): keeps the `k`
    * largest `ord` values per group in a bounded priority queue with
    * map-side partial merge. */
  def collectTopK(ord: Column, k: Int): Column =
    column(org.apache.spark.sql.catalyst.expressions.aggregate
      .GraftTopKBridge.collectTopK(expression(ord), k)
      .toAggregateExpression())

  /** Bloom-filter build aggregate over a LongType column (see
    * [[catalyst.expressions.aggregate.GraftBloomBridge]]). */
  def bloomAgg(hashed: Column, estimatedItems: Long, numBits: Long): Column =
    column(org.apache.spark.sql.catalyst.expressions.aggregate
      .GraftBloomBridge.bloomAgg(expression(hashed), estimatedItems, numBits)
      .toAggregateExpression())

  /** Codegen'd bloom membership probe; `bloom` must be constant. */
  def bloomMightContain(bloom: Column, hashed: Column): Column =
    column(org.apache.spark.sql.catalyst.expressions.aggregate
      .GraftBloomBridge.mightContain(expression(bloom), expression(hashed)))
}
