package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Literal}

/** Bridge into Spark's `private[sql]` bloom-filter expressions — the pair
  * that powers Spark's own `InjectRuntimeFilter` rewrite. Same minimal
  * pattern as [[GraftTopKBridge]]: construction only, no behavior. Used by
  * [[graft.ext.BloomOps]] for explicit semi-join reduction where the
  * planner's automatic runtime filter does not reach (e.g. a filter built
  * in one job and applied in another, or a pruned scan feeding a shuffle
  * the optimizer cannot see across).
  *
  *  - [[BloomFilterAggregate]]: aggregates `xxhash64` longs into a
  *    serialized `BloomFilter` (BinaryType result, map-side merged).
  *  - [[BloomFilterMightContain]]: codegen'd membership probe; requires
  *    the filter side to be a constant (literal or scalar subquery) —
  *    callers materialize the small build side's filter and inline it.
  */
object GraftBloomBridge {

  /** Aggregate `child` (must be LongType, e.g. `xxhash64(key)`) into a
    * serialized bloom filter sized for `estimatedItems` at `numBits`. */
  def bloomAgg(child: Expression, estimatedItems: Long, numBits: Long): AggregateFunction =
    new BloomFilterAggregate(child, Literal(estimatedItems), Literal(numBits))

  /** Membership probe of `value` (LongType) against a constant serialized
    * bloom filter (BinaryType). */
  def mightContain(bloom: Expression, value: Expression): Expression =
    BloomFilterMightContain(bloom, value)
}
