package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}

/** Bounded per-group top-k as an AGGREGATE, not a window.
  *
  * `row_number().over(Window.partitionBy(g).orderBy(o))` followed by
  * `rank <= k` is the idiomatic small-data top-k, but its physical plan
  * shuffles and sorts EVERY candidate row (the window operator cannot
  * discard rows map-side). For ANN search the candidate set is the
  * bucket/cell join output — orders of magnitude larger than the k kept
  * rows — so at 100 TB the window shuffle IS the query cost.
  *
  * [[CollectTopK]] (Spark's bounded-priority-queue collect aggregate,
  * public since 3.4, planned through ObjectHashAggregate) keeps at most
  * k elements per group in each partial buffer, so the shuffle carries
  * O(groups × k) rows regardless of candidate count — the same
  * partial-aggregation shape as a SUM. Determinism: elements are
  * compared by the full ordering struct (score, then tie-break), so the
  * kept set and its order are exactly those of the window formulation.
  *
  * Usage: `df.groupBy(g).agg(topKBy(ordStruct, k).as("tk"))` then
  * [[explodeRanked]] to recover (rank, element) rows. The ordering
  * struct's FIRST fields define priority (descending); embed inverted
  * tie-breakers (e.g. `-id`) to get "ties → smallest id" under the
  * descending order.
  */
object TopK {

  /** Aggregate column: array of the k largest `ord` structs (unsorted —
    * heap order; callers recover ranks via
    * `posexplode(sort_array(tk, asc = false))`, per-row work on ≤ k
    * elements — negligible next to the shuffle it replaces). */
  def topKBy(ord: Column, k: Int): Column =
    GraftColumnBridge.collectTopK(ord, k)
}
