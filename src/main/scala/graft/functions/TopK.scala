package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}

/** Bounded per-group top-k as an AGGREGATE, not a window.
  *
  * `row_number().over(Window.partitionBy(g).orderBy(o))` followed by
  * `rank <= k` is the idiomatic top-k. Spark 4 does bound its shuffle
  * (`InferWindowGroupLimit` inserts a Partial WindowGroupLimit below
  * the exchange), but the plan still SORTS the entire candidate set in
  * every map partition, and sorts again after the shuffle, before the
  * Window operator finally ranks — for ANN search the candidate set is
  * the bucket/cell join output, orders of magnitude larger than the k
  * kept rows, so those O(n log n) sorts are the query cost at scale.
  *
  * The aggregate form keeps at most k elements per group in an O(k)
  * priority-queue buffer ([[CollectTopK]], planned through
  * ObjectHashAggregate): no candidate sort anywhere, partial buffers
  * combine map-side, and the shuffle carries O(groups × k) rows — the
  * same partial-aggregation shape as a SUM. Determinism: elements are
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
