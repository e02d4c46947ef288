package graft.streaming

import graft.SparkSpec
import graft.ext.GraphOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental connected components: cross-batch merges relabel the
  * stored mapping, re-delivered edges are no-ops, a later smaller id
  * takes over as the component's canonical root, and ANY batch order
  * converges to the from-scratch labels. The corpus-level
  * incremental ≡ batch gate is `stream_graph_cc`. */
class StreamGraphSpec extends SparkSpec {
  import spark.implicits._

  private def empty(): DataFrame =
    Seq.empty[(Long, Long)].toDF("node", "root")

  private def edges(es: (Long, Long)*): DataFrame = es.toDF("a", "b")

  private def m(state: DataFrame): Map[Long, Long] =
    state.as[(Long, Long)].collect().toMap

  test("merges relabel stored components; re-delivery is a no-op; a smaller id becomes root") {
    var st = StreamGraph.mergeStep(empty(), edges(1L -> 2L, 5L -> 6L))
    assert(m(st) == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L))
    st = StreamGraph.mergeStep(st, edges(3L -> 4L))
    assert(m(st)(3L) == 3L && m(st)(4L) == 3L)
    // cross-batch merge: the stored 5-component relabels to 1
    st = StreamGraph.mergeStep(st, edges(2L -> 5L))
    assert(m(st) == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L, 3L -> 3L, 4L -> 3L))
    // re-delivery: both ends already share a root — state unchanged
    val before = m(st)
    st = StreamGraph.mergeStep(st, edges(1L -> 2L, 2L -> 5L))
    assert(m(st) == before)
    // a NEW smaller node takes over as the canonical minimum
    st = StreamGraph.mergeStep(st, edges(0L -> 6L))
    assert(m(st) == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 5L -> 0L, 6L -> 0L,
      3L -> 3L, 4L -> 3L))
  }

  test("any batch order converges to the from-scratch labels") {
    val all = Seq(1L -> 2L, 2L -> 3L, 7L -> 8L, 8L -> 9L, 3L -> 7L,
      20L -> 21L, 4L -> 9L, 10L -> 20L)
    val batch = GraphOps.connectedComponents(all.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    for (order <- Seq(all, all.reverse, all.grouped(3).toSeq.reverse.flatten)) {
      var st = empty()
      order.grouped(2).foreach(g => st = StreamGraph.mergeStep(st, g.toDF("a", "b")))
      assert(m(st) == batch, s"order $order must converge to the batch labels")
    }
  }
}
