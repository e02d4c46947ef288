package graft.ext

import graft.SparkSpec

/** Large-star/small-star connected components: correctness on multi-
  * component graphs and the long-chain case that defeats one-hop
  * min-label propagation (the prior implementation capped at 50 rounds —
  * a path of 80 nodes would have tripped its convergence `require`). */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("long chain: a path of 80 nodes collapses to one component in O(log d) rounds") {
    val path = (0L until 79L).map(i => (i, i + 1))
    val out = cc(path)
    assert(out.size == 80)
    assert(out.values.toSet == Set(0L))
  }

  test("multiple components resolve to their own minima; edge order is irrelevant") {
    // component {1,2,3} (triangle), {10,11} (pair, reversed edge),
    // {20,21,22,23} (star around a NON-minimal center).
    val edges = Seq((3L, 2L), (2L, 1L), (3L, 1L), (11L, 10L),
      (22L, 20L), (22L, 21L), (22L, 23L))
    val out = cc(edges)
    assert(out == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
  }

  test("self-loops and duplicate/null edges are ignored; empty graph yields empty output") {
    val withJunk = Seq((1L, 1L), (2L, 3L), (3L, 2L), (2L, 3L))
    assert(cc(withJunk) == Map(2L -> 2L, 3L -> 2L))
    assert(cc(Seq.empty) == Map.empty)
  }
}
