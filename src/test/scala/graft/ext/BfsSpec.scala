package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bounded-round BFS: hub pick determinism, exact hop distances on a
  * hand-built graph, and the round bound. End-to-end corpus values are
  * pinned by the DuckDB twin (`ext_graph_bfs`, unrolled to the same
  * round count). */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  test("hop distances on a lollipop graph; nodes beyond the bound are absent") {
    // hub 0 with spokes 1..3 (degree 4 with the chain), then a chain
    // 0-10-11-12-13-14: hops(10)=1 … hops(13)=4; 14 is 5 hops out and
    // must be absent at BfsRounds = 4
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 10L), (10L, 11L),
      (11L, 12L), (12L, 13L), (13L, 14L)).toDF("u", "v")
    val res = GraphOps.bfsHopsOf(edges).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(res == Map(0L -> 0, 1L -> 1, 2L -> 1, 3L -> 1, 10L -> 1,
      11L -> 2, 12L -> 3, 13L -> 4))
  }

  test("hub tie-break picks the smallest id; disconnected parts stay unreached") {
    // two triangles, equal max degree everywhere → source = node 1;
    // the second triangle is disconnected and must not appear
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (7L, 8L), (8L, 9L), (7L, 9L)).toDF("u", "v")
    val res = GraphOps.bfsHopsOf(edges).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(res == Map(1L -> 0, 2L -> 1, 3L -> 1))
  }

  test("corpus pass: one source at hops 0, hop levels contiguous, frontier monotone") {
    val res = GraphOps.bfsHops(spark, sfSmoke).cache()
    try {
      val byHop = res.groupBy("hops").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(byHop(0) == 1L)
      // no empty level below a populated one (BFS frontiers can only
      // die once)
      val present = byHop.keySet
      assert(present.forall(h => (0 to h).forall(present.contains)))
    } finally res.unpersist()
  }
}
