package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Fixed-point integer PageRank invariants on hand-built graphs. Exact
  * end-to-end values are pinned by the DuckDB twin (`ext_graph_pagerank`);
  * here: structural properties and the integer-arithmetic guarantees the
  * design claims (partitioning-independent determinism, mass bounds). */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Directed-symmetric edge frame from undirected pairs. */
  private def sym(pairs: (Long, Long)*): DataFrame =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("regular graph: every node gets the identical rank") {
    // 4-cycle: all nodes degree 2 — symmetry forces equal ranks.
    val edges = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val ranks = GraphOps.pageRankOf(edges, 4).select("r").distinct().collect()
    assert(ranks.length == 1)
  }

  test("star graph: the hub outranks the leaves; total mass is conserved up to floor loss") {
    val edges = sym((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L))
    val out = GraphOps.pageRankOf(edges, 5)
      .as[(Long, Long)].collect().toMap
    val hub = out(10L)
    val leaves = out.filterNot(_._1 == 10L).values
    assert(leaves.forall(_ < hub))
    assert(leaves.toSet.size == 1) // leaves are symmetric
    val total = out.values.sum
    // Each division floors: total never exceeds the scale, and loses at
    // most a few units per node per iteration.
    assert(total <= GraphOps.PageRankScale)
    assert(total > GraphOps.PageRankScale - 1000L)
  }

  test("ranks are identical under different input partitionings (integer sums)") {
    val pairs = (1L to 40L).map(i => (i, i % 7 + 100L))
    val a = GraphOps.pageRankOf(sym(pairs: _*).repartition(1), 47)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val b = GraphOps.pageRankOf(sym(pairs: _*).repartition(13), 47)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("bipartite oscillation damps: successive hub deltas shrink by the damping factor") {
    // A star graph is bipartite, so power iteration OSCILLATES around the
    // fixed point; damping 0.85 contracts the swing every step.
    val edges = sym((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L))
    def hubRank(iters: Int): Long =
      GraphOps.pageRankOf(edges, 5, iters)
        .where(col("id") === 10L).as[(Long, Long)].head()._2
    val (h1, h2, h3) = (hubRank(1), hubRank(2), hubRank(3))
    assert(math.abs(h3 - h2) < math.abs(h2 - h1))
  }
}
