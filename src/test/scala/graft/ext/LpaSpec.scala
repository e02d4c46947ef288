package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation on hand-built graphs plus a
  * brute-force round-for-round reference. Exact end-to-end values on
  * the co-purchase graph are pinned by the DuckDB twin
  * (`ext_graph_lpa`). */
class LpaSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*): DataFrame =
    pairs.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .distinct.toDF("u", "v")

  private def lpa(e: DataFrame, rounds: Int = GraphOps.LpaRounds): Map[Long, Long] =
    GraphOps.labelPropagationOf(e, rounds).as[(Long, Long)].collect().toMap

  /** The same synchronous update on Scala collections: most frequent
    * neighbor label, smallest on ties. */
  private def bruteLpa(pairs: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val nbrs = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lab = nbrs.map { case (n, ns) =>
        val freq = ns.map(lab).groupBy(identity).view.mapValues(_.size)
        n -> freq.toSeq.maxBy { case (l, c) => (c, -l) }._1
      }
    }
    lab
  }

  test("two triangles over a bridge resolve to two communities") {
    val g = edges((1L,2L),(1L,3L),(2L,3L),(4L,5L),(4L,6L),(5L,6L),(3L,4L))
    val got = lpa(g)
    assert(Set(got(1L), got(2L), got(3L)).size == 1)
    assert(Set(got(4L), got(5L), got(6L)).size == 1)
    assert(got(1L) != got(4L))
  }

  test("bipartite oscillation is pinned by the fixed round count") {
    // a single edge flips labels every round: even round counts land on
    // the identity labeling, odd ones on the swap — the reason rounds
    // are FIXED (shared with the oracle), never run to "convergence"
    val e = edges((1L, 2L))
    assert(lpa(e, 4) == Map(1L -> 1L, 2L -> 2L))
    assert(lpa(e, 3) == Map(1L -> 2L, 2L -> 1L))
  }

  test("round-for-round equal to the brute-force synchronous update on a random graph") {
    val n = 30L
    val pairs = (for {
      i <- 1L to n; j <- (i + 1) to n
      if ((i * 2654435761L + j * 40503L) % 97) < 15
    } yield (i, j)).toSeq
    for (r <- 1 to 4)
      assert(lpa(pairs.toDF("u", "v"), r) == bruteLpa(pairs, r), s"diverged at round $r")
  }

  test("modularity: closed form on two disjoint triangles, margin conservation, chance baseline") {
    val g = edges((1L,2L),(1L,3L),(2L,3L),(4L,5L),(4L,6L),(5L,6L))
    val perfect = Seq((1L,1L),(2L,1L),(3L,1L),(4L,4L),(5L,4L),(6L,4L)).toDF("node","lab")
    val q = GraphOps.modularityOf(g, perfect).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // each triangle: e_c=3, d_c=6, m=6 -> 3/6 - (6/12)^2 = 0.25
    assert(q.toSeq == Seq((1L,3L,3L,6L,0.25),(4L,3L,3L,6L,0.25)))
    // the all-singletons partition scores negative (worse than chance)
    val singles = (1L to 6L).map(n => (n, n)).toDF("node","lab")
    val qs = GraphOps.modularityOf(g, singles).agg(sum("q_term"))
      .collect().head.getDouble(0)
    assert(qs < 0)
    // margins conserve on the corpus partition
    val res = GraphOps.lpaModularity(spark, sfSmoke).cache()
    try {
      val e = GraphOps.supportedCoPurchaseEdges(spark, sfSmoke)
      val m = e.count()
      val sums = res.agg(sum("internal_edges"), sum("total_degree"), sum("q_term"))
        .collect().head
      assert(sums.getLong(0) <= m)
      assert(sums.getLong(1) == 2 * m)
      val qTotal = sums.getDouble(2)
      assert(qTotal >= -0.5 && qTotal <= 1.0)
    } finally res.unpersist()
  }

  test("driver query labels every node of the supported graph exactly once") {
    val res = GraphOps.labelCommunities(spark, sfSmoke).cache()
    try {
      val e = GraphOps.supportedCoPurchaseEdges(spark, sfSmoke)
      val nNodes = e.select("u").union(e.select("v")).distinct().count()
      assert(res.count() == nNodes)
      assert(res.select("product_id").distinct().count() == nNodes)
      // community sizes reconcile with the label assignment
      val bySize = res.groupBy("community").count()
        .join(res.select("community", "community_size").distinct(), Seq("community"))
        .where($"count" =!= $"community_size")
      assert(bySize.count() == 0)
    } finally res.unpersist()
  }
}
