package graft.ext

import graft.SparkSpec

/** Large-star/small-star connected components: correctness on multi-
  * component graphs and the long-chain case that defeats one-hop
  * min-label propagation (the prior implementation capped at 50 rounds —
  * a path of 80 nodes would have tripped its convergence `require`). */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Runs BOTH execution paths of connectedComponents — the driver
    * union-find short-circuit (forced via a huge edge bound) and the
    * distributed star iteration (forced via bound 0) — asserts they
    * agree, and returns the result. Every test in this spec therefore
    * pins driver ≡ distributed on its graph. */
  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = edges.toDF("a", "b")
    val driver = GraphOps.connectedComponents(df, "a", "b",
        driverMaxEdges = Long.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val distributed = GraphOps.connectedComponents(df, "a", "b",
        driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(driver == distributed,
      "driver union-find short-circuit disagrees with the distributed star iteration")
    driver
  }

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

  test("random graphs match a driver-side union-find on every trial") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 30 + rnd.nextInt(40)
      val edges = Seq.fill(rnd.nextInt(60))((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      // truth: union-find, always hanging the larger root under the
      // smaller, so each final root IS its component's minimum member.
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val incident = edges.flatMap(e => Seq(e._1.toInt, e._2.toInt)).toSet
      val expected = incident.groupBy(find).values
        .flatMap { ms => val mn = ms.min.toLong; ms.map(_.toLong -> mn) }.toMap
      assert(cc(edges) == expected, s"trial $trial (n=$n, m=${edges.size})")
    }
  }

  test("under the default bound the driver short-circuit actually fires (local relation)") {
    val out = GraphOps.connectedComponents(
      Seq((5L, 4L), (4L, 3L), (9L, 8L)).toDF("a", "b"), "a", "b")
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    assert(out.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.isInstanceOf[LocalRelation]),
      "expected the driver union-find path (LocalRelation) under the default bound")
    assert(out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(3L -> 3L, 4L -> 3L, 5L -> 3L, 8L -> 8L, 9L -> 8L))
  }

  test("self-loops and duplicate/null edges are ignored; empty graph yields empty output") {
    val withJunk = Seq((1L, 1L), (2L, 3L), (3L, 2L), (2L, 3L))
    assert(cc(withJunk) == Map(2L -> 2L, 3L -> 2L))
    assert(cc(Seq.empty) == Map.empty)
  }
}
