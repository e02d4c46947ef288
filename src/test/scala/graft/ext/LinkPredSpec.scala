package graft.ext

import graft.SparkSpec

/** RA-index link prediction: exact scores on hand graphs, adjacency
  * exclusion, and the hub cap. End-to-end corpus values are pinned by
  * the DuckDB twin (`ext_graph_linkpred`). */
class LinkPredSpec extends SparkSpec {
  import spark.implicits._

  test("path and cycle score the exact quantized RA index") {
    // path 1-2-3-4: predictions (1,3) via center 2 and (2,4) via 3,
    // both deg-2 centers → ra = 10^6 div 2
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val p = GraphOps.linkPredictOf(path).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(p == Map((1L, 3L) -> ((1L, 500000L)), (2L, 4L) -> ((1L, 500000L))))
    // 4-cycle: diagonals share TWO deg-2 centers → ra = 10^6 exactly
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    val c = GraphOps.linkPredictOf(cycle).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(c == Map((1L, 3L) -> 1000000L, (2L, 4L) -> 1000000L))
  }

  test("adjacent pairs are never predicted; hub-capped centers contribute nothing") {
    // triangle: every common-neighbor pair is already an edge
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    assert(GraphOps.linkPredictOf(tri).count() == 0)
    // star with a hub above the cap: all wedges center on the hub
    val star = (1L to 70L).map(i => (0L, i)).toDF("u", "v")
    assert(GraphOps.linkPredictOf(star).count() == 0)
    // the same star under a raised cap predicts every spoke pair
    assert(GraphOps.linkPredictOf(star, hubCap = 100L, k = 5000).count()
      == 70L * 69L / 2)
  }

  test("corpus pass: bounded output, scores within one wedge-sum of the cap rule") {
    val res = GraphOps.linkPredict(spark, sfSmoke).collect()
    assert(res.length <= GraphOps.LinkPredK)
    res.foreach { r =>
      val (n, ra) = (r.getLong(2), r.getLong(3))
      // each wedge adds between 10^6/cap and 10^6/2 ppm
      assert(ra >= n * (TextOps.Ppm / GraphOps.LinkPredHubCap) && ra <= n * (TextOps.Ppm / 2))
    }
  }
}
