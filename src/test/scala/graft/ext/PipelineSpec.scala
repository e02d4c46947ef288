package graft.ext

import graft.SparkSpec

/** The curation pipeline and its funnel audit: the funnel's final
  * survivor count must equal the cleaned corpus row count (same gates,
  * same constants, same keeper tables — a drift between them is a
  * pipeline/dashboard split-brain), and the stage algebra must
  * reconcile. End-to-end values are pinned by the DuckDB twins. */
class PipelineSpec extends SparkSpec {

  test("funnel stages reconcile and the final stage equals cleanCorpus") {
    val rows = PipelineOps.filterFunnel(spark, sfSmoke).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3, 4, 5))
    assert(rows.map(_._2).toSeq ==
      Seq("length", "quality", "language", "exact_dedup", "near_dup"))
    // chain: each stage's n_in is the previous stage's n_out
    rows.sliding(2).foreach { case Array(a, b) => assert(b._3 == a._5) }
    // per-stage conservation and monotonicity
    rows.foreach { case (_, _, nIn, nDrop, nOut) =>
      assert(nIn == nDrop + nOut && nOut <= nIn && nDrop >= 0)
    }
    // stage 1 enters the whole corpus
    assert(rows.head._3 == TextOps.docs(spark, sfSmoke).count())
    // the theorem: funnel ≡ pipeline
    assert(rows.last._5 == PipelineOps.cleanCorpus(spark, sfSmoke).count(),
      "funnel survivors must equal the cleaned corpus")
    // the funnel is non-trivial on the test corpus: something dies
    assert(rows.map(_._4).sum > 0, "no stage dropped anything — thresholds vacuous")
  }
}
