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

  test("datasheet: cells conserve the cleaned corpus, shares quantize to the total") {
    val ds = PipelineOps.corpusDatasheet(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val langs = TextOps.docs(spark, sfSmoke).select("lang").distinct().count()
    assert(ds.length == langs * 3, "full language × split grid, zero-filled")
    assert(ds.map(_._3).sum == PipelineOps.cleanCorpus(spark, sfSmoke).count(),
      "doc cells must conserve the cleaned corpus")
    // empty cells carry zero shares; shares sum to ≤ 10⁶ with floor slack
    ds.foreach { case (_, _, nd, nt, dp, tp) =>
      if (nd == 0) assert(nt == 0 && dp == 0 && tp == 0)
    }
    val dpSum = ds.map(_._5).sum
    assert(dpSum <= 1000000L && dpSum > 1000000L - ds.length,
      s"doc shares must telescope to 10⁶ within floor slack, got $dpSum")
  }

  test("source overlap: canonical cells conserve the verified pair table") {
    val m = DedupOps.sourceOverlap(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    m.foreach { case (a, b, _) => assert(a <= b, "cells must be canonical") }
    val s = TextOps.docs(spark, sfSmoke).select("source").distinct().count()
    assert(m.length == s * (s + 1) / 2, "zero-filled upper triangle")
    assert(m.map(_._3).sum == DedupOps.jaccardPairs(spark, sfSmoke).count(),
      "every verified pair lands in exactly one cell")
  }
}
