package graft.ext

import graft.SparkSpec

/** The SAX time-series similarity kernel from first principles:
  * z-normalization makes scale invisible (an identical SHAPE at 100×
  * the level is distance 0), flat windows are excluded before the
  * divide, and the SAX index never separates what exact distance would
  * rank first. End-to-end values are pinned by the DuckDB twin. */
class SaxSpec extends SparkSpec {
  import spark.implicits._

  private def monthlyOf(rows: Seq[(Long, String, Long)]) =
    rows.toDF("store_id", "month", "dollars")

  test("identical shape at different scale is distance zero; flat series excluded") {
    // store 1: a ramp; store 2: the same ramp ×100 (same z-shape);
    // store 3: constant (zero variance — must not divide, must not match)
    val shape = Seq(10L, 20L, 30L, 40L, 50L, 60L)
    val rows =
      shape.zipWithIndex.map { case (v, i) => (1L, f"2024-${i + 1}%02d", v) } ++
        shape.zipWithIndex.map { case (v, i) => (2L, f"2024-${i + 1}%02d", v * 100) } ++
        shape.indices.map(i => (3L, f"2024-${i + 1}%02d", 7L))
    val out = TemporalOps.saxSimilarFrom(monthlyOf(rows), k = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getDouble(5)))
    assert(out.length == 1, s"exactly the scaled twin pair must match: ${out.toSeq}")
    val (sa, _, sb, _, _, d) = out.head
    assert(sa == 1L && sb == 2L)
    // not algebraically 0.0: sqrt(100²·v) rounds independently of
    // 100·sqrt(v) (1 ulp), so the z-scores differ at the last bit. The
    // cross-ENGINE contract is bit-identity of that same rounding (the
    // oracle row pins it); the in-engine property is ≈ 0 at ulp scale.
    assert(d < 1e-20, s"z-normalization must erase the scale difference, got $d")
    assert(!out.exists(o => o._1 == 3L || o._3 == 3L), "flat store must be excluded")
  }

  test("the SAX word blocks dissimilar shapes from pairing") {
    // a rising ramp and a falling ramp: maximally different z-shapes →
    // words 'a..c' vs 'c..a' — no candidate pair is generated at all
    val up = Seq(10L, 20L, 30L, 40L, 50L, 60L)
    val rows =
      up.zipWithIndex.map { case (v, i) => (1L, f"2024-${i + 1}%02d", v) } ++
        up.reverse.zipWithIndex.map { case (v, i) => (2L, f"2024-${i + 1}%02d", v) }
    assert(TemporalOps.saxSimilarFrom(monthlyOf(rows), k = 10).collect().isEmpty)
  }

  test("sliding windows: a 8-month series yields 3 windows per store") {
    // same series twice → each of the 3 aligned window pairs matches at 0,
    // plus any cross-window word collisions; the aligned ones rank first
    val vals = Seq(5L, 9L, 2L, 8L, 3L, 7L, 1L, 6L)
    val rows = (1L to 2L).flatMap(s =>
      vals.zipWithIndex.map { case (v, i) => (s, f"2024-${i + 1}%02d", v) })
    val out = TemporalOps.saxSimilarFrom(monthlyOf(rows), k = 50).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3), r.getDouble(5)))
    val zeros = out.filter(_._5 == 0.0)
    assert(zeros.length == 3, s"three aligned zero-distance pairs expected: ${zeros.toSeq}")
    zeros.foreach { case (sa, wa, sb, wb, _) =>
      assert(sa == 1L && sb == 2L && wa == wb, "zeros must be the aligned windows")
    }
  }
}
