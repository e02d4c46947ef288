package graft.olap

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The approx-percentile error envelope (q25_percentiles_approx): the
  * checker's arithmetic from first principles, the verdict flipping on
  * a deliberately wrong sketch value, and the real sketch passing at
  * the registered accuracy. */
class PercentileEnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private def subOf(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("store_id", "order_id", "order_cents")

  private def approxOf(rows: Seq[(Long, String, Double, Long)]) =
    rows.toDF("store_id", "qlabel", "p", "v")

  test("envelope math: target rank and tolerance from first principles") {
    // one store, order values exactly 1..1000 cents
    val sub = subOf((1L to 1000L).map(i => (7L, i, i)))
    // the TRUE p50/p90/p99 values trivially satisfy the bound
    val approx = approxOf(Seq(
      (7L, "p50", 0.5, 500L), (7L, "p90", 0.9, 900L), (7L, "p99", 0.99, 990L)))
    val out = Queries.percentileEnvelope(sub, approx, accuracy = 1000)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    // n = 1000 → tolerance = 1000 div 1000 + 1 = 2; targets ⌈p·1000⌉
    assert(out.toSeq == Seq(
      ("p50", 1000L, 500L, 2L, true),
      ("p90", 1000L, 900L, 2L, true),
      ("p99", 1000L, 990L, 2L, true)))
  }

  test("a sketch value outside the rank tolerance flips the verdict") {
    val sub = subOf((1L to 1000L).map(i => (7L, i, i)))
    // p50 claimed at value 600 → rank 600, |600 − 500| = 100 > 2
    val bad = approxOf(Seq((7L, "p50", 0.5, 600L)))
    val out = Queries.percentileEnvelope(sub, bad, accuracy = 1000).collect()
    assert(!out.head.getBoolean(5), "a 100-rank miss must fail the envelope")
    // just inside the tolerance still passes (rank 502, target 500, tol 2)
    val edge = approxOf(Seq((7L, "p50", 0.5, 498L)))
    assert(Queries.percentileEnvelope(sub, edge, accuracy = 1000)
      .collect().head.getBoolean(5))
    // one past it fails (rank 497 < target − tol... rank 503 > 502)
    val past = approxOf(Seq((7L, "p50", 0.5, 503L)))
    assert(!Queries.percentileEnvelope(sub, past, accuracy = 1000)
      .collect().head.getBoolean(5))
  }

  test("ties: a repeated value's full rank range [n_lt+1, n_le] counts") {
    // 500 copies of 10, 500 copies of 20: the median value 10 has rank
    // range [1, 500], which reaches target 500 — within any tolerance
    val sub = subOf((1L to 1000L).map(i => (7L, i, if (i <= 500) 10L else 20L)))
    val tied = approxOf(Seq((7L, "p50", 0.5, 10L)))
    assert(Queries.percentileEnvelope(sub, tied, accuracy = 1000)
      .collect().head.getBoolean(5))
  }

  test("the real sketch passes the envelope on the test corpus") {
    val out = Queries.q25PercentilesApprox(spark, sfSmoke).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getBoolean(5)),
      "approx_percentile broke its advertised rank bound")
    // and the exact row agrees on the spine (same stores × 3 labels)
    val exact = Queries.q25Percentiles(spark, sfSmoke).select("store_id").collect()
    assert(out.length == exact.length * 3)
  }
}
