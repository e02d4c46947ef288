package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Additive seasonal decomposition: a constructed level-plus-periodic
  * series decomposes EXACTLY (flat trend at the level, indices = the
  * planted pattern, remainder 0 — the closed-form property of the
  * 2×12 window spanning one full period), the floor-division spelling
  * matches floor semantics on negative numerators, and the real-data
  * output satisfies the structural invariants (trend exactly where 13
  * consecutive months exist, identity cents·1000 = trend + seasonal +
  * remainder, near-zero-sum centered indices). Cross-engine equality
  * is hash-gated by `etl_seasonal_decompose`. */
class SeasonalDecomposeSpec extends SparkSpec {
  import spark.implicits._

  // zero-sum monthly pattern in cents (Σ = 0), planted on a flat level
  private val pattern = Seq(300L, -120L, 80L, -260L, 40L, 200L,
    -100L, 60L, -140L, 220L, -180L, -100L)

  test("level + periodic series decomposes exactly: flat trend, planted indices, zero remainder") {
    val level = 50000L
    // 36 months starting at month 1 of "year 0" (x = 1..36)
    val monthly = (1L to 36L)
      .map(x => (7L, x, level + pattern(((x - 1) % 12).toInt)))
      .toDF("store_id", "x", "y")
    val out = EtlQueries.seasonalDecomposeMonthly(monthly)
      .select("month", "year", "cents", "trend_milli", "seasonal_milli",
        "remainder_milli")
      .as[(Int, Int, Long, Option[Long], Option[Long], Option[Long])]
      .collect()
    assert(out.length == 36)
    // interior months (x in 7..30) carry the closed-form decomposition
    val interior = out.filter(_._4.nonEmpty)
    assert(interior.length == 24, "trend defined exactly on the 13-covered interior")
    interior.foreach { case (month, _, cents, t, s, r) =>
      assert(t.get == level * 1000L, s"flat trend at the level, got $t")
      assert(s.get == pattern(month - 1) * 1000L,
        s"month $month index must be the planted pattern value")
      assert(r.get == 0L, "periodic series leaves zero remainder")
      assert(cents * 1000L == t.get + s.get + r.get)
    }
    // edge months: no trend, but the seasonal index still serves
    out.filter(_._4.isEmpty).foreach { case (month, _, _, _, s, r) =>
      assert(s.get == pattern(month - 1) * 1000L)
      assert(r.isEmpty, "remainder undefined without a trend")
    }
  }

  test("floorDiv spelling floors negative numerators (not truncates)") {
    val rows = Seq((-7L, 2L), (7L, 2L), (-6L, 3L), (-1L, 12L))
      .toDF("a", "b")
      .withColumn("fd", expr(EtlQueries.floorDiv("a", "b", "DIV")))
      .select("fd").as[Long].collect().toSeq
    assert(rows == Seq(-4L, 3L, -2L, -1L),
      "must floor: -7/2 -> -4 (Spark's bare div would give -3)")
  }

  test("real-data invariants: coverage rule, identity, near-zero-sum indices") {
    val out = EtlQueries.seasonalDecompose(spark, sfSmoke)
      .select("store_id", "year", "month", "cents", "trend_milli",
        "seasonal_milli", "remainder_milli")
      .as[(Long, Int, Int, Long, Option[Long], Option[Long], Option[Long])]
      .collect()
    assert(out.nonEmpty)
    // trend coverage: exactly the months with all 13 neighbours present
    val byStore = out.groupBy(_._1)
    byStore.foreach { case (sid, rows) =>
      val xs = rows.map(r => r._2 * 12 + r._3).toSet
      rows.foreach { r =>
        val x = r._2 * 12 + r._3
        val covered = (x - 6 to x + 6).forall(xs.contains)
        assert(r._5.nonEmpty == covered,
          s"store $sid month $x: trend defined iff 13-covered")
        // identity wherever all parts exist
        if (r._5.nonEmpty && r._6.nonEmpty)
          assert(r._4 * 1000L == r._5.get + r._6.get + r._7.get)
      }
      // centered indices: |Σ| < #indices (one floor of slack per index)
      val idx = rows.filter(_._5.nonEmpty).map(r => (r._3, r._6.get)).distinct
      if (idx.nonEmpty)
        assert(math.abs(idx.map(_._2).sum) <= idx.length,
          s"store $sid: centered indices must sum to ~0")
    }
  }
}
