package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CUSUM changepoint and linear gap interpolation: planted level
  * shift, tie-break, exact interpolated values, and the truncation
  * semantics both engines share. End-to-end corpus values are pinned
  * by the DuckDB twins (`etl_cusum_changepoint`,
  * `etl_gap_interpolate`). */
class CusumGapSpec extends SparkSpec {
  import spark.implicits._

  private def x(year: Int, month: Int): Int = year * 12 + month

  test("cusum finds a planted level shift with the right direction and scale") {
    // store 1: 100 cents for months 1-4, 200 for 5-8 — the cumulative
    // deviation bottoms exactly at the last low month (dev = n·cum −
    // i·total = 8·400 − 4·1200 = −1600), and the early-below-mean sign
    // reads as an upward shift
    val monthly = (1 to 8).map(m =>
      (1L, x(2024, m), if (m <= 4) 100L else 200L)).toDF("store_id", "x", "cents")
    val r = EtlQueries.cusumOf(monthly).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 8L) // n_months
    assert((r(0).getInt(2), r(0).getInt(3)) == ((2024, 4)))
    assert(r(0).getLong(4) == -1600L)
    assert(r(0).getString(5) == "up")
  }

  test("cusum |dev| ties resolve to the earliest month") {
    // 100, 200, 100 → dev = (−100, 100, 0): tie on |dev| at months 1
    // and 2 → month 1 wins, direction up (early month under the mean)
    val monthly = Seq((1L, x(2024, 1), 100L), (1L, x(2024, 2), 200L),
      (1L, x(2024, 3), 100L)).toDF("store_id", "x", "cents")
    val r = EtlQueries.cusumOf(monthly).collect()
    assert((r(0).getInt(2), r(0).getInt(3)) == ((2024, 1)))
    assert(r(0).getLong(4) == -100L && r(0).getString(5) == "up")
  }

  test("gap interpolation: exact fills, truncation, flags, no end extrapolation") {
    val monthly = Seq(
      (1L, x(2024, 1), 1000L), (1L, x(2024, 4), 1600L), // gap of 2
      (2L, x(2024, 1), 1000L), (2L, x(2024, 3), 1001L), // trunc toward 0
      (3L, x(2024, 1), 1001L), (3L, x(2024, 3), 1000L)  // negative delta
    ).toDF("store_id", "x", "cents")
    val r = EtlQueries.gapInterpolateOf(monthly).collect()
      .map(row => (row.getLong(0), row.getInt(2)) ->
        (row.getLong(3), row.getBoolean(4))).toMap
    assert(r((1L, 2)) == ((1200L, true)) && r((1L, 3)) == ((1400L, true)))
    assert(r((1L, 1)) == ((1000L, false)) && r((1L, 4)) == ((1600L, false)))
    // (1001−1000)·1 div 2 = 0 both engines (truncation)
    assert(r((2L, 2)) == ((1000L, true)))
    // (1000−1001)·1 div 2 = 0 too: −0.5 truncates toward zero
    assert(r((3L, 2)) == ((1001L, true)))
    // spine is each store's own [min, max] — no extrapolated months
    assert(r.keySet.map(_._2).max == 4)
    assert(!r.contains((2L, 4)) && !r.contains((3L, 4)))
  }

  test("t-closeness: homogeneous groups score the exact TV distance, matched groups zero") {
    // groups A (10x cat 1), B (10x cat 2), C (5+5) in a 50/50 corpus:
    // A and B sit at TV = 0.5 from the global mix, C matches it exactly
    val qi = ((1 to 10).map(_ => ("A", 0L, 1)) ++
      (1 to 10).map(_ => ("B", 0L, 2)) ++
      (1 to 5).map(_ => ("C", 0L, 1)) ++ (1 to 5).map(_ => ("C", 0L, 2)))
      .toDF("segment", "bal_band", "sensitive")
    val r = Retention.tClosenessOf(qi).collect()
      .map(row => row.getString(0) -> (row.getLong(2), row.getLong(3), row.getBoolean(4)))
      .toMap
    assert(r("A") == ((10L, 500000L, false)))
    assert(r("B") == ((10L, 500000L, false)))
    assert(r("C") == ((10L, 0L, true)))
  }
}
