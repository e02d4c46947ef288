package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seasonal HHI and outage windows: closed-form concentration values
  * and planted gaps. End-to-end values are pinned by the DuckDB twins
  * (`etl_seasonal_hhi`, `etl_outage_windows`). */
class HhiOutageSpec extends SparkSpec {
  import spark.implicits._

  test("hhi: uniform months sit at 10^6/n, a one-month store at 10^6") {
    val monthly = // store 1: 4 equal months; store 2: everything in June
      Seq((1L, 1, 250L), (1L, 2, 250L), (1L, 3, 250L), (1L, 4, 250L),
        (2L, 6, 999L)).toDF("store_id", "month", "cents")
    val r = EtlQueries.seasonalHhiOf(monthly).collect()
      .map(row => row.getLong(0) ->
        (row.getLong(1), row.getLong(3), row.getInt(4), row.getLong(5))).toMap
    // share_ppm = 250000 each → Σ share² / 10⁶ = 4·250000²/10⁶ = 250000
    assert(r(1L) == ((4L, 250000L, 1, 250L)))
    assert(r(2L) == ((1L, 1000000L, 6, 999L)))
  }

  test("hhi peak ties resolve to the earliest month") {
    val monthly = Seq((1L, 3, 500L), (1L, 7, 500L))
      .toDF("store_id", "month", "cents")
    val r = EtlQueries.seasonalHhiOf(monthly).collect()(0)
    assert(r.getInt(4) == 3 && r.getLong(3) == 500000L)
  }

  test("leadtime drift: total shift scores 10^6, identical years score 0") {
    val base = (
      (1 to 10).map(_ => (1L, 2000, 3L)) ++ // all 0-7
        (1 to 10).map(_ => (1L, 2001, 40L)) ++ // all 31+
        (1 to 5).map(i => (2L, 2000, i.toLong * 10)) ++
        (1 to 5).map(i => (2L, 2001, i.toLong * 10)) // identical mix
      ).toDF("store_id", "year", "lead_days")
    val r = EtlQueries.leadtimeDriftOf(base).collect()
      .map(row => row.getLong(0) -> row.getLong(4)).toMap
    assert(r(1L) == 1000000L)
    assert(r(2L) == 0L)
    assert(r.size == 2) // only valid consecutive-year pairs emit
  }

  test("outage windows: a 45-minute gap surfaces with exact bounds, a 10-minute gap does not") {
    val base = 1000000L // minute index
    val active = // type A: gap [base+10, base+54] (45 dark minutes)
      ((0L to 9L) ++ (55L to 60L)).map(i => ("A", base + i)) ++
        // type B: only a 10-minute gap — below the threshold
        ((0L to 9L) ++ (20L to 25L)).map(i => ("B", base + i))
    val r = EtlQueries.outageWindowsOf(active.toDF("event_type", "m")).collect()
    assert(r.length == 1)
    assert(r(0).getString(0) == "A")
    assert(r(0).getTimestamp(1).getTime == (base + 10) * 60_000L)
    assert(r(0).getTimestamp(2).getTime == (base + 55) * 60_000L)
    assert(r(0).getLong(3) == 45L)
  }
}
