package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Max-drawdown semantics against a driver-side fold over every
  * store's monthly series (tiny: stores × months); exact values are
  * pinned by the DuckDB twin (`etl_max_drawdown`). */
class DrawdownSpec extends SparkSpec {

  test("window algebra equals the sequential peak/trough fold, store by store") {
    val monthExpr = expr("substring(CAST(time_id AS STRING), 1, 7)")
    val series = Star.salesFact(spark, sfSmoke)
      .groupBy(col("store_id"), monthExpr.as("month"))
      .agg(sum((col("total_revenue") * 100).cast("long")).as("cents"))
      .collect().map(r => (r.getAs[Number](0).longValue, r.getString(1), r.getLong(2)))
      .groupBy(_._1).map { case (s, rows) =>
        s -> rows.sortBy(_._2).map(r => (r._2, r._3)).toList
      }
    val expected = series.map { case (store, months) =>
      var peak = Long.MinValue
      var maxDd = Long.MinValue
      var troughMonth = ""; var troughPeak = 0L
      for ((m, c) <- months) {
        peak = math.max(peak, c)
        val dd = peak - c
        if (dd > maxDd) { maxDd = dd; troughMonth = m; troughPeak = peak }
      }
      val recovery = months.collectFirst {
        case (m, c) if m > troughMonth && c >= troughPeak => m }
      store -> ((maxDd, troughMonth, troughPeak, recovery))
    }
    val got = EtlQueries.maxDrawdown(spark, sfSmoke).collect().map(r =>
      r.getAs[Number](0).longValue -> ((r.getLong(1), r.getString(2), r.getLong(3),
        Option(r.getString(4))))).toMap
    assert(got == expected)
    // and the invariants that make the row readable
    assert(got.values.forall { case (dd, _, pk, _) => dd >= 0 && pk >= dd })
    assert(got.values.forall { case (_, t, _, r) => r.forall(_ > t) })
  }
}
