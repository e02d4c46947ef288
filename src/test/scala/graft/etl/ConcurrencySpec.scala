package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Peak-concurrency sweep vs a driver-side brute force over the smoke
  * data (exact output pinned by the DuckDB twin `etl_peak_open_orders`). */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  test("sweep peak equals the brute-force interval count on each store's peak day") {
    val out = EtlQueries.peakOpenOrders(spark, sfSmoke)
      .select(col("store_id"), col("peak_open"),
        expr("datediff(peak_day, DATE'1970-01-01')").cast("int"))
      .as[(Long, Int, Int)].collect().toSeq
    assert(out.nonEmpty)
    val l = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
    val o = spark.read.parquet(s"$sfSmoke/orders.parquet")
    val s = spark.read.parquet(s"$sfSmoke/supplier.parquet")
    val iv = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").as("store"),
        expr("least(datediff(o_orderdate, DATE'1970-01-01'), " +
          "datediff(l_shipdate, DATE'1970-01-01'))").cast("int").as("sd"),
        expr("greatest(datediff(o_orderdate, DATE'1970-01-01'), " +
          "datediff(l_shipdate, DATE'1970-01-01'))").cast("int").as("ed"))
      .as[(Long, Int, Int)].collect().toSeq.groupBy(_._1)
    out.foreach { case (store, peak, day) =>
      val ivs = iv(store)
      // brute force: count intervals open on the reported day (inclusive)
      val openOnDay = ivs.count { case (_, sd, ed) => sd <= day && day <= ed }
      assert(openOnDay == peak, s"store $store day $day")
      // no earlier day reaches the same count
      val days = ivs.flatMap(r => Seq(r._2, r._3 + 1)).distinct.filter(_ < day)
      val earlierMax = if (days.isEmpty) 0
        else days.map(d => ivs.count { case (_, sd, ed) => sd <= d && d <= ed }).max
      assert(earlierMax < peak, s"store $store had an earlier day at >= peak")
    }
  }

  test("interval merge: islands are disjoint with real gaps and equal the brute-force union") {
    import org.apache.spark.sql.functions._
    val out = EtlQueries.intervalMerge(spark, sfSmoke).cache()
    try {
      assert(out.count() > 0)
      // n_days is the island's inclusive span (coverage is contiguous)
      assert(out.where(col("n_days") =!=
        datediff(col("end_day"), col("start_day")) + 1).count() == 0)
      val islands = out.collect().map(r =>
        (r.getInt(0), r.getTimestamp(1).toLocalDateTime.toLocalDate,
          r.getTimestamp(2).toLocalDateTime.toLocalDate, r.getLong(3)))
      // per store: ordered, disjoint, separated by >= 1 uncovered day
      islands.groupBy(_._1).foreach { case (_, isl) =>
        val sorted = isl.sortBy(_._2.toEpochDay)
        sorted.zip(sorted.tail).foreach { case (a, b) =>
          assert(b._2.toEpochDay > a._3.toEpochDay + 1,
            s"islands touch or overlap: $a / $b")
        }
      }
      // brute force on one store: merge intervals on a day set
      val store = islands.head._1
      val ivs = Star.table(spark, sfSmoke, "lineitem").as("l")
        .join(Star.table(spark, sfSmoke, "orders").as("o"),
          col("l.l_orderkey") === col("o.o_orderkey"))
        .join(Star.table(spark, sfSmoke, "supplier").as("s"),
          col("l.l_suppkey") === col("s.s_suppkey"))
        .where(col("s.s_nationkey") === store)
        .groupBy(col("l.l_orderkey"))
        .agg(to_date(min("o.o_orderdate")).as("d0"), to_date(max("l.l_shipdate")).as("d1"))
        .collect().map(r => (r.getDate(1).toLocalDate.toEpochDay,
          r.getDate(2).toLocalDate.toEpochDay))
      // reversed (degenerate) intervals clamp to their start day
      val covered = ivs.flatMap { case (a, b) => a to math.max(a, b) }.distinct.sorted
      val brute = covered.foldLeft(List.empty[(Long, Long)]) {
        case ((s0, e0) :: rest, d) if d == e0 + 1 => (s0, d) :: rest
        case (acc, d) => (d, d) :: acc
      }.reverse
      val got = islands.filter(_._1 == store).sortBy(_._2.toEpochDay)
        .map(t => (t._2.toEpochDay, t._3.toEpochDay)).toList
      assert(got == brute, s"store $store islands != brute-force union")
    } finally out.unpersist()
  }
}
