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
}
