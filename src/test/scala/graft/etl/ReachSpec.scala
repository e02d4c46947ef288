package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the cumulative distinct reach on the sf0.001 smoke
  * fact; exact values are pinned by the DuckDB twin
  * (`etl_cumulative_reach`). */
class ReachSpec extends SparkSpec {

  test("cumulative reach equals the brute-force growing distinct; series is monotone") {
    val reach = EtlQueries.cumulativeReach(spark, sfSmoke).cache()
    try {
      val f = Star.salesFact(spark, sfSmoke)
        .select(col("store_id"), col("customer_id"),
          (expr("CAST(year(time_id) AS INT)") * 12 +
            expr("CAST(month(time_id) AS INT)")).as("ym"))
        .distinct().cache()
      try {
        // brute force: distinct customers with any purchase at ym' <= ym
        val months = reach.select(col("store_id"),
          (col("year") * 12 + col("month")).as("ym"))
        val brute = months.as("m").join(f.as("p"),
            col("m.store_id") === col("p.store_id") &&
              col("p.ym") <= col("m.ym"))
          .groupBy(col("m.store_id").as("store_id"), col("m.ym").as("ym"))
          .agg(countDistinct("p.customer_id").as("expect"))
        val drift = reach
          .withColumn("ym", col("year") * 12 + col("month"))
          .join(brute, Seq("store_id", "ym"))
          .where(col("cumulative_customers") =!= col("expect"))
        assert(drift.count() == 0, "cumulative reach drifts from brute force")
        // final cumulative per store == the store's total distinct customers
        val fin = reach.groupBy("store_id")
          .agg(max("cumulative_customers").as("got"))
        val tot = f.groupBy("store_id")
          .agg(countDistinct("customer_id").as("want"))
        assert(fin.join(tot, Seq("store_id"))
          .where(col("got") =!= col("want")).count() == 0)
        // per row: active ≤ cumulative, new ≤ active
        assert(reach.where(col("active_customers") > col("cumulative_customers") ||
          col("new_customers") > col("active_customers")).count() == 0)
      } finally f.unpersist()
    } finally reach.unpersist()
  }
}
