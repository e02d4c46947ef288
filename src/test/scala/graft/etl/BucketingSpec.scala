package graft.etl

import graft.SparkSpec

/** Plan-shape pin for the bucketed warehouse layout: the Q6-shape fact
  * self-join over a table bucketed on order_id must plan ZERO shuffle
  * exchanges (broadcast disabled so a small test table can't cheat the
  * assertion with a broadcast join). */
class BucketingSpec extends SparkSpec {

  test("bucketed fact self-join plans no shuffle exchange") {
    val table = "graft_test_fact_bucketed"
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Star.salesFact(spark, sfSmoke).select("order_id", "product_id"),
        table, Seq("order_id"), numBuckets = 4)
      val joined = Bucketing.affinityPairsBucketed(spark, table)
      val plan = joined.queryExecution.executedPlan.toString
      // both scan sides must read the bucketed layout...
      assert(plan.contains("Bucketed: true"), s"scan is not bucketed:\n$plan")
      // ...and the join must NOT reshuffle on order_id — the only
      // Exchange left is the final aggregation on the (product, product)
      // PAIR key, which no storage layout can avoid.
      assert(!plan.contains("Exchange hashpartitioning(order_id"),
        s"bucketed self-join still shuffles on the join key:\n$plan")
      assert("Exchange".r.findAllIn(plan).length == 1,
        s"expected exactly the pair-key aggregation exchange:\n$plan")
      // same frequencies as the unbucketed shape computes
      val viaBuckets = joined.orderBy("product_1", "product_2").collect()
      val direct = {
        import org.apache.spark.sql.functions._
        val fact = Star.salesFact(spark, sfSmoke).select("order_id", "product_id")
        fact.as("a").join(fact.as("b"),
            col("a.order_id") === col("b.order_id") &&
              col("a.product_id") < col("b.product_id"))
          .groupBy(col("a.product_id").as("product_1"), col("b.product_id").as("product_2"))
          .agg(count(lit(1)).as("frequency"))
          .orderBy("product_1", "product_2").collect()
      }
      assert(viaBuckets.toSeq == direct.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }
}
