package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the round-4 scale-pattern joins at the edges the oracle rows
  * can't isolate: bloom prefilter invisibility (and its presence in the
  * plan), trailing-window boundary semantics, and the bucketed range
  * join's equivalence to the naive inequality join it replaces. */
class ScaleJoinSpec extends SparkSpec {

  test("bloom semi-join equals the plain semi-join (fp removed by exact join)") {
    import spark.implicits._
    // 1000 probe keys, 10 build keys ⇒ plenty of non-members to tempt a
    // false positive through; tiny filter (64 bits) makes fps LIKELY, so
    // this passes only because the exact join removes them.
    val probe = (1L to 1000L).toDF("k")
    val build = (1L to 100L).filter(_ % 10 == 0).toDF("bk")
    val got = BloomOps.bloomSemiJoin(probe, "k", build, "bk",
        expectedItems = 10, numBits = 64)
      .select("k").as[Long].collect().sorted
    assert(got === (1L to 100L).filter(_ % 10 == 0).toArray)
  }

  test("bloom probe reaches the plan; urgent-revenue equals the plain join") {
    val df = BloomOps.urgentOrderRevenue(spark, sfSmoke)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "bloom prefilter missing from the plan")
    val orders = spark.read.parquet(s"$sfSmoke/orders.parquet")
      .where(col("o_orderpriority") === "1-URGENT" &&
        year(col("o_orderdate").cast("date")) === 1997)
      .select("o_orderkey")
    val plain = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
      .join(orders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(expr("CAST(floor(l_quantity) AS BIGINT)")).as("sum_qty"),
        sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")).as("revenue_cents"))
      .orderBy("l_returnflag")
    assert(df.collect().toSeq === plain.collect().toSeq)
  }

  test("trailing-window join: boundaries, cross-bucket match, zero-match rows") {
    import spark.implicits._
    // window = 30 days. Probe at day 100 (bucket 3). Right rows chosen to
    // pin: exact-day inclusive, ts-W exclusive, ts-W+1 inclusive (lands
    // in bucket 2 → only reachable through the cross-bucket replica),
    // future excluded, other key excluded, keyless probe retained.
    val left = Seq((1L, 10L, 100L), (2L, 99L, 100L)).toDF("id", "k", "day")
    val right = Seq(
      (10L, 100L, "same_day"),      // b.day <= a.day → in
      (10L, 70L, "edge_out"),       // day > 100-30 fails → out
      (10L, 71L, "edge_in"),        // bucket 2, cross-bucket replica → in
      (10L, 101L, "future"),        // out
      (20L, 100L, "other_key")      // out
    ).toDF("rk", "rday", "tag")
    val out = TemporalOps.trailingWindowJoin(left, right, "k", "rk", "day", "rday", 30)
      .groupBy("id").agg(sort_array(collect_list("tag")).as("tags"))
      .orderBy("id").as[(Long, Seq[String])].collect().toSeq
    assert(out === Seq((1L, Seq("edge_in", "same_day")), (2L, Seq.empty)))
  }

  test("bucketed trailing join equals the naive inequality join on real orders") {
    import spark.implicits._
    val o = spark.read.parquet(s"$sfSmoke/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"))
    val b = o.select(col("o_custkey").as("bc"), col("o_orderkey").as("bk"),
      col("cents").as("bcents"), col("day").as("bday"))
    val naive = o.join(b,
        col("o_custkey") === col("bc") && col("bk") =!= col("o_orderkey") &&
          col("bday") > col("day") - 30 && col("bday") <= col("day"), "left")
      .groupBy("o_orderkey")
      .agg(count(col("bk")).as("n"), coalesce(sum("bcents"), lit(0L)).as("s"),
        max("bday").as("d"))
      .orderBy("o_orderkey")
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    val bucketed = TemporalOps.ordersTrailing30d(spark, sfSmoke)
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    assert(bucketed === naive)
    // and the bucketed plan must not be the naive plan: no per-key
    // all-pairs — every join in it carries an equi-key component.
    val plan = TemporalOps.ordersTrailing30d(spark, sfSmoke)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "bucketed range join degenerated to an all-pairs join")
  }
}
