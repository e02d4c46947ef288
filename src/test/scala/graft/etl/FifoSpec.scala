package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** First-principles FIFO-allocation semantics on a hand ledger, plus
  * the conservation law on real data; exact values are pinned by the
  * DuckDB twin (`etl_fifo_allocation`). */
class FifoSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s + " 00:00:00")

  test("hand ledger: oldest stock drains first, returns split across supply lines exactly") {
    import spark.implicits._
    // part 1: supplies 10@d1 then 5@d2; returns 8@d3 then 7@d4.
    // FIFO: r1 takes 8 of s1; r2 takes s1's remaining 2 + all 5 of s2.
    // part 2: supply 3, returns 9 — 6 units must stay unmatched.
    val li = Seq(
      (1L, 101L, 1, 9L, ts("2024-01-01"), 10.0, "N"),
      (1L, 102L, 1, 9L, ts("2024-01-02"), 5.0, "N"),
      (1L, 201L, 1, 9L, ts("2024-01-10"), 8.0, "R"),
      (1L, 202L, 1, 9L, ts("2024-01-20"), 7.0, "R"),
      (2L, 103L, 1, 9L, ts("2024-01-01"), 3.0, "N"),
      (2L, 203L, 1, 9L, ts("2024-01-05"), 9.0, "R"))
      .toDF("l_partkey", "l_orderkey", "l_linenumber", "l_suppkey",
        "l_shipdate", "l_quantity", "l_returnflag")
    val dir = tempDataDir("lineitem" -> li)
    val rows = EtlQueries.fifoAllocation(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)) ->
        (r.getLong(5), r.getInt(6))).toMap
    assert(rows((1L, 201L, 101L)) == ((8L, 9)))   // r1 ← s1, aged 9 days
    assert(rows((1L, 202L, 101L)) == ((2L, 19)))  // r2 ← s1 remainder
    assert(rows((1L, 202L, 102L)) == ((5L, 18)))  // r2 ← s2 rest
    assert(rows((2L, 203L, 103L)) == ((3L, 4)))   // capped at supply
    assert(rows.size == 4)                        // nothing else matches
  }

  test("real data: matched units conserve to min(supply, demand) per part, spans never overdraw") {
    val a = EtlQueries.fifoAllocation(spark, sfSmoke).cache()
    try {
      val li = Star.table(spark, sfSmoke, "lineitem")
        .select(col("l_partkey"),
          col("l_quantity").cast("long").as("qty"), col("l_returnflag"))
      val totals = li.groupBy("l_partkey").agg(
        sum(when(col("l_returnflag") =!= "R", col("qty")).otherwise(0L)).as("sup"),
        sum(when(col("l_returnflag") === "R", col("qty")).otherwise(0L)).as("dem"))
      val matched = a.groupBy(col("partkey").as("l_partkey"))
        .agg(sum("qty_matched").as("m"))
      // FIFO conservation: per part, matched = min(total supply, demand)
      val bad = totals.join(matched, Seq("l_partkey"), "left")
        .where(coalesce(col("m"), lit(0L)) =!= least(col("sup"), col("dem")))
        .count()
      assert(bad == 0)
      // no allocation row exceeds either side's line quantity
      assert(a.where(col("qty_matched") <= 0).count() == 0)
    } finally a.unpersist()
  }
}
