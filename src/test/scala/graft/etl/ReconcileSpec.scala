package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Snapshot-diff semantics on a hand-built fixture plus class coverage
  * on the corpus; exact values are pinned by the DuckDB twin
  * (`etl_snapshot_diff`). */
class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added/removed/changed/unchanged, null-safe") {
    val before = Seq(
      (1L, 10, "a"), // unchanged
      (2L, 20, "b"), // changed (attr)
      (3L, 30, null.asInstanceOf[String]), // changed (null -> value)
      (4L, 40, "d")  // removed
    ).toDF("k", "q", "v")
    val after = Seq(
      (1L, 10, "a"),
      (2L, 21, "b"),
      (3L, 30, "now-set"),
      (5L, 50, "e")  // added
    ).toDF("k", "q", "v")
    val d = Reconcile.snapshotDiff(before, after, Seq("k"), Seq("q", "v"))
      .select("k", "change_type").as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
  }

  test("fact snapshot diff covers all four classes with conserved keys") {
    val d = Reconcile.factSnapshotDiff(spark, sfSmoke).cache()
    try {
      val byType = d.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(byType.keySet == Set("added", "removed", "changed", "unchanged"))
      // added rows carry positive revenue, removed negative,
      // unchanged zero (quantities were restated, revenue was not)
      assert(byType("added")._2 > 0)
      assert(byType("removed")._2 < 0)
      assert(byType("unchanged")._2 == 0.0)
      assert(byType("changed")._2 == 0.0)
      // key conservation: classes partition the union of both key sets
      val keys = Seq("order_id", "product_id", "supplier_id")
      val fact = Star.salesFact(spark, sfSmoke)
      val beforeKeys = fact
        .where(col("time_id") < lit("1998-06-01 00:00:00").cast("timestamp"))
        .select(keys.map(col): _*).distinct()
      val afterKeys = fact.where(col("customer_id") % 41 =!= 0)
        .select(keys.map(col): _*).distinct()
      val union = beforeKeys.unionByName(afterKeys).distinct().count()
      assert(d.agg(sum("n_rows")).collect().head.getLong(0) == union)
    } finally d.unpersist()
  }
}
