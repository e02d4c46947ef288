package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Last-writer-wins semantics of the CDC apply — op interleavings,
  * re-insert after delete, replay idempotence. Exact fixture values are
  * pinned by the DuckDB twin (`etl_cdc_apply`). */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val feed = Seq(
    // key 1: plain insert
    (1L, "a", "I", 1L),
    // key 2: insert then update — update wins
    (2L, "b", "I", 1L), (2L, "b2", "U", 2L),
    // key 3: insert, update, delete — delete wins, no row
    (3L, "c", "I", 1L), (3L, "c2", "U", 2L), (3L, "c!", "D", 3L),
    // key 4: delete then RE-insert — the later insert wins
    (4L, "d", "I", 1L), (4L, "d!", "D", 2L), (4L, "d-back", "I", 3L)
  ).toDF("id", "name", "op", "seq")

  test("last writer wins per key; deletes drop rows; re-insert resurrects") {
    val state = Cdc.apply(feed, Seq("id"), "seq")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(state == Seq((1L, "a"), (2L, "b2"), (4L, "d-back")))
  }

  test("applying a feed is idempotent and input-order independent") {
    val once = Cdc.apply(feed, Seq("id"), "seq")
      .orderBy("id").as[(Long, String)].collect().toSeq
    val shuffled = Cdc.apply(feed.orderBy(col("seq").desc, col("id").desc),
        Seq("id"), "seq")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(once == shuffled)
  }

  test("emit/apply closure: before-as-inserts + emitted feed rebuilds after exactly") {
    import org.apache.spark.sql.functions._
    val (before, after, keys, attrs) = Reconcile.restatementSnapshots(spark, sfSmoke)
    val base = before.withColumn("op", lit("I")).withColumn("seq", lit(0L))
    val changes = Cdc.emit(before, after, keys, attrs).withColumn("seq", lit(1L))
    val rebuilt = Cdc.apply(base.unionByName(changes), keys, "seq")
    val a = after.select((keys ++ attrs).map(col): _*)
    assert(rebuilt.exceptAll(a).count() == 0 && a.exceptAll(rebuilt).count() == 0,
      "emit(before, after) applied over before does not reproduce after")
    // the feed is minimal: unchanged keys emit nothing
    val unchanged = before.join(after, keys)
      .count() // sanity: fixture has overlap at all
    assert(unchanged > 0)
    val feedKeys = changes.select(keys.map(col): _*)
    val unchangedKeys = Reconcile.snapshotDiff(before, after, keys, attrs)
      .where(col("change_type") === "unchanged").select(keys.map(col): _*)
    assert(feedKeys.join(unchangedKeys, keys, "left_semi").count() == 0,
      "feed contains no-op rows for unchanged keys")
  }

  test("fixture: updated names carry v2, deleted keys absent, %21 delete wins over update") {
    val state = Cdc.cdcApplyCustomers(spark, sfSmoke).cache()
    try {
      assert(state.where(col("customer_id") % 7 === 0).count() == 0)
      assert(state.where(col("customer_id") % 3 === 0 &&
        !col("customer_name").endsWith(" v2")).count() == 0)
      assert(state.where(col("customer_id") % 3 =!= 0 &&
        col("customer_name").endsWith(" v2")).count() == 0)
      // live count: all customers minus the deleted sevenths
      val cust = Star.dimCustomer(spark, sfSmoke)
      val expected = cust.count() - cust.where(col("customer_id") % 7 === 0).count()
      assert(state.count() == expected)
    } finally state.unpersist()
  }
}
