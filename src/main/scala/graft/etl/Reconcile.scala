package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the key-level diff of two versions of a
  * table: which rows were added, removed, changed (null-safe attribute
  * compare) or untouched, with measure deltas per class. The audit a
  * warehouse runs after every restatement, backfill or migration —
  * "what exactly did this load change?" — and the verification step of
  * a blue/green cutover. The reference can't answer it (its warehouse
  * holds only the latest state); [[Upserts.scdType2]] keeps history
  * per key, this compares whole table versions.
  *
  * Scale shape: ONE full outer join on the key (both sides shuffle
  * once — unavoidable: the diff must see both versions of every key;
  * with [[Bucketing]]-bucketed snapshots even that shuffle vanishes),
  * then a per-row CASE and a four-row aggregate. No collect, no
  * per-class passes. */
object Reconcile {

  /** Key-level diff of `before` vs `after` (same schema): one row per
    * key with its change class; `attrs` compare null-safely. */
  def snapshotDiff(before: DataFrame, after: DataFrame,
      keys: Seq[String], attrs: Seq[String]): DataFrame = {
    val b = before.select((keys ++ attrs).map(col): _*)
      .withColumn("__b", lit(1))
    val a = after.select(keys.map(col) ++ attrs.map(c => col(c).as(s"__a_$c")): _*)
      .withColumn("__a", lit(1))
    b.join(a, keys, "full_outer")
      .withColumn("change_type",
        when(col("__b").isNull, "added")
          .when(col("__a").isNull, "removed")
          .when(attrs.map(c => !(col(c) <=> col(s"__a_$c"))).reduce(_ || _), "changed")
          .otherwise("unchanged"))
  }

  /** Oracle-checked fixture exercising all four classes. The diff runs
    * at a DECLARED grain — (order_id, product_id, supplier_id), with
    * measures summed per key first (lineitem lines can repeat that key;
    * reconciling a non-unique key would fan the outer join out):
    *
    *  - before: orders strictly before mid-1998,
    *  - after: all orders, but every 13th customer's quantity restated
    *    +1 per line (→ changed) and every 41st customer erased since
    *    the snapshot (→ removed); later orders appear (→ added).
    *
    * Summary per class: key count and the exact-decimal revenue delta
    * (after − before, absent side 0) — doubles only at the output
    * surface. */
  /** The restatement-fixture snapshot pair at the declared grain —
    * shared by the diff summary and the CDC-emit feed ([[Cdc.emit]]):
    * (before, after, keys, attrs). */
  private[etl] def restatementSnapshots(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, Seq[String], Seq[String]) = {
    val keys = Seq("order_id", "product_id", "supplier_id")
    val agg2 = graft.model.Schemas.aggRevenueType
    val cutoff = lit("1998-06-01 00:00:00").cast("timestamp")
    val fact = Star.salesFact(spark, dir)
    def atGrain(df: DataFrame): DataFrame = df
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("quantity_ordered")).cast("long").as("quantity_ordered"),
        sum(col("total_revenue")).cast(agg2).as("total_revenue"))
    val before = atGrain(fact.where(col("time_id") < cutoff))
    val after = atGrain(fact
      .where(col("customer_id") % 41 =!= 0)
      .withColumn("quantity_ordered",
        when(col("customer_id") % 13 === 0, col("quantity_ordered") + 1)
          .otherwise(col("quantity_ordered"))))
    (before, after, keys, Seq("quantity_ordered", "total_revenue"))
  }

  def factSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val agg2 = graft.model.Schemas.aggRevenueType
    val (before, after, keys, attrs) = restatementSnapshots(spark, dir)
    val diff = snapshotDiff(before, after, keys, attrs)
    graft.model.Schemas.outputDoubles(diff
      .groupBy("change_type")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(coalesce(col("__a_total_revenue"), lit(0).cast(agg2))
          - coalesce(col("total_revenue"), lit(0).cast(agg2)))
          .cast(agg2).as("revenue_delta")))
      .orderBy("change_type")
  }
}
