package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Right-to-erasure (GDPR art. 17) delete propagation — the warehouse
  * maintenance job that removes every trace of a set of subjects across
  * all tables keyed by them, with an audit trail of what was deleted
  * where (the auditable evidence a compliance run must produce).
  *
  * Scale shape: the request list is small by nature (a deletion queue,
  * not a table) — every scrub is ONE broadcast anti-join per affected
  * table; no shuffle of the fact table anywhere. The audit counts ride
  * the same broadcast as a left-join flag + one aggregate per table, so
  * auditing costs one scan per table, same as the scrub itself. At
  * 100 TB the deletes rewrite only the partitions holding matches when
  * the fact sink is date-partitioned ([[Layout]]) — the scan is
  * partition-parallel either way.
  *
  * The reference has no deletion path at all (its warehouse only ever
  * grows, `/root/reference/src/Meshjoin.java:283-320`); this is the
  * maintenance counterpart of the D1–D6 insert-if-absent family.
  */
object Retention {

  /** The deterministic pseudo request list: every 97th customer —
    * stands in for the deletion queue a real deployment reads. */
  def forgetKeys(spark: SparkSession, dir: String): DataFrame =
    Star.dimCustomer(spark, dir)
      .where(col("customer_id") % 97 === 0)
      .select("customer_id")

  /** The surviving rows of `table` after the scrub: one broadcast
    * LEFT ANTI join on the subject key. */
  def scrubbed(table: DataFrame, keys: DataFrame): DataFrame =
    table.join(broadcast(keys), Seq("customer_id"), "left_anti")

  /** Audit row for one table: total, deleted and surviving row counts,
    * computed in a single scan (broadcast flag join + one aggregate —
    * NOT a count() per verdict). */
  private def audit(name: String, table: DataFrame, keys: DataFrame): DataFrame =
    table
      .join(broadcast(keys.withColumn("f", lit(1))), Seq("customer_id"), "left")
      .agg(
        count(lit(1)).as("rows_before"),
        // coalesce OUTSIDE the sum too: an empty table aggregates to
        // one row with sum = NULL, which must audit as 0 deletions
        coalesce(sum(coalesce(col("f"), lit(0))), lit(0L))
          .cast("bigint").as("rows_deleted"))
      .select(lit(name).as("table_name"), col("rows_before"), col("rows_deleted"),
        (col("rows_before") - col("rows_deleted")).as("rows_after"))

  /** The compliance report: per affected table, rows before / deleted /
    * after. Both customer-keyed tables of the star are covered (the
    * other dimensions carry no subject data). */
  def forgetCustomers(spark: SparkSession, dir: String): DataFrame = {
    val keys = forgetKeys(spark, dir)
    audit("dim_customer", Star.dimCustomer(spark, dir), keys)
      .unionByName(audit("sales_fact", Star.salesFact(spark, dir), keys))
      .orderBy("table_name")
  }
}
