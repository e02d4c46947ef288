package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Erasure-propagation invariants: the scrub really removes every
  * subject row, nothing else, and the audit matches what the scrub
  * does (exact values pinned by the `etl_forget_customer` oracle). */
class RetentionSpec extends SparkSpec {

  test("scrub removes exactly the requested subjects from every table") {
    val keys = Retention.forgetKeys(spark, sfSmoke)
    assert(keys.count() > 0, "empty request list — the invariant would be vacuous")
    val audit = Retention.forgetCustomers(spark, sfSmoke).collect()
      .map(r => r.getString(0) -> r).toMap
    Seq(
      "dim_customer" -> Star.dimCustomer(spark, sfSmoke),
      "sales_fact" -> Star.salesFact(spark, sfSmoke)
    ).foreach { case (name, table) =>
      val surviving = Retention.scrubbed(table, keys)
      // no trace of any requested subject survives
      assert(surviving.join(keys, Seq("customer_id"), "left_semi").count() == 0)
      // nothing else was touched, and the audit reports the same counts
      val a = audit(name)
      assert(a.getLong(1) == table.count())
      assert(a.getLong(3) == surviving.count())
      assert(a.getLong(1) == a.getLong(2) + a.getLong(3))
    }
    // the fact table genuinely loses rows (the request list has sales)
    assert(audit("sales_fact").getLong(2) > 0)
  }

  test("k-anonymity: release suppresses exactly the below-k groups") {
    import org.apache.spark.sql.functions._
    val k = 5
    val audit = Retention.kAnonymity(spark, sfSmoke, k).cache()
    val release = Retention.kAnonymousRelease(spark, sfSmoke, k).cache()
    try {
      // flag is exactly the threshold
      assert(audit.where(col("is_anonymous") =!= (col("group_size") >= k)).count() == 0)
      // every group in the released view reaches k
      val tooSmall = release.groupBy("segment", "bal_band")
        .count().where(col("count") < k).count()
      assert(tooSmall == 0)
      // released rows = total - suppressed (conservation)
      val suppressed = audit.where(!col("is_anonymous"))
        .agg(coalesce(sum("group_size"), lit(0L))).collect().head.getLong(0)
      val total = spark.read.parquet(s"$sfSmoke/customer.parquet").count()
      assert(release.count() == total - suppressed)
      // the audit is discriminating on this corpus: both outcomes occur
      assert(audit.where(col("is_anonymous")).count() > 0)
      assert(suppressed > 0)
    } finally { audit.unpersist(); release.unpersist() }
  }

  test("l-diversity: margins reconcile with k-anonymity groups and the verdict is consistent") {
    val ld = Retention.lDiversity(spark, sfSmoke).cache()
    try {
      assert(ld.count() > 0)
      // counting identities per group
      assert(ld.where(col("top_sensitive_cnt") > col("group_size") ||
        col("n_sensitive") > col("group_size") ||
        col("top_sensitive_cnt") * col("n_sensitive") < col("group_size")).count() == 0)
      assert(ld.where(col("is_diverse") =!=
        (col("n_sensitive") >= Retention.LDiversityL)).count() == 0)
      // the QI groups and their sizes are exactly kAnonymity's
      val ka = Retention.kAnonymity(spark, sfSmoke)
        .select("segment", "bal_band", "group_size")
      assert(ld.select("segment", "bal_band", "group_size")
        .except(ka).count() == 0)
      assert(ka.except(ld.select("segment", "bal_band", "group_size")).count() == 0)
      // the audit discriminates on this corpus: both outcomes occur
      assert(ld.where(col("is_diverse")).count() > 0)
      assert(ld.where(!col("is_diverse")).count() > 0)
    } finally ld.unpersist()
  }

  test("subject export covers exactly the request list and reconciles with direct aggregation") {
    val ex = Retention.subjectExport(spark, sfSmoke).cache()
    try {
      // one row per requested subject, no extras
      val req = Retention.forgetKeys(spark, sfSmoke)
        .collect().map(_.getLong(0)).toSet
      val got = ex.select("customer_id").collect().map(_.getLong(0)).toSet
      assert(got == req)
      // spend and counts reconcile with a direct fact aggregation
      val direct = Star.salesFact(spark, sfSmoke)
        .groupBy("customer_id")
        .agg(sum((col("total_revenue") * 100).cast("long")).as("cents"),
          countDistinct("order_id").as("no"), count(lit(1)).as("ni"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      ex.collect().foreach { r =>
        val id = r.getLong(0)
        direct.get(id) match {
          case Some((cents, no, ni)) =>
            assert(r.getAs[Long]("spend_cents") == cents)
            assert(r.getAs[Long]("n_orders") == no && r.getAs[Long]("n_items") == ni)
          case None =>
            assert(r.getAs[Long]("n_orders") == 0L &&
              r.getAs[Long]("spend_cents") == 0L)
            assert(r.getAs[String]("orders_fp") ==
              java.security.MessageDigest.getInstance("MD5").digest(Array.empty[Byte])
                .map("%02x".format(_)).mkString)
        }
      }
      // fingerprint is the md5 of the sorted comma-joined order ids
      val probe = ex.where(col("n_orders") > 0).orderBy("customer_id").first()
      val ids = Star.salesFact(spark, sfSmoke)
        .where(col("customer_id") === probe.getLong(0))
        .select("order_id").distinct().collect().map(_.getLong(0)).sorted
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(ids.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(probe.getAs[String]("orders_fp") == md)
    } finally ex.unpersist()
  }
}
