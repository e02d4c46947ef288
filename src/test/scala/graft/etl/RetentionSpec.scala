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
}
