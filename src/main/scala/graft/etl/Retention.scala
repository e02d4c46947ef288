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

  /** SUBJECT-ACCESS export (GDPR art. 15) — the READ counterpart of the
    * art. 17 erasure above: for every subject on the request list, one
    * portable summary row of everything the warehouse holds on them —
    * identity attributes, order/item counts, exact spend, activity
    * range, and an order-set fingerprint (md5 over the sorted order
    * ids: two exports match iff the underlying order sets match, which
    * is how a regulator-facing export is diffed without shipping raw
    * rows twice). Subjects with no fact rows still export (zero counts,
    * empty-set fingerprint) — absence of data is also an answer.
    *
    * Scale shape: the request list broadcasts into ONE semi-joined fact
    * scan; the rollup is two stacked partial-aggregable aggregates
    * (order grain, then subject grain) — the sorted collect is over one
    * subject's ORDER IDS (entity-bounded, the [[EtlQueries.sessionPaths]]
    * contract), never the fact rows. */
  def subjectExport(spark: SparkSession, dir: String): DataFrame = {
    val keys = forgetKeys(spark, dir)
    val cust = Star.dimCustomer(spark, dir)
      .join(broadcast(keys), Seq("customer_id"), "left_semi")
      .select(col("customer_id"), col("customer_name"), col("gender").as("segment"))
    val perOrder = Star.salesFact(spark, dir)
      .join(broadcast(keys), Seq("customer_id"), "left_semi")
      .groupBy("customer_id", "order_id")
      .agg(
        count(lit(1)).as("n_items_o"),
        sum((col("total_revenue") * 100).cast("long")).as("cents_o"),
        min("time_id").as("t0"), max("time_id").as("t1"))
    val perSubject = perOrder.groupBy("customer_id")
      .agg(
        count(lit(1)).as("n_orders"),
        sum("n_items_o").as("n_items"),
        sum("cents_o").as("spend_cents"),
        min("t0").as("first_order"), max("t1").as("last_order"),
        md5(expr("CAST(concat_ws(',', transform(array_sort(collect_list(order_id)), " +
          "x -> CAST(x AS STRING))) AS BINARY)")).as("orders_fp"))
    cust.join(perSubject, Seq("customer_id"), "left")
      .select(col("customer_id"), col("customer_name"), col("segment"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_items"), lit(0L)).as("n_items"),
        coalesce(col("spend_cents"), lit(0L)).as("spend_cents"),
        col("first_order"), col("last_order"),
        coalesce(col("orders_fp"), md5(lit("").cast("binary"))).as("orders_fp"))
      .orderBy("customer_id")
  }

  /** Customer quasi-identifier projection for the anonymity audit:
    * market segment × account-balance band (floor(bal/1000) —
    * identical double division + floor in both engines). The QI set is
    * a MODELING choice: fine enough that joint re-identification is
    * plausible, coarse enough that groups can reach k at all — adding
    * nation here fragments every group below any useful k on this
    * corpus, which is itself the classic k-anonymity lesson. */
  private def quasiIdentifiers(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/customer.parquet")
      .select(
        col("c_mktsegment").as("segment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))

  /** k-anonymity audit — the release-side privacy check next to the
    * erasure path: a published slice is k-anonymous when every
    * quasi-identifier combination (attributes that jointly re-identify:
    * here segment × balance band) covers at least k people.
    * One aggregate over the QI projection, one flag column; groups
    * below k are exactly the rows a release must suppress or
    * generalize. The reference publishes raw dimension rows with no
    * such check. Scale: output is the QI-combination count (bounded by
    * the attribute domain product, not the table). */
  def kAnonymity(spark: SparkSession, dir: String, k: Int = 20): DataFrame =
    quasiIdentifiers(spark, dir)
      .groupBy("segment", "bal_band")
      .agg(count(lit(1)).as("group_size"))
      .withColumn("is_anonymous", col("group_size") >= k)
      .orderBy("segment", "bal_band")

  /** l for the [[lDiversity]] audit — shared with the oracle twin. */
  val LDiversityL = 5

  /** l-diversity audit — the check k-anonymity famously misses
    * (Machanavajjhala et al. '06): a QI group can cover k people and
    * STILL leak if they all share the sensitive value (the homogeneity
    * attack). Per QI group (segment × balance band, the
    * [[kAnonymity]] identifiers) against the nation as the sensitive
    * attribute: group size, distinct sensitive values, the modal
    * sensitive count (the homogeneity evidence — its ratio to the
    * group size is what a recursive (c,l) policy would bound), and the
    * distinct-l verdict. Two stacked partial-aggregable aggregates —
    * (QI, sensitive) counts, then per-QI size/distinct/struct-max —
    * output bounded by the QI domain, same scale contract as
    * [[kAnonymity]]. */
  def lDiversity(spark: SparkSession, dir: String, l: Int = LDiversityL): DataFrame =
    spark.read.parquet(s"$dir/customer.parquet")
      .select(
        col("c_mktsegment").as("segment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"),
        col("c_nationkey").as("sensitive"))
      .groupBy("segment", "bal_band", "sensitive")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("segment", "bal_band")
      .agg(
        sum("cnt").as("group_size"),
        count(lit(1)).cast("int").as("n_sensitive"),
        max("cnt").as("top_sensitive_cnt"))
      .withColumn("is_diverse", col("n_sensitive") >= l)
      .orderBy("segment", "bal_band")

  /** t threshold in ppm for [[tCloseness]] (t = 0.3) — shared with
    * the oracle twin. */
  val TClosenessPpm = 300000L

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE'07) — the
    * check l-diversity famously misses in turn: a QI group can hold l
    * DISTINCT sensitive values and still leak when its distribution
    * skews far from the table's (the skewness attack — "this group is
    * 90 % one nation" is a disclosure even with 5 nations present).
    * Per QI group ([[kAnonymity]]'s segment × balance band) against
    * nation as the categorical sensitive attribute, the distance is
    * total variation: t = ½·Σ_c |p_g(c) − p(c)|, reported as the
    * exact-integer ppm quantization
    * ⌊10⁶·Σ_c |cnt_g(c)·N − cnt(c)·n_g| / (2·n_g·N)⌋ — numerators are
    * cross-multiplied BIGINTs (the termDrift direction discipline;
    * headroom |cnt·N| ≤ N², loud ANSI overflow beyond, never silent
    * float drift).
    *
    * Shape: the (QI, sensitive) cell counts and two marginal
    * aggregates, then a zero-filled QI×category grid (bounded by the
    * two attribute domains, never the table) via a broadcast cross
    * join + left join, and one per-group aggregate. */
  def tCloseness(spark: SparkSession, dir: String): DataFrame =
    tClosenessOf(spark.read.parquet(s"$dir/customer.parquet")
      .select(
        col("c_mktsegment").as("segment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"),
        col("c_nationkey").as("sensitive")))

  /** The audit kernel over an arbitrary
    * `(segment, bal_band, sensitive)` frame — the fixture path for
    * the spec. */
  def tClosenessOf(qi: DataFrame): DataFrame = {
    val cell = qi.groupBy("segment", "bal_band", "sensitive")
      .agg(count(lit(1)).as("cnt"))
    val gsize = cell.groupBy("segment", "bal_band").agg(sum("cnt").as("n_g"))
    val global = qi.groupBy("sensitive").agg(count(lit(1)).as("g_cnt"))
    val total = qi.agg(count(lit(1)).as("n_total"))
    gsize
      .crossJoin(broadcast(global))
      .crossJoin(broadcast(total))
      .join(cell, Seq("segment", "bal_band", "sensitive"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("num",
        abs(col("cnt") * col("n_total") - col("g_cnt") * col("n_g")))
      .groupBy("segment", "bal_band", "n_g", "n_total")
      .agg(sum("num").as("t_num"))
      .withColumn("t_ppm",
        expr("(1000000 * t_num) div (2 * n_g * n_total)"))
      .withColumn("is_close", col("t_ppm") <= TClosenessPpm)
      .select(col("segment"), col("bal_band"),
        col("n_g").as("group_size"), col("t_ppm"), col("is_close"))
      .orderBy("segment", "bal_band")
  }

  /** The enforcing half: the released view keeps only rows whose QI
    * group reaches k — a semi-join of the table against its own
    * passing groups (the audit flags; this suppresses). */
  def kAnonymousRelease(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val passing = kAnonymity(spark, dir, k)
      .where(col("is_anonymous"))
      .select("segment", "bal_band")
    quasiIdentifiers(spark, dir)
      .join(passing, Seq("segment", "bal_band"), "left_semi")
  }
}
