package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ordering/conservation invariants of the funnel and cohort queries;
  * exact values are pinned by the DuckDB twins (`etl_funnel_steps`,
  * `etl_cohort_retention`). */
class EventAnalyticsSpec extends SparkSpec {

  test("funnel stages are strictly ordered in time and monotone in reach") {
    val f = EtlQueries.funnelSteps(spark, sfSmoke).cache()
    try {
      assert(f.count() > 0)
      // stage timestamps strictly increase where present
      assert(f.where(col("t_click").isNotNull &&
        col("t_click") <= col("t_view")).count() == 0)
      assert(f.where(col("t_purchase").isNotNull &&
        col("t_purchase") <= col("t_click")).count() == 0)
      // a later stage implies the earlier one (no purchase without click)
      assert(f.where(col("t_purchase").isNotNull &&
        col("t_click").isNull).count() == 0)
      // funnel_stage counts the non-null stage timestamps
      assert(f.where(col("funnel_stage") =!=
        (lit(1) + when(col("t_click").isNotNull, 1).otherwise(0)
          + when(col("t_purchase").isNotNull, 1).otherwise(0))).count() == 0)
      // the funnel never exceeds the unordered event-presence bound:
      // fewer or equal converters than users having all three types
      val unordered = Star.events(spark, sfSmoke)
        .where(col("event_type").isin("view", "click", "purchase"))
        .groupBy("user_id").agg(countDistinct("event_type").as("k"))
        .where(col("k") === 3).count()
      assert(f.where(col("funnel_stage") === 3).count() <= unordered)
    } finally f.unpersist()
  }

  test("deadline funnel: stages are pointwise <= the anytime funnel, reached stages keep their timestamps") {
    val any = EtlQueries.funnelSteps(spark, sfSmoke)
      .select(col("user_id"), col("funnel_stage").as("s_any"),
        col("t_click").as("c_any"), col("t_purchase").as("p_any"))
    val dl = EtlQueries.funnelDeadline(spark, sfSmoke)
      .select(col("user_id"), col("funnel_stage").as("s_dl"),
        col("t_click").as("c_dl"), col("t_purchase").as("p_dl"))
    val j = any.join(dl, Seq("user_id"), "full").cache()
    try {
      // same user universe (stage 1 is deadline-free: the first view)
      assert(j.where(col("s_any").isNull || col("s_dl").isNull).count() == 0)
      // a deadline can only null a stage out, never add or move one
      assert(j.where(col("s_dl") > col("s_any")).count() == 0)
      assert(j.where(col("c_dl").isNotNull &&
        col("c_dl") =!= col("c_any")).count() == 0)
      assert(j.where(col("p_dl").isNotNull &&
        col("p_dl") =!= col("p_any")).count() == 0)
      // and on sparse month-long user histories a 30-minute deadline
      // must actually bite — otherwise this spec is vacuous
      assert(j.where(col("s_dl") < col("s_any")).count() > 0)
    } finally j.unpersist()
  }

  test("transition counts conserve: total transitions = events - users") {
    val t = EtlQueries.eventTransitions(spark, sfSmoke)
    val total = t.agg(sum("n_transitions")).collect().head.getLong(0)
    val events = Star.events(spark, sfSmoke).count()
    val users = Star.events(spark, sfSmoke).select("user_id").distinct().count()
    // each user's n events contribute exactly n-1 transitions
    assert(total == events - users)
    assert(t.where(col("n_transitions") <= 0).count() == 0)
  }

  test("rolling actives: wau_7 >= dau, and equals the brute-force trailing window") {
    val r = EtlQueries.rollingActive(spark, sfSmoke).cache()
    try {
      assert(r.count() > 0)
      assert(r.where(col("wau_7") < col("dau")).count() == 0)
      // brute force one day: distinct users in [d-6, d]
      val probe = r.orderBy(col("day").desc).select("day", "wau_7").collect().head
      val d = new java.sql.Date(probe.getTimestamp(0).getTime)
      val brute = Star.events(spark, sfSmoke)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .where(col("day") <= lit(d) && col("day") >= date_sub(lit(d), 6))
        .select("user_id").distinct().count()
      assert(probe.getLong(1) == brute,
        s"wau_7($d): explode says ${probe.getLong(1)}, brute force says $brute")
    } finally r.unpersist()
  }

  test("fk audit: clean corpus reads zero orphans; a planted violation is counted") {
    import spark.implicits._
    val audit = EtlQueries.fkAudit(spark, sfSmoke).cache()
    try {
      assert(audit.count() == 6)
      assert(audit.where(col("orphan_rows") =!= 0).count() == 0)
      assert(audit.where(col("child_rows") <= 0).count() == 0)
    } finally audit.unpersist()
    // the detector detects: one child row pointing nowhere
    val child = Seq((1L, 10L), (2L, 99L)).toDF("id", "fk")
    val parent = Seq((10L, "x")).toDF("pk", "v")
    val row = EtlQueries.fkRelationCheck("planted", child, "fk", parent, "pk")
      .collect().head
    assert(row.getAs[Long]("child_rows") == 2L)
    assert(row.getAs[Long]("orphan_rows") == 1L)
  }

  test("fact profile: one scan's metrics obey the counting identities") {
    val p = EtlQueries.factProfile(spark, sfSmoke).cache()
    try {
      assert(p.count() == 7)
      // distinct values never exceed the non-null rows
      assert(p.where(col("n_distinct") > col("n_rows") - col("n_nulls")).count() == 0)
      // star keys are never null in a well-formed fact
      assert(p.where(col("column_name").isin(
        "order_id", "product_id", "customer_id") && col("n_nulls") > 0).count() == 0)
      // n_rows constant across rows and equal to the fact count
      val n = Star.salesFact(spark, sfSmoke).count()
      assert(p.where(col("n_rows") =!= n).count() == 0)
    } finally p.unpersist()
  }

  test("winsorized sums never exceed raw, equality exactly when nothing was capped") {
    val w = EtlQueries.winsorizedRevenue(spark, sfSmoke).cache()
    try {
      assert(w.where(col("winsorized_cents") > col("revenue_cents")).count() == 0)
      assert(w.where(col("n_capped") === 0 &&
        col("winsorized_cents") =!= col("revenue_cents")).count() == 0)
      assert(w.where(col("n_capped") > 0 &&
        col("winsorized_cents") === col("revenue_cents")).count() == 0)
      // the p99 cap touches ~1% of rows corpus-wide (generous bound)
      val t = w.agg(sum("n_capped").as("c"), sum("n_rows").as("n")).collect().head
      val frac = t.getLong(0).toDouble / t.getLong(1)
      assert(frac > 0 && frac <= 0.02, s"cap fraction $frac out of band")
    } finally w.unpersist()
  }

  test("gini: bounds hold and a brute-force mean-absolute-difference agrees per store") {
    val g = EtlQueries.giniConcentration(spark, sfSmoke).cache()
    try {
      assert(g.count() > 0)
      // G in [0, 1): equality needs one customer holding everything
      assert(g.where(col("gini") < 0 || col("gini") >= 1).count() == 0)
      // brute force on one store: G = sum|xi-xj| / (2 n^2 mu)
      val store = g.first().getInt(0)
      val xs = Star.salesFact(spark, sfSmoke)
        .where(col("store_id") === store)
        .groupBy("customer_id")
        .agg(sum((col("total_revenue") * 100).cast("long")).as("c"))
        .collect().map(_.getLong(1))
      val n = xs.length.toDouble
      val sumAbs = (for (a <- xs; b <- xs) yield math.abs(a - b)).map(_.toDouble).sum
      val brute = sumAbs / (2.0 * n * xs.map(_.toDouble).sum)
      val got = g.where(col("store_id") === store).first().getAs[Double]("gini")
      assert(math.abs(got - brute) < 1e-9, s"gini $got != brute $brute")
    } finally g.unpersist()
  }

  test("month spine: exactly stores x 12 cells, imputed zeros flagged, totals conserved") {
    val sp = EtlQueries.monthSpine(spark, sfSmoke).cache()
    try {
      val nStores = Star.dimStore(spark, sfSmoke).count()
      assert(sp.count() == nStores * 12, "spine is not the full grid")
      // imputation visible: has_sales = false exactly on zero-filled cells
      assert(sp.where(!col("has_sales") &&
        (col("monthly_revenue") =!= 0.0 || col("n_rows") =!= 0L)).count() == 0)
      assert(sp.where(col("has_sales") && col("n_rows") === 0L).count() == 0)
      // spine total equals the plain year aggregate (zeros add nothing)
      val spineTotal = sp.agg(sum("monthly_revenue")).collect().head.getDouble(0)
      val direct = Star.salesFact(spark, sfSmoke)
        .join(Star.dimTime(spark, sfSmoke).select("time_id", "year"), Seq("time_id"))
        .where(col("year") === graft.olap.Queries.Year)
        .agg(sum("total_revenue").cast(graft.model.Schemas.aggRevenueType))
        .collect().head.getDecimal(0).doubleValue()
      assert(math.abs(spineTotal - direct) < 1e-6)
    } finally sp.unpersist()
  }

  test("MAD outliers: median halves each store, z is scale-free, flags match the threshold") {
    val m = EtlQueries.madOutliers(spark, sfSmoke).cache()
    try {
      // the median property: within each store, at most half the months
      // lie strictly on either side of med_cents
      val sides = m.groupBy("store_id").agg(
        count(lit(1)).as("n"),
        sum(when(col("rev_cents") > col("med_cents"), 1).otherwise(0)).as("above"),
        sum(when(col("rev_cents") < col("med_cents"), 1).otherwise(0)).as("below"))
      assert(sides.where(col("above") * 2 > col("n") ||
        col("below") * 2 > col("n")).count() == 0)
      // flag is exactly the documented threshold rule
      assert(m.where(col("is_outlier") =!=
        coalesce(col("robust_z") > EtlQueries.MadThreshold, lit(false))).count() == 0)
      // z reconstructs from its parts wherever MAD > 0
      assert(m.where(col("mad") > 0 && col("robust_z") =!=
        lit(EtlQueries.MadConsistency) *
          abs(col("rev_cents").cast("double") - col("med_cents")) / col("mad"))
        .count() == 0)
      // outliers are rare by construction of the 3.5 threshold
      val frac = m.where(col("is_outlier")).count().toDouble / m.count()
      assert(frac < 0.1, s"outlier fraction $frac implausibly high")
    } finally m.unpersist()
  }

  test("cohort retention: offset-0 cell equals the cohort size, offsets non-negative") {
    val r = EtlQueries.cohortRetention(spark, sfSmoke).cache()
    try {
      assert(r.where(col("week_offset") < 0).count() == 0)
      // every user is active in their first-seen week, so the offset-0
      // cell is exactly the cohort's size
      val epoch = lit("2024-01-01").cast("date")
      val cohortSizes = Star.events(spark, sfSmoke)
        .select(col("user_id"),
          (datediff(to_date(col("ts")), epoch) / 7).cast("int").as("week"))
        .groupBy("user_id").agg(min("week").as("cohort_week"))
        .groupBy("cohort_week").agg(countDistinct("user_id").as("size"))
      val zero = r.where(col("week_offset") === 0)
      assert(zero.join(cohortSizes, "cohort_week")
        .where(col("n_users") =!= col("size")).count() == 0)
      // later cells never exceed the cohort size
      assert(r.join(cohortSizes, "cohort_week")
        .where(col("n_users") > col("size")).count() == 0)
    } finally r.unpersist()
  }
}
