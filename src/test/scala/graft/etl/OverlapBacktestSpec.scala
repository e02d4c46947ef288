package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the assortment-overlap and forecast-backtest
  * operators on the sf0.001 smoke fact; exact values are pinned by the
  * DuckDB twins (`etl_store_overlap`, `etl_forecast_backtest`). */
class OverlapBacktestSpec extends SparkSpec {

  test("store overlap: jaccard in (0,1], intersection bounded, brute-force pair agrees") {
    val ov = EtlQueries.storeOverlap(spark, sfSmoke).cache()
    try {
      assert(ov.count() > 0)
      assert(ov.where(col("jaccard") <= 0 || col("jaccard") > 1).count() == 0)
      assert(ov.where(col("n_common") > least(col("n_a"), col("n_b"))).count() == 0)
      // pairs are canonical and unique
      assert(ov.where(col("store_a") >= col("store_b")).count() == 0)
      assert(ov.groupBy("store_a", "store_b").count()
        .where(col("count") > 1).count() == 0)
      // brute force the first pair with plain Scala sets
      val row = ov.first()
      val (sa, sb) = (row.get(row.fieldIndex("store_a")),
        row.get(row.fieldIndex("store_b")))
      def productsOf(s: Any): Set[Any] = Star.salesFact(spark, sfSmoke)
        .where(col("store_id") === s).select("product_id")
        .distinct().collect().map(_.get(0)).toSet
      val (pa, pb) = (productsOf(sa), productsOf(sb))
      assert(row.getLong(row.fieldIndex("n_common")) == (pa & pb).size)
      assert(row.getDouble(row.fieldIndex("jaccard")) ==
        (pa & pb).size.toDouble / (pa | pb).size.toDouble)
    } finally ov.unpersist()
  }

  test("assortment churn conserves set sizes across consecutive quarters") {
    val churn = EtlQueries.assortmentChurn(spark, sfSmoke).cache()
    try {
      assert(churn.count() > 0)
      val sizes = Star.salesFact(spark, sfSmoke)
        .select(col("store_id"), col("product_id"),
          (expr("CAST(year(time_id) AS INT)") * 4 +
            (expr("CAST(quarter(time_id) AS INT)") - 1)).as("qi"))
        .distinct()
        .groupBy("store_id", "qi").agg(count(lit(1)).as("n"))
      val keyed = churn.withColumn("qi", col("year") * 4 + (col("quarter") - 1))
      // kept + added == the quarter's assortment; kept + dropped == the
      // previous quarter's — inclusion-exclusion bookkeeping must close
      val withCur = keyed.join(sizes, Seq("store_id", "qi"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
      assert(withCur.where(col("n_kept") + col("n_added") =!= col("n"))
        .count() == 0, "kept+added != current assortment size")
      val withPrev = keyed
        .withColumn("qi", col("qi") - 1)
        .join(sizes, Seq("store_id", "qi"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
      assert(withPrev.where(col("n_kept") + col("n_dropped") =!= col("n"))
        .count() == 0, "kept+dropped != previous assortment size")
    } finally churn.unpersist()
  }

  test("trend slope matches the brute-force exact-integer OLS for every store") {
    val ts = EtlQueries.trendSlope(spark, sfSmoke)
    val monthly = Star.salesFact(spark, sfSmoke)
      .groupBy(col("store_id"),
        (expr("CAST(year(time_id) AS INT)") * 12 +
          expr("CAST(month(time_id) AS INT)")).as("x"))
      .agg(sum((col("total_revenue") * 100).cast("long")).as("y"))
      .collect().groupBy(_.get(0))
    val rows = ts.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pts = monthly(r.get(0)).map(p => (p.getInt(1).toLong, p.getLong(2)))
      val n = pts.length.toLong
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val expect = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      assert(r.getLong(r.fieldIndex("n")) == n)
      assert(r.getDouble(r.fieldIndex("slope_cents_per_month")) == expect,
        s"slope drifts for store ${r.get(0)}")
    }
  }

  test("store correlation: |r| <= 1, self-consistent with brute-force exact sums") {
    val sc = EtlQueries.storeCorrelation(spark, sfSmoke).cache()
    try {
      assert(sc.count() > 0)
      assert(sc.where(abs(col("corr_r")) > 1.0 + 1e-12).count() == 0)
      assert(sc.where(col("store_a") >= col("store_b")).count() == 0)
      // brute-force the first pair in plain Scala (exact longs, same
      // factored spelling)
      val r = sc.first()
      val monthly = Star.salesFact(spark, sfSmoke)
        .groupBy(col("store_id"),
          (expr("CAST(year(time_id) AS INT)") * 12 +
            expr("CAST(month(time_id) AS INT)")).as("m"))
        .agg(sum((col("total_revenue") * 100).cast("long")).as("y"))
        .collect().groupBy(_.get(0))
      // integer dollars, the operator's stated series (exact floor)
      val ma = monthly(r.get(0)).map(p => p.getInt(1) -> p.getLong(2) / 100).toMap
      val mb = monthly(r.get(1)).map(p => p.getInt(1) -> p.getLong(2) / 100).toMap
      val common = (ma.keySet & mb.keySet).toSeq
      val n = common.size.toLong
      val (sx, sy) = (common.map(ma).sum, common.map(mb).sum)
      val sxx = common.map(m => ma(m) * ma(m)).sum
      val syy = common.map(m => mb(m) * mb(m)).sum
      val sxy = common.map(m => ma(m) * mb(m)).sum
      val expect = (n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) *
          math.sqrt((n * syy - sy * sy).toDouble))
      assert(r.getLong(r.fieldIndex("n_months")) == n)
      assert(r.getDouble(r.fieldIndex("corr_r")) == expect)
    } finally sc.unpersist()
  }

  test("benford audit: digit coverage, exact expected literals, observed shares sum to 1") {
    val bf = EtlQueries.benfordAudit(spark, sfSmoke)
    val rows = bf.collect()
    assert(rows.map(_.getInt(0)).toSet.subsetOf((1 to 9).toSet))
    // The pinned cross-engine literals (libm's correctly-rounded
    // log10(1 + 1/d)). NOT java.lang.Math.log10: the JVM's result is
    // one ULP HIGH for d = 3 (…993 vs …992) — the very divergence that
    // makes engine-evaluated transcendentals un-oracle-able and forces
    // the literal table the operator uses.
    val pinned = Map(
      1 -> 0.3010299956639812, 2 -> 0.17609125905568124,
      3 -> 0.12493873660829992, 4 -> 0.09691001300805642,
      5 -> 0.07918124604762482, 6 -> 0.06694678963061322,
      7 -> 0.05799194697768673, 8 -> 0.05115252244738129,
      9 -> 0.04575749056067514)
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("benford_share")) == pinned(r.getInt(0)))
    }
    val obs = rows.map(_.getDouble(rows.head.fieldIndex("observed_share"))).sum
    assert(math.abs(obs - 1.0) < 1e-12)
  }

  test("return rates: conditional sums partition the totals, rates in [0,1]") {
    val rr = EtlQueries.returnRates(spark, sfSmoke)
    val rows = rr.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("qty_returned")) <=
        r.getLong(r.fieldIndex("qty_total")))
      val rate = r.getDouble(r.fieldIndex("qty_return_rate"))
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // flag partition: R + non-R == total (brute force on one store)
    val sid = rows.head.get(0)
    val l = Star.table(spark, sfSmoke, "lineitem")
    val s = Star.table(spark, sfSmoke, "supplier")
    val sl = l.join(s, col("l_suppkey") === col("s_suppkey"))
      .where(col("s_nationkey") === sid)
    val total = sl.agg(sum(expr("CAST(floor(l_quantity) AS BIGINT)")))
      .first().getLong(0)
    assert(rows.head.getLong(rows.head.fieldIndex("qty_total")) == total)
  }

  test("rolling median: window membership counts and a brute-force window agree") {
    val rm = EtlQueries.rollingMedian(spark, sfSmoke).cache()
    try {
      assert(rm.count() > 0)
      assert(rm.where(col("n_in_window") < 1 || col("n_in_window") > 3).count() == 0)
      // brute force one (store, month): median over the up-to-3
      // trailing months actually present
      val r = rm.orderBy(desc("n_in_window"), asc("store_id"),
        asc("year"), asc("month")).first()
      val x = r.getInt(r.fieldIndex("year")) * 12 + r.getInt(r.fieldIndex("month"))
      val ys = Star.salesFact(spark, sfSmoke)
        .where(col("store_id") === r.get(0))
        .groupBy((expr("CAST(year(time_id) AS INT)") * 12 +
          expr("CAST(month(time_id) AS INT)")).as("x"))
        .agg(sum((col("total_revenue") * 100).cast("long")).as("y"))
        .where(col("x") >= x - 2 && col("x") <= x)
        .select("y").collect().map(_.getLong(0)).sorted
      assert(r.getInt(r.fieldIndex("n_in_window")) == ys.length)
      val pos = (ys.length - 1) * 0.5
      val lo = pos.toInt
      val expect =
        if (lo + 1 >= ys.length) ys.last.toDouble
        else ys(lo) + (pos - lo) * (ys(lo + 1) - ys(lo))
      assert(r.getDouble(r.fieldIndex("rolling_median_cents")) == expect)
    } finally rm.unpersist()
  }

  test("theil-sen slope is the brute-force pairwise-slope median and sits in the slope range") {
    val ts = EtlQueries.theilSenSlope(spark, sfSmoke)
    val monthly = Star.salesFact(spark, sfSmoke)
      .groupBy(col("store_id"),
        (expr("CAST(year(time_id) AS INT)") * 12 +
          expr("CAST(month(time_id) AS INT)")).as("x"))
      .agg(sum((col("total_revenue") * 100).cast("long")).as("y"))
      .collect().groupBy(_.get(0))
    ts.collect().foreach { r =>
      val pts = monthly(r.get(0)).map(p => (p.getInt(1), p.getLong(2)))
      val slopes = (for {
        (a, i) <- pts.zipWithIndex; b <- pts.drop(i + 1)
        if a._1 != b._1
      } yield {
        val (lo, hi) = if (a._1 < b._1) (a, b) else (b, a)
        (hi._2 - lo._2).toDouble / (hi._1 - lo._1).toDouble
      }).sorted
      assert(r.getLong(r.fieldIndex("n_pairs")) == slopes.length)
      val pos = (slopes.length - 1) * 0.5
      val lo = pos.toInt
      val expect =
        if (lo + 1 >= slopes.length) slopes.last
        else slopes(lo) + (pos - lo) * (slopes(lo + 1) - slopes(lo))
      assert(r.getDouble(r.fieldIndex("theil_sen_slope")) == expect,
        s"median slope drifts for store ${r.get(0)}")
    }
  }

  test("forecast backtest: wape bounds bias, strict year-1 pairing only") {
    val bt = EtlQueries.forecastBacktest(spark, sfSmoke).cache()
    try {
      assert(bt.count() > 0)
      // |bias| <= wape always (triangle inequality on the error sums)
      assert(bt.where(abs(col("bias")) > col("wape") + lit(1e-15)).count() == 0)
      assert(bt.where(col("wape") < 0).count() == 0)
      // scored months never exceed the store's months with a prior year
      val monthly = Star.salesFact(spark, sfSmoke)
        .groupBy(col("store_id"),
          expr("CAST(year(time_id) AS INT)").as("year"),
          expr("CAST(month(time_id) AS INT)").as("month"))
        .agg(sum((col("total_revenue") * 100).cast("long")).as("cents"))
        .cache()
      try {
        val withPrior = monthly.as("a").join(monthly.as("f"),
            col("a.store_id") === col("f.store_id") &&
              col("a.month") === col("f.month") &&
              col("a.year") === col("f.year") + 1)
          .groupBy(col("a.store_id").as("store_id"))
          .agg(count(lit(1)).as("expect"))
        assert(bt.join(withPrior, Seq("store_id"))
          .where(col("n_months") =!= col("expect")).count() == 0)
      } finally monthly.unpersist()
    } finally bt.unpersist()
  }

  test("ewma: dyadic weights reproduce the brute-force trailing average per store") {
    val ew = EtlQueries.ewmaTrend(spark, sfSmoke).cache()
    try {
      assert(ew.count() > 0)
      assert(ew.where(col("n_in_window") < 1 ||
        col("n_in_window") > EtlQueries.EwmaSpan).count() == 0)
      // a month whose window holds only itself smooths to itself
      assert(ew.where(col("n_in_window") === 1 &&
        col("ewma_cents") =!= col("cents").cast("double")).count() == 0)
      // brute force: recompute every store's series from the monthly table
      val monthly = Star.salesFact(spark, sfSmoke)
        .groupBy(col("store_id"),
          (expr("CAST(year(time_id) AS INT)") * 12 +
            expr("CAST(month(time_id) AS INT)")).as("x"))
        .agg(sum((col("total_revenue") * 100).cast("long")).as("y"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      val byStore = monthly.groupBy(_._1)
        .view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
      val got = ew.collect().map { r =>
        (r.getInt(0), r.getInt(1) * 12 + r.getInt(2)) -> r.getDouble(5)
      }.toMap
      byStore.foreach { case (store, series) =>
        series.keys.foreach { x =>
          val span = EtlQueries.EwmaSpan
          val terms = (0 until span).flatMap { lag =>
            series.get(x - lag).map(y => (y, 1L << (span - 1 - lag)))
          }
          val expect = terms.map(t => t._1 * t._2).sum.toDouble /
            terms.map(_._2).sum.toDouble
          assert(got((store, x)) == expect, s"ewma mismatch at ($store, $x)")
        }
      }
    } finally ew.unpersist()
  }
}
