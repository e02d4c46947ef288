package graft.olap

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.etl.Star

/** Algebraic invariants of the OLAP layer on the sf0.001 smoke data —
  * properties that must hold regardless of data (SURVEY.md §5 test plan
  * item 3), complementing the value-exact DuckDB differential harness. */
class OlapPropertySpec extends SparkSpec {

  test("rollup grand total equals the ungrouped sum") {
    val rollup = Queries.q07Rollup(spark, sfSmoke)
    val grand = rollup
      .where(col("year").isNull && col("store_id").isNull &&
        col("supplier_id").isNull && col("product_id").isNull)
      .select("total_revenue").collect()
    val direct = Star.salesFact(spark, sfSmoke)
      .agg(sum("total_revenue").cast(graft.model.Schemas.aggRevenueType))
      .collect()
    assert(grand.length == 1)
    // Query outputs are doubles (comparison-surface contract); the double
    // of the exact decimal grand total must match bit-for-bit.
    assert(grand.head.getDouble(0) == direct.head.getDecimal(0).doubleValue())
  }

  test("cube covers the full grouping lattice and gid encodes the null pattern") {
    val cube = Queries.q13CubeRevenue(spark, sfSmoke).cache()
    try {
      // exactly one grand-total row, gid = 7
      val grand = cube.where(col("gid") === 7).collect()
      assert(grand.length == 1)
      assert(grand.head.getAs[Any]("year") == null &&
        grand.head.getAs[Any]("store_id") == null)
      // grouping_id bits == null pattern (year MSB), on every row
      assert(cube.where(col("gid") =!=
        (when(col("year").isNull, 4).otherwise(0) +
          when(col("quarter").isNull, 2).otherwise(0) +
          when(col("store_id").isNull, 1).otherwise(0))).count() == 0)
      // all 8 lattice members are populated
      assert(cube.select("gid").distinct().count() == 8)
      // every marginal reaggregates to the same grand total
      val g = grand.head.getAs[Double]("total_revenue")
      Seq(4, 2, 1).foreach { bit =>
        val marginal = cube.where(col("gid") === (7 ^ bit))
          .agg(sum(col("total_revenue"))).collect().head.getDouble(0)
        assert(math.abs(marginal - g) < 1e-6 * math.abs(g))
      }
    } finally cube.unpersist()
  }

  test("grouping sets emit exactly the three declared groupings, each totaling the grand sum") {
    val gs = Queries.q20GroupingSets(spark, sfSmoke).cache()
    try {
      // only the three declared gids exist (1 = by-store, 2 = by-supplier,
      // 3 = year total) — no CUBE over-computation leaked through
      assert(gs.select("gid").distinct().collect().map(_.getInt(0)).sorted
        .sameElements(Array(1, 2, 3)))
      // gid encodes the null pattern on every row
      assert(gs.where(col("gid") =!=
        (when(col("store_id").isNull, 2).otherwise(0) +
          when(col("supplier_id").isNull, 1).otherwise(0))).count() == 0)
      // each per-year breakdown reaggregates to that year's total row
      Seq(1, 2).foreach { gid =>
        val marginal = gs.where(col("gid") === gid)
          .groupBy("year").agg(sum("total_revenue").as("rev"))
        val totals = gs.where(col("gid") === 3).select(col("year"), col("total_revenue"))
        val joined = marginal.join(totals, "year")
          .where(abs(col("rev") - col("total_revenue")) >
            lit(1e-6) * abs(col("total_revenue")))
        assert(joined.count() == 0, s"gid=$gid marginals drift from year totals")
      }
    } finally gs.unpersist()
  }

  test("lapsed customers bought in H1 and never in H2") {
    val lapsed = Queries.q21LapsedCustomers(spark, sfSmoke)
    val fact = Star.salesFact(spark, sfSmoke)
    val time = Star.dimTime(spark, sfSmoke).select("time_id", "year", "month")
    def half(p: org.apache.spark.sql.Column) = fact
      .join(time, Seq("time_id"))
      .where(col("year") === Queries.Year && p)
      .select("customer_id").distinct()
    assert(lapsed.join(half(col("month") > 6), Seq("customer_id"), "left_semi")
      .count() == 0, "a lapsed customer appears in H2")
    assert(lapsed.join(half(col("month") <= 6), Seq("customer_id"), "left_anti")
      .count() == 0, "a lapsed customer never bought in H1")
    assert(lapsed.count() == lapsed.distinct().count(), "EXCEPT must emit distinct rows")
  }

  test("frame bounds: first/last/nth land on the right months; trailing avg brackets") {
    val fb = Queries.q22FrameBounds(spark, sfSmoke).cache()
    try {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("store_id", "year")
      val annotated = fb
        .withColumn("min_m", min("month").over(w))
        .withColumn("max_m", max("month").over(w))
        .withColumn("n_m", count(lit(1)).over(w))
      // first/last_value equal the revenue at the partition's min/max month
      assert(annotated.where(col("month") === col("min_m") &&
        col("first_month_revenue") =!= col("monthly_revenue")).count() == 0)
      assert(annotated.where(col("month") === col("max_m") &&
        col("last_month_revenue") =!= col("monthly_revenue")).count() == 0)
      // nth_value(2) is null exactly on single-month partitions
      assert(annotated.where(col("second_month_revenue").isNull =!=
        (col("n_m") === 1)).count() == 0)
      // the trailing average lies within the partition's revenue range
      val bad = annotated
        .withColumn("lo", min("monthly_revenue").over(w))
        .withColumn("hi", max("monthly_revenue").over(w))
        .where(col("trailing3_avg") < col("lo") - lit(1e-9) ||
          col("trailing3_avg") > col("hi") + lit(1e-9))
      assert(bad.count() == 0, "trailing3_avg outside the partition's range")
    } finally fb.unpersist()
  }

  test("ABC pareto: running sum is the window's, bucket count never changes values") {
    val abc = Queries.q23AbcPareto(spark, sfSmoke).cache()
    try {
      val rows = abc.collect()
      assert(rows.nonEmpty)
      // running total reproduces the brute-force prefix over the output order
      var acc = 0L
      rows.foreach { r =>
        acc += r.getLong(1)
        assert(r.getLong(2) == acc, s"running_cents drifts at product ${r.getLong(0)}")
      }
      // final share is exactly 1.0 (total/total); classes obey the thresholds
      assert(rows.last.getDouble(3) == 1.0)
      rows.foreach { r =>
        val cls = if (r.getDouble(3) <= Queries.AbcA) "A"
          else if (r.getDouble(3) <= Queries.AbcB) "B" else "C"
        assert(r.getString(4) == cls)
      }
      // the adaptive gate is a PLAN decision only: the bucketed
      // distributed prefix sum (windowGate = 0 forces it) answers
      // identically to the default plain-window path, for any bucket
      // count
      val alt = Queries.q23AbcPareto(spark, sfSmoke, buckets = 13,
        windowGate = 0L).collect()
      assert(rows.toSeq == alt.toSeq, "bucketed path changed ABC values")
      val alt2 = Queries.q23AbcPareto(spark, sfSmoke, windowGate = 0L).collect()
      assert(rows.toSeq == alt2.toSeq, "bucket count changed ABC values")
    } finally abc.unpersist()
  }

  test("relational division: exactly the customers covering every region") {
    val div = Queries.q24Division(spark, sfSmoke).cache()
    try {
      // independent spelling: a qualifying customer is one with NO
      // (customer × region) cell missing from their covered pairs —
      // set-difference algebra instead of the query's count matching
      val nation = Star.table(spark, sfSmoke, "nation")
        .select(col("n_nationkey").as("store_id"),
          col("n_regionkey").as("region_id"))
      val regions = Star.table(spark, sfSmoke, "region")
        .select(col("r_regionkey").as("region_id"))
      val covered = Star.salesFact(spark, sfSmoke)
        .select("customer_id", "store_id")
        .join(nation, Seq("store_id"))
        .select("customer_id", "region_id").distinct()
      val buyers = covered.select("customer_id").distinct()
      val missing = buyers.crossJoin(regions)
        .except(covered).select("customer_id").distinct()
      val expected = buyers.except(missing)
      assert(div.select("customer_id").except(expected).count() == 0,
        "division returned a customer with an uncovered region")
      assert(expected.except(div.select("customer_id")).count() == 0,
        "division missed a fully-covering customer")
      // regions_covered is the divisor cardinality on every row
      val nRegions = regions.count().toInt
      assert(div.where(col("regions_covered") =!= nRegions).count() == 0)
    } finally div.unpersist()
  }

  test("association rules: ratios rebuild from counts, lift is direction-symmetric") {
    val rules = Queries.q27Rules(spark, sfSmoke).cache()
    try {
      val rows = rules.collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (nab, na, nc) = (r.getLong(2), r.getLong(3), r.getLong(4))
        assert(r.get(0) != r.get(1))
        assert(nab <= math.min(na, nc), "pair count exceeds a marginal")
        assert(r.getDouble(5) == nab.toDouble / na.toDouble)
      }
      // lift is symmetric in direction: a→b and b→a carry the same lift
      val byPair = rows.groupBy(r => Set(r.get(0), r.get(1)))
      byPair.values.filter(_.length == 2).foreach { pair =>
        assert(pair(0).getDouble(6) == pair(1).getDouble(6))
      }
      // output is lift-descending
      val lifts = rows.map(_.getDouble(6))
      assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
    } finally rules.unpersist()
  }

  test("unpivot of the pivot equals the direct long aggregate") {
    val melted = Queries.q26Unpivot(spark, sfSmoke)
    val time = Star.dimTime(spark, sfSmoke).select("time_id", "quarter")
    val direct = Star.salesFact(spark, sfSmoke)
      .join(time, Seq("time_id"))
      .groupBy("store_id", "quarter")
      .agg(sum("total_revenue").cast(graft.model.Schemas.aggRevenueType)
        .cast("double").as("revenue"))
    val strict = melted.select("store_id", "quarter", "revenue")
      .except(direct.select("store_id", "quarter", "revenue"))
    val strict2 = direct.select("store_id", "quarter", "revenue")
      .except(melted.select("store_id", "quarter", "revenue"))
    assert(strict.count() == 0 && strict2.count() == 0,
      "unpivot ∘ pivot is not the identity on populated cells")
  }

  test("grouped percentiles: monotone, bounded by min/max, brute-force interpolation agrees") {
    val q = Queries.q25Percentiles(spark, sfSmoke).cache()
    try {
      assert(q.where(col("p50") > col("p90") || col("p90") > col("p99")).count() == 0)
      assert(q.where(col("p50") < col("min_cents") ||
        col("p99") > col("max_cents")).count() == 0)
      // brute force one store: the standard (n−1)·p linear interpolation
      // over the sorted exact cents, computed in plain Scala
      val sid = q.select("store_id").orderBy("store_id").first().get(0)
      val cents = Star.salesFact(spark, sfSmoke)
        .where(col("store_id") === sid)
        .groupBy("order_id")
        .agg(sum((col("total_revenue") * 100).cast("long")).as("c"))
        .select("c").collect().map(_.getLong(0)).sorted
      def interp(p: Double): Double = {
        val pos = (cents.length - 1) * p
        val lo = pos.toInt
        val f = pos - lo
        if (lo + 1 >= cents.length) cents.last.toDouble
        else cents(lo) + f * (cents(lo + 1) - cents(lo))
      }
      val row = q.where(col("store_id") === sid).first()
      assert(row.getDouble(row.fieldIndex("p50")) == interp(0.5))
      assert(row.getDouble(row.fieldIndex("p90")) == interp(0.9))
      assert(row.getLong(row.fieldIndex("n_orders")) == cents.length)
    } finally q.unpersist()
  }

  test("pivot cells reaggregate to the store totals; long and wide agree") {
    val wide = Queries.q14PivotQuarters(spark, sfSmoke).cache()
    try {
      // row sum of the four quarter cells == the store's total revenue
      // (double of the exact decimal — same comparison surface contract)
      val rowSums = wide.select(col("store_id"),
        (coalesce(col("q1_revenue"), lit(0.0)) +
          coalesce(col("q2_revenue"), lit(0.0)) +
          coalesce(col("q3_revenue"), lit(0.0)) +
          coalesce(col("q4_revenue"), lit(0.0))).as("row_total"))
      val direct = Star.salesFact(spark, sfSmoke)
        .groupBy("store_id")
        .agg(sum("total_revenue").cast(graft.model.Schemas.aggRevenueType)
          .cast("double").as("direct_total"))
      val joined = rowSums.join(direct, "store_id")
      assert(joined.where(
        abs(col("row_total") - col("direct_total")) > lit(1e-6) * abs(col("direct_total"))
      ).count() == 0)

      // wide rows == stores with any sales (pivot drops nothing)
      val stores = Star.salesFact(spark, sfSmoke)
        .select("store_id").distinct().count()
      assert(wide.count() == stores)

      // every cell of a quarter column agrees with the long-format Q10
      // slice for that quarter (summed over years)
      val q10 = Queries.q10StoreQuarterly(spark, sfSmoke)
        .where(col("quarter") === 2)
        .groupBy("store_id")
        .agg(sum("total_quarterly_revenue").as("long_rev"))
      val cellCheck = wide.select("store_id", "q2_revenue").join(q10, "store_id")
      assert(cellCheck.where(
        abs(col("q2_revenue") - col("long_rev")) > lit(1e-6) * abs(col("long_rev"))
      ).count() == 0)
    } finally wide.unpersist()
  }

  test("rank family: consistent ranks, [0,1] fractions, balanced quartiles") {
    val r = Queries.q15RankFamily(spark, sfSmoke).cache()
    try {
      // per year: rank 1 exists; dense_rank <= rank everywhere
      assert(r.groupBy("year").agg(min("rnk").as("m"))
        .where(col("m") =!= 1).count() == 0)
      assert(r.where(col("dense_rnk") > col("rnk")).count() == 0)
      // fractions live in [0,1]; the top row's percent_rank is 0,
      // the last cume_dist is 1
      assert(r.where(col("pct_rank") < 0 || col("pct_rank") > 1 ||
        col("cume") <= 0 || col("cume") > 1).count() == 0)
      assert(r.where(col("rnk") === 1 && col("pct_rank") =!= 0.0).count() == 0)
      assert(r.groupBy("year").agg(max("cume").as("c"))
        .where(col("c") =!= 1.0).count() == 0)
      // ntile balance: quartile sizes differ by at most 1 within a year
      val q = r.groupBy("year", "quartile").count()
        .groupBy("year").agg((max("count") - min("count")).as("spread"))
      assert(q.where(col("spread") > 1).count() == 0)
    } finally r.unpersist()
  }

  test("share-of-year sums to 1 per year and matches revenue ratios") {
    val r = Queries.q18ShareOfYear(spark, sfSmoke).cache()
    try {
      // shares within a year sum to 1 (up to double accumulation)
      val sums = r.groupBy("year").agg(sum("revenue_share").as("s"))
      assert(sums.where(abs(col("s") - 1.0) > 1e-9).count() == 0)
      // every share is the ratio of its own two output columns, exactly
      assert(r.where(col("revenue_share") =!=
        col("total_revenue") / col("year_total")).count() == 0)
      // the year total matches an independent aggregation
      val direct = Star.salesFact(spark, sfSmoke)
        .join(Star.dimTime(spark, sfSmoke).select("time_id", "year"), Seq("time_id"))
        .groupBy("year")
        .agg(sum("total_revenue").cast(graft.model.Schemas.aggRevenueType)
          .cast("double").as("direct_total"))
      assert(r.select("year", "year_total").distinct().join(direct, "year")
        .where(col("year_total") =!= col("direct_total")).count() == 0)
    } finally r.unpersist()
  }

  test("affinity returns top pairs with positive frequencies") {
    val rows = Queries.q06Affinity(spark, sfSmoke).collect()
    assert(rows.nonEmpty && rows.length <= 5) // line-item grain makes Q6 meaningful (Q-j)
    val freqs = rows.map(_.getLong(2))
    assert(freqs.forall(_ > 0))
    assert(freqs.sameElements(freqs.sortBy(-(_: Long)))) // descending
  }

  test("top-5 queries return at most 5 rows, sorted descending") {
    Seq(true, false).foreach { weekend =>
      val rows = Queries.q01TopProducts(spark, sfSmoke, weekend).collect()
      assert(rows.length <= 5 && rows.nonEmpty)
      val sums = rows.map(_.getDouble(2))
      assert(sums.sameElements(sums.sortBy(-(_: Double))))
    }
  }

  test("fact build: revenue equals round(extendedprice × (1 − discount), 2) per row") {
    val bad = Star.salesFact(spark, sfSmoke)
      .where(col("total_revenue").isNull || col("total_revenue") < 0)
    assert(bad.count() == 0)
  }

  test("q02_literal pins the reference's LEAD-mapping quirks") {
    val rows = Queries.q02LiteralGrowth(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    // every (store, quarter) has a self-paired row: prev == total, growth 0
    val byKey = rows.groupBy(r => (r.getInt(0), r.getInt(2)))
    byKey.foreach { case (_, grp) =>
      val self = grp.filter(r => r.getDouble(3) == r.getDouble(4))
      assert(self.nonEmpty && self.forall(_.getDouble(5) == 0.0))
    }
    // the non-self pairing carries the NEXT quarter's revenue (the bug):
    // quarter q's partner revenue equals quarter q+1's own total_revenue
    val totals = rows.map(r => (r.getInt(0), r.getInt(2)) -> r.getDouble(3)).toMap
    rows.filter(r => r.getDouble(3) != r.getDouble(4)).foreach { r =>
      assert(totals.get((r.getInt(0), r.getInt(2) + 1)).contains(r.getDouble(4)))
    }
  }

  test("q05_literal volatility is identically zero (the reference's same-month self-join)") {
    val rows = Queries.q05LiteralVolatility(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(5) == 0.0))
  }

  test("seasonal buckets partition all fact rows") {
    // total_sales is a double at the output surface; decimal(18,2) →
    // double → decimal(18,2) round-trips exactly below ~4.5e13, so cast
    // back before summing to keep the partition check order-independent.
    val seasonal = Queries.q04Seasonal(spark, sfSmoke)
      .agg(sum(col("total_sales").cast(graft.model.Schemas.aggRevenueType)))
      .collect().head.getDecimal(0)
    val total = Star.salesFact(spark, sfSmoke)
      .agg(sum("total_revenue")).collect().head.getDecimal(0)
    assert(seasonal.compareTo(total) == 0)
  }

  test("q28 skyline equals brute-force dominance and is bucket-count independent") {
    val sky = Queries.q28Skyline(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sky.nonEmpty)
    // brute-force: the all-pairs dominance filter the operator refuses
    val price = Star.dimProduct(spark, sfSmoke)
      .select(col("product_id"), (col("price") * 100).cast("long").as("price_cents"))
    val pp = Star.salesFact(spark, sfSmoke)
      .groupBy("product_id")
      .agg(sum(col("quantity_ordered").cast("long")).as("total_qty"))
      .join(price, Seq("product_id"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(1)))
    val brute = pp.filter { case (_, p, q) =>
      !pp.exists { case (_, p2, q2) => p2 <= p && q2 >= q && (p2 < p || q2 > q) }
    }.map { case (id, p, q) => (id, p, q) }.sortBy(t => (t._2, t._1))
    assert(sky.toSeq == brute.toSeq)
    // every excluded product is dominated by some skyline member
    val skySet = sky.map(_._1).toSet
    pp.filterNot(t => skySet.contains(t._1)).foreach { case (_, p, q) =>
      assert(sky.exists { case (_, sp, sq) => sp <= p && sq >= q && (sp < p || sq > q) })
    }
    // bucket count is parallelism only, never values
    val b7 = Queries.q28Skyline(spark, sfSmoke, buckets = 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(b7.toSeq == sky.toSeq)
  }
}
