package graft.olap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.Star
import graft.model.Schemas._

/** The reference's OLAP query surface (Q1–Q10,
  * `/root/reference/SQL/OLAP Queries - Metro.sql`) re-expressed as
  * DataFrame plans over the star schema. Each query has a DuckDB oracle
  * twin in [[OracleSql]].
  *
  * Determinism rules (shared with the oracle):
  *  - aggregates in exact decimal; ratio outputs as IEEE double derived
  *    from identical exact decimals; no rounding of doubles;
  *  - every DECIMAL output column is cast to DOUBLE in the final
  *    projection, before the final ORDER BY ([[graft.model.Schemas.outputDoubles]]):
  *    decimal text canonicalization differs across engines, doubles are
  *    bit-identical — the comparison (and sort) surface is doubles;
  *  - every query ends in a total deterministic ORDER BY (ties broken).
  *
  * The reference filters on year=2019; the testdata spans 1995–2001, so
  * the parameterized year is pinned to 1996 in both engines.
  */
object Queries {

  val Year = 1996

  /** Q1 (weekend variant): top-5 revenue (month, product) groups on
    * weekends of the pinned year — global top-5, not per-month
    * (reference Q-h). `/root/reference/SQL/OLAP Queries - Metro.sql:5-14`.
    * Plan shape: fact scan → broadcast star joins → partial+final hash agg
    * → `TakeOrderedAndProject` (no global sort at scale). */
  def q01TopProducts(spark: SparkSession, dir: String, weekend: Boolean): DataFrame = {
    val fact = Star.salesFact(spark, dir)
    val time = Star.dimTime(spark, dir)
    val product = Star.dimProduct(spark, dir)
    val grouped = fact
      .join(broadcast(time), Seq("time_id"))
      .join(broadcast(product), Seq("product_id"))
      .where(col("is_weekend") === lit(weekend) && col("year") === lit(Year))
      .groupBy(col("month"), col("product_name"))
      .agg(sum("total_revenue").cast(aggRevenueType).as("total_revenue"))
    outputDoubles(grouped)
      .orderBy(desc("total_revenue"), asc("month"), asc("product_name"))
      .limit(5)
  }

  /** Q2: store×quarter revenue with previous-quarter revenue and growth
    * rate. The reference's LEAD-mapping self-join
    * (`.../OLAP Queries - Metro.sql:31-72`) is replaced by the idiomatic
    * (and single-shuffle) `lag()` window per SURVEY.md J7 — the reference's
    * own join actually fetches the *next* quarter (quirk); we implement the
    * stated intent. Growth is IEEE double derived from exact decimals. */
  def q02QuarterlyGrowth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fact = Star.salesFact(spark, dir)
    val time = Star.dimTime(spark, dir)
    val store = Star.dimStore(spark, dir)
    val byQuarter = fact
      .join(broadcast(time), Seq("time_id"))
      .where(col("year") === lit(Year))
      .join(broadcast(store), Seq("store_id"))
      .groupBy(col("store_id"), col("store_name"), col("quarter"))
      .agg(sum("total_revenue").cast(aggRevenueType).as("total_revenue"))
    val w = Window.partitionBy("store_id").orderBy("quarter")
    outputDoubles(byQuarter
      .withColumn("previous_quarter_revenue", lag("total_revenue", 1).over(w))
      .withColumn(
        "revenue_growth_rate",
        (col("total_revenue") - col("previous_quarter_revenue")).cast("double") /
          col("previous_quarter_revenue").cast("double") * lit(100.0)))
      .orderBy("store_id", "quarter")
  }

  /** Q2 LITERAL twin — the reference's query verbatim
    * (`.../OLAP Queries - Metro.sql:31-72`), bugs included, alongside the
    * stated-intent [[q02QuarterlyGrowth]]:
    *
    *  - QuarterMapping computes `LEAD(Quarter) OVER (ORDER BY Quarter)`
    *    over the (duplicate-quarter) TimeDimension rows and DISTINCTs the
    *    result, so it contains BOTH (q, q) and (q, q+1) pairs — every
    *    store×quarter therefore emits a self-paired row with growth 0.00
    *    and (for q1–q3) a second row whose "previous_quarter_revenue" is
    *    actually the NEXT quarter's revenue (the reference's inverted
    *    LEAD-mapping quirk). Q4 has no next quarter → inner join drops
    *    that pairing.
    *  - `ROUND(x, 2)` is reproduced EXACTLY across engines as half-away-
    *    from-zero rounding of the exact rational (diff·10⁴ / prev) in
    *    64-bit integer cents — never rounding a double (see the
    *    determinism rules above). Headroom: cents × 2·10⁴ must fit int64,
    *    i.e. per-store quarterly revenue below ~$4.6·10¹³ — loud ANSI
    *    overflow beyond, not silent corruption.
    *
    * The reference's `ORDER BY Store_ID, Quarter` is not total here (two
    * rows per store×quarter); previous_quarter_revenue is appended as the
    * documented tie-break (O2). */
  def q02LiteralGrowth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fact = Star.salesFact(spark, dir)
    val time = Star.dimTime(spark, dir)
    val store = Star.dimStore(spark, dir)
    val revenueData = fact
      .join(broadcast(time), Seq("time_id"))
      .where(col("year") === lit(Year))
      .join(broadcast(store), Seq("store_id"))
      .groupBy(col("store_id"), col("store_name"), col("quarter"))
      .agg(sum("total_revenue").cast(aggRevenueType).as("total_revenue"))
    // LEAD over the per-date rows BEFORE the distinct — that ordering is
    // what manufactures the (q, q) self-pairs. ~365 rows, one partition.
    val quarterMapping = time
      .where(col("year") === lit(Year))
      .select(col("quarter"),
        lead("quarter", 1).over(Window.orderBy("quarter")).as("next_quarter"))
      .distinct()
    val prev = revenueData.select(
      col("store_id").as("prev_store_id"),
      col("quarter").as("prev_quarter"),
      col("total_revenue").as("previous_quarter_revenue"))
    revenueData
      .join(broadcast(quarterMapping), Seq("quarter"))
      .join(broadcast(prev),
        col("store_id") === col("prev_store_id") &&
          col("prev_quarter") === col("next_quarter"))
      // integer-cents fixed point: n = diff·10⁶ (cents × 10⁴), p_c = prev
      // in cents; ROUND(d/p·100, 2) = half-away-round(n/p_c) / 100.
      .withColumn("n",
        ((col("total_revenue") - col("previous_quarter_revenue")) * lit(100))
          .cast("long") * lit(10000L))
      .withColumn("p_c", (col("previous_quarter_revenue") * lit(100)).cast("long"))
      .selectExpr(
        "store_id", "store_name", "quarter",
        "CAST(total_revenue AS DOUBLE) AS total_revenue",
        "CAST(previous_quarter_revenue AS DOUBLE) AS previous_quarter_revenue",
        """CASE WHEN p_c = 0 THEN NULL
           |     ELSE CAST((CASE WHEN (n >= 0) = (p_c >= 0) THEN 1 ELSE -1 END)
           |               * ((2 * abs(n) + abs(p_c)) div (2 * abs(p_c))) AS DOUBLE) / 100
           |END AS revenue_growth_rate""".stripMargin)
      .orderBy("store_id", "quarter", "previous_quarter_revenue")
  }

  /** Q3: supplier sales contribution per store and product —
    * `SUM(price)` is the reference's price-weighted occurrence count
    * (quirk Q-i), kept as-is. `.../OLAP Queries - Metro.sql:78-95`. */
  def q03SupplierContribution(spark: SparkSession, dir: String): DataFrame = {
    val fact = Star.salesFact(spark, dir)
    val store = Star.dimStore(spark, dir)
    val supplier = Star.dimSupplier(spark, dir)
    val product = Star.dimProduct(spark, dir)
      .select(col("product_id"), col("product_name"), col("price"))
    outputDoubles(fact
      .join(broadcast(store), Seq("store_id"))
      .join(broadcast(supplier), Seq("supplier_id"))
      .join(broadcast(product), Seq("product_id"))
      .groupBy(col("store_name"), col("supplier_name"), col("product_name"))
      .agg(sum("price").cast(aggRevenueType).as("total_sales")))
      .orderBy(asc("store_name"), asc("supplier_name"), desc("product_name"))
  }

  /** Season bucket shared by the projection and the group key (reference
    * A6, `.../OLAP Queries - Metro.sql:103-122`). */
  private def seasonCol(monthCol: org.apache.spark.sql.Column) =
    when(monthCol.isin(3, 4, 5), "Spring")
      .when(monthCol.isin(6, 7, 8), "Summer")
      .when(monthCol.isin(9, 10, 11), "Fall")
      .otherwise("Winter")

  /** Q4: product sales drilled down by season. */
  def q04Seasonal(spark: SparkSession, dir: String): DataFrame = {
    val fact = Star.salesFact(spark, dir)
    val time = Star.dimTime(spark, dir)
    val product = Star.dimProduct(spark, dir)
    outputDoubles(fact
      .join(broadcast(time), Seq("time_id"))
      .join(broadcast(product), Seq("product_id"))
      .groupBy(col("product_name"), seasonCol(col("month")).as("season"))
      .agg(sum("total_revenue").cast(aggRevenueType).as("total_sales")))
      .orderBy(asc("product_name"), asc("season"))
  }

  /** Q5: store×supplier month-over-month revenue volatility. The
    * reference's CTE joins the *same* (year, month) to itself so its
    * volatility is always 0 (quirk Q-f); per SURVEY.md G9 we implement the
    * stated intent: `lag()` over (store, supplier) ordered by (year,
    * month), unmatched → 0 via coalesce. */
  def q05Volatility(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fact = Star.salesFact(spark, dir)
    val time = Star.dimTime(spark, dir)
    val store = Star.dimStore(spark, dir)
    val supplier = Star.dimSupplier(spark, dir)
    val monthly = fact
      .join(broadcast(time), Seq("time_id"))
      .join(broadcast(store), Seq("store_id"))
      .join(broadcast(supplier), Seq("supplier_id"))
      .groupBy(col("store_name"), col("supplier_name"), col("year"), col("month"))
      .agg(sum("total_revenue").cast(aggRevenueType).as("total_revenue"))
    val w = Window.partitionBy("store_name", "supplier_name").orderBy("year", "month")
    outputDoubles(monthly
      .withColumn("prev_rev", lag("total_revenue", 1).over(w))
      .withColumn(
        "revenue_volatility",
        coalesce(
          (col("total_revenue") - col("prev_rev")).cast("double") /
            col("prev_rev").cast("double") * lit(100.0),
          lit(0.0)))
      .drop("prev_rev"))
      .orderBy("store_name", "supplier_name", "year", "month")
  }

  /** Q5 LITERAL twin — the reference's volatility query verbatim
    * (`.../OLAP Queries - Metro.sql:124-175`), bug included, alongside the
    * stated-intent [[q05Volatility]]: the Previous_Month_Revenue CTE is
    * LEFT-JOINed on the SAME (year, month) as the current group — not the
    * previous month — so `(SUM − prev) / prev` is identically 0 wherever
    * the CTE has a row, and `IFNULL(..., 0)` zeroes the rest (the months
    * at/after the CTE's `(MAX(Year), global MAX(Month))` cutoff). Net:
    * revenue_volatility ≡ 0.0 on every row, which is exactly what the
    * reference computes.
    *
    * Two determinizations, no semantic change: supplier_name is joined via
    * the fact's supplier key (in the reference schema `sf.Supplier_ID =
    * p.Supplier_ID` by MESHJOIN construction, so routing through Products
    * is the identity there — our TPC-H product dim pins a DIFFERENT
    * representative supplier, which would break that invariant); and the
    * reference's bare non-grouped `pmr.Prev_Month_Revenue` (legal only
    * under MySQL's disabled ONLY_FULL_GROUP_BY, G4) becomes
    * `MAX(pmr.Prev_Month_Revenue)` — constant within each group, since the
    * group key determines the CTE key.
    *
    * Expressed as SQL text like [[q11LatestMonth]]: the CTE's year/month
    * cutoff exercises Catalyst's non-correlated scalar-subquery planning
    * (A7) inside a disjunctive WHERE. */
  def q05LiteralVolatility(spark: SparkSession, dir: String): DataFrame = {
    Star.salesFact(spark, dir).createOrReplaceTempView("sales_fact_v")
    Star.dimTime(spark, dir).createOrReplaceTempView("dim_time_v")
    Star.dimStore(spark, dir).createOrReplaceTempView("dim_store_v")
    Star.dimSupplier(spark, dir).createOrReplaceTempView("dim_supplier_v")
    spark.sql(
      """WITH previous_month_revenue AS (
        |  SELECT f.store_id, f.supplier_id, t.year, t.month,
        |         CAST(SUM(f.total_revenue) AS DECIMAL(18,2)) AS prev_month_revenue
        |  FROM sales_fact_v f
        |  JOIN dim_time_v t ON f.time_id = t.time_id
        |  WHERE t.year < (SELECT MAX(year) FROM dim_time_v)
        |     OR (t.year = (SELECT MAX(year) FROM dim_time_v)
        |         AND t.month < (SELECT MAX(month) FROM dim_time_v))
        |  GROUP BY f.store_id, f.supplier_id, t.year, t.month
        |)
        |SELECT st.store_name, sup.supplier_name, t.year AS year, t.month AS month,
        |       CAST(CAST(SUM(f.total_revenue) AS DECIMAL(18,2)) AS DOUBLE) AS total_revenue,
        |       COALESCE(
        |         CAST(CAST(SUM(f.total_revenue) AS DECIMAL(18,2))
        |              - MAX(pmr.prev_month_revenue) AS DOUBLE)
        |           / CAST(MAX(pmr.prev_month_revenue) AS DOUBLE) * 100.0,
        |         0.0) AS revenue_volatility
        |FROM sales_fact_v f
        |JOIN dim_store_v st ON f.store_id = st.store_id
        |JOIN dim_supplier_v sup ON f.supplier_id = sup.supplier_id
        |JOIN dim_time_v t ON f.time_id = t.time_id
        |LEFT JOIN previous_month_revenue pmr
        |  ON f.store_id = pmr.store_id AND f.supplier_id = pmr.supplier_id
        | AND t.year = pmr.year AND t.month = pmr.month
        |GROUP BY st.store_name, sup.supplier_name, t.year, t.month
        |ORDER BY st.store_name, sup.supplier_name, t.year, t.month""".stripMargin)
  }

  /** Q6: product-affinity pairs — self theta-join on the order key with
    * `product_id <` to emit each unordered pair once
    * (`.../OLAP Queries - Metro.sql:182-203`). Meaningful at line-item
    * fact grain (SURVEY.md Q-j). The self-join shuffles both sides on
    * order_id (co-partitioned); the `<` is a post-join filter on the
    * equi-join, exactly what Catalyst plans. */
  def q06Affinity(spark: SparkSession, dir: String): DataFrame = {
    // No extra persist: Star.salesFact is session-cached, so both sides
    // of the self-join scan the same in-memory fact table.
    val fact = Star.salesFact(spark, dir).select("order_id", "product_id")
    val product = Star.dimProduct(spark, dir).select("product_id", "product_name")
    val a = fact.as("a")
    val b = fact.as("b")
    a.join(b, col("a.order_id") === col("b.order_id") &&
        col("a.product_id") < col("b.product_id"))
      .join(broadcast(product).as("p1"), col("a.product_id") === col("p1.product_id"))
      .join(broadcast(product).as("p2"), col("b.product_id") === col("p2.product_id"))
      .groupBy(col("p1.product_name").as("product_1"), col("p2.product_name").as("product_2"))
      .agg(count(lit(1)).as("frequency"))
      .orderBy(desc("frequency"), asc("product_1"), asc("product_2"))
      .limit(5)
  }

  /** Q7: yearly revenue ROLLUP over store → supplier → product
    * (`.../OLAP Queries - Metro.sql:211-228`); Catalyst `Expand` +
    * hash aggregate. Subtotal NULLs sort first (G3).
    *
    * Pre-aggregated before the rollup: `Expand` multiplies its input
    * 5× BEFORE the first aggregate, so rolling up the raw fact would
    * materialize and hash 5×|fact| rows map-side. Collapsing to the
    * finest grouping first (one ordinary shuffle, |catalog|-sized
    * output) and rolling up the partials gives an identical result —
    * SUM is decomposable — while the Expand fan-out applies to the
    * fine aggregate, not the fact table. At 100 TB that is the
    * difference between expanding ~59k rows and expanding the corpus. */
  def q07Rollup(spark: SparkSession, dir: String): DataFrame = {
    val fact = Star.salesFact(spark, dir)
    val time = Star.dimTime(spark, dir).select("time_id", "year")
    val fine = fact
      .join(broadcast(time), Seq("time_id"))
      .groupBy(col("year"), col("store_id"), col("supplier_id"), col("product_id"))
      .agg(sum("total_revenue").as("fine_revenue"))
    outputDoubles(fine
      .rollup(col("year"), col("store_id"), col("supplier_id"), col("product_id"))
      .agg(sum("fine_revenue").cast(aggRevenueType).as("total_revenue")))
      .orderBy(asc_nulls_first("year"), asc_nulls_first("store_id"),
        asc_nulls_first("supplier_id"), asc_nulls_first("product_id"))
  }

  /** Q8: H1/H2 conditional aggregation per product and year (reference
    * A4); `year` added to the projection per G4 (the reference leans on
    * MySQL's disabled ONLY_FULL_GROUP_BY). */
  def q08HalfYear(spark: SparkSession, dir: String): DataFrame = {
    val fact = Star.salesFact(spark, dir)
    val time = Star.dimTime(spark, dir)
    val product = Star.dimProduct(spark, dir)
    val h1 = col("month") <= 6
    outputDoubles(fact
      .join(broadcast(time), Seq("time_id"))
      .join(broadcast(product), Seq("product_id"))
      .groupBy(col("product_name"), col("year"))
      .agg(
        sum(when(h1, col("total_revenue")).otherwise(lit(0))).cast(aggRevenueType).as("h1_revenue"),
        sum(when(h1, col("quantity_ordered")).otherwise(lit(0))).as("h1_quantity"),
        sum(when(!h1, col("total_revenue")).otherwise(lit(0))).cast(aggRevenueType).as("h2_revenue"),
        sum(when(!h1, col("quantity_ordered")).otherwise(lit(0))).as("h2_quantity"),
        sum(col("total_revenue")).cast(aggRevenueType).as("yearly_revenue"),
        sum(col("quantity_ordered")).as("yearly_quantity")))
      .orderBy(asc("product_name"), asc("year"))
  }

  /** Q9: daily revenue per product with a running average and spike flag
    * (reference W2/W3). The running average is derived from an exact
    * decimal running sum and count (identical in both engines); the spike
    * comparison `daily > 2 × avg` is evaluated in exact decimal arithmetic
    * as `daily × count > 2 × sum` so the flag never depends on float
    * rounding. */
  def q09Spikes(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fact = Star.salesFact(spark, dir)
    val time = Star.dimTime(spark, dir).select("time_id", "order_date")
    val product = Star.dimProduct(spark, dir).select("product_id", "product_name")
    val daily = fact
      .join(broadcast(time), Seq("time_id"))
      .join(broadcast(product), Seq("product_id"))
      .groupBy(col("product_id"), col("product_name"), col("order_date"))
      .agg(sum("total_revenue").cast(aggRevenueType).as("daily_sales"))
    val w = Window.partitionBy("product_id").orderBy("order_date")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    outputDoubles(daily
      .withColumn("run_sum", sum("daily_sales").over(w))
      .withColumn("run_cnt", count(lit(1)).over(w))
      .withColumn("daily_avg_sales", col("run_sum").cast("double") / col("run_cnt"))
      .withColumn(
        "sales_status",
        when(col("daily_sales") * col("run_cnt") > col("run_sum") * 2,
          "High Revenue Spike (Outlier)").otherwise("Normal"))
      .select("product_name", "order_date", "daily_sales", "daily_avg_sales", "sales_status"))
      // daily_avg_sales in the sort: product_name is not unique (distinct
      // product_ids can share a name), so without it the order is not
      // total and the differential compare could flake on name ties.
      .orderBy("product_name", "order_date", "daily_sales", "daily_avg_sales", "sales_status")
  }

  /** A7 — scalar-subquery aggregates (reference
    * `/root/reference/SQL/OLAP Queries - Metro.sql:140-141`:
    * `WHERE Year = (SELECT MAX(Year)...) AND Month = (SELECT MAX(Month)...)`):
    * revenue per store in the latest month of the latest year. Expressed
    * as SQL text so Catalyst's subquery planning (scalar-subquery →
    * broadcast-ready single-row plans) is the exercised path, exactly the
    * built-in machinery SURVEY.md §4.2 maps A7 to. */
  def q11LatestMonth(spark: SparkSession, dir: String): DataFrame = {
    Star.salesFact(spark, dir).createOrReplaceTempView("sales_fact_v")
    Star.dimTime(spark, dir).createOrReplaceTempView("dim_time_v")
    Star.dimStore(spark, dir).createOrReplaceTempView("dim_store_v")
    spark.sql(
      s"""SELECT st.store_id, st.store_name,
         |       CAST(CAST(SUM(f.total_revenue) AS DECIMAL(18,2)) AS DOUBLE) AS total_revenue
         |FROM sales_fact_v f
         |JOIN dim_time_v t ON f.time_id = t.time_id
         |JOIN dim_store_v st ON f.store_id = st.store_id
         |WHERE t.year = (SELECT MAX(year) FROM dim_time_v)
         |  AND t.month = (SELECT MAX(month) FROM dim_time_v
         |                 WHERE year = (SELECT MAX(year) FROM dim_time_v))
         |GROUP BY st.store_id, st.store_name
         |ORDER BY st.store_id""".stripMargin)
  }

  /** Q12 (extension of the reference's top-k family): top-3 products
    * PER STORE by revenue — the grouped variant of Q1's global top-5
    * (reference O1 generalized). Implemented with the bounded top-k
    * aggregate ([[graft.functions.TopK]]): per-store state is 3 rows
    * and combines map-side with no sort of the (store, product)
    * aggregate rows (a row_number window would sort them per partition
    * before ranking). Revenue ties rank by product name
    * DESCENDING: the bounded aggregate keeps the k largest
    * (revenue, name) structs and strings cannot be order-inverted the
    * way numeric tie-breaks are (`-id`), so the tie direction follows
    * the struct order — deterministic, and mirrored verbatim by the
    * oracle's `ORDER BY revenue DESC, product_name DESC` window. */
  def q12TopPerStore(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val fact = Star.salesFact(spark, dir)
    val store = Star.dimStore(spark, dir)
    val product = Star.dimProduct(spark, dir)
    val byProduct = fact
      .join(broadcast(store), Seq("store_id"))
      .join(broadcast(product), Seq("product_id"))
      .groupBy(col("store_name"), col("product_name"))
      .agg(sum("total_revenue").cast(aggRevenueType).cast("double").as("revenue"))
    val tk = graft.functions.TopK.topKBy(
      struct(col("revenue").as("r"), col("product_name").as("p")), k)
    byProduct.groupBy("store_name")
      .agg(tk.as("tk"))
      .select(col("store_name"),
        posexplode(sort_array(col("tk"), asc = false)))
      .select(col("store_name"), (col("pos") + 1).cast("int").as("rank"),
        col("col.p").as("product_name"), col("col.r").as("revenue"))
      .orderBy("store_name", "rank")
  }

  /** Q10: the STORE_QUARTERLY_SALES view (reference S8,
    * `.../OLAP Queries - Metro.sql:276-288`) — registered as a temp view
    * (Spark's lazy-view analog of CREATE VIEW) and read back. */
  def q10StoreQuarterly(spark: SparkSession, dir: String): DataFrame = {
    val fact = Star.salesFact(spark, dir)
    val time = Star.dimTime(spark, dir)
    val store = Star.dimStore(spark, dir)
    outputDoubles(fact
      .join(broadcast(store), Seq("store_id"))
      .join(broadcast(time), Seq("time_id"))
      .groupBy(col("store_id"), col("store_name"), col("quarter"), col("year"))
      .agg(
        sum("total_revenue").cast(aggRevenueType).as("total_quarterly_revenue"),
        sum("quantity_ordered").as("total_quarterly_quantity")))
      .createOrReplaceTempView("store_quarterly_sales")
    spark.table("store_quarterly_sales")
      .orderBy(asc("store_name"), asc("year"), asc("quarter"))
  }

  /** Q19 (extension): the one-pass executive summary — every headline
    * number of the dashboard's top row (orders, line items, revenue,
    * units, per-order average, active stores/products) from a SINGLE
    * scan of the fact: heterogeneous metrics as one wide aggregate,
    * never one query per tile (at 100 TB, six dashboard tiles issuing
    * six fact scans is the difference between one cheap report and
    * six expensive ones). Ratios divide exactly-cast operands, the
    * standard doubles contract. */
  def q19Summary(spark: SparkSession, dir: String): DataFrame = {
    val fact = Star.salesFact(spark, dir)
    outputDoubles(fact.agg(
      countDistinct("order_id").as("n_orders"),
      count(lit(1)).as("n_line_items"),
      sum("total_revenue").cast(aggRevenueType).as("total_revenue"),
      sum("quantity_ordered").cast("bigint").as("total_units"),
      countDistinct("store_id").as("n_active_stores"),
      countDistinct("product_id").as("n_products_sold")))
      .withColumn("avg_order_revenue",
        col("total_revenue") / col("n_orders").cast("double"))
  }

  /** Q18 (extension): ratio-to-report — each store's share of its
    * year's revenue, the percent-of-parent column every OLAP report
    * carries next to the absolute number. Numeric discipline: the
    * window SUM runs over the EXACT DECIMAL (order-independent, so the
    * partition-order of the window cannot move a bit); only the final
    * division happens in doubles, on two exactly-cast operands — the
    * same contract as every ratio in this engine. A double window sum
    * would be partition-order-dependent in the last ulp and the oracle
    * could never pin it. */
  def q18ShareOfYear(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fact = Star.salesFact(spark, dir)
    val time = Star.dimTime(spark, dir).select("time_id", "year")
    val store = Star.dimStore(spark, dir)
    val yearly = fact
      .join(broadcast(time), Seq("time_id"))
      .join(broadcast(store), Seq("store_id"))
      .groupBy(col("year"), col("store_id"), col("store_name"))
      .agg(sum("total_revenue").cast(aggRevenueType).as("total_revenue"))
    val w = Window.partitionBy("year")
    outputDoubles(yearly
      .withColumn("year_total", sum("total_revenue").over(w).cast(aggRevenueType))
      .withColumn("revenue_share",
        col("total_revenue").cast("double") / col("year_total").cast("double")))
      .orderBy("year", "store_id")
  }

  /** Q16 (extension): correlated NOT EXISTS — products with no weekend
    * sale in the reference year (over the whole history every product
    * eventually sells on some weekend, which would make the predicate
    * vacuous; the year slice keeps it discriminating). Extends the
    * reference's subquery surface (A7 is scalar subqueries only) to
    * existential ones, expressed as SQL text so Catalyst's subquery
    * decorrelation is the exercised path: the NOT EXISTS rewrites to a
    * LEFT ANTI join of the dimension against the filtered weekend
    * slice of the fact — the 100 TB side is one filtered scan, and
    * both anti-join operands are dimension-sized after it (the planner
    * picks SMJ or broadcast by stats; either is a dimension-scale
    * exchange, never a fact shuffle). */
  def q16NeverOnWeekend(spark: SparkSession, dir: String): DataFrame = {
    Star.salesFact(spark, dir).createOrReplaceTempView("sales_fact_v")
    Star.dimTime(spark, dir).createOrReplaceTempView("dim_time_v")
    Star.dimProduct(spark, dir).createOrReplaceTempView("dim_product_v")
    spark.sql(
      s"""SELECT p.product_id, p.product_name
         |FROM dim_product_v p
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM sales_fact_v f
         |  JOIN dim_time_v t ON f.time_id = t.time_id
         |  WHERE f.product_id = p.product_id
         |    AND t.is_weekend AND t.year = $Year
         |)
         |ORDER BY p.product_id""".stripMargin)
  }

  /** Q17 (extension): set operation — products sold in BOTH halves of
    * the reference year (INTERSECT of the two distinct product sets;
    * over the whole history every product appears in both halves and
    * the intersection is vacuous), the O3 family beyond plain
    * DISTINCT. `intersect` carries SQL INTERSECT semantics (distinct,
    * null-safe); physically it is an aggregate + semi-join over the
    * two filtered fact slices — two pruned scans, one shuffle each, no
    * dimension table needed at all. */
  def q17BothHalves(spark: SparkSession, dir: String): DataFrame = {
    val fact = Star.salesFact(spark, dir)
    val time = Star.dimTime(spark, dir).select("time_id", "year", "month")
    def half(p: Column => Column) = fact
      .join(broadcast(time), Seq("time_id"))
      .where(col("year") === Year && p(col("month")))
      .select("product_id")
    half(_ <= 6).intersect(half(_ > 6)).orderBy("product_id")
  }

  /** Q15 (extension): the full ranking-function family — store league
    * tables per year. Generalizes the reference's O1 top-k (which only
    * ever needs a LIMIT) to the analytic ranks a report layer asks for:
    * rank / dense_rank / percent_rank / cume_dist / ntile(4).
    *
    * Determinism: rank, dense_rank, percent_rank and cume_dist depend
    * only on the ORDERING VALUES (exact-decimal revenue), not on row
    * order, so they order by revenue alone; ntile DOES depend on row
    * order within ties, so its window adds the store_id tie-break to
    * stay total. percent_rank/cume_dist are integer-over-integer double
    * divisions — bit-identical cross-engine. The windows partition by
    * year (bounded groups, no global sort; the year count grows with
    * the calendar, not the data). */
  def q15RankFamily(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fact = Star.salesFact(spark, dir)
    val time = Star.dimTime(spark, dir).select("time_id", "year")
    val store = Star.dimStore(spark, dir)
    val yearly = fact
      .join(broadcast(time), Seq("time_id"))
      .join(broadcast(store), Seq("store_id"))
      .groupBy(col("year"), col("store_id"), col("store_name"))
      .agg(sum("total_revenue").cast(aggRevenueType).as("total_revenue"))
    val byRev = Window.partitionBy("year").orderBy(col("total_revenue").desc)
    val total = Window.partitionBy("year")
      .orderBy(col("total_revenue").desc, col("store_id").asc)
    outputDoubles(yearly
      .withColumn("rnk", rank().over(byRev))
      .withColumn("dense_rnk", dense_rank().over(byRev))
      .withColumn("pct_rank", percent_rank().over(byRev))
      .withColumn("cume", cume_dist().over(byRev))
      .withColumn("quartile", ntile(4).over(total)))
      .orderBy("year", "rnk", "store_id")
  }

  /** Q14 (extension): the crosstab report — store rows × quarter
    * columns of revenue, the matrix view a consumer of the reference
    * builds client-side from Q10's long-format output. Spark's
    * relational pivot keeps it one group-aggregate (one shuffle on
    * store); the quarter axis becomes four per-column conditional
    * aggregates. The pivot VALUES are declared explicitly: with an
    * unspecified list Spark runs an eager distinct-collect job over the
    * pivot column at PLAN time — a hidden driver-side action a 100 TB
    * plan must not carry (and quarters are a closed domain anyway).
    * A cell with no recorded revenue stays NULL, matching the
    * conditional-aggregation NULL of the SQL twin (a 0 would be
    * indistinguishable from a real zero-revenue quarter). */
  def q14PivotQuarters(spark: SparkSession, dir: String): DataFrame = {
    val fact = Star.salesFact(spark, dir)
    val time = Star.dimTime(spark, dir).select("time_id", "quarter")
    val store = Star.dimStore(spark, dir)
    outputDoubles(fact
      .join(broadcast(time), Seq("time_id"))
      .join(broadcast(store), Seq("store_id"))
      .groupBy(col("store_id"), col("store_name"))
      .pivot("quarter", Seq(1, 2, 3, 4))
      .agg(sum("total_revenue").cast(aggRevenueType))
      .withColumnsRenamed(Map(
        "1" -> "q1_revenue", "2" -> "q2_revenue",
        "3" -> "q3_revenue", "4" -> "q4_revenue")))
      .orderBy("store_id")
  }

  /** Q13 (extension): CUBE over (year, quarter, store) — the full 2³
    * grouping-sets lattice generalizing the reference's ROLLUP (Q7
    * walks only the 4 prefix groupings). `grouping_id()` disambiguates
    * a data NULL from a subtotal NULL; with non-null dimensions it
    * equals the null-pattern fold the oracle computes, and the spec
    * pins the two encodings against each other. Same physical shape as
    * the rollup: one `Expand` (8×) feeding a two-phase hash aggregate —
    * no extra scans for the extra groupings. */
  def q13CubeRevenue(spark: SparkSession, dir: String): DataFrame = {
    val fact = Star.salesFact(spark, dir)
    val time = Star.dimTime(spark, dir).select("time_id", "year", "quarter")
    // Pre-aggregate to the finest (year, quarter, store) grouping before
    // the CUBE: Expand's 8× fan-out then applies to the fine aggregate,
    // not the fact table (same rewrite as q07Rollup — SUMs compose, and
    // grouping_id depends only on which columns each set nulls out).
    val fine = fact
      .join(broadcast(time), Seq("time_id"))
      .groupBy(col("year"), col("quarter"), col("store_id"))
      .agg(sum("total_revenue").as("fine_revenue"),
        sum("quantity_ordered").as("fine_quantity"))
    outputDoubles(fine
      .cube(col("year"), col("quarter"), col("store_id"))
      .agg(
        grouping_id().cast("int").as("gid"),
        sum("fine_revenue").cast(aggRevenueType).as("total_revenue"),
        sum("fine_quantity").cast("bigint").as("total_quantity")))
      .orderBy(asc_nulls_first("year"), asc_nulls_first("quarter"),
        asc_nulls_first("store_id"))
  }

  /** ABC-class share thresholds (cumulative revenue ≤ 80 % → A,
    * ≤ 95 % → B, else C) — shared literals with the oracle. */
  val AbcA = 0.80
  val AbcB = 0.95

  /** [[q23AbcPareto]]'s adaptive-gate threshold: the plain global
    * window is admitted while the product domain (part-dimension row
    * count, one parquet metadata read) stays under 4 million rows —
    * a few hundred MB through one window partition; above it the
    * distributed bucketed prefix sum engages. */
  val AbcWindowGate: Long = 4_000_000L

  /** Q23 (extension): ABC / Pareto analysis — products ranked by yearly
    * revenue with their cumulative share and A/B/C class, the classic
    * "which 20 % of the catalog is 80 % of revenue" report.
    *
    * The cumulative sum's natural spelling is a GLOBAL window (ORDER BY
    * revenue DESC ROWS UNBOUNDED PRECEDING) — a single-partition sort
    * of the catalog-sized aggregate, the plan [[graft.ext.PackOps]]
    * refuses. Instead the running total reuses the shared distributed
    * prefix sum: revenue-quantile range buckets (monotone in the
    * (−cents, product_id) total order), per-bucket parallel windows, a
    * B-row serial offset pass. Bucket count affects parallelism only,
    * never values (spec-pinned, same contract as packing/curriculum).
    * All sums are exact integer cents; the one double division (share =
    * running/total) and the threshold compares are exact-input. The
    * DuckDB twin uses the plain window — semantics, not plans, must
    * match. */
  def q23AbcPareto(spark: SparkSession, dir: String, buckets: Int = 0,
      windowGate: Long = AbcWindowGate): DataFrame = {
    val b = if (buckets > 0) buckets
      else math.max(4, spark.sparkContext.defaultParallelism / 4)
    val perProduct = Star.salesFact(spark, dir)
      .groupBy("product_id")
      .agg(sum((col("total_revenue") * 100).cast("long")).as("cents"))
    val total = perProduct.agg(sum("cents").as("total_cents"))
    // ADAPTIVE WINDOW GATE (round-13: the bucketed prefix-max's a/b
    // crossover never arrived — 1.4× slower than the plain window even
    // at factor 10, because the windowed frame is the PRODUCT-grain
    // aggregate, tiny relative to the fact). The product domain is
    // bounded by the part dimension, whose row count is one parquet
    // metadata read; while it fits comfortably through one window
    // partition the natural spelling wins, and only a genuinely
    // catalog-sized domain engages the distributed prefix sum. Bucket
    // choice never changes values (spec-pinned), so the gate is purely
    // a plan decision.
    val productDomain = cachedProbe(spark, s"partcount:$dir") {
      scala.util.Try(
        spark.read.parquet(s"$dir/part.parquet").count()).getOrElse(Long.MaxValue)
    }
    if (productDomain <= windowGate) {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(desc("cents"), asc("product_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      return perProduct
        .withColumn("running_cents", sum("cents").over(w))
        .crossJoin(broadcast(total))
        .withColumn("cum_share",
          col("running_cents").cast("double") / col("total_cents").cast("double"))
        .withColumn("abc_class",
          when(col("cum_share") <= lit(AbcA), "A")
            .when(col("cum_share") <= lit(AbcB), "B")
            .otherwise("C"))
        .select("product_id", "cents", "running_cents", "cum_share", "abc_class")
        .orderBy(desc("cents"), asc("product_id"))
    }
    val qs = (1 until b).map(i => i.toDouble / b).mkString(",")
    val cuts = perProduct.agg(expr(s"percentile(cents, array($qs))").as("cuts"))
    val keyed = perProduct.crossJoin(broadcast(cuts))
      // bucket 0 = richest quantile slice: (b−1) − #cutoffs below cents
      // is monotone non-decreasing in (−cents) — the prefix-sum order
      .withColumn("bucket", lit(b - 1) - expr(
        "aggregate(cuts, 0, (acc, c) -> acc + CASE WHEN cents > c THEN 1 ELSE 0 END)"))
      .withColumn("neg_cents", -col("cents"))
    graft.ext.PackOps.prefixSumOverBuckets(keyed, b, "cents",
        Seq("neg_cents", "product_id"))
      .crossJoin(broadcast(total))
      .withColumn("running_cents", col("global_before") + col("cents"))
      .withColumn("cum_share",
        col("running_cents").cast("double") / col("total_cents").cast("double"))
      .withColumn("abc_class",
        when(col("cum_share") <= lit(AbcA), "A")
          .when(col("cum_share") <= lit(AbcB), "B")
          .otherwise("C"))
      .select("product_id", "cents", "running_cents", "cum_share", "abc_class")
      .orderBy(desc("cents"), asc("product_id"))
  }

  /** Q20 (extension): explicit GROUPING SETS — the general member of
    * the grouping-lattice family (Q7 walks ROLLUP's prefixes, Q13 the
    * full CUBE). A report wanting two independent yearly breakdowns
    * (by store AND by supplier) plus the year total names exactly
    * those three sets; a CUBE over the 3 columns would compute 8
    * groupings and throw 5 away. Physically identical machinery: one
    * `Expand` (3×, not 8×) feeding a two-phase hash aggregate — one
    * fact scan for all three groupings. */
  def q20GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val fact = Star.salesFact(spark, dir)
    val time = Star.dimTime(spark, dir).select("time_id", "year")
    // Pre-aggregate to (year, store, supplier) — the union of all three
    // sets' columns — before the GROUPING SETS Expand (see q07Rollup).
    val fine = fact
      .join(broadcast(time), Seq("time_id"))
      .groupBy(col("year"), col("store_id"), col("supplier_id"))
      .agg(sum("total_revenue").as("fine_revenue"),
        sum("quantity_ordered").as("fine_quantity"))
    outputDoubles(fine
      .groupingSets(
        Seq(Seq(col("year"), col("store_id")),
          Seq(col("year"), col("supplier_id")),
          Seq(col("year"))),
        col("year"), col("store_id"), col("supplier_id"))
      .agg(
        grouping_id().cast("int").as("gid"),
        sum("fine_revenue").cast(aggRevenueType).as("total_revenue"),
        sum("fine_quantity").cast("bigint").as("total_quantity")))
      .orderBy(col("year"), col("gid"), asc_nulls_first("store_id"),
        asc_nulls_first("supplier_id"))
  }

  /** Q21 (extension): set difference — customers who bought in H1 of
    * the reference year but not in H2 (the lapsed-customer list a
    * retention campaign starts from); EXCEPT completes the set-op
    * family next to Q17's INTERSECT. `except` carries SQL EXCEPT
    * semantics (distinct, null-safe); physically an aggregate +
    * anti-join over two pruned fact slices — no dimension table, no
    * cartesian anywhere. */
  def q21LapsedCustomers(spark: SparkSession, dir: String): DataFrame = {
    val fact = Star.salesFact(spark, dir)
    val time = Star.dimTime(spark, dir).select("time_id", "year", "month")
    def half(p: Column => Column) = fact
      .join(broadcast(time), Seq("time_id"))
      .where(col("year") === Year && p(col("month")))
      .select("customer_id")
    half(_ <= 6).except(half(_ > 6)).orderBy("customer_id")
  }

  /** Q22 (extension): explicit window FRAMES — the remaining window
    * dimension after Q15's ranking family (which needs no frames) and
    * Q9's default-frame running sums. Per store×year monthly revenue
    * annotated with first/last/2nd month of the year (full-partition
    * frame: `first_value`/`last_value`/`nth_value`) and a trailing
    * 3-month moving average (bounded `2 PRECEDING..CURRENT ROW`
    * frame). The moving average divides an EXACT decimal frame-sum
    * (cast to double) by the frame row count — never an avg() over
    * doubles, whose accumulation order engines don't agree on.
    * Partitions are store×year (≤12 rows each, no global sort);
    * month is unique within a partition so every frame is total. */
  def q22FrameBounds(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fact = Star.salesFact(spark, dir)
    val time = Star.dimTime(spark, dir).select("time_id", "year", "month")
    val monthly = fact
      .join(broadcast(time), Seq("time_id"))
      .groupBy(col("store_id"), col("year"), col("month"))
      .agg(sum("total_revenue").cast(aggRevenueType).as("monthly_revenue"))
    val byMonth = Window.partitionBy("store_id", "year").orderBy("month")
    val full = byMonth.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val trail = byMonth.rowsBetween(-2, Window.currentRow)
    outputDoubles(monthly
      .withColumn("first_month_revenue", first("monthly_revenue").over(full))
      .withColumn("last_month_revenue", last("monthly_revenue").over(full))
      .withColumn("second_month_revenue",
        nth_value(col("monthly_revenue"), 2).over(full))
      .withColumn("trailing3_avg",
        sum("monthly_revenue").over(trail).cast("double") /
          count(lit(1)).over(trail).cast("double")))
      .orderBy("store_id", "year", "month")
  }

  /** Q27 (extension): ASSOCIATION RULES over baskets — the directed
    * completion of Q6's co-occurrence counts: for every supported
    * product pair, both rules a→b and b→a with support count,
    * confidence n_ab/n_a and lift n_ab·N/(n_a·n_b). All counts are
    * exact bigints from ONE distinct (order, product) table — the pair
    * self-join is per-order bounded (basket size ≤ 7 lines), the
    * per-product order counts broadcast back, N rides in as a 1-row
    * broadcast cross — and the two ratios are single double divisions
    * of exact integer products (n_ab·N fits int64 comfortably at any
    * SF this schema reaches). Top-k by lift via `TakeOrderedAndProject`
    * (bounded, never a global sort). */
  def q27Rules(spark: SparkSession, dir: String, minSupport: Int = 2,
      k: Int = 100): DataFrame = {
    val basket = Star.salesFact(spark, dir)
      .select("order_id", "product_id").distinct()
    val perProduct = basket.groupBy(col("product_id").as("p"))
      .agg(count(lit(1)).as("n_p"))
    // the stored basket-pair artifact shared with the triangle graph
    val pairs = graft.ext.GraphOps.coPurchasePairCounts(spark, dir, minSupport)
    val total = basket.select("order_id").distinct()
      .agg(count(lit(1)).as("n_orders"))
    val directed = pairs
      .select(col("u").as("antecedent"), col("v").as("consequent"), col("n_ab"))
      .unionByName(pairs
        .select(col("v").as("antecedent"), col("u").as("consequent"), col("n_ab")))
    directed
      .join(broadcast(perProduct.select(col("p").as("antecedent"),
        col("n_p").as("n_ante"))), Seq("antecedent"))
      .join(broadcast(perProduct.select(col("p").as("consequent"),
        col("n_p").as("n_cons"))), Seq("consequent"))
      .crossJoin(broadcast(total))
      .withColumn("confidence",
        col("n_ab").cast("double") / col("n_ante").cast("double"))
      .withColumn("lift", (col("n_ab") * col("n_orders")).cast("double") /
        (col("n_ante") * col("n_cons")).cast("double"))
      .select("antecedent", "consequent", "n_ab", "n_ante", "n_cons",
        "confidence", "lift")
      .orderBy(desc("lift"), desc("confidence"), asc("antecedent"),
        asc("consequent"))
      .limit(k)
  }

  /** Q25 (extension): grouped EXACT percentile family — per store, the
    * order-value distribution (median / p90 / p99 over each order's
    * store subtotal) plus count and range. Values are integer cents, so
    * the linear interpolation both engines apply (`percentile` here,
    * `quantile_cont` in DuckDB) runs on exact integers and the IEEE
    * result is bit-identical — the [[graft.etl.EtlQueries.madOutliers]]
    * determinism contract. Exact percentiles hold per-group value
    * buffers (no partial aggregation); groups here are store-bounded —
    * for unbounded groups at corpus scale the engine's switch is
    * `approx_percentile`, the documented trade
    * ([[graft.ext.TextOps.lengthHistQuantiles]] makes the same call). */
  def q25Percentiles(spark: SparkSession, dir: String): DataFrame = {
    val sub = Star.salesFact(spark, dir)
      .groupBy("store_id", "order_id")
      .agg(sum((col("total_revenue") * 100).cast("long")).as("order_cents"))
    sub.groupBy("store_id")
      .agg(
        count(lit(1)).as("n_orders"),
        min("order_cents").as("min_cents"),
        expr("percentile(order_cents, CAST(0.5 AS DOUBLE))").as("p50"),
        expr("percentile(order_cents, CAST(0.9 AS DOUBLE))").as("p90"),
        expr("percentile(order_cents, CAST(0.99 AS DOUBLE))").as("p99"),
        max("order_cents").as("max_cents"))
      .orderBy("store_id")
  }

  /** Q25a (extension): the UNBOUNDED-GROUP percentile answer —
    * `approx_percentile` (a mergeable rank sketch: constant memory per
    * group, full partial aggregation) in place of [[q25Percentiles]]'s
    * exact per-group value buffers, REGISTERED AS ITS ERROR-ENVELOPE
    * AUDIT. The sketch's values are engine-specific (no second engine
    * reproduces them bit-for-bit), so what the oracle can — and does —
    * gate is the advertised guarantee itself: for each (store,
    * quantile), one exact pass counts the approx value's rank range
    * [n_lt+1, n_le] and checks it lands within ±(⌊n/accuracy⌋+1) of
    * the target rank ⌈p·n⌉. Engine emits the MEASURED verdict, the
    * twin emits the expected one (TRUE) over the identical spine /
    * target / tolerance arithmetic — a wrong or drifting sketch flips
    * `within_bound` and fails the hash gate. This is the 100-TB
    * switch: exact percentiles hold per-group buffers (fine for
    * store-bounded groups), the sketch holds O(accuracy) state per
    * group at any cardinality; the envelope row keeps the switch
    * honest. */
  def q25PercentilesApprox(spark: SparkSession, dir: String,
      accuracy: Int = PercentileAccuracy): DataFrame = {
    val sub = Star.salesFact(spark, dir)
      .groupBy("store_id", "order_id")
      .agg(sum((col("total_revenue") * 100).cast("long")).as("order_cents"))
    val approx = sub.groupBy("store_id")
      .agg(expr("approx_percentile(order_cents, " +
        s"array(CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)), $accuracy)")
        .as("ap"))
      .select(col("store_id"), posexplode(col("ap")))
      .select(col("store_id"),
        element_at(lit(Array("p50", "p90", "p99")), col("pos").cast("int") + 1).as("qlabel"),
        element_at(lit(Array(0.5, 0.9, 0.99)), col("pos").cast("int") + 1).as("p"),
        col("col").as("v"))
    percentileEnvelope(sub, approx, accuracy)
  }

  /** Sketch accuracy for [[q25PercentilesApprox]]: rank tolerance
    * ⌊n/accuracy⌋+1 — tight enough to be a real check at test group
    * sizes, shared with the twin's tolerance arithmetic. */
  val PercentileAccuracy = 1000

  /** The envelope checker behind [[q25PercentilesApprox]], factored so
    * the spec can feed it a DELIBERATELY wrong `approx` frame and watch
    * the verdict flip. `approx` carries (store_id, qlabel, p, v); the
    * check is one exact aggregate over `sub` joined on the group key —
    * partial-aggregable, no buffers. */
  private[olap] def percentileEnvelope(sub: DataFrame, approx: DataFrame,
      accuracy: Int): DataFrame =
    sub.join(approx, "store_id")
      .groupBy("store_id", "qlabel", "p")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("order_cents") <= col("v"), 1L).otherwise(0L)).as("n_le"),
        sum(when(col("order_cents") < col("v"), 1L).otherwise(0L)).as("n_lt"))
      .withColumn("target_rank",
        greatest(lit(1L), ceil(col("p") * col("n_orders")).cast("long")))
      .withColumn("tolerance", expr(s"n_orders div $accuracy") + lit(1L))
      .withColumn("within_bound",
        col("n_le") >= col("target_rank") - col("tolerance") &&
          col("n_lt") < col("target_rank") + col("tolerance"))
      .select("store_id", "qlabel", "n_orders", "target_rank", "tolerance",
        "within_bound")
      .orderBy("store_id", "qlabel")

  /** Q26 (extension): UNPIVOT — [[q14PivotQuarters]]'s wide quarter
    * columns melted back to (store, quarter, revenue) rows via `stack`
    * (one codegen projection, a 4× bounded fan-out — the exact inverse
    * of pivot's CASE-aggregate). Empty cells (a store with no sales in
    * a quarter) unpivot to NULL and are dropped, so the oracle can be
    * the DIRECT long aggregate: the differential then pins
    * `unpivot ∘ pivot == identity` across engines, not merely the
    * melt arithmetic. */
  def q26Unpivot(spark: SparkSession, dir: String): DataFrame =
    q14PivotQuarters(spark, dir)
      .selectExpr("store_id", "store_name",
        "stack(4, 1, q1_revenue, 2, q2_revenue, 3, q3_revenue, 4, q4_revenue) AS (quarter, revenue)")
      .where(col("revenue").isNotNull)
      .orderBy("store_id", "quarter")

  /** Q24 (extension): RELATIONAL DIVISION — customers whose purchases
    * cover EVERY sales region (Codd's ÷, the "suppliers who supply all
    * parts" shape; the universal-quantifier query the reference's SQL
    * surface never reaches). Count-matching plan: one fact scan →
    * broadcast nation join → per-customer `countDistinct(region)` (one
    * shuffle, partial-aggregable) → filter against the divisor
    * cardinality, computed as a 1-row aggregate and broadcast-crossed
    * into the plan — never `collect()`ed to the driver, so the same
    * plan runs unmodified on a cluster. The divisor is the REGION
    * table (all regions must be covered, not just regions that sold) —
    * identical to the oracle's double-NOT-EXISTS spelling, which pins
    * the two classic division spellings against each other. */
  def q24Division(spark: SparkSession, dir: String): DataFrame = {
    val fact = Star.salesFact(spark, dir)
    val storeRegion = Star.table(spark, dir, "nation")
      .select(col("n_nationkey").as("store_id"),
        col("n_regionkey").as("region_id"))
    val divisorSize = Star.table(spark, dir, "region")
      .agg(count(lit(1)).cast("int").as("n_regions"))
    val cust = Star.dimCustomer(spark, dir)
      .select("customer_id", "customer_name")
    fact.select("customer_id", "store_id")
      .join(broadcast(storeRegion), Seq("store_id"))
      .groupBy("customer_id")
      .agg(countDistinct("region_id").cast("int").as("regions_covered"))
      .crossJoin(broadcast(divisorSize))
      .where(col("regions_covered") === col("n_regions"))
      .join(broadcast(cust), Seq("customer_id"))
      .select("customer_id", "customer_name", "regions_covered")
      .orderBy("customer_id")
  }

  /** Q28 (extension): SKYLINE / Pareto frontier — products not dominated
    * on (price ↓, total units sold ↑): no other product is at most as
    * expensive AND sells at least as much with one strict. The classic
    * multi-objective "efficient frontier" report (Börzsönyi et al.
    * ICDE'01), the set-membership sibling of Q23's one-dimensional
    * Pareto ranking.
    *
    * The naive spelling is an all-pairs dominance self-join (catalog²).
    * In 2D dominance collapses to PREFIX MAXIMA: with
    * M_lt(p) = max{qty : price < p} and M_eq(p) = max{qty : price = p},
    * a product survives iff qty > M_lt(p) and qty = M_eq(p) (nothing
    * strictly cheaper sells as much; it is the best seller at its own
    * price). M_eq is one partial-aggregable groupBy(price); M_lt is an
    * exclusive running max over the DISTINCT-price table — computed with
    * the same bucketed two-pass structure as the shared prefix sum
    * ([[graft.ext.PackOps.prefixSumOverBuckets]], max instead of sum):
    * percentile range buckets over prices, per-bucket local window,
    * B-row offset pass — so there is NO single-partition window over the
    * price domain and NO self-join anywhere. Quantities are exact
    * bigints, prices exact integer cents; the −1 sentinel for "no
    * cheaper price exists" is safe (quantities are ≥ 0). The DuckDB twin
    * deliberately uses the double-NOT-EXISTS dominance spelling — the
    * definition, not the algorithm — so the prefix-maxima reduction
    * itself is what the oracle checks. Bucket count affects parallelism
    * only, never values (spec-pinned, the prefix-sum contract). */
  def q28Skyline(spark: SparkSession, dir: String, buckets: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = if (buckets > 0) buckets
      else math.max(4, spark.sparkContext.defaultParallelism / 4)
    val price = Star.dimProduct(spark, dir)
      .select(col("product_id"), (col("price") * 100).cast("long").as("price_cents"))
    val perProduct = Star.salesFact(spark, dir)
      .groupBy("product_id")
      .agg(sum(col("quantity_ordered").cast("long")).as("total_qty"))
      .join(broadcast(price), Seq("product_id"))
    val perPrice = perProduct.groupBy("price_cents")
      .agg(max("total_qty").as("peq"))
    val qs = (1 until b).map(i => i.toDouble / b).mkString(",")
    val cuts = perPrice.agg(expr(s"percentile(price_cents, array($qs))").as("cuts"))
    val keyed = perPrice.crossJoin(broadcast(cuts))
      .withColumn("bucket", expr(
        "aggregate(cuts, 0, (acc, c) -> acc + CASE WHEN price_cents > c THEN 1 ELSE 0 END)"))
      .repartitionByRange(b, col("bucket"))
    val localWin = Window.partitionBy("bucket").orderBy("price_cents")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = keyed.withColumn("local_mlt",
      coalesce(max(col("peq")).over(localWin), lit(-1L)))
    val offsetWin = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local
      .groupBy("bucket")
      .agg(max(greatest(col("local_mlt"), col("peq"))).as("bucket_max"))
      .withColumn("bucket_mlt",
        coalesce(max(col("bucket_max")).over(offsetWin), lit(-1L)))
      .select("bucket", "bucket_mlt")
    val mlt = local.join(broadcast(offsets), "bucket")
      .withColumn("m_lt", greatest(col("local_mlt"), col("bucket_mlt")))
      .select("price_cents", "peq", "m_lt")
    perProduct.join(mlt, Seq("price_cents"))
      .where(col("total_qty") > col("m_lt") && col("total_qty") === col("peq"))
      .select("product_id", "price_cents", "total_qty")
      .orderBy("price_cents", "product_id")
  }

  /** Q30 — year-over-year revenue WATERFALL: the latest year's total
    * delta vs the year before, decomposed per store (the "where did
    * the change come from" bridge chart every revenue review opens
    * with). The year pair is data-derived (max year and its
    * predecessor); stores missing from either side zero-fill rather
    * than vanish — an exited store IS a negative contribution. Deltas
    * are exact integer cents; the one double is each store's share of
    * the total delta. The rank window is over the store dimension
    * (≤ |stores| rows — the Q2-literal bounded-window precedent), so
    * nothing fact-sized is ever sorted. */
  def q30Waterfall(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val yearly = Star.salesFact(spark, dir)
      .groupBy(expr("CAST(year(time_id) AS INT)").as("year"), col("store_id"))
      .agg(sum((col("total_revenue") * 100).cast("long")).as("cents"))
    val ymax = yearly.agg(max("year").as("ym"))
    val sliced = yearly.crossJoin(broadcast(ymax))
      .where(col("year") >= col("ym") - 1)
    val cur = sliced.where(col("year") === col("ym"))
      .select(col("store_id"), col("cents").as("rev_cur"))
    val prev = sliced.where(col("year") === col("ym") - 1)
      .select(col("store_id"), col("cents").as("rev_prev"))
    val joined = cur.join(prev, Seq("store_id"), "full_outer")
      .select(col("store_id"),
        coalesce(col("rev_prev"), lit(0L)).as("rev_prev_cents"),
        coalesce(col("rev_cur"), lit(0L)).as("rev_cur_cents"))
      .withColumn("delta_cents", col("rev_cur_cents") - col("rev_prev_cents"))
    val total = joined.agg(sum("delta_cents").as("total_delta"))
    joined.crossJoin(broadcast(total))
      .withColumn("share_of_delta", expr(
        "CASE WHEN total_delta = 0 THEN CAST(0 AS DOUBLE) " +
          "ELSE CAST(delta_cents AS DOUBLE) / CAST(total_delta AS DOUBLE) END"))
      .withColumn("rank", row_number().over(
        Window.orderBy(abs(col("delta_cents")).desc, col("store_id"))))
      .select("rank", "store_id", "rev_prev_cents", "rev_cur_cents",
        "delta_cents", "share_of_delta")
      .orderBy("rank")
  }

  /** Q29 — top-k frequent 3-itemsets by exact support, completing the
    * basket-mining ladder (pair counts → association rules Q27 →
    * triangles → triples): which product TRIOS reliably sell together.
    *
    * Enumeration is APRIORI-PRUNED (Agrawal–Srikant VLDB'94), not the
    * naive two-step self-join: a triple with support ≥ s contains each
    * of its pairs in every supporting order, so every sub-pair also has
    * support ≥ s — pruning candidate expansions whose (p1,p2) [and,
    * post-expansion, (p2,p3)] pair misses min-support is LOSSLESS for
    * the final `support ≥ minSupport` output. That property is not
    * argued, it is oracle-PROVEN: the DuckDB twin deliberately keeps
    * the brute-force expansion, so the per-round hash gate pins
    * Apriori ≡ brute force on real data. What pruning buys is skew
    * resistance: unpruned, one pathological 10k-line order costs
    * C(10⁴,3) ≈ 1.7·10¹¹ triples on a single order key; pruned, its
    * expansion is bounded by its FREQUENT pairs × basket. A second,
    * explicit guard caps basket size outright (`maxBasket`, default
    * 100 — far above the domain's ≤7-line orders, so a no-op on sane
    * data): a bot/bulk-upload order above the cap is excluded from
    * mining entirely, mirrored verbatim in the oracle twin. */
  def q29Itemsets3(spark: SparkSession, dir: String, minSupport: Int = 2,
      k: Int = 50, maxBasket: Int = 100,
      tripleGate: Long = AprioriTripleGate): DataFrame = {
    val basket = graft.etl.Star.salesFact(spark, dir)
      .select("order_id", "product_id").distinct()
    // ADAPTIVE APRIORI GATE (round-13: the measured a/b crossover
    // never arrived — at factor 10 the always-pruned plan is 3.4×
    // SLOWER than the direct expansion, because sane baskets make the
    // pair-support pass and its two semi-joins pure overhead). One
    // cheap aggregate over basket sizes computes the EXACT unpruned
    // candidate count Σ C(n,3); only when that predicts a blow-up
    // (a pathological basket mix) does the Apriori machinery engage.
    // Both paths end at the same `support ≥ minSupport` filter, so
    // the answer is path-independent (spec-pinned; pruning is
    // lossless by the Apriori property).
    // probe cost discipline: line-grain counts (no distinct shuffle)
    // give an UPPER bound on basket sizes — a safe overestimate that
    // can only engage pruning early — and the scalar memoizes per
    // (session, dataset) like any other statistic, so repeat plans
    // pay nothing
    // probe grain note: line counts upper-bound item counts, and the
    // sum is over ALL orders (no cap filter — filtering on the wrong
    // grain could under-estimate a kept basket's expansion), so the
    // predicted candidate count is a strict upper bound — a safe
    // overestimate can only engage pruning early. The max line count
    // additionally proves the basket-size guard VACUOUS when already
    // under the cap, so the sane-data plan carries no guard shuffle
    // at all.
    val (triples, maxLine) = q29Probes(spark, dir)
    val candidates =
      if (triples > tripleGate) itemsets3Candidates(basket, minSupport, maxBasket)
      else itemsets3Direct(basket, maxBasket,
        guardNeeded = maxLine > maxBasket)
    candidates
      .groupBy("p1", "p2", "p3")
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
      .orderBy(col("support").desc, col("p1"), col("p2"), col("p3"))
      .limit(k)
  }

  /** Scalar probe memo behind the adaptive gates — the statistics-
    * cache discipline (ANALYZE once, plan many): a gate probe's answer
    * is a property of the (session, dataset), so repeat queries reuse
    * the first run's decision instead of re-scanning. Stopped
    * sessions' entries purge lazily, the [[graft.util.SessionCache]]
    * lifecycle. */
  private val probeCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), java.lang.Long]()

  private def cachedProbe(spark: SparkSession, key: String)(
      compute: => Long): Long = {
    probeCache.keySet.removeIf(_._1.sparkContext.isStopped)
    probeCache.computeIfAbsent((spark, key), _ => compute).longValue()
  }

  /** [[q29Itemsets3]]'s two gate scalars in ONE cached pass over the
    * per-order line counts: the exact-upper-bound candidate sum
    * Σ C(n,3) and the max per-order line count (which proves the
    * basket-size guard vacuous when it is already under the cap —
    * items per basket ≤ lines per order). */
  private def q29Probes(spark: SparkSession, dir: String): (Long, Long) = {
    probeCache.keySet.removeIf(_._1.sparkContext.isStopped)
    val kT = (spark, s"q29triples:$dir")
    val kM = (spark, s"q29maxline:$dir")
    val (t, m) = (probeCache.get(kT), probeCache.get(kM))
    if (t != null && m != null) (t.longValue(), m.longValue())
    else {
      val r = graft.etl.Star.salesFact(spark, dir)
        .groupBy("order_id")
        .agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(expr("n * (n - 1) * (n - 2) / 6")), lit(0L))
          .cast("long"),
          coalesce(max(col("n")), lit(0L)).cast("long"))
        .head()
      probeCache.put(kT, r.getLong(0))
      probeCache.put(kM, r.getLong(1))
      (r.getLong(0), r.getLong(1))
    }
  }

  /** [[q29Itemsets3]]'s adaptive-gate threshold: the direct (unpruned)
    * expansion is admitted while the exact predicted candidate count
    * Σ C(basket,3) stays under 2·10⁸ (a few GB through the support
    * shuffle — bounded on one executor, trivial on a cluster); above
    * it the Apriori pair cuts engage. */
  val AprioriTripleGate: Long = 200_000_000L

  /** The DIRECT candidate expansion — [[itemsets3Candidates]] minus
    * the pair-support pass and its semi-joins, taken when the gate's
    * probe proves Σ C(n,3) is bounded. Same canonical p1<p2<p3 rows,
    * same basket-size guard; the final support filter makes the two
    * paths answer-identical. */
  private[olap] def itemsets3Direct(basket: DataFrame,
      maxBasket: Int, guardNeeded: Boolean = true): DataFrame = {
    val b = if (!guardNeeded) basket else {
      val kept = basket.groupBy("order_id")
        .agg(count(lit(1)).as("basket_size"))
        .where(col("basket_size") <= maxBasket)
        .select("order_id")
      basket.join(kept, Seq("order_id"), "left_semi")
    }
    b.as("a")
      .join(b.as("b"),
        col("a.order_id") === col("b.order_id") &&
          col("a.product_id") < col("b.product_id"))
      .select(col("a.order_id").as("order_id"),
        col("a.product_id").as("p1"), col("b.product_id").as("p2"))
      .as("ab")
      .join(b.as("c"),
        col("ab.order_id") === col("c.order_id") &&
          col("ab.p2") < col("c.product_id"))
      .select(col("ab.order_id").as("order_id"), col("p1"), col("p2"),
        col("c.product_id").as("p3"))
  }

  /** The pruned candidate-triple table behind [[q29Itemsets3]]: one row
    * per (order, canonical p1<p2<p3 trio) that SURVIVES the basket-size
    * guard and the Apriori pair cuts. Factored out so the fan-out bound
    * is a row-count assertion in `Itemsets3Spec`, not a claim. All
    * joins share the order-key partitioning; the frequent-pair
    * semi-joins are support-filtered aggregates (frequent pairs ≪
    * pairs — AQE broadcasts them when small). */
  private[olap] def itemsets3Candidates(basket: DataFrame,
      minSupport: Int, maxBasket: Int): DataFrame = {
    val kept = basket.groupBy("order_id")
      .agg(count(lit(1)).as("basket_size"))
      .where(col("basket_size") <= maxBasket)
      .select("order_id")
    val b = basket.join(kept, Seq("order_id"), "left_semi")
    val pairs = b.as("a")
      .join(b.as("b"),
        col("a.order_id") === col("b.order_id") &&
          col("a.product_id") < col("b.product_id"))
      .select(col("a.order_id").as("order_id"),
        col("a.product_id").as("p1"), col("b.product_id").as("p2"))
    val freqPairs = pairs.groupBy("p1", "p2")
      .agg(count(lit(1)).as("pair_support"))
      .where(col("pair_support") >= minSupport)
      .select("p1", "p2")
    // Apriori cut 1 — BEFORE the cubic extension: only frequent (p1,p2)
    // occurrences extend to a third item.
    pairs.join(freqPairs, Seq("p1", "p2"), "left_semi")
      .as("ab")
      .join(b.as("c"),
        col("ab.order_id") === col("c.order_id") &&
          col("ab.p2") < col("c.product_id"))
      .select(col("ab.order_id").as("order_id"), col("p1"), col("p2"),
        col("c.product_id").as("p3"))
      // Apriori cut 2 — the (p2,p3) sub-pair must itself be frequent;
      // trims the shuffle into the support aggregate.
      .join(freqPairs.toDF("p2", "p3"), Seq("p2", "p3"), "left_semi")
      .select("order_id", "p1", "p2", "p3")
  }
}
