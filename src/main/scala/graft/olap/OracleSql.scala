package graft.olap

import graft.etl.Star

/** DuckDB oracle SQL twins for [[Queries]] — ANSI SQL over the same raw
  * parquet tables, prefixed with the shared star-schema CTE
  * ([[Star.oracleCte]]) so both engines compute over the identical model.
  *
  * Comparison-surface contract (mirrors [[graft.model.Schemas.outputDoubles]]):
  * aggregates are exact decimal internally; every DECIMAL output column is
  * wrapped in `CAST(... AS DOUBLE)` in the outer projection, so both
  * engines emit (and sort) bit-identical IEEE doubles. */
object OracleSql {

  private def star(body: String): String = Star.oracleCte + body

  def q01(weekend: Boolean): String = star(
    s"""SELECT t.month AS month, p.product_name AS product_name,
       |       CAST(CAST(SUM(f.total_revenue) AS DECIMAL(18,2)) AS DOUBLE) AS total_revenue
       |FROM sales_fact f
       |JOIN dim_time t ON f.time_id = t.time_id
       |JOIN dim_product p ON f.product_id = p.product_id
       |WHERE t.is_weekend = $weekend AND t.year = ${Queries.Year}
       |GROUP BY t.month, p.product_name
       |ORDER BY total_revenue DESC, month ASC, product_name ASC
       |LIMIT 5""".stripMargin)

  val q02: String = star(
    s"""SELECT store_id, store_name, quarter,
       |       CAST(total_revenue AS DOUBLE) AS total_revenue,
       |       CAST(previous_quarter_revenue AS DOUBLE) AS previous_quarter_revenue,
       |       CAST(total_revenue - previous_quarter_revenue AS DOUBLE)
       |         / CAST(previous_quarter_revenue AS DOUBLE) * 100.0
       |         AS revenue_growth_rate
       |FROM (
       |  SELECT st.store_id, st.store_name, t.quarter,
       |         CAST(SUM(f.total_revenue) AS DECIMAL(18,2)) AS total_revenue,
       |         LAG(CAST(SUM(f.total_revenue) AS DECIMAL(18,2))) OVER (
       |           PARTITION BY st.store_id ORDER BY t.quarter
       |         ) AS previous_quarter_revenue
       |  FROM sales_fact f
       |  JOIN dim_time t ON f.time_id = t.time_id
       |  JOIN dim_store st ON f.store_id = st.store_id
       |  WHERE t.year = ${Queries.Year}
       |  GROUP BY st.store_id, st.store_name, t.quarter
       |)
       |ORDER BY store_id, quarter""".stripMargin)

  /** Literal twin of the reference Q2 (see [[Queries.q02LiteralGrowth]]):
    * LEAD-mapping self-join with its (q, q) self-pairs and inverted
    * "previous" quarter; ROUND(x, 2) as exact half-away integer-cents
    * rounding, identical to the Spark expression. DuckDB `//` and Spark
    * `div` both truncate; operands are kept positive so trunc == floor. */
  val q02Literal: String = star(
    s""", revenue_data AS (
       |  SELECT st.store_id, st.store_name, t.quarter,
       |         CAST(SUM(f.total_revenue) AS DECIMAL(18,2)) AS total_revenue
       |  FROM sales_fact f
       |  JOIN dim_time t ON f.time_id = t.time_id
       |  JOIN dim_store st ON f.store_id = st.store_id
       |  WHERE t.year = ${Queries.Year}
       |  GROUP BY st.store_id, st.store_name, t.quarter
       |),
       |quarter_mapping AS (
       |  SELECT DISTINCT quarter,
       |         LEAD(quarter) OVER (ORDER BY quarter) AS next_quarter
       |  FROM dim_time WHERE year = ${Queries.Year}
       |)
       |SELECT store_id, store_name, quarter, total_revenue, previous_quarter_revenue,
       |       CASE WHEN p_c = 0 THEN NULL
       |            ELSE CAST((CASE WHEN (n >= 0) = (p_c >= 0) THEN 1 ELSE -1 END)
       |                      * ((2 * abs(n) + abs(p_c)) // (2 * abs(p_c))) AS DOUBLE) / 100
       |       END AS revenue_growth_rate
       |FROM (
       |  SELECT rd.store_id, rd.store_name, rd.quarter,
       |         CAST(rd.total_revenue AS DOUBLE) AS total_revenue,
       |         CAST(prev.total_revenue AS DOUBLE) AS previous_quarter_revenue,
       |         CAST((rd.total_revenue - prev.total_revenue) * 100 AS BIGINT) * 10000 AS n,
       |         CAST(prev.total_revenue * 100 AS BIGINT) AS p_c
       |  FROM revenue_data rd
       |  JOIN quarter_mapping qm ON rd.quarter = qm.quarter
       |  JOIN revenue_data prev
       |    ON rd.store_id = prev.store_id AND prev.quarter = qm.next_quarter
       |)
       |ORDER BY store_id, quarter, previous_quarter_revenue""".stripMargin)

  val q03: String = star(
    """SELECT st.store_name, sp.supplier_name, p.product_name,
      |       CAST(CAST(SUM(p.price) AS DECIMAL(18,2)) AS DOUBLE) AS total_sales
      |FROM sales_fact f
      |JOIN dim_store st ON st.store_id = f.store_id
      |JOIN dim_product p ON f.product_id = p.product_id
      |JOIN dim_supplier sp ON sp.supplier_id = f.supplier_id
      |GROUP BY st.store_name, sp.supplier_name, p.product_name
      |ORDER BY st.store_name ASC, sp.supplier_name ASC, p.product_name DESC""".stripMargin)

  private val seasonSql =
    """CASE WHEN t.month IN (3,4,5) THEN 'Spring'
      |     WHEN t.month IN (6,7,8) THEN 'Summer'
      |     WHEN t.month IN (9,10,11) THEN 'Fall'
      |     ELSE 'Winter' END""".stripMargin

  val q04: String = star(
    s"""SELECT p.product_name, $seasonSql AS season,
       |       CAST(CAST(SUM(f.total_revenue) AS DECIMAL(18,2)) AS DOUBLE) AS total_sales
       |FROM sales_fact f
       |JOIN dim_time t ON f.time_id = t.time_id
       |JOIN dim_product p ON f.product_id = p.product_id
       |GROUP BY p.product_name, season
       |ORDER BY p.product_name ASC, season ASC""".stripMargin)

  val q05: String = star(
    """SELECT store_name, supplier_name, year, month,
      |       CAST(total_revenue AS DOUBLE) AS total_revenue,
      |       COALESCE(CAST(total_revenue - prev_rev AS DOUBLE)
      |                / CAST(prev_rev AS DOUBLE) * 100.0, 0.0)
      |         AS revenue_volatility
      |FROM (
      |  SELECT st.store_name, sp.supplier_name, t.year, t.month,
      |         CAST(SUM(f.total_revenue) AS DECIMAL(18,2)) AS total_revenue,
      |         LAG(CAST(SUM(f.total_revenue) AS DECIMAL(18,2))) OVER (
      |           PARTITION BY st.store_name, sp.supplier_name
      |           ORDER BY t.year, t.month
      |         ) AS prev_rev
      |  FROM sales_fact f
      |  JOIN dim_time t ON f.time_id = t.time_id
      |  JOIN dim_store st ON f.store_id = st.store_id
      |  JOIN dim_supplier sp ON f.supplier_id = sp.supplier_id
      |  GROUP BY st.store_name, sp.supplier_name, t.year, t.month
      |)
      |ORDER BY store_name, supplier_name, year, month""".stripMargin)

  /** Literal twin of the reference Q5 (see [[Queries.q05LiteralVolatility]]):
    * same-(year,month) self-join + COALESCE→0 — volatility ≡ 0 by
    * construction. */
  val q05Literal: String = star(
    """, previous_month_revenue AS (
      |  SELECT f.store_id, f.supplier_id, t.year, t.month,
      |         CAST(SUM(f.total_revenue) AS DECIMAL(18,2)) AS prev_month_revenue
      |  FROM sales_fact f
      |  JOIN dim_time t ON f.time_id = t.time_id
      |  WHERE t.year < (SELECT MAX(year) FROM dim_time)
      |     OR (t.year = (SELECT MAX(year) FROM dim_time)
      |         AND t.month < (SELECT MAX(month) FROM dim_time))
      |  GROUP BY f.store_id, f.supplier_id, t.year, t.month
      |)
      |SELECT st.store_name, sup.supplier_name, t.year AS year, t.month AS month,
      |       CAST(CAST(SUM(f.total_revenue) AS DECIMAL(18,2)) AS DOUBLE) AS total_revenue,
      |       COALESCE(
      |         CAST(CAST(SUM(f.total_revenue) AS DECIMAL(18,2))
      |              - MAX(pmr.prev_month_revenue) AS DOUBLE)
      |           / CAST(MAX(pmr.prev_month_revenue) AS DOUBLE) * 100.0,
      |         0.0) AS revenue_volatility
      |FROM sales_fact f
      |JOIN dim_store st ON f.store_id = st.store_id
      |JOIN dim_supplier sup ON f.supplier_id = sup.supplier_id
      |JOIN dim_time t ON f.time_id = t.time_id
      |LEFT JOIN previous_month_revenue pmr
      |  ON f.store_id = pmr.store_id AND f.supplier_id = pmr.supplier_id
      | AND t.year = pmr.year AND t.month = pmr.month
      |GROUP BY st.store_name, sup.supplier_name, t.year, t.month
      |ORDER BY st.store_name, sup.supplier_name, t.year, t.month""".stripMargin)

  val q06: String = star(
    """SELECT p1.product_name AS product_1, p2.product_name AS product_2,
      |       COUNT(*) AS frequency
      |FROM sales_fact a
      |JOIN sales_fact b
      |  ON a.order_id = b.order_id AND a.product_id < b.product_id
      |JOIN dim_product p1 ON a.product_id = p1.product_id
      |JOIN dim_product p2 ON b.product_id = p2.product_id
      |GROUP BY p1.product_name, p2.product_name
      |ORDER BY frequency DESC, product_1 ASC, product_2 ASC
      |LIMIT 5""".stripMargin)

  val q07: String = star(
    """SELECT t.year, f.store_id, f.supplier_id, f.product_id,
      |       CAST(CAST(SUM(f.total_revenue) AS DECIMAL(18,2)) AS DOUBLE) AS total_revenue
      |FROM sales_fact f
      |JOIN dim_time t ON f.time_id = t.time_id
      |GROUP BY ROLLUP (t.year, f.store_id, f.supplier_id, f.product_id)
      |ORDER BY t.year ASC NULLS FIRST, f.store_id ASC NULLS FIRST,
      |         f.supplier_id ASC NULLS FIRST, f.product_id ASC NULLS FIRST""".stripMargin)

  val q08: String = star(
    """SELECT p.product_name, t.year,
      |       CAST(CAST(SUM(CASE WHEN t.month <= 6 THEN f.total_revenue ELSE 0 END) AS DECIMAL(18,2)) AS DOUBLE) AS h1_revenue,
      |       CAST(SUM(CASE WHEN t.month <= 6 THEN f.quantity_ordered ELSE 0 END) AS BIGINT) AS h1_quantity,
      |       CAST(CAST(SUM(CASE WHEN t.month > 6 THEN f.total_revenue ELSE 0 END) AS DECIMAL(18,2)) AS DOUBLE) AS h2_revenue,
      |       CAST(SUM(CASE WHEN t.month > 6 THEN f.quantity_ordered ELSE 0 END) AS BIGINT) AS h2_quantity,
      |       CAST(CAST(SUM(f.total_revenue) AS DECIMAL(18,2)) AS DOUBLE) AS yearly_revenue,
      |       CAST(SUM(f.quantity_ordered) AS BIGINT) AS yearly_quantity
      |FROM sales_fact f
      |JOIN dim_time t ON f.time_id = t.time_id
      |JOIN dim_product p ON f.product_id = p.product_id
      |GROUP BY p.product_name, t.year
      |ORDER BY p.product_name ASC, t.year ASC""".stripMargin)

  val q09: String = star(
    """SELECT product_name, order_date,
      |       CAST(daily_sales AS DOUBLE) AS daily_sales,
      |       CAST(run_sum AS DOUBLE) / run_cnt AS daily_avg_sales,
      |       CASE WHEN daily_sales * run_cnt > run_sum * 2
      |            THEN 'High Revenue Spike (Outlier)' ELSE 'Normal'
      |       END AS sales_status
      |FROM (
      |  SELECT p.product_id, p.product_name, t.order_date,
      |         CAST(SUM(f.total_revenue) AS DECIMAL(18,2)) AS daily_sales,
      |         SUM(CAST(SUM(f.total_revenue) AS DECIMAL(18,2))) OVER (
      |           PARTITION BY p.product_id ORDER BY t.order_date
      |           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      |         ) AS run_sum,
      |         COUNT(*) OVER (
      |           PARTITION BY p.product_id ORDER BY t.order_date
      |           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      |         ) AS run_cnt
      |  FROM sales_fact f
      |  JOIN dim_time t ON f.time_id = t.time_id
      |  JOIN dim_product p ON f.product_id = p.product_id
      |  GROUP BY p.product_id, p.product_name, t.order_date
      |)
      |ORDER BY product_name, order_date, daily_sales, daily_avg_sales, sales_status""".stripMargin)

  val q10: String = star(
    """SELECT f.store_id, st.store_name, t.quarter AS quarter, t.year AS year,
      |       CAST(CAST(SUM(f.total_revenue) AS DECIMAL(18,2)) AS DOUBLE) AS total_quarterly_revenue,
      |       CAST(SUM(f.quantity_ordered) AS BIGINT) AS total_quarterly_quantity
      |FROM sales_fact f
      |JOIN dim_store st ON f.store_id = st.store_id
      |JOIN dim_time t ON f.time_id = t.time_id
      |GROUP BY f.store_id, st.store_name, quarter, year
      |ORDER BY st.store_name ASC, year ASC, quarter ASC""".stripMargin)

  /** Ties rank by product_name DESC — mirroring the engine's bounded
    * top-k aggregate, whose descending struct order cannot invert a
    * string tie-break (see Queries.q12TopPerStore). */
  val q12: String = star(
    """SELECT store_name, CAST(rank AS INT) AS rank, product_name, revenue
      |FROM (
      |  SELECT store_name, product_name, revenue,
      |         ROW_NUMBER() OVER (
      |           PARTITION BY store_name
      |           ORDER BY revenue DESC, product_name DESC
      |         ) AS rank
      |  FROM (
      |    SELECT st.store_name, p.product_name,
      |           CAST(CAST(SUM(f.total_revenue) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
      |    FROM sales_fact f
      |    JOIN dim_store st ON f.store_id = st.store_id
      |    JOIN dim_product p ON f.product_id = p.product_id
      |    GROUP BY st.store_name, p.product_name
      |  )
      |)
      |WHERE rank <= 3
      |ORDER BY store_name, rank""".stripMargin)

  val q11: String = star(
    """SELECT st.store_id, st.store_name,
      |       CAST(CAST(SUM(f.total_revenue) AS DECIMAL(18,2)) AS DOUBLE) AS total_revenue
      |FROM sales_fact f
      |JOIN dim_time t ON f.time_id = t.time_id
      |JOIN dim_store st ON f.store_id = st.store_id
      |WHERE t.year = (SELECT MAX(year) FROM dim_time)
      |  AND t.month = (SELECT MAX(month) FROM dim_time
      |                 WHERE year = (SELECT MAX(year) FROM dim_time))
      |GROUP BY st.store_id, st.store_name
      |ORDER BY st.store_id""".stripMargin)

  /** Q19 twin: the same single wide aggregate. */
  val q19: String = star(
    """SELECT count(DISTINCT order_id) AS n_orders,
      |       count(*) AS n_line_items,
      |       CAST(CAST(SUM(total_revenue) AS DECIMAL(18,2)) AS DOUBLE) AS total_revenue,
      |       CAST(SUM(quantity_ordered) AS BIGINT) AS total_units,
      |       count(DISTINCT store_id) AS n_active_stores,
      |       count(DISTINCT product_id) AS n_products_sold,
      |       CAST(CAST(SUM(total_revenue) AS DECIMAL(18,2)) AS DOUBLE)
      |         / CAST(count(DISTINCT order_id) AS DOUBLE) AS avg_order_revenue
      |FROM sales_fact""".stripMargin)

  /** Q18 twin: the same exact-decimal window sum, doubles only at the
    * division. */
  val q18: String = star(
    """SELECT year, store_id, store_name,
      |       CAST(rev AS DOUBLE) AS total_revenue,
      |       CAST(year_total AS DOUBLE) AS year_total,
      |       CAST(rev AS DOUBLE) / CAST(year_total AS DOUBLE) AS revenue_share
      |FROM (
      |  SELECT year, store_id, store_name, rev,
      |         CAST(SUM(rev) OVER (PARTITION BY year) AS DECIMAL(18,2)) AS year_total
      |  FROM (
      |    SELECT t.year, f.store_id, st.store_name,
      |           CAST(SUM(f.total_revenue) AS DECIMAL(18,2)) AS rev
      |    FROM sales_fact f
      |    JOIN dim_time t ON f.time_id = t.time_id
      |    JOIN dim_store st ON f.store_id = st.store_id
      |    GROUP BY t.year, f.store_id, st.store_name
      |  )
      |)
      |ORDER BY year, store_id""".stripMargin)

  /** Q16 twin: the identical NOT EXISTS (DuckDB decorrelates the same
    * way — a left anti against the weekend product set). */
  val q16: String = star(
    s"""SELECT p.product_id, p.product_name
       |FROM dim_product p
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM sales_fact f
       |  JOIN dim_time t ON f.time_id = t.time_id
       |  WHERE f.product_id = p.product_id
       |    AND t.is_weekend AND t.year = ${Queries.Year}
       |)
       |ORDER BY p.product_id""".stripMargin)

  /** Q17 twin: SQL INTERSECT (distinct semantics on both sides). */
  val q17: String = star(
    s"""SELECT f.product_id
       |FROM sales_fact f JOIN dim_time t ON f.time_id = t.time_id
       |WHERE t.year = ${Queries.Year} AND t.month <= 6
       |INTERSECT
       |SELECT f.product_id
       |FROM sales_fact f JOIN dim_time t ON f.time_id = t.time_id
       |WHERE t.year = ${Queries.Year} AND t.month > 6
       |ORDER BY product_id""".stripMargin)

  /** Q15 rank-family twin: the same two window specs — value-determined
    * ranks over revenue alone, ntile over the total (revenue, store_id)
    * order. percent_rank/cume_dist stay uncast (double in both). */
  val q15: String = star(
    """SELECT year, store_id, store_name,
      |       CAST(rev AS DOUBLE) AS total_revenue,
      |       CAST(rank() OVER w AS INT) AS rnk,
      |       CAST(dense_rank() OVER w AS INT) AS dense_rnk,
      |       percent_rank() OVER w AS pct_rank,
      |       cume_dist() OVER w AS cume,
      |       CAST(ntile(4) OVER wt AS INT) AS quartile
      |FROM (
      |  SELECT t.year, f.store_id, st.store_name,
      |         CAST(SUM(f.total_revenue) AS DECIMAL(18,2)) AS rev
      |  FROM sales_fact f
      |  JOIN dim_time t ON f.time_id = t.time_id
      |  JOIN dim_store st ON f.store_id = st.store_id
      |  GROUP BY t.year, f.store_id, st.store_name
      |)
      |WINDOW w AS (PARTITION BY year ORDER BY rev DESC),
      |       wt AS (PARTITION BY year ORDER BY rev DESC, store_id ASC)
      |ORDER BY year, rnk, store_id""".stripMargin)

  /** Q14 pivot twin: the crosstab as four conditional aggregates — the
    * relational reading of PIVOT, shared by both engines. A quarter with
    * no rows aggregates to NULL on both sides (not 0). */
  val q14: String = star(
    """SELECT st.store_id, st.store_name,
      |       CAST(CAST(SUM(CASE WHEN t.quarter = 1 THEN f.total_revenue END) AS DECIMAL(18,2)) AS DOUBLE) AS q1_revenue,
      |       CAST(CAST(SUM(CASE WHEN t.quarter = 2 THEN f.total_revenue END) AS DECIMAL(18,2)) AS DOUBLE) AS q2_revenue,
      |       CAST(CAST(SUM(CASE WHEN t.quarter = 3 THEN f.total_revenue END) AS DECIMAL(18,2)) AS DOUBLE) AS q3_revenue,
      |       CAST(CAST(SUM(CASE WHEN t.quarter = 4 THEN f.total_revenue END) AS DECIMAL(18,2)) AS DOUBLE) AS q4_revenue
      |FROM sales_fact f
      |JOIN dim_time t ON f.time_id = t.time_id
      |JOIN dim_store st ON f.store_id = st.store_id
      |GROUP BY st.store_id, st.store_name
      |ORDER BY st.store_id""".stripMargin)

  /** Q13 CUBE twin. gid from the null pattern rather than GROUPING():
    * the dimensions are never NULL in data, so a NULL is exactly a
    * subtotal marker — the fold equals Spark's grouping_id() bit vector
    * (year = MSB, the cube column order). */
  val q13: String = star(
    """SELECT t.year, t.quarter, f.store_id,
      |       CAST(4 * (CASE WHEN t.year IS NULL THEN 1 ELSE 0 END)
      |          + 2 * (CASE WHEN t.quarter IS NULL THEN 1 ELSE 0 END)
      |          + (CASE WHEN f.store_id IS NULL THEN 1 ELSE 0 END) AS INT) AS gid,
      |       CAST(CAST(SUM(f.total_revenue) AS DECIMAL(18,2)) AS DOUBLE) AS total_revenue,
      |       CAST(SUM(f.quantity_ordered) AS BIGINT) AS total_quantity
      |FROM sales_fact f
      |JOIN dim_time t ON f.time_id = t.time_id
      |GROUP BY CUBE (t.year, t.quarter, f.store_id)
      |ORDER BY t.year ASC NULLS FIRST, t.quarter ASC NULLS FIRST,
      |         f.store_id ASC NULLS FIRST""".stripMargin)

  /** Q20 twin: the same three explicit grouping sets; `gid` folds the
    * subtotal-NULL pattern exactly as Spark's `grouping_id()` encodes
    * it over (year, store_id, supplier_id) — valid because both key
    * columns are non-null in the data, so NULL ⟺ subtotal. */
  val q20: String = star(
    """SELECT t.year, f.store_id, f.supplier_id,
      |       CAST(2 * (CASE WHEN f.store_id IS NULL THEN 1 ELSE 0 END)
      |          + (CASE WHEN f.supplier_id IS NULL THEN 1 ELSE 0 END) AS INT) AS gid,
      |       CAST(CAST(SUM(f.total_revenue) AS DECIMAL(18,2)) AS DOUBLE) AS total_revenue,
      |       CAST(SUM(f.quantity_ordered) AS BIGINT) AS total_quantity
      |FROM sales_fact f
      |JOIN dim_time t ON f.time_id = t.time_id
      |GROUP BY GROUPING SETS ((t.year, f.store_id), (t.year, f.supplier_id), (t.year))
      |ORDER BY t.year, gid, f.store_id ASC NULLS FIRST,
      |         f.supplier_id ASC NULLS FIRST""".stripMargin)

  /** Q23 twin: the plain global window over the per-product aggregate
    * (ROWS, not the RANGE default — RANGE would group revenue ties);
    * integer-cents sums, one exact-input double division, shared
    * threshold literals. */
  val q23: String = star(
    s""", per_product AS (
       |  SELECT product_id,
       |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
       |  FROM sales_fact GROUP BY product_id
       |),
       |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents FROM per_product),
       |run AS (
       |  SELECT product_id, cents,
       |         CAST(sum(cents) OVER (ORDER BY cents DESC, product_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |           AS running_cents
       |  FROM per_product
       |)
       |SELECT product_id, cents, running_cents, cum_share,
       |       CASE WHEN cum_share <= CAST(${Queries.AbcA} AS DOUBLE) THEN 'A'
       |            WHEN cum_share <= CAST(${Queries.AbcB} AS DOUBLE) THEN 'B'
       |            ELSE 'C' END AS abc_class
       |FROM (
       |  SELECT product_id, cents, running_cents,
       |         CAST(running_cents AS DOUBLE) / CAST(total_cents AS DOUBLE)
       |           AS cum_share
       |  FROM run, tot
       |)
       |ORDER BY cents DESC, product_id""".stripMargin)

  /** Q21 twin: SQL EXCEPT (distinct semantics on both sides). */
  val q21: String = star(
    s"""SELECT f.customer_id
       |FROM sales_fact f JOIN dim_time t ON f.time_id = t.time_id
       |WHERE t.year = ${Queries.Year} AND t.month <= 6
       |EXCEPT
       |SELECT f.customer_id
       |FROM sales_fact f JOIN dim_time t ON f.time_id = t.time_id
       |WHERE t.year = ${Queries.Year} AND t.month > 6
       |ORDER BY customer_id""".stripMargin)

  /** Q22 twin: identical explicit frames via a WINDOW clause; the
    * moving average is exact-decimal frame-sum cast to double over the
    * frame count, never avg() (see [[Queries.q22FrameBounds]]). */
  val q22: String = star(
    """SELECT store_id, year, month,
      |       CAST(monthly_revenue AS DOUBLE) AS monthly_revenue,
      |       CAST(first_value(monthly_revenue) OVER wfull AS DOUBLE) AS first_month_revenue,
      |       CAST(last_value(monthly_revenue) OVER wfull AS DOUBLE) AS last_month_revenue,
      |       CAST(nth_value(monthly_revenue, 2) OVER wfull AS DOUBLE) AS second_month_revenue,
      |       CAST(SUM(monthly_revenue) OVER wtrail AS DOUBLE)
      |         / CAST(COUNT(*) OVER wtrail AS DOUBLE) AS trailing3_avg
      |FROM (
      |  SELECT f.store_id, t.year, t.month,
      |         CAST(SUM(f.total_revenue) AS DECIMAL(18,2)) AS monthly_revenue
      |  FROM sales_fact f
      |  JOIN dim_time t ON f.time_id = t.time_id
      |  GROUP BY f.store_id, t.year, t.month
      |)
      |WINDOW wfull AS (PARTITION BY store_id, year ORDER BY month
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
      |       wtrail AS (PARTITION BY store_id, year ORDER BY month
      |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY store_id, year, month""".stripMargin)

  /** Q27 twin: same exact-count rules, same (lift DESC, confidence
    * DESC, pair ASC) total order. */
  val q27: String = star(
    """, basket AS (SELECT DISTINCT order_id, product_id FROM sales_fact),
      |per_product AS (
      |  SELECT product_id AS p, count(*) AS n_p FROM basket GROUP BY 1
      |),
      |pairs AS (
      |  SELECT a.product_id AS u, b.product_id AS v, count(*) AS n_ab
      |  FROM basket a JOIN basket b
      |    ON a.order_id = b.order_id AND a.product_id < b.product_id
      |  GROUP BY 1, 2 HAVING count(*) >= 2
      |),
      |total AS (SELECT count(DISTINCT order_id) AS n_orders FROM basket),
      |directed AS (
      |  SELECT u AS antecedent, v AS consequent, n_ab FROM pairs
      |  UNION ALL
      |  SELECT v, u, n_ab FROM pairs
      |)
      |SELECT d.antecedent, d.consequent, d.n_ab,
      |       pa.n_p AS n_ante, pc.n_p AS n_cons,
      |       CAST(d.n_ab AS DOUBLE) / CAST(pa.n_p AS DOUBLE) AS confidence,
      |       CAST(d.n_ab * t.n_orders AS DOUBLE)
      |         / CAST(pa.n_p * pc.n_p AS DOUBLE) AS lift
      |FROM directed d
      |JOIN per_product pa ON d.antecedent = pa.p
      |JOIN per_product pc ON d.consequent = pc.p
      |CROSS JOIN total t
      |ORDER BY lift DESC, confidence DESC, antecedent ASC, consequent ASC
      |LIMIT 100""".stripMargin)

  /** Q26 twin: deliberately the DIRECT long aggregate, not a melt of
    * the wide table — the differential then proves unpivot ∘ pivot is
    * the identity on populated cells. */
  val q26: String = star(
    """SELECT st.store_id, st.store_name, t.quarter,
      |       CAST(CAST(SUM(f.total_revenue) AS DECIMAL(18,2)) AS DOUBLE)
      |         AS revenue
      |FROM sales_fact f
      |JOIN dim_time t ON f.time_id = t.time_id
      |JOIN dim_store st ON f.store_id = st.store_id
      |GROUP BY st.store_id, st.store_name, t.quarter
      |ORDER BY st.store_id, t.quarter""".stripMargin)

  /** Q25 twin: `quantile_cont` == Spark `percentile` — linear
    * interpolation over exact integer cents (the madOutliers
    * determinism contract). */
  val q25: String = star(
    """, sub AS (
      |  SELECT store_id, order_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT)
      |           AS order_cents
      |  FROM sales_fact GROUP BY store_id, order_id
      |)
      |SELECT store_id, count(*) AS n_orders,
      |       min(order_cents) AS min_cents,
      |       quantile_cont(order_cents, 0.5) AS p50,
      |       quantile_cont(order_cents, 0.9) AS p90,
      |       quantile_cont(order_cents, 0.99) AS p99,
      |       max(order_cents) AS max_cents
      |FROM sub GROUP BY store_id
      |ORDER BY store_id""".stripMargin)

  /** Q25a twin: the approx-percentile ERROR ENVELOPE. The sketch's
    * values are Spark-internal, so the twin gates the guarantee, not
    * the values: identical spine (store × quantile label), identical
    * target-rank ⌈p·n⌉ and tolerance ⌊n/accuracy⌋+1 arithmetic, and
    * the EXPECTED verdict TRUE — the engine's measured `within_bound`
    * must agree on every row or the hash gate fails. */
  val q25Approx: String = star(
    s""", sub AS (
      |  SELECT store_id, order_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT)
      |           AS order_cents
      |  FROM sales_fact GROUP BY store_id, order_id
      |),
      |g AS (SELECT store_id, CAST(count(*) AS BIGINT) AS n_orders
      |      FROM sub GROUP BY store_id)
      |SELECT g.store_id, q.qlabel, g.n_orders,
      |       CAST(greatest(1, ceil(q.p * g.n_orders)) AS BIGINT) AS target_rank,
      |       CAST(g.n_orders // ${Queries.PercentileAccuracy} + 1 AS BIGINT)
      |         AS tolerance,
      |       TRUE AS within_bound
      |FROM g CROSS JOIN (VALUES
      |    ('p50', CAST(0.5 AS DOUBLE)),
      |    ('p90', CAST(0.9 AS DOUBLE)),
      |    ('p99', CAST(0.99 AS DOUBLE))) q(qlabel, p)
      |ORDER BY store_id, qlabel""".stripMargin)

  /** Q24 twin: Codd's division as the classic double NOT EXISTS — no
    * region without a purchase by this customer. Same divisor (the
    * full region table) as the count-matching plan; a customer with no
    * purchases fails the inner NOT EXISTS for every region, matching
    * the engine side's absence from the fact aggregate. */
  val q24: String = star(
    """SELECT c.customer_id, c.customer_name,
      |       (SELECT CAST(count(*) AS INT) FROM region) AS regions_covered
      |FROM dim_customer c
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM region r
      |  WHERE NOT EXISTS (
      |    SELECT 1
      |    FROM sales_fact f
      |    JOIN nation n ON f.store_id = n.n_nationkey
      |    WHERE f.customer_id = c.customer_id
      |      AND n.n_regionkey = r.r_regionkey))
      |ORDER BY customer_id""".stripMargin)

  /** Q28 twin: the skyline by DEFINITION — the double-condition
    * NOT-EXISTS dominance predicate over the per-product aggregate,
    * deliberately not the engine side's prefix-maxima reduction, so the
    * reduction itself is what the hash comparison checks. Quantities
    * and prices are exact integers on both sides. */
  val q28: String = star(
    """, per_product AS (
      |  SELECT f.product_id,
      |         CAST(p.price * 100 AS BIGINT) AS price_cents,
      |         CAST(sum(f.quantity_ordered) AS BIGINT) AS total_qty
      |  FROM sales_fact f
      |  JOIN dim_product p ON f.product_id = p.product_id
      |  GROUP BY f.product_id, p.price
      |)
      |SELECT a.product_id, a.price_cents, a.total_qty
      |FROM per_product a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM per_product b
      |  WHERE b.price_cents <= a.price_cents AND b.total_qty >= a.total_qty
      |    AND (b.price_cents < a.price_cents OR b.total_qty > a.total_qty))
      |ORDER BY price_cents, product_id""".stripMargin)

  /** Q29 twin: the engine is Apriori-pruned; this twin DELIBERATELY
    * keeps the brute-force triple expansion so the hash gate proves
    * the pruning lossless on real data every round. The basket-size
    * guard (≤ 100 distinct products per order) is semantics, so it IS
    * mirrored. */
  val q29: String = star(
    """, basket0 AS (SELECT DISTINCT order_id, product_id FROM sales_fact),
      |basket AS (
      |  SELECT order_id, product_id FROM basket0
      |  WHERE order_id IN (
      |    SELECT order_id FROM basket0 GROUP BY order_id
      |    HAVING count(*) <= 100)
      |)
      |SELECT a.product_id AS p1, b.product_id AS p2, c.product_id AS p3,
      |       CAST(count(*) AS BIGINT) AS support
      |FROM basket a
      |JOIN basket b ON a.order_id = b.order_id
      |  AND a.product_id < b.product_id
      |JOIN basket c ON b.order_id = c.order_id
      |  AND b.product_id < c.product_id
      |GROUP BY 1, 2, 3
      |HAVING count(*) >= 2
      |ORDER BY support DESC, p1, p2, p3
      |LIMIT 50""".stripMargin)

  /** Q30 twin: same data-derived year pair, zero-filled full outer,
    * exact deltas, bounded rank window. */
  val q30: String = star(
    """, yearly AS (
      |  SELECT CAST(year(time_id) AS INT) AS year, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |ym AS (SELECT max(year) AS ym FROM yearly),
      |cur AS (SELECT store_id, cents AS rev_cur FROM yearly, ym
      |        WHERE year = ym),
      |prev AS (SELECT store_id, cents AS rev_prev FROM yearly, ym
      |         WHERE year = ym - 1),
      |j AS (
      |  SELECT coalesce(cur.store_id, prev.store_id) AS store_id,
      |         coalesce(rev_prev, 0) AS rev_prev_cents,
      |         coalesce(rev_cur, 0) AS rev_cur_cents,
      |         coalesce(rev_cur, 0) - coalesce(rev_prev, 0) AS delta_cents
      |  FROM cur FULL OUTER JOIN prev ON cur.store_id = prev.store_id
      |),
      |tot AS (SELECT CAST(sum(delta_cents) AS BIGINT) AS total_delta FROM j)
      |SELECT CAST(row_number() OVER (ORDER BY abs(delta_cents) DESC, store_id)
      |         AS INT) AS rank,
      |       store_id, rev_prev_cents, rev_cur_cents, delta_cents,
      |       CASE WHEN total_delta = 0 THEN CAST(0 AS DOUBLE)
      |            ELSE CAST(delta_cents AS DOUBLE) / CAST(total_delta AS DOUBLE)
      |       END AS share_of_delta
      |FROM j, tot
      |ORDER BY rank""".stripMargin)
}
