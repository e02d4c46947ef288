package graft.etl

/** DuckDB oracle twins for [[EtlQueries]]. */
object EtlOracleSql {

  private def star(body: String): String = Star.oracleCte + body

  val timeDim: String = star(
    """SELECT * FROM dim_time ORDER BY time_id""")

  // Same week-of-calendar-year arithmetic as TimeDim.weekLiteralCol,
  // spelled with isodow (1=Mon..7=Sun, so isodow-1 = Spark's weekday).
  val timeDimLiteral: String =
    """WITH dates AS (SELECT DISTINCT o_orderdate AS time_id FROM orders),
      |parts AS (
      |  SELECT time_id,
      |         date_trunc('year', time_id) AS jan1,
      |         isodow(date_trunc('year', time_id)) - 1 AS wd
      |  FROM dates
      |)
      |SELECT time_id,
      |       CAST(weekofyear(time_id) AS INT) AS week_iso,
      |       CAST(floor((date_diff('day', jan1, time_id) -
      |                   (CASE WHEN wd <= 3 THEN -wd ELSE 7 - wd END))
      |                  / 7.0) + 1 AS INT) AS week_literal
      |FROM parts
      |ORDER BY time_id""".stripMargin

  // `* REPLACE` (DuckDB star-expression) mirrors Schemas.outputDoubles:
  // exact decimal internally, DOUBLE at the comparison surface.
  val dimProduct: String = star(
    """SELECT * REPLACE (CAST(price AS DOUBLE) AS price)
      |FROM dim_product ORDER BY product_id""".stripMargin)

  val salesFact: String = star(
    """SELECT * REPLACE (CAST(total_revenue AS DOUBLE) AS total_revenue)
      |FROM sales_fact
      |ORDER BY order_id, product_id, supplier_id, quantity_ordered, total_revenue""".stripMargin)

  val upsertAntiJoin: String =
    """WITH incoming AS (
      |  SELECT c_custkey AS customer_id, c_name AS customer_name,
      |         c_mktsegment AS gender,
      |         ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY c_name)
      |           AS rn
      |  FROM customer
      |),
      |deduped AS (
      |  SELECT customer_id, customer_name, gender FROM incoming WHERE rn = 1
      |)
      |SELECT d.customer_id, d.customer_name, d.gender
      |FROM deduped d
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM customer e
      |  WHERE e.c_custkey < 750 AND e.c_custkey = d.customer_id
      |)
      |ORDER BY customer_id""".stripMargin

  val factDedupPerOrder: String =
    """WITH ranked AS (
      |  SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
      |         ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_quantity)
      |           AS rn
      |  FROM lineitem
      |)
      |SELECT l_orderkey AS order_id, l_partkey AS product_id,
      |       CAST(l_quantity AS INT) AS quantity_ordered
      |FROM ranked WHERE rn = 1
      |ORDER BY order_id""".stripMargin

  val dedupEvents: String =
    """WITH ranked AS (
      |  SELECT event_id, ts, user_id, event_type,
      |         ROW_NUMBER() OVER (
      |           PARTITION BY user_id, event_type ORDER BY ts, event_id
      |         ) AS rn
      |  FROM events
      |)
      |SELECT event_id, ts, user_id, event_type
      |FROM ranked WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  /** Exactly-once replay twin: the PLAIN daily aggregate — the engine
    * side reaches it through month-batched overwrite commits plus one
    * deliberately redelivered batch, so hash equality here IS the
    * exactly-once proof. */
  val txDailyReplay: String =
    """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
      |       COUNT(*) AS n_events
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY day, event_type""".stripMargin

  /** Streamed metadata-count twin: the engine replays week-sliced
    * exactly-once loads (one redelivered) and answers the two-week
    * count from manifest credit + boundary scans; the oracle counts
    * the daily aggregate's rows declaratively. */
  val txCountReplay: String =
    """WITH daily AS (
      |  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT count(*) AS n FROM daily
      |WHERE day >= '2024-01-08' AND day <= '2024-01-21'""".stripMargin

  val eventsHourly: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |       COUNT(*) AS n_events,
      |       CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE)
      |         AS total_value
      |FROM events
      |GROUP BY date_trunc('hour', ts), event_type
      |ORDER BY window_start, event_type""".stripMargin

  /** Incremental-maintenance twin: deliberately the FULL RECOMPUTE (the
    * same SQL as [[eventsHourly]]) — the engine side merges stored
    * partials with a delta, and the differential pins maintained ≡
    * recomputed. */
  val incrementalHourly: String = eventsHourly

  /** SCD2 twin: set logic spelled out — changed = null-safe attr diff
    * against the open version; history = closed-out old rows ∪ untouched
    * opens ∪ new versions. */
  val scd2Customer: String =
    """WITH cur AS (
      |  SELECT c_custkey AS customer_id, c_name AS customer_name FROM customer
      |),
      |upd AS (
      |  SELECT customer_id,
      |    CASE WHEN customer_id % 10 = 0 THEN customer_name || ' (moved)'
      |         ELSE customer_name END AS customer_name
      |  FROM cur WHERE customer_id % 5 = 0
      |),
      |chg AS (
      |  SELECT u.customer_id, u.customer_name
      |  FROM upd u JOIN cur c ON u.customer_id = c.customer_id
      |  WHERE u.customer_name IS DISTINCT FROM c.customer_name
      |)
      |SELECT c.customer_id, c.customer_name,
      |  TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
      |  CASE WHEN ch.customer_id IS NOT NULL
      |       THEN TIMESTAMP '2024-06-01 00:00:00' END AS valid_to,
      |  ch.customer_id IS NULL AS is_current
      |FROM cur c LEFT JOIN chg ch ON c.customer_id = ch.customer_id
      |UNION ALL
      |SELECT customer_id, customer_name, TIMESTAMP '2024-06-01 00:00:00',
      |  CAST(NULL AS TIMESTAMP), TRUE
      |FROM chg
      |ORDER BY customer_id, valid_from""".stripMargin

  /** Seasonal-HHI twin: identical twice-floored quantized shares and
    * the rn=1 peak pick. */
  val seasonalHhi: String = star(
    """, monthly AS (
      |  SELECT store_id, CAST(month(time_id) AS INT) AS month,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT)
      |           AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |tot AS (SELECT store_id, CAST(sum(cents) AS BIGINT) AS total_cents
      |        FROM monthly GROUP BY store_id),
      |shares AS (
      |  SELECT m.store_id, m.month, m.cents, t.total_cents,
      |         (1000000 * m.cents) // t.total_cents AS share_ppm
      |  FROM monthly m JOIN tot t USING (store_id)
      |),
      |agg AS (
      |  SELECT store_id, count(*) AS n_months,
      |    CAST(max(total_cents) AS BIGINT) AS total_cents,
      |    CAST(sum(share_ppm * share_ppm) AS BIGINT) // 1000000 AS hhi_ppm
      |  FROM shares GROUP BY store_id
      |),
      |peak AS (
      |  SELECT store_id, month AS peak_month, cents AS peak_cents
      |  FROM monthly
      |  QUALIFY row_number() OVER (PARTITION BY store_id
      |    ORDER BY cents DESC, month ASC) = 1
      |)
      |SELECT a.store_id, a.n_months, a.total_cents, a.hhi_ppm,
      |  p.peak_month, p.peak_cents
      |FROM agg a JOIN peak p ON a.store_id = p.store_id
      |ORDER BY a.store_id""".stripMargin)

  /** Outage twin: per-type distinct active minutes, spine via
    * generate_series, anti-join, minute islanding, threshold. */
  val outageWindows: String =
    s"""WITH minutes AS (
       |  SELECT DISTINCT event_type,
       |    date_diff('minute', TIMESTAMP '1970-01-01 00:00:00', ts) AS m
       |  FROM events
       |),
       |spine AS (
       |  SELECT event_type, CAST(g AS BIGINT) AS m
       |  FROM (SELECT event_type, min(m) AS m0, max(m) AS m1
       |        FROM minutes GROUP BY event_type),
       |       LATERAL (SELECT unnest(generate_series(m0, m1)) AS g)
       |),
       |dark AS (
       |  SELECT s.event_type, s.m FROM spine s
       |  LEFT JOIN minutes x ON s.event_type = x.event_type AND s.m = x.m
       |  WHERE x.m IS NULL
       |),
       |isl AS (
       |  SELECT event_type, m,
       |    m - row_number() OVER (PARTITION BY event_type ORDER BY m) AS grp
       |  FROM dark
       |)
       |SELECT event_type,
       |  make_timestamp(min(m) * 60 * 1000000) AS outage_start,
       |  make_timestamp((max(m) + 1) * 60 * 1000000) AS outage_end,
       |  CAST(count(*) AS BIGINT) AS n_minutes
       |FROM isl
       |GROUP BY event_type, grp
       |HAVING count(*) >= ${EtlQueries.OutageMinMinutes}
       |ORDER BY event_type, outage_start""".stripMargin

  /** Lead-time-drift twin: the shared bucket rule, zero-filled fixed
    * domain, identical cross-multiplied TV. */
  val leadtimeDrift: String = {
    val domain = EtlQueries.LeadBucketDomain
      .map(b => s"('$b')").mkString(", ")
    s"""WITH base AS (
       |  SELECT s.s_nationkey AS store_id,
       |         CAST(year(o.o_orderdate) AS INT) AS year,
       |         date_diff('day', CAST(o.o_orderdate AS DATE),
       |                   CAST(l.l_shipdate AS DATE)) AS lead_days
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |),
       |cell AS (
       |  SELECT store_id, year, ${EtlQueries.LeadBucketExpr} AS bucket,
       |         CAST(count(*) AS BIGINT) AS cnt
       |  FROM base GROUP BY 1, 2, 3
       |),
       |tot AS (SELECT store_id, year, CAST(sum(cnt) AS BIGINT) AS n
       |        FROM cell GROUP BY 1, 2),
       |dom(bucket) AS (VALUES $domain),
       |grid AS (
       |  SELECT t.store_id, t.year, d.bucket, t.n,
       |         coalesce(c.cnt, 0) AS cnt
       |  FROM tot t CROSS JOIN dom d
       |  LEFT JOIN cell c ON c.store_id = t.store_id
       |    AND c.year = t.year AND c.bucket = d.bucket
       |)
       |SELECT a.store_id, a.year AS year_from,
       |  a.n AS n_from, b.n AS n_to,
       |  (1000000 * CAST(sum(abs(a.cnt * b.n - b.cnt * a.n)) AS BIGINT))
       |    // (2 * a.n * b.n) AS tv_ppm
       |FROM grid a
       |JOIN grid b ON a.store_id = b.store_id AND a.year + 1 = b.year
       |  AND a.bucket = b.bucket
       |GROUP BY a.store_id, a.year, a.n, b.n
       |ORDER BY a.store_id, year_from""".stripMargin
  }

  /** SCD2-audit twin: the history twin as a subquery under the same
    * lead-window chain checks. */
  val scd2Audit: String =
    s"""WITH hist AS (
       |$scd2Customer
       |),
       |walked AS (
       |  SELECT customer_id, valid_from, valid_to, is_current,
       |    lead(valid_from) OVER (PARTITION BY customer_id
       |      ORDER BY valid_from) AS nxt_from
       |  FROM hist
       |)
       |SELECT customer_id, CAST(count(*) AS BIGINT) AS n_versions,
       |  CAST(sum(CASE WHEN is_current THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_current,
       |  CAST(sum(CASE WHEN nxt_from IS NOT NULL AND valid_to IS NOT NULL
       |       AND valid_to < nxt_from THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
       |  CAST(sum(CASE WHEN nxt_from IS NOT NULL AND valid_to IS NOT NULL
       |       AND valid_to > nxt_from THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_overlaps,
       |  CAST(sum(CASE WHEN nxt_from IS NOT NULL AND valid_to IS NULL
       |       THEN 1 ELSE 0 END) AS BIGINT) AS n_dangling,
       |  sum(CASE WHEN is_current THEN 1 ELSE 0 END) = 1
       |    AND sum(CASE WHEN nxt_from IS NOT NULL AND valid_to IS NOT NULL
       |            AND valid_to < nxt_from THEN 1 ELSE 0 END) = 0
       |    AND sum(CASE WHEN nxt_from IS NOT NULL AND valid_to IS NOT NULL
       |            AND valid_to > nxt_from THEN 1 ELSE 0 END) = 0
       |    AND sum(CASE WHEN nxt_from IS NOT NULL AND valid_to IS NULL
       |            THEN 1 ELSE 0 END) = 0 AS chain_ok
       |FROM walked
       |GROUP BY customer_id
       |ORDER BY customer_id""".stripMargin

  /** Salted-join twin: the PLAIN equi-join — hash equality against the
    * engine's salted plan is the semantics-preservation theorem. */
  val saltedJoinCounts: String =
    """SELECT c.c_mktsegment AS segment, e.event_type,
      |       CAST(count(*) AS BIGINT) AS n_events
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Point-in-time twin: the same history fixture at the 1996/1998
    * dates, left-joined with the half-open interval predicate — each
    * order binds at most one version; pre-history orders keep NULLs. */
  val scd2PointInTime: String =
    """WITH cur AS (
      |  SELECT c_custkey AS customer_id, c_name AS customer_name FROM customer
      |),
      |chg AS (
      |  SELECT customer_id, customer_name || ' (moved)' AS customer_name
      |  FROM cur WHERE customer_id % 10 = 0
      |),
      |hist AS (
      |  SELECT c.customer_id, c.customer_name,
      |    TIMESTAMP '1996-01-01 00:00:00' AS valid_from,
      |    CASE WHEN ch.customer_id IS NOT NULL
      |         THEN TIMESTAMP '1998-06-01 00:00:00' END AS valid_to
      |  FROM cur c LEFT JOIN chg ch ON c.customer_id = ch.customer_id
      |  UNION ALL
      |  SELECT customer_id, customer_name, TIMESTAMP '1998-06-01 00:00:00',
      |    CAST(NULL AS TIMESTAMP)
      |  FROM chg
      |)
      |SELECT o.o_orderkey AS order_id, o.o_custkey AS customer_id,
      |       o.o_orderdate AS order_ts, h.customer_name, h.valid_from
      |FROM orders o LEFT JOIN hist h ON h.customer_id = o.o_custkey
      |  AND h.valid_from <= o.o_orderdate
      |  AND (h.valid_to IS NULL OR o.o_orderdate < h.valid_to)
      |ORDER BY order_id""".stripMargin

  /** Profile twin: per-column metric rows (UNION ALL — readability
    * over the engine's single wide aggregate; semantics match). */
  val factProfile: String = {
    val cols = Seq("customer_id", "order_id", "product_id",
      "quantity_ordered", "store_id", "supplier_id", "total_revenue")
    star(cols.map { c =>
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |       CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_nulls,
         |       count(DISTINCT $c) AS n_distinct
         |FROM sales_fact""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name"))
  }

  /** Streak twin: the same day − row_number island key; best streak per
    * product via the (len DESC, start ASC) rank the Spark struct-max
    * encodes. */
  val salesStreaks: String = star(
    """, pd AS (
      |  SELECT DISTINCT product_id,
      |         CAST(time_id AS DATE) - DATE '1970-01-01' AS day
      |  FROM sales_fact
      |),
      |rn AS (
      |  SELECT product_id, day,
      |         row_number() OVER (PARTITION BY product_id ORDER BY day) AS rn
      |  FROM pd
      |),
      |isl AS (
      |  SELECT product_id, count(*) AS len, min(day) AS start
      |  FROM rn GROUP BY product_id, day - rn
      |),
      |best AS (
      |  SELECT product_id, len, start,
      |         row_number() OVER (PARTITION BY product_id
      |                            ORDER BY len DESC, start ASC) AS r
      |  FROM isl
      |)
      |SELECT product_id, CAST(len AS INT) AS streak_days,
      |       CAST(DATE '1970-01-01' + CAST(start AS INT) AS TIMESTAMP) AS streak_start
      |FROM best WHERE r = 1
      |ORDER BY streak_days DESC, product_id
      |LIMIT 100""".stripMargin)

  /** Jaro-Winkler twin: DuckDB's native `jaro_winkler_similarity` IS
    * the pinned contract the engine's codegen expression replicates —
    * the rank's (jw DESC, match_id ASC) mirrors the struct-max. */
  val jwBestMatch: String = star(
    """, blocked AS (
      |  SELECT customer_id, customer_name,
      |         substr(customer_name, 1, 16) AS blk
      |  FROM dim_customer
      |),
      |pairs AS (
      |  SELECT a.customer_id, b.customer_id AS match_id,
      |         jaro_winkler_similarity(a.customer_name, b.customer_name) AS jw
      |  FROM blocked a JOIN blocked b
      |    ON a.blk = b.blk AND a.customer_id <> b.customer_id
      |),
      |r AS (
      |  SELECT customer_id, match_id, jw,
      |         row_number() OVER (PARTITION BY customer_id
      |                            ORDER BY jw DESC, match_id ASC) AS rn
      |  FROM pairs
      |)
      |SELECT customer_id, match_id AS best_match_id, jw
      |FROM r WHERE rn = 1
      |ORDER BY customer_id""".stripMargin)

  /** Churn twin: the same shifted full-outer classification and
    * double-spine restriction. */
  val assortmentChurn: String = star(
    """, pres AS (
      |  SELECT DISTINCT store_id, product_id,
      |         CAST(year(time_id) AS INT) * 4 +
      |           (CAST(quarter(time_id) AS INT) - 1) AS qi
      |  FROM sales_fact
      |),
      |spine AS (SELECT DISTINCT qi FROM pres),
      |j AS (
      |  SELECT COALESCE(c.store_id, p.store_id) AS store_id,
      |         COALESCE(c.qi, p.qi + 1) AS qi,
      |         c.qi IS NOT NULL AS in_cur,
      |         p.qi IS NOT NULL AS in_prev
      |  FROM pres c
      |  FULL OUTER JOIN pres p
      |    ON c.store_id = p.store_id AND c.product_id = p.product_id
      |   AND c.qi = p.qi + 1
      |),
      |churn AS (
      |  SELECT store_id, qi,
      |         CAST(sum(CASE WHEN in_cur AND NOT in_prev THEN 1 ELSE 0 END)
      |           AS BIGINT) AS n_added,
      |         CAST(sum(CASE WHEN NOT in_cur AND in_prev THEN 1 ELSE 0 END)
      |           AS BIGINT) AS n_dropped,
      |         CAST(sum(CASE WHEN in_cur AND in_prev THEN 1 ELSE 0 END)
      |           AS BIGINT) AS n_kept
      |  FROM j GROUP BY store_id, qi
      |)
      |SELECT store_id,
      |       CAST(qi // 4 AS INT) AS year,
      |       CAST(qi % 4 + 1 AS INT) AS quarter,
      |       n_added, n_dropped, n_kept
      |FROM churn
      |WHERE qi IN (SELECT qi FROM spine)
      |  AND qi - 1 IN (SELECT qi FROM spine)
      |ORDER BY store_id, year, quarter""".stripMargin)

  /** Rolling-median twin: same 3-window contribution explode and
    * `quantile_cont` median, real-month restriction via IN. */
  val rollingMedian: String = star(
    """, monthly AS (
      |  SELECT store_id,
      |         CAST(year(time_id) AS INT) * 12 +
      |           CAST(month(time_id) AS INT) AS x,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS y
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |contrib AS (
      |  SELECT store_id, x + i AS wx, y
      |  FROM monthly CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS i)
      |),
      |med AS (
      |  SELECT store_id, wx, CAST(count(*) AS INT) AS n_in_window,
      |         quantile_cont(y, 0.5) AS rolling_median_cents
      |  FROM contrib GROUP BY store_id, wx
      |)
      |SELECT m.store_id,
      |       CAST((m.wx - 1) // 12 AS INT) AS year,
      |       CAST((m.wx - 1) % 12 + 1 AS INT) AS month,
      |       m.n_in_window, m.rolling_median_cents
      |FROM med m
      |WHERE EXISTS (SELECT 1 FROM monthly o
      |              WHERE o.store_id = m.store_id AND o.x = m.wx)
      |ORDER BY m.store_id, year, month""".stripMargin)

  /** Correlation twin: same exact-bigint sums and the same factored
    * num / (sqrt·sqrt) spelling — never DuckDB's `corr()`. */
  val storeCorrelation: String = star(
    """, monthly AS (
      |  SELECT store_id,
      |         CAST(year(time_id) AS INT) * 12 +
      |           CAST(month(time_id) AS INT) AS m,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) // 100
      |           AS BIGINT) AS y
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |sums AS (
      |  SELECT a.store_id AS store_a, b.store_id AS store_b,
      |         count(*) AS n_months,
      |         CAST(sum(a.y) AS BIGINT) AS sx,
      |         CAST(sum(b.y) AS BIGINT) AS sy,
      |         CAST(sum(a.y * a.y) AS BIGINT) AS sxx,
      |         CAST(sum(b.y * b.y) AS BIGINT) AS syy,
      |         CAST(sum(a.y * b.y) AS BIGINT) AS sxy
      |  FROM monthly a JOIN monthly b
      |    ON a.m = b.m AND a.store_id < b.store_id
      |  GROUP BY 1, 2
      |)
      |SELECT store_a, store_b, n_months,
      |       CAST(n_months * sxy - sx * sy AS DOUBLE)
      |         / (sqrt(CAST(n_months * sxx - sx * sx AS DOUBLE))
      |            * sqrt(CAST(n_months * syy - sy * sy AS DOUBLE))) AS corr_r
      |FROM sums
      |ORDER BY store_a, store_b""".stripMargin)

  /** ACF twin: the same lag-offset self-join and the same
    * integer-exact sums; the single float division reproduces
    * bit-for-bit (identical IEEE ops in the same order). */
  val acfRevenue: String = star(
    """, monthly AS (
      |  SELECT store_id,
      |         CAST(year(time_id) AS INT) * 12 +
      |           CAST(month(time_id) AS INT) AS m,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) // 100
      |           AS BIGINT) AS y
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |lags AS (SELECT * FROM (VALUES (1), (2), (3)) AS t(lag)),
      |sums AS (
      |  SELECT a.store_id AS store_id, l.lag AS lag,
      |         count(*) AS n_pairs,
      |         CAST(sum(a.y) AS HUGEINT) AS sx,
      |         CAST(sum(b.y) AS HUGEINT) AS sy,
      |         CAST(sum(CAST(a.y AS HUGEINT) * CAST(a.y AS HUGEINT))
      |           AS HUGEINT) AS sxx,
      |         CAST(sum(CAST(b.y AS HUGEINT) * CAST(b.y AS HUGEINT))
      |           AS HUGEINT) AS syy,
      |         CAST(sum(CAST(a.y AS HUGEINT) * CAST(b.y AS HUGEINT))
      |           AS HUGEINT) AS sxy
      |  FROM monthly a CROSS JOIN lags l
      |    JOIN monthly b
      |    ON a.store_id = b.store_id AND b.m = a.m + l.lag
      |  GROUP BY 1, 2
      |)
      |SELECT store_id, lag, n_pairs,
      |       CAST(CAST(n_pairs AS HUGEINT) * sxy - sx * sy AS DOUBLE)
      |         / (sqrt(CAST(CAST(n_pairs AS HUGEINT) * sxx - sx * sx AS DOUBLE))
      |            * sqrt(CAST(CAST(n_pairs AS HUGEINT) * syy - sy * sy
      |                        AS DOUBLE))) AS acf_r
      |FROM sums
      |ORDER BY store_id, lag""".stripMargin)

  /** Benford twin: same string-extracted digit and the SAME nine
    * literal expected shares (no engine evaluates a log). */
  val benfordAudit: String = star(
    s""", by_digit AS (
       |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
       |         count(*) AS n
       |  FROM (SELECT CAST(total_revenue * 100 AS BIGINT) AS cents
       |        FROM sales_fact)
       |  WHERE cents > 0
       |  GROUP BY 1
       |),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM by_digit)
       |SELECT digit, n,
       |       CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE) AS observed_share,
       |       ${EtlQueries.BenfordShareSql.replace("\n", " ")} AS benford_share,
       |       (CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE)) /
       |         (${EtlQueries.BenfordShareSql.replace("\n", " ")}) AS ratio
       |FROM by_digit, tot
       |ORDER BY digit""".stripMargin)

  /** Returns twin: identical floor-cents integerization and
    * conditional sums. */
  val returnRates: String =
    """SELECT s.s_nationkey AS store_id,
      |       CAST(sum(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT)
      |         AS qty_total,
      |       CAST(sum(CASE WHEN l.l_returnflag = 'R'
      |                THEN CAST(floor(l.l_quantity) AS BIGINT)
      |                ELSE 0 END) AS BIGINT) AS qty_returned,
      |       CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
      |         AS BIGINT) AS cents_total,
      |       CAST(sum(CASE WHEN l.l_returnflag = 'R'
      |                THEN CAST(floor(l.l_extendedprice * 100) AS BIGINT)
      |                ELSE 0 END) AS BIGINT) AS cents_returned,
      |       CAST(sum(CASE WHEN l.l_returnflag = 'R'
      |                THEN CAST(floor(l.l_quantity) AS BIGINT) ELSE 0 END)
      |          AS DOUBLE)
      |         / CAST(sum(CAST(floor(l.l_quantity) AS BIGINT)) AS DOUBLE)
      |         AS qty_return_rate,
      |       CAST(sum(CASE WHEN l.l_returnflag = 'R'
      |                THEN CAST(floor(l.l_extendedprice * 100) AS BIGINT)
      |                ELSE 0 END) AS DOUBLE)
      |         / CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
      |             AS DOUBLE) AS revenue_return_rate
      |FROM lineitem l
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |GROUP BY s.s_nationkey
      |ORDER BY store_id""".stripMargin

  /** Theil-Sen twin: same pairwise slopes, `quantile_cont` median. */
  val theilSenSlope: String = star(
    """, monthly AS (
      |  SELECT store_id,
      |         CAST(year(time_id) AS INT) * 12 +
      |           CAST(month(time_id) AS INT) AS x,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS y
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |slopes AS (
      |  SELECT a.store_id,
      |         CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
      |  FROM monthly a JOIN monthly b
      |    ON a.store_id = b.store_id AND a.x < b.x
      |)
      |SELECT store_id, count(*) AS n_pairs,
      |       quantile_cont(slope, 0.5) AS theil_sen_slope
      |FROM slopes GROUP BY store_id
      |ORDER BY store_id""".stripMargin)

  /** RFM twin: identical total-ordered ntiles and the same corpus-max
    * recency anchor. */
  val rfmSegments: String = star(
    """, per_cust AS (
      |  SELECT customer_id,
      |         max(CAST(time_id AS DATE)) AS last_day,
      |         count(DISTINCT order_id) AS frequency,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT)
      |           AS monetary_cents
      |  FROM sales_fact GROUP BY customer_id
      |),
      |anchor AS (SELECT max(CAST(time_id AS DATE)) AS anchor_day FROM sales_fact),
      |scored AS (
      |  SELECT p.customer_id,
      |         CAST(date_diff('day', p.last_day, a.anchor_day) AS INT)
      |           AS recency_days,
      |         p.frequency, p.monetary_cents
      |  FROM per_cust p, anchor a
      |),
      |q AS (
      |  SELECT *,
      |    CAST(ntile(4) OVER (ORDER BY recency_days, customer_id) AS INT)
      |      AS r_quartile,
      |    CAST(ntile(4) OVER (ORDER BY frequency, customer_id) AS INT)
      |      AS f_quartile,
      |    CAST(ntile(4) OVER (ORDER BY monetary_cents, customer_id) AS INT)
      |      AS m_quartile
      |  FROM scored
      |)
      |SELECT customer_id, recency_days, frequency, monetary_cents,
      |       r_quartile, f_quartile, m_quartile,
      |       CAST(r_quartile AS VARCHAR) || CAST(f_quartile AS VARCHAR) ||
      |         CAST(m_quartile AS VARCHAR) AS segment
      |FROM q
      |ORDER BY customer_id""".stripMargin)

  /** Trend twin: the same exact-bigint OLS sums — never `regr_slope`,
    * whose double accumulation would not be bit-identical. */
  val trendSlope: String = star(
    """, monthly AS (
      |  SELECT store_id,
      |         CAST(year(time_id) AS INT) * 12 +
      |           CAST(month(time_id) AS INT) AS x,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS y
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |sums AS (
      |  SELECT store_id, count(*) AS n,
      |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |         CAST(sum(x * x) AS BIGINT) AS sxx,
      |         CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM monthly GROUP BY store_id
      |)
      |SELECT store_id, n,
      |       CAST(n * sxy - sx * sy AS DOUBLE)
      |         / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents_per_month
      |FROM sums
      |ORDER BY store_id""".stripMargin)

  /** Assortment-overlap twin: same co-membership join and
    * inclusion-exclusion union. */
  val storeOverlap: String = star(
    """, sp AS (SELECT DISTINCT store_id, product_id FROM sales_fact),
      |sizes AS (SELECT store_id, count(*) AS n FROM sp GROUP BY store_id),
      |inter AS (
      |  SELECT a.store_id AS store_a, b.store_id AS store_b,
      |         count(*) AS n_common
      |  FROM sp a JOIN sp b
      |    ON a.product_id = b.product_id AND a.store_id < b.store_id
      |  GROUP BY 1, 2
      |)
      |SELECT i.store_a, i.store_b, sa.n AS n_a, sb.n AS n_b, i.n_common,
      |       CAST(i.n_common AS DOUBLE)
      |         / CAST(sa.n + sb.n - i.n_common AS DOUBLE) AS jaccard
      |FROM inter i
      |JOIN sizes sa ON i.store_a = sa.store_id
      |JOIN sizes sb ON i.store_b = sb.store_id
      |ORDER BY i.store_a, i.store_b""".stripMargin)

  /** Backtest twin: the same strict year−1 join (never a
    * present-years lag) and integer-cents error sums. */
  val forecastBacktest: String = star(
    """, monthly AS (
      |  SELECT store_id, CAST(year(time_id) AS INT) AS year,
      |         CAST(month(time_id) AS INT) AS month,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT)
      |           AS cents
      |  FROM sales_fact GROUP BY 1, 2, 3
      |),
      |scored AS (
      |  SELECT a.store_id, a.cents AS actual, f.cents AS forecast
      |  FROM monthly a JOIN monthly f
      |    ON a.store_id = f.store_id AND a.month = f.month
      |   AND a.year = f.year + 1
      |)
      |SELECT store_id, count(*) AS n_months,
      |       CAST(sum(abs(actual - forecast)) AS BIGINT) AS abs_err_cents,
      |       CAST(sum(actual) AS BIGINT) AS actual_cents,
      |       CAST(sum(abs(actual - forecast)) AS DOUBLE)
      |         / CAST(sum(actual) AS DOUBLE) AS wape,
      |       CAST(sum(actual - forecast) AS DOUBLE)
      |         / CAST(sum(actual) AS DOUBLE) AS bias
      |FROM scored
      |GROUP BY store_id
      |ORDER BY store_id""".stripMargin)

  /** JSON-extraction twin: `json_extract_string` == Spark
    * `get_json_object` for scalar paths; both engines cast the string
    * to INT and count parse failures as NULLs. */
  val eventProps: String =
    """SELECT event_type,
      |       count(*) AS n_events,
      |       count(k) AS n_parsed,
      |       min(k) AS min_k,
      |       max(k) AS max_k,
      |       CAST(sum(k) AS BIGINT) AS sum_k
      |FROM (SELECT event_type,
      |             CAST(json_extract_string(props, '$.k') AS INT) AS k
      |      FROM events)
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Hopping-window twin: the epoch-aligned 15-minute grid stated
    * explicitly — each event joined to its 4 covering window starts
    * (floor-to-grid minus 0..3 slides). */
  val eventsSliding: String =
    """WITH ex AS (
      |  SELECT make_timestamp(
      |           (((epoch_us(ts) // 1000000) // 900) * 900 - i * 900)
      |             * 1000000) AS window_start,
      |         event_type, value
      |  FROM events
      |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i)
      |)
      |SELECT window_start, event_type, count(*) AS n_events,
      |       CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2))
      |         AS DOUBLE) AS total_value
      |FROM ex
      |GROUP BY window_start, event_type
      |ORDER BY window_start, event_type""".stripMargin

  /** Cumulative-reach twin: the same first-occurrence reduction (the
    * oracle could spell COUNT(DISTINCT) over a growing frame, but
    * DuckDB's distinct-window and a running sum of firsts are the same
    * number — the reduction is the semantics, so both engines state
    * it). */
  val cumulativeReach: String = star(
    """, f AS (
      |  SELECT store_id, customer_id,
      |         CAST(year(time_id) AS INT) AS year,
      |         CAST(month(time_id) AS INT) AS month,
      |         CAST(year(time_id) AS INT) * 12 +
      |           CAST(month(time_id) AS INT) AS ym
      |  FROM sales_fact
      |),
      |active AS (
      |  SELECT store_id, year, month, ym, count(*) AS active_customers
      |  FROM (SELECT DISTINCT store_id, customer_id, year, month, ym FROM f)
      |  GROUP BY 1, 2, 3, 4
      |),
      |firsts AS (
      |  SELECT store_id, customer_id, min(ym) AS ym
      |  FROM f GROUP BY 1, 2
      |),
      |news AS (
      |  SELECT store_id, ym, count(*) AS new_customers
      |  FROM firsts GROUP BY 1, 2
      |)
      |SELECT a.store_id, a.year, a.month, a.active_customers,
      |       COALESCE(n.new_customers, 0) AS new_customers,
      |       CAST(SUM(COALESCE(n.new_customers, 0)) OVER (
      |         PARTITION BY a.store_id ORDER BY a.ym
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS BIGINT) AS cumulative_customers
      |FROM active a
      |LEFT JOIN news n ON a.store_id = n.store_id AND a.ym = n.ym
      |ORDER BY a.store_id, a.year, a.month""".stripMargin)

  /** Attribution twin: the trailing-window pairing as the PLAIN
    * inequality join — the engine's bucket equi-join must be invisible
    * in the result. Identical integer-cents split (`//` matches Spark's
    * `div` on these non-negative values). */
  val touchAttribution: String =
    """WITH conv AS (
      |  SELECT event_id AS conv_id, user_id, ts AS conv_ts,
      |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS conv_cents
      |  FROM events WHERE event_type = 'purchase'
      |),
      |touch AS (
      |  SELECT event_id AS touch_id, user_id, ts AS touch_ts,
      |         event_type AS touch_type
      |  FROM events WHERE event_type IN ('click', 'view')
      |),
      |pairs AS (
      |  SELECT c.conv_id, c.conv_cents, t.touch_id, t.touch_type, t.touch_ts
      |  FROM conv c JOIN touch t
      |    ON c.user_id = t.user_id
      |   AND t.touch_ts <= c.conv_ts
      |   AND t.touch_ts > c.conv_ts - INTERVAL 7 DAY
      |),
      |rk AS (
      |  SELECT *,
      |         row_number() OVER (PARTITION BY conv_id
      |                            ORDER BY touch_ts DESC, touch_id DESC) AS r,
      |         count(*) OVER (PARTITION BY conv_id) AS n
      |  FROM pairs
      |)
      |SELECT conv_id, touch_id, touch_type, CAST(n AS INT) AS n_touches,
      |       CAST(conv_cents // n +
      |            CASE WHEN r = 1 THEN conv_cents % n ELSE 0 END
      |         AS BIGINT) AS attributed_cents,
      |       r = n AS is_first_touch,
      |       r = 1 AS is_last_touch
      |FROM rk
      |ORDER BY conv_id, touch_id""".stripMargin

  /** Peak-concurrency twin: identical +1/−1 delta sweep and
    * (open DESC, day ASC) peak pick. */
  val peakOpenOrders: String = star(
    """, iv AS (
      |  SELECT s.s_nationkey AS store_id,
      |         least(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01',
      |               CAST(l.l_shipdate AS DATE) - DATE '1970-01-01') AS sd,
      |         greatest(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01',
      |                  CAST(l.l_shipdate AS DATE) - DATE '1970-01-01') AS ed
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |),
      |deltas AS (
      |  SELECT store_id, day, sum(delta) AS delta FROM (
      |    SELECT store_id, sd AS day, 1 AS delta FROM iv
      |    UNION ALL
      |    SELECT store_id, ed + 1 AS day, -1 AS delta FROM iv
      |  ) GROUP BY 1, 2
      |),
      |run AS (
      |  SELECT store_id, day,
      |         sum(delta) OVER (PARTITION BY store_id ORDER BY day
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
      |  FROM deltas
      |),
      |best AS (
      |  SELECT store_id, open, day,
      |         row_number() OVER (PARTITION BY store_id
      |                            ORDER BY open DESC, day ASC) AS r
      |  FROM run
      |)
      |SELECT store_id, CAST(open AS INT) AS peak_open,
      |       CAST(DATE '1970-01-01' + CAST(day AS INT) AS TIMESTAMP) AS peak_day
      |FROM best WHERE r = 1
      |ORDER BY store_id""".stripMargin)

  /** KS-drift twin: identical (store, value) pre-aggregate, the same
    * one-window CDF pass, the same cross-multiplied integer gap, and
    * row_number as the struct-max spelling (gap DESC, value ASC). */
  val ksDrift: String =
    s"""WITH rows_ AS (
       |  SELECT s.s_nationkey AS store_id,
       |         CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS v,
       |         CASE WHEN year(o.o_orderdate) < ${EtlQueries.KsPivotYear}
       |              THEN 1 ELSE 0 END AS a
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |),
       |counts AS (
       |  SELECT store_id, v, CAST(sum(a) AS BIGINT) AS c1,
       |         CAST(count(*) - sum(a) AS BIGINT) AS c2
       |  FROM rows_ GROUP BY 1, 2
       |),
       |cdf AS (
       |  SELECT store_id, v,
       |    CAST(sum(c1) OVER (PARTITION BY store_id ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
       |    CAST(sum(c2) OVER (PARTITION BY store_id ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2,
       |    CAST(sum(c1) OVER (PARTITION BY store_id) AS BIGINT) AS n1,
       |    CAST(sum(c2) OVER (PARTITION BY store_id) AS BIGINT) AS n2
       |  FROM counts
       |),
       |best AS (
       |  SELECT store_id, n1, n2,
       |    abs(cum1 * n2 - cum2 * n1) AS gap, v,
       |    row_number() OVER (PARTITION BY store_id
       |      ORDER BY abs(cum1 * n2 - cum2 * n1) DESC, v ASC) AS r
       |  FROM cdf
       |)
       |SELECT store_id, n1, n2, gap AS ks_num,
       |       (1000000 * gap) // (n1 * n2) AS ks_ppm,
       |       v AS ks_at_cents
       |FROM best WHERE r = 1 AND n1 > 0 AND n2 > 0
       |ORDER BY store_id""".stripMargin

  /** Streaming-KS twin: each replay batch's prefix computed
    * declaratively — same arm split, same day-range carve, same CDF
    * arithmetic, one leg per prefix — so the incremental fold's state
    * EVOLUTION is gated, not just its final answer. */
  val streamKsDrift: String = {
    val legs = (0 until graft.streaming.StreamKs.ReplayBatches).map { b =>
      s"""SELECT CAST($b AS INT) AS batch, event_type, n1, n2, gap AS ks_num,
         |  (1000000 * gap) // (n1 * n2) AS ks_ppm, v AS ks_at_cents
         |FROM (
         |  WITH rows_ AS (
         |    SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v,
         |           CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS a
         |    FROM events
         |    WHERE (day(ts) - 1) // ${graft.streaming.StreamKs.BatchDays} <= $b
         |  ),
         |  counts AS (
         |    SELECT event_type, v, CAST(sum(a) AS BIGINT) AS c1,
         |           CAST(count(*) - sum(a) AS BIGINT) AS c2
         |    FROM rows_ GROUP BY 1, 2
         |  ),
         |  cdf AS (
         |    SELECT event_type, v,
         |      CAST(sum(c1) OVER (PARTITION BY event_type ORDER BY v
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
         |      CAST(sum(c2) OVER (PARTITION BY event_type ORDER BY v
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2,
         |      CAST(sum(c1) OVER (PARTITION BY event_type) AS BIGINT) AS n1,
         |      CAST(sum(c2) OVER (PARTITION BY event_type) AS BIGINT) AS n2
         |    FROM counts
         |  )
         |  SELECT event_type, n1, n2, abs(cum1 * n2 - cum2 * n1) AS gap, v,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY abs(cum1 * n2 - cum2 * n1) DESC, v ASC) AS r
         |  FROM cdf
         |  QUALIFY r = 1 AND n1 > 0 AND n2 > 0
         |)""".stripMargin
    }.mkString("\nUNION ALL\n")
    legs + "\nORDER BY batch, event_type"
  }

  /** Entity-match twin: identical blocking prefix and integer
    * Levenshtein threshold. */
  val entityMatch: String = star(
    """SELECT customer_a, customer_b, dist
      |FROM (
      |  SELECT a.customer_id AS customer_a, b.customer_id AS customer_b,
      |         CAST(levenshtein(a.customer_name, b.customer_name) AS INT) AS dist
      |  FROM dim_customer a
      |  JOIN dim_customer b
      |    ON substr(a.customer_name, 1, 16) = substr(b.customer_name, 1, 16)
      |   AND a.customer_id < b.customer_id
      |)
      |WHERE dist <= 1
      |ORDER BY customer_a, customer_b""".stripMargin)

  /** Spine twin: generated stores × 12 grid left-joined to the present
    * months, zero-filled in the same DECIMAL(18,2). */
  val monthSpine: String = star(
    s""", monthly AS (
       |  SELECT f.store_id, t.month,
       |         CAST(SUM(f.total_revenue) AS DECIMAL(18,2)) AS rev,
       |         count(*) AS n_rows
       |  FROM sales_fact f
       |  JOIN dim_time t ON f.time_id = t.time_id
       |  WHERE t.year = ${graft.olap.Queries.Year}
       |  GROUP BY f.store_id, t.month
       |),
       |spine AS (
       |  SELECT s.store_id, m.month
       |  FROM (SELECT store_id FROM dim_store) s,
       |       (SELECT CAST(unnest(generate_series(1, 12)) AS INT) AS month) m
       |)
       |SELECT sp.store_id, sp.month,
       |       CAST(COALESCE(mo.rev, CAST(0 AS DECIMAL(18,2))) AS DOUBLE)
       |         AS monthly_revenue,
       |       CAST(COALESCE(mo.n_rows, 0) AS BIGINT) AS n_rows,
       |       mo.rev IS NOT NULL AS has_sales
       |FROM spine sp
       |LEFT JOIN monthly mo ON sp.store_id = mo.store_id AND sp.month = mo.month
       |ORDER BY sp.store_id, sp.month""".stripMargin)

  /** MAD-outlier twin: same integer-cents monthly sums, the same two
    * interpolated percentiles, and the shared Iglewicz–Hoaglin
    * literals in the identical operation order. */
  val madOutliers: String = star(
    s""", monthly AS (
       |  SELECT f.store_id, t.year, t.month,
       |         CAST(sum(CAST(f.total_revenue * 100 AS BIGINT)) AS BIGINT) AS rev_cents
       |  FROM sales_fact f
       |  JOIN dim_time t ON f.time_id = t.time_id
       |  GROUP BY f.store_id, t.year, t.month
       |),
       |med AS (
       |  SELECT store_id, quantile_cont(rev_cents, 0.5) AS med_cents
       |  FROM monthly GROUP BY store_id
       |),
       |dev AS (
       |  SELECT m.store_id, m.year, m.month, m.rev_cents, d.med_cents,
       |         abs(CAST(m.rev_cents AS DOUBLE) - d.med_cents) AS abs_dev
       |  FROM monthly m JOIN med d ON m.store_id = d.store_id
       |),
       |mad AS (
       |  SELECT store_id, quantile_cont(abs_dev, 0.5) AS mad
       |  FROM dev GROUP BY store_id
       |)
       |SELECT store_id, year, month, rev_cents, med_cents, mad, robust_z,
       |       COALESCE(robust_z > CAST(${EtlQueries.MadThreshold} AS DOUBLE), false)
       |         AS is_outlier
       |FROM (
       |  SELECT v.store_id, v.year, v.month, v.rev_cents, v.med_cents, a.mad,
       |         CASE WHEN a.mad = CAST(0 AS DOUBLE) THEN NULL
       |              ELSE CAST(${EtlQueries.MadConsistency} AS DOUBLE)
       |                * v.abs_dev / a.mad END AS robust_z
       |  FROM dev v JOIN mad a ON v.store_id = a.store_id
       |)
       |ORDER BY store_id, year, month""".stripMargin)

  /** Winsorization twin: same integer-cents clamp below the same
    * floored exact percentile. */
  val winsorizedRevenue: String = star(
    """, cents AS (
      |  SELECT store_id, CAST(total_revenue * 100 AS BIGINT) AS rev_cents
      |  FROM sales_fact
      |),
      |cap AS (
      |  SELECT CAST(floor(quantile_cont(rev_cents, 0.99)) AS BIGINT) AS cap_cents
      |  FROM cents
      |)
      |SELECT store_id,
      |       count(*) AS n_rows,
      |       CAST(sum(rev_cents) AS BIGINT) AS revenue_cents,
      |       CAST(sum(least(rev_cents, cap_cents)) AS BIGINT) AS winsorized_cents,
      |       CAST(sum(CASE WHEN rev_cents > cap_cents THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_capped
      |FROM cents, cap
      |GROUP BY store_id
      |ORDER BY store_id""".stripMargin)

  /** Snapshot-diff twin: the same grain aggregation, FULL OUTER JOIN
    * and change-class CASE. */
  val snapshotDiff: String = star(
    """, before_g AS (
      |  SELECT order_id, product_id, supplier_id,
      |         CAST(SUM(quantity_ordered) AS BIGINT) AS q,
      |         CAST(SUM(total_revenue) AS DECIMAL(18,2)) AS rev
      |  FROM sales_fact
      |  WHERE time_id < TIMESTAMP '1998-06-01 00:00:00'
      |  GROUP BY order_id, product_id, supplier_id
      |),
      |after_g AS (
      |  SELECT order_id, product_id, supplier_id,
      |         CAST(SUM(CASE WHEN customer_id % 13 = 0
      |                       THEN quantity_ordered + 1
      |                       ELSE quantity_ordered END) AS BIGINT) AS q,
      |         CAST(SUM(total_revenue) AS DECIMAL(18,2)) AS rev
      |  FROM sales_fact
      |  WHERE customer_id % 41 <> 0
      |  GROUP BY order_id, product_id, supplier_id
      |),
      |d AS (
      |  SELECT CASE WHEN b.order_id IS NULL THEN 'added'
      |              WHEN a.order_id IS NULL THEN 'removed'
      |              WHEN b.q IS DISTINCT FROM a.q
      |                OR b.rev IS DISTINCT FROM a.rev THEN 'changed'
      |              ELSE 'unchanged' END AS change_type,
      |         coalesce(a.rev, CAST(0 AS DECIMAL(18,2)))
      |           - coalesce(b.rev, CAST(0 AS DECIMAL(18,2))) AS delta
      |  FROM before_g b
      |  FULL OUTER JOIN after_g a
      |    ON b.order_id = a.order_id AND b.product_id = a.product_id
      |   AND b.supplier_id = a.supplier_id
      |)
      |SELECT change_type, count(*) AS n_rows,
      |       CAST(CAST(SUM(delta) AS DECIMAL(18,2)) AS DOUBLE) AS revenue_delta
      |FROM d GROUP BY change_type
      |ORDER BY change_type""".stripMargin)

  /** CDC-emit twin: the same restatement snapshots, op from side
    * presence (group sums are never null, so a null q marks an absent
    * row), after-side attributes with tombstone NULLs for deletes. */
  val cdcEmit: String = star(
    """, before_g AS (
      |  SELECT order_id, product_id, supplier_id,
      |         CAST(SUM(quantity_ordered) AS BIGINT) AS q,
      |         CAST(SUM(total_revenue) AS DECIMAL(18,2)) AS rev
      |  FROM sales_fact
      |  WHERE time_id < TIMESTAMP '1998-06-01 00:00:00'
      |  GROUP BY order_id, product_id, supplier_id
      |),
      |after_g AS (
      |  SELECT order_id, product_id, supplier_id,
      |         CAST(SUM(CASE WHEN customer_id % 13 = 0
      |                       THEN quantity_ordered + 1
      |                       ELSE quantity_ordered END) AS BIGINT) AS q,
      |         CAST(SUM(total_revenue) AS DECIMAL(18,2)) AS rev
      |  FROM sales_fact
      |  WHERE customer_id % 41 <> 0
      |  GROUP BY order_id, product_id, supplier_id
      |),
      |d AS (
      |  SELECT order_id, product_id, supplier_id,
      |         CASE WHEN b.q IS NULL THEN 'I'
      |              WHEN a.q IS NULL THEN 'D'
      |              WHEN b.q IS DISTINCT FROM a.q
      |                OR b.rev IS DISTINCT FROM a.rev THEN 'U'
      |              ELSE NULL END AS op,
      |         a.q AS aq, a.rev AS arev
      |  FROM before_g b
      |  FULL OUTER JOIN after_g a USING (order_id, product_id, supplier_id)
      |)
      |SELECT order_id, product_id, supplier_id, op,
      |       CASE WHEN op = 'D' THEN NULL ELSE aq END AS quantity_ordered,
      |       CAST(CASE WHEN op = 'D' THEN NULL ELSE arev END AS DOUBLE)
      |         AS total_revenue
      |FROM d WHERE op IS NOT NULL
      |ORDER BY order_id, product_id, supplier_id""".stripMargin)

  /** k-anonymity twin: identical QI projection and threshold. */
  val kAnonymity: String =
    """SELECT c_mktsegment AS segment,
      |       CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
      |       count(*) AS group_size,
      |       count(*) >= 20 AS is_anonymous
      |FROM customer
      |GROUP BY segment, bal_band
      |ORDER BY segment, bal_band""".stripMargin

  /** Gini twin: identical ascending ranks, DECIMAL rank×cents sum, and
    * the shared closed-form expression. */
  val giniConcentration: String = star(
    s""", per_cust AS (
      |  SELECT store_id, customer_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |ranked AS (
      |  SELECT store_id, cents,
      |         CAST(row_number() OVER (PARTITION BY store_id
      |                                 ORDER BY cents, customer_id) AS BIGINT) AS i
      |  FROM per_cust
      |),
      |agg AS (
      |  SELECT store_id,
      |         count(*) AS n_customers,
      |         CAST(sum(cents) AS BIGINT) AS revenue_cents,
      |         sum(CAST(i AS DECIMAL(18,0)) * CAST(cents AS DECIMAL(18,0))) AS s1
      |  FROM ranked GROUP BY store_id
      |)
      |SELECT store_id, n_customers, revenue_cents,
      |       ${EtlQueries.GiniExpr} AS gini
      |FROM agg
      |ORDER BY store_id""".stripMargin)

  /** Interval-merge twin: identical calendar-coverage islanding over
    * the same per-(store, order) intervals. */
  val intervalMerge: String =
    """WITH iv AS (
      |  SELECT store_id, order_id, d0, greatest(d0, d1) AS d1 FROM (
      |    SELECT s.s_nationkey AS store_id, l.l_orderkey AS order_id,
      |           CAST(min(o.o_orderdate) AS DATE) AS d0,
      |           CAST(max(l.l_shipdate) AS DATE) AS d1
      |    FROM lineitem l
      |    JOIN orders o ON l.l_orderkey = o.o_orderkey
      |    JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |    GROUP BY 1, 2
      |  )
      |),
      |cov AS (
      |  SELECT DISTINCT store_id, CAST(d AS DATE) AS day
      |  FROM iv, LATERAL (SELECT unnest(generate_series(
      |    CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS d)
      |),
      |isl AS (
      |  SELECT store_id, day,
      |    datediff('day', DATE '1970-01-01', day)
      |      - row_number() OVER (PARTITION BY store_id ORDER BY day) AS grp
      |  FROM cov
      |)
      |SELECT store_id,
      |  CAST(min(day) AS TIMESTAMP) AS start_day,
      |  CAST(max(day) AS TIMESTAMP) AS end_day,
      |  count(*) AS n_days
      |FROM isl
      |GROUP BY store_id, grp
      |ORDER BY store_id, start_day""".stripMargin

  /** CUSUM twin: same scaled integer deviation n·cum − i·total over
    * the store×month table, argmax by (|dev| desc, month asc) via
    * QUALIFY against the engine side's struct-max. */
  val cusumChangepoint: String = star(
    """, monthly AS (
      |  SELECT store_id,
      |         CAST(year(time_id) AS INT) * 12 +
      |           CAST(month(time_id) AS INT) AS x,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |stats AS (
      |  SELECT store_id, count(*) AS n, CAST(sum(cents) AS BIGINT) AS total
      |  FROM monthly GROUP BY store_id
      |),
      |walked AS (
      |  SELECT m.store_id, m.x, s.n,
      |         CAST(row_number() OVER w AS BIGINT) AS i,
      |         CAST(sum(m.cents) OVER w AS BIGINT) AS cum,
      |         s.total
      |  FROM monthly m JOIN stats s USING (store_id)
      |  WINDOW w AS (PARTITION BY m.store_id ORDER BY m.x
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |),
      |scored AS (SELECT *, n * cum - i * total AS dev FROM walked)
      |SELECT store_id, n AS n_months,
      |       CAST((x - 1) // 12 AS INT) AS cp_year,
      |       CAST((x - 1) % 12 + 1 AS INT) AS cp_month,
      |       dev AS cusum_scaled,
      |       CASE WHEN dev < 0 THEN 'up' WHEN dev > 0 THEN 'down'
      |            ELSE 'flat' END AS shift_direction
      |FROM scored
      |QUALIFY row_number() OVER (PARTITION BY store_id
      |  ORDER BY abs(dev) DESC, x ASC) = 1
      |ORDER BY store_id""".stripMargin)

  /** Gap-interpolation twin: per-store month spine via
    * generate_series, IGNORE NULLS window walks, and the identical
    * truncated integer division. */
  val gapInterpolate: String = star(
    """, monthly AS (
      |  SELECT store_id,
      |         CAST(year(time_id) AS INT) * 12 +
      |           CAST(month(time_id) AS INT) AS x,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |spine AS (
      |  SELECT store_id, CAST(s AS INT) AS x
      |  FROM (SELECT store_id, min(x) AS x0, max(x) AS x1
      |        FROM monthly GROUP BY store_id),
      |       LATERAL (SELECT unnest(generate_series(x0, x1)) AS s)
      |),
      |walked AS (
      |  SELECT sp.store_id, sp.x, m.cents,
      |    last_value(m.cents IGNORE NULLS) OVER wb AS pc,
      |    last_value(CASE WHEN m.cents IS NOT NULL THEN sp.x END IGNORE NULLS)
      |      OVER wb AS px,
      |    first_value(m.cents IGNORE NULLS) OVER wf AS nc,
      |    first_value(CASE WHEN m.cents IS NOT NULL THEN sp.x END IGNORE NULLS)
      |      OVER wf AS nx
      |  FROM spine sp LEFT JOIN monthly m USING (store_id, x)
      |  WINDOW
      |    wb AS (PARTITION BY sp.store_id ORDER BY sp.x
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    wf AS (PARTITION BY sp.store_id ORDER BY sp.x
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |)
      |SELECT store_id,
      |       CAST((x - 1) // 12 AS INT) AS year,
      |       CAST((x - 1) % 12 + 1 AS INT) AS month,
      |       coalesce(cents, pc + ((nc - pc) * (x - px)) // (nx - px)) AS cents,
      |       cents IS NULL AS interpolated
      |FROM walked
      |ORDER BY store_id, year, month""".stripMargin)

  /** t-closeness twin: the same zero-filled QI×category grid
    * (cross join of the group marginal with the global category
    * counts, left join of the cells) and exact cross-multiplied
    * numerators. */
  val tCloseness: String =
    s"""WITH qi AS (
       |  SELECT c_mktsegment AS segment,
       |         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
       |         c_nationkey AS sensitive
       |  FROM customer
       |),
       |cell AS (
       |  SELECT segment, bal_band, sensitive, CAST(count(*) AS BIGINT) AS cnt
       |  FROM qi GROUP BY 1, 2, 3
       |),
       |gsize AS (
       |  SELECT segment, bal_band, CAST(sum(cnt) AS BIGINT) AS n_g
       |  FROM cell GROUP BY 1, 2
       |),
       |gcat AS (
       |  SELECT sensitive, CAST(count(*) AS BIGINT) AS g_cnt
       |  FROM qi GROUP BY 1
       |),
       |grid AS (
       |  SELECT g.segment, g.bal_band, g.n_g, c.sensitive, c.g_cnt,
       |         t.n_total, coalesce(l.cnt, 0) AS cnt
       |  FROM gsize g
       |  CROSS JOIN gcat c
       |  CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n_total FROM qi) t
       |  LEFT JOIN cell l ON l.segment = g.segment
       |    AND l.bal_band = g.bal_band AND l.sensitive = c.sensitive
       |)
       |SELECT segment, bal_band, n_g AS group_size,
       |  (1000000 * CAST(sum(abs(cnt * n_total - g_cnt * n_g)) AS BIGINT))
       |    // (2 * n_g * n_total) AS t_ppm,
       |  (1000000 * CAST(sum(abs(cnt * n_total - g_cnt * n_g)) AS BIGINT))
       |    // (2 * n_g * n_total) <= ${Retention.TClosenessPpm} AS is_close
       |FROM grid
       |GROUP BY segment, bal_band, n_g, n_total
       |ORDER BY segment, bal_band""".stripMargin

  /** IVM twin: the FULL recompute of the daily view — hash equality
    * against the engine's base ⊕ delta merge is the SUM/COUNT
    * self-maintainability check. */
  val ivmDailyRefresh: String = star(
    """SELECT store_id, time_id,
      |       CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents,
      |       CAST(count(*) AS BIGINT) AS n_rows
      |FROM sales_fact
      |GROUP BY 1, 2
      |ORDER BY store_id, time_id""".stripMargin)

  /** MIN/MAX-retraction twin: the view recomputed from scratch over
    * the surviving days — equality proves the group-targeted rule. */
  val ivmMinMax: String = star(
    """, daily AS (
      |  SELECT store_id, time_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |)
      |SELECT store_id,
      |       CAST(min(cents) AS BIGINT) AS mn,
      |       CAST(max(cents) AS BIGINT) AS mx,
      |       CAST(count(*) AS BIGINT) AS n_days
      |FROM daily
      |WHERE time_id < (SELECT max(time_id) FROM daily)
      |GROUP BY store_id
      |ORDER BY store_id""".stripMargin)

  /** Distinct-count-retraction twin: the view recomputed over the
    * surviving fact — equality proves the multiplicity accounting. */
  val ivmDistinct: String = star(
    """SELECT store_id,
      |       CAST(count(DISTINCT product_id) AS BIGINT) AS n_products
      |FROM sales_fact
      |WHERE time_id < (SELECT max(time_id) FROM sales_fact)
      |GROUP BY store_id
      |ORDER BY store_id""".stripMargin)

  /** Join-view IVM twin: the full-recompute γ(L ⋈ O) the three-term
    * delta refresh must reproduce — hash equality IS the delta rule. */
  val ivmJoinRefresh: String =
    """SELECT o_orderpriority,
      |       CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INT) AS ship_ym,
      |       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents,
      |       CAST(count(*) AS BIGINT) AS n_rows
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1, 2
      |ORDER BY o_orderpriority, ship_ym""".stripMargin

  /** χ²-independence twin: the same zero-filled segment×priority grid
    * and the shared cell expression. */
  val chi2Independence: String =
    s"""WITH pairs AS (
       |  SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority
       |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       |),
       |cell AS (
       |  SELECT segment, priority, CAST(count(*) AS BIGINT) AS cnt
       |  FROM pairs GROUP BY 1, 2
       |),
       |rowm AS (SELECT segment, CAST(sum(cnt) AS BIGINT) AS rt
       |         FROM cell GROUP BY 1),
       |colm AS (SELECT priority, CAST(sum(cnt) AS BIGINT) AS ct
       |         FROM cell GROUP BY 1),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM cell),
       |grid AS (
       |  SELECT r.segment, c.priority, r.rt, c.ct, t.n_total,
       |         coalesce(l.cnt, 0) AS cnt
       |  FROM rowm r
       |  CROSS JOIN colm c
       |  CROSS JOIN tot t
       |  LEFT JOIN cell l ON l.segment = r.segment AND l.priority = c.priority
       |),
       |scored AS (SELECT *, cnt * n_total - rt * ct AS delta FROM grid)
       |SELECT segment, priority, cnt AS observed, rt, ct,
       |       ${EtlQueries.chi2CellExpr} AS contrib
       |FROM scored
       |ORDER BY segment, priority""".stripMargin

  /** NDV-profile twin: the same column list and casts
    * ([[EtlQueries.ProfileCols]]), unpivoted as a UNION ALL chain. */
  val ndvProfile: String = {
    val unp = EtlQueries.ProfileCols
      .map { case (n, cast) =>
        s"SELECT '$n' AS column_name, $cast AS val FROM lineitem" }
      .mkString("\n  UNION ALL ")
    s"""WITH unp AS (
       |  $unp
       |)
       |SELECT column_name, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       |  CAST(count(DISTINCT val) AS BIGINT) AS ndv,
       |  min(val) AS min_str, max(val) AS max_str
       |FROM unp GROUP BY column_name
       |ORDER BY column_name""".stripMargin
  }

  /** ABC-migration twin: per-year cumulative-share classes via a
    * plain year-partitioned window (the engine side's window is also
    * partitioned — same shape), consecutive-year full outer inside
    * valid year pairs, none-filled entrants/exits. */
  val abcMigration: String = star(
    s""", py AS (
       |  SELECT CAST(year(time_id) AS INT) AS year, product_id,
       |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
       |  FROM sales_fact GROUP BY 1, 2
       |),
       |tot AS (SELECT year, CAST(sum(cents) AS BIGINT) AS total_cents
       |        FROM py GROUP BY year),
       |classed AS (
       |  SELECT p.year, p.product_id,
       |    CASE WHEN CAST(sum(p.cents) OVER w AS DOUBLE)
       |           / CAST(t.total_cents AS DOUBLE) <= CAST(${graft.olap.Queries.AbcA} AS DOUBLE)
       |         THEN 'A'
       |         WHEN CAST(sum(p.cents) OVER w AS DOUBLE)
       |           / CAST(t.total_cents AS DOUBLE) <= CAST(${graft.olap.Queries.AbcB} AS DOUBLE)
       |         THEN 'B' ELSE 'C' END AS cls
       |  FROM py p JOIN tot t USING (year)
       |  WINDOW w AS (PARTITION BY p.year
       |    ORDER BY p.cents DESC, p.product_id ASC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |),
       |valid AS (
       |  SELECT a.year FROM (SELECT DISTINCT year FROM py) a
       |  JOIN (SELECT DISTINCT year FROM py) b ON a.year + 1 = b.year
       |),
       |cur AS (SELECT c.year, c.product_id, c.cls AS class_from
       |        FROM classed c JOIN valid v ON c.year = v.year),
       |nxt AS (SELECT c.year - 1 AS year, c.product_id, c.cls AS class_to
       |        FROM classed c
       |        JOIN valid v ON c.year - 1 = v.year)
       |SELECT coalesce(cur.year, nxt.year) AS year_from,
       |       coalesce(class_from, 'none') AS class_from,
       |       coalesce(class_to, 'none') AS class_to,
       |       CAST(count(*) AS BIGINT) AS n_products
       |FROM cur FULL OUTER JOIN nxt
       |  ON cur.year = nxt.year AND cur.product_id = nxt.product_id
       |GROUP BY 1, 2, 3
       |ORDER BY year_from, class_from, class_to""".stripMargin)

  /** DQ-rule twin: the same predicate strings evaluated as one
    * conditional-sum pass, unpivoted by a UNION ALL chain. */
  val dqRules: String = {
    val sums = EtlQueries.DqRules.map { case (n, pred) =>
      s"CAST(sum(CASE WHEN $pred THEN 1 ELSE 0 END) AS BIGINT) AS v_$n"
    }.mkString(",\n         ")
    val unions = EtlQueries.DqRules.map { case (n, _) =>
      s"SELECT '$n' AS rule, n_checked, v_$n AS n_violations FROM wide"
    }.mkString("\n  UNION ALL ")
    s"""WITH wide AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_checked,
       |         $sums
       |  FROM lineitem
       |)
       |SELECT rule, n_checked, n_violations, n_violations = 0 AS passed
       |FROM (
       |  $unions
       |)
       |ORDER BY rule""".stripMargin
  }

  /** Subject-export twin: same request rule (every 97th customer), same
    * two-level rollup, md5 over the identical sorted comma-joined order
    * ids; subjects without orders export zeros and md5(''). */
  val subjectExport: String = star(
    """, req AS (
      |  SELECT customer_id, customer_name, gender AS segment
      |  FROM dim_customer WHERE customer_id % 97 = 0
      |),
      |per_order AS (
      |  SELECT f.customer_id, f.order_id,
      |         CAST(count(*) AS BIGINT) AS n_items_o,
      |         CAST(sum(CAST(f.total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents_o,
      |         min(f.time_id) AS t0, max(f.time_id) AS t1
      |  FROM sales_fact f
      |  WHERE f.customer_id % 97 = 0
      |  GROUP BY 1, 2
      |),
      |per_subject AS (
      |  SELECT customer_id,
      |         CAST(count(*) AS BIGINT) AS n_orders,
      |         CAST(sum(n_items_o) AS BIGINT) AS n_items,
      |         CAST(sum(cents_o) AS BIGINT) AS spend_cents,
      |         min(t0) AS first_order, max(t1) AS last_order,
      |         md5(string_agg(CAST(order_id AS VARCHAR), ',' ORDER BY order_id))
      |           AS orders_fp
      |  FROM per_order
      |  GROUP BY customer_id
      |)
      |SELECT r.customer_id, r.customer_name, r.segment,
      |       coalesce(s.n_orders, 0) AS n_orders,
      |       coalesce(s.n_items, 0) AS n_items,
      |       coalesce(s.spend_cents, 0) AS spend_cents,
      |       s.first_order, s.last_order,
      |       coalesce(s.orders_fp, md5('')) AS orders_fp
      |FROM req r LEFT JOIN per_subject s USING (customer_id)
      |ORDER BY customer_id""".stripMargin)

  /** l-diversity twin: identical stacked aggregates over the same QI
    * projection with the nation as the sensitive attribute. */
  val lDiversity: String =
    s"""WITH cells AS (
       |  SELECT c_mktsegment AS segment,
       |         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
       |         c_nationkey AS sensitive,
       |         CAST(count(*) AS BIGINT) AS cnt
       |  FROM customer
       |  GROUP BY 1, 2, 3
       |)
       |SELECT segment, bal_band,
       |       CAST(sum(cnt) AS BIGINT) AS group_size,
       |       CAST(count(*) AS INT) AS n_sensitive,
       |       CAST(max(cnt) AS BIGINT) AS top_sensitive_cnt,
       |       count(*) >= ${graft.etl.Retention.LDiversityL} AS is_diverse
       |FROM cells
       |GROUP BY segment, bal_band
       |ORDER BY segment, bal_band""".stripMargin

  /** EWMA twin: same dyadic weights over the same bounded fan-out. */
  val ewmaTrend: String = {
    val span = EtlQueries.EwmaSpan
    star(
      s""", monthly AS (
         |  SELECT store_id,
         |         CAST(year(time_id) AS INT) * 12 +
         |           CAST(month(time_id) AS INT) AS x,
         |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS y
         |  FROM sales_fact GROUP BY 1, 2
         |),
         |contrib AS (
         |  SELECT store_id, x + i AS wx, y,
         |         CAST(1 AS BIGINT) << (${span - 1} - i) AS w
         |  FROM monthly CROSS JOIN (SELECT unnest(generate_series(0, ${span - 1})) AS i)
         |),
         |agg AS (
         |  SELECT store_id, wx, CAST(count(*) AS INT) AS n_in_window,
         |         CAST(sum(y * w) AS BIGINT) AS num,
         |         CAST(sum(w) AS BIGINT) AS den
         |  FROM contrib GROUP BY store_id, wx
         |)
         |SELECT a.store_id,
         |       CAST((a.wx - 1) // 12 AS INT) AS year,
         |       CAST((a.wx - 1) % 12 + 1 AS INT) AS month,
         |       a.n_in_window, o.y AS cents,
         |       CAST(a.num AS DOUBLE) / CAST(a.den AS DOUBLE) AS ewma_cents
         |FROM agg a
         |JOIN monthly o ON o.store_id = a.store_id AND o.x = a.wx
         |ORDER BY a.store_id, year, month""".stripMargin)
  }

  /** Seasonal-decomposition twin: the same 2×12 centered MA (half
    * weight at |i| = 6, complete-window HAVING), per-moy index and
    * centering via the shared [[EtlQueries.floorDiv]] spelling with
    * `//` — the numerator-shift trick makes floor and truncation
    * agree, so the engines' one integer-division disagreement never
    * reaches the data. */
  val seasonalDecompose: String = {
    def fd(a: String, b: String) = EtlQueries.floorDiv(a, b, "//")
    star(
      s""", monthly AS (
         |  SELECT store_id,
         |         CAST(year(time_id) AS INT) * 12 +
         |           CAST(month(time_id) AS INT) AS x,
         |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS y
         |  FROM sales_fact GROUP BY 1, 2
         |),
         |contrib AS (
         |  SELECT store_id, x + i AS wx, y,
         |         CASE WHEN abs(i) = 6 THEN CAST(500 AS BIGINT)
         |              ELSE CAST(1000 AS BIGINT) END AS w
         |  FROM monthly CROSS JOIN (SELECT unnest(generate_series(-6, 6)) AS i)
         |),
         |trend AS (
         |  SELECT store_id, wx AS x,
         |         CAST(sum(y * w) AS BIGINT) // 12 AS trend_milli
         |  FROM contrib GROUP BY store_id, wx HAVING count(*) = 13
         |),
         |det AS (
         |  SELECT m.store_id, m.x, m.y, t.trend_milli,
         |         m.y * 1000 - t.trend_milli AS det_milli
         |  FROM monthly m
         |  LEFT JOIN trend t ON t.store_id = m.store_id AND t.x = m.x
         |),
         |idx AS (
         |  SELECT store_id, CAST((x - 1) % 12 + 1 AS INT) AS moy,
         |         CAST(sum(det_milli) AS BIGINT) AS sdet,
         |         CAST(count(*) AS BIGINT) AS nmoy
         |  FROM det WHERE trend_milli IS NOT NULL GROUP BY 1, 2
         |),
         |idx2 AS (
         |  SELECT store_id, moy, ${fd("sdet", "nmoy")} AS s_raw FROM idx
         |),
         |adj AS (
         |  SELECT store_id, ${fd("CAST(sum(s_raw) AS BIGINT)", "CAST(count(*) AS BIGINT)")} AS s_adj
         |  FROM idx2 GROUP BY 1
         |),
         |seasonal AS (
         |  SELECT i.store_id, i.moy, i.s_raw - a.s_adj AS seasonal_milli
         |  FROM idx2 i JOIN adj a USING (store_id)
         |)
         |SELECT d.store_id,
         |       CAST((d.x - 1) // 12 AS INT) AS year,
         |       CAST((d.x - 1) % 12 + 1 AS INT) AS month,
         |       d.y AS cents, d.trend_milli, s.seasonal_milli,
         |       d.det_milli - s.seasonal_milli AS remainder_milli
         |FROM det d
         |LEFT JOIN seasonal s
         |  ON s.store_id = d.store_id AND s.moy = CAST((d.x - 1) % 12 + 1 AS INT)
         |ORDER BY d.store_id, year, month""".stripMargin)
  }

  /** Transition twin: the same (ts, event_id)-ordered lag per user. */
  val eventTransitions: String =
    """SELECT prev_type, event_type, count(*) AS n_transitions
      |FROM (
      |  SELECT user_id, event_type,
      |         lag(event_type) OVER (
      |           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events
      |)
      |WHERE prev_type IS NOT NULL
      |GROUP BY prev_type, event_type
      |ORDER BY prev_type, event_type""".stripMargin

  /** Rolling-active twin: the same explode-to-covered-days shape. */
  val rollingActive: String =
    """WITH act AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      |),
      |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM act GROUP BY day),
      |cov AS (
      |  SELECT a.user_id, a.day + CAST(o AS INT) AS day
      |  FROM act a, LATERAL (SELECT unnest(range(0, 7)) AS o)
      |),
      |wau AS (SELECT day, count(DISTINCT user_id) AS wau_7 FROM cov GROUP BY day)
      |SELECT CAST(d.day AS TIMESTAMP) AS day, d.dau, w.wau_7
      |FROM dau d JOIN wau w ON d.day = w.day
      |ORDER BY day""".stripMargin

  /** FK-audit twin: one LEFT JOIN per relation against the distinct
    * parent key set, orphans counted from the join miss. */
  val fkAudit: String = {
    def rel(name: String, child: String, fk: String,
        parent: String, pk: String): String =
      s"""SELECT '$name' AS relation,
         |       count(*) AS child_rows,
         |       CAST(sum(CASE WHEN p.__pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |         AS orphan_rows
         |FROM $child c
         |LEFT JOIN (SELECT DISTINCT $pk AS __pk FROM $parent) p
         |  ON c.$fk = p.__pk""".stripMargin
    star(Seq(
      rel("embeddings_documents", "embeddings", "vec_id", "documents", "doc_id"),
      rel("fact_customer", "sales_fact", "customer_id", "dim_customer", "customer_id"),
      rel("fact_product", "sales_fact", "product_id", "dim_product", "product_id"),
      rel("fact_store", "sales_fact", "store_id", "dim_store", "store_id"),
      rel("fact_supplier", "sales_fact", "supplier_id", "dim_supplier", "supplier_id"),
      rel("fact_time", "sales_fact", "time_id", "dim_time", "time_id")
    ).mkString("", "\nUNION ALL\n", "\nORDER BY relation"))
  }

  /** CDC twin: the same three-epoch feed, collapsed with a window
    * (last writer per key by seq), deletes filtered after the rank. */
  val cdcApply: String =
    """WITH cur AS (
      |  SELECT c_custkey AS customer_id, c_name AS customer_name FROM customer
      |),
      |feed AS (
      |  SELECT customer_id, customer_name, 'I' AS op, 1 AS seq FROM cur
      |  UNION ALL
      |  SELECT customer_id, customer_name || ' v2', 'U', 2
      |  FROM cur WHERE customer_id % 3 = 0
      |  UNION ALL
      |  SELECT customer_id, customer_name, 'D', 3
      |  FROM cur WHERE customer_id % 7 = 0
      |)
      |SELECT customer_id, customer_name FROM (
      |  SELECT customer_id, customer_name, op,
      |         row_number() OVER (PARTITION BY customer_id ORDER BY seq DESC) AS rn
      |  FROM feed)
      |WHERE rn = 1 AND op <> 'D'
      |ORDER BY customer_id""".stripMargin

  /** Funnel twin: the same cascaded conditional-min CTEs — each stage's
    * first qualifying event strictly after the previous stage. */
  val funnelSteps: String =
    """WITH v AS (
      |  SELECT user_id, min(ts) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY user_id
      |),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS t_click
      |  FROM events e JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.t_view
      |  GROUP BY e.user_id
      |),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS t_purchase
      |  FROM events e JOIN c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      |  GROUP BY e.user_id
      |)
      |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
      |  CAST(1 + (CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
      |         + (CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS INT)
      |    AS funnel_stage
      |FROM v
      |LEFT JOIN c ON v.user_id = c.user_id
      |LEFT JOIN p ON v.user_id = p.user_id
      |ORDER BY v.user_id""".stripMargin

  /** Deadline-funnel twin: [[funnelSteps]]'s CTEs with the per-stage
    * interval cap from the SHARED [[EtlQueries.FunnelDeadlineMinutes]]. */
  val funnelDeadline: String = {
    val m = EtlQueries.FunnelDeadlineMinutes
    s"""WITH v AS (
       |  SELECT user_id, min(ts) AS t_view FROM events
       |  WHERE event_type = 'view' GROUP BY user_id
       |),
       |c AS (
       |  SELECT e.user_id, min(e.ts) AS t_click
       |  FROM events e JOIN v ON v.user_id = e.user_id
       |  WHERE e.event_type = 'click' AND e.ts > v.t_view
       |    AND e.ts <= v.t_view + INTERVAL $m MINUTE
       |  GROUP BY e.user_id
       |),
       |p AS (
       |  SELECT e.user_id, min(e.ts) AS t_purchase
       |  FROM events e JOIN c ON c.user_id = e.user_id
       |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
       |    AND e.ts <= c.t_click + INTERVAL $m MINUTE
       |  GROUP BY e.user_id
       |)
       |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
       |  CAST(1 + (CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
       |         + (CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS INT)
       |    AS funnel_stage
       |FROM v
       |LEFT JOIN c ON v.user_id = c.user_id
       |LEFT JOIN p ON v.user_id = p.user_id
       |ORDER BY v.user_id""".stripMargin
  }

  /** Cohort twin: integer week arithmetic from the same epoch. */
  val cohortRetention: String =
    """WITH e AS (
      |  SELECT user_id,
      |    CAST((CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS INT) AS week
      |  FROM events
      |),
      |cohort AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id),
      |active AS (SELECT DISTINCT user_id, week FROM e)
      |SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
      |       count(DISTINCT a.user_id) AS n_users
      |FROM active a JOIN cohort c ON a.user_id = c.user_id
      |GROUP BY c.cohort_week, week_offset
      |ORDER BY cohort_week, week_offset""".stripMargin

  /** Z-interleave twin: the bit arithmetic is GENERATED by the same
    * loop as the engine column ([[ZOrder.zOrderSql]]) — plain
    * `>> << & |` integer ops in both dialects. */
  val zorderKeys: String =
    s"""SELECT o_orderkey, ${ZOrder.zOrderSql("xm", "ym")} AS z
       |FROM (
       |  SELECT o_orderkey, o_custkey & 65535 AS xm,
       |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) & 65535 AS ym
       |  FROM orders
       |)
       |ORDER BY z, o_orderkey""".stripMargin

  /** Hilbert-key twin: the rotation fold as the generated CTE chain
    * ([[Hilbert.hilbertCteChain]]) over the same masked inputs as the
    * Z twin — shared per-level construction, so the spellings cannot
    * drift. */
  val hilbertKeys: String = {
    val chain = Hilbert.hilbertCteChain("hbase", Seq("o_orderkey"), "hl")
    s"""WITH hbase AS (
       |  SELECT o_orderkey,
       |    CAST(o_custkey & 65535 AS BIGINT) AS hx,
       |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) & 65535 AS hy
       |  FROM orders
       |),
       |$chain
       |SELECT o_orderkey, hd AS h FROM hl${Hilbert.Bits}
       |ORDER BY h, o_orderkey""".stripMargin
  }

  /** Gaps-and-islands twin of Spark's session_window (30-min gap):
    * session breaks where ts − lag(ts) > gap; session_end = last event +
    * gap. Events sharing one timestamp fall in one session either way. */
  val eventSessions: String =
    """WITH flagged AS (
      |  SELECT user_id, ts,
      |         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |                   > INTERVAL 30 MINUTE
      |              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |),
      |numbered AS (
      |  SELECT user_id, ts,
      |         SUM(new_session) OVER (
      |           PARTITION BY user_id ORDER BY ts
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      |         ) AS session_id
      |  FROM flagged
      |)
      |SELECT user_id,
      |       MIN(ts) AS session_start,
      |       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
      |       COUNT(*) AS n_events
      |FROM numbered
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_start""".stripMargin

  /** Session-path twin: the same gap-island sessionization as
    * [[eventSessions]], paths via ORDER BY-ed string_agg (the (ts,
    * event_id) order mirrors the engine's struct sort). */
  val sessionPaths: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |                   > INTERVAL 30 MINUTE
      |              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |),
      |numbered AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         SUM(new_session) OVER (
      |           PARTITION BY user_id ORDER BY ts
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      |         ) AS session_id
      |  FROM flagged
      |),
      |paths AS (
      |  SELECT user_id, session_id,
      |         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      |  FROM numbered GROUP BY user_id, session_id
      |)
      |SELECT path, count(*) AS n_sessions
      |FROM paths GROUP BY path
      |ORDER BY n_sessions DESC, path ASC
      |LIMIT 50""".stripMargin

  /** Erasure-audit twin: the same every-97th request list, counted with
    * FILTER instead of the engine's broadcast flag join. */
  val forgetCustomer: String = star(
    """, forget AS (
      |  SELECT customer_id FROM dim_customer WHERE customer_id % 97 = 0
      |)
      |SELECT * FROM (
      |  SELECT 'dim_customer' AS table_name,
      |    CAST(count(*) AS BIGINT) AS rows_before,
      |    CAST(count(*) FILTER (WHERE customer_id IN (SELECT customer_id FROM forget))
      |         AS BIGINT) AS rows_deleted,
      |    CAST(count(*) - count(*) FILTER (WHERE customer_id IN (SELECT customer_id FROM forget))
      |         AS BIGINT) AS rows_after
      |  FROM dim_customer
      |  UNION ALL
      |  SELECT 'sales_fact',
      |    CAST(count(*) AS BIGINT),
      |    CAST(count(*) FILTER (WHERE customer_id IN (SELECT customer_id FROM forget))
      |         AS BIGINT),
      |    CAST(count(*) - count(*) FILTER (WHERE customer_id IN (SELECT customer_id FROM forget))
      |         AS BIGINT)
      |  FROM sales_fact
      |)
      |ORDER BY table_name""".stripMargin)

  /** Token-bucket rate-limiter twin: the streaming state machine's
    * decisions over the CLOSED event log are a deterministic
    * (ts, event_id)-ordered fold per user, which SQL replays with a
    * recursive CTE — one recursion step per event rank, all users
    * advancing in lockstep. The arithmetic mirrors
    * [[graft.streaming.StatefulOps.bucketStep]] exactly: integer
    * millitokens, truncating refill `(Δms · full) // periodMs`, cap at
    * full, spend 1000 iff ≥ 1000 available. capacity=2, period=4 h
    * (full = 2000 millitokens, periodMs = 14400000). */
  /** Abandoned-carts twin: gaps-and-islands sessionization (new session
    * at gap ≥ 30 min — `session_window`'s boundary convention), decimal
    * value sums, alert = session without a purchase. */
  val abandonedCarts: String =
    """WITH e AS (
      |  SELECT user_id, ts, event_id, value, event_type,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |              OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) >= 1800000
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), s AS (
      |  SELECT user_id, ts, value, event_type,
      |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                          ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM e
      |), agg AS (
      |  SELECT user_id, sid,
      |         count(*) AS n_events,
      |         CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2))
      |              AS DOUBLE) AS total_value,
      |         max(ts) AS last_ts,
      |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS hp
      |  FROM s GROUP BY user_id, sid
      |)
      |SELECT user_id, n_events, total_value, last_ts
      |FROM agg WHERE hp = 0
      |ORDER BY user_id, last_ts""".stripMargin

  /** Interval-join twin: purchases × same-user views inside the
    * trailing window (6 h registered — see SparkEntry — so the check
    * covers thousands of matches), as a plain range join. */
  val viewAttribution: String =
    """SELECT p.event_id AS purchase_id, p.ts AS purchase_ts,
      |       p.user_id, p.value,
      |       v.event_id AS view_id, v.ts AS view_ts
      |FROM events p
      |JOIN events v
      |  ON v.user_id = p.user_id
      | AND v.ts >= p.ts - INTERVAL 6 HOUR
      | AND v.ts <= p.ts
      |WHERE p.event_type = 'purchase' AND v.event_type = 'view'
      |ORDER BY purchase_id, view_id""".stripMargin

  /** Outer-attribution twin: the LEFT range join — the filters move
    * into the subqueries/ON clause so unmatched purchases null-extend
    * instead of being filtered away; NULLS FIRST matches Spark's
    * ascending null ordering. */
  val viewAttributionOuter: String =
    """SELECT p.event_id AS purchase_id, p.ts AS purchase_ts,
      |       p.user_id, p.value,
      |       v.event_id AS view_id, v.ts AS view_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON v.user_id = p.user_id
      | AND v.ts >= p.ts - INTERVAL 6 HOUR
      | AND v.ts <= p.ts
      |ORDER BY purchase_id, view_id NULLS FIRST""".stripMargin

  /** The twin is GENERATED from the same (capacity, periodSeconds)
    * constants [[graft.streaming.StatefulOps.rateLimitQuery]] defaults
    * to, so the registered query and its oracle cannot drift: changing
    * the defaults re-derives full/periodMs/base-case tokens here.
    * (Calling rateLimitQuery with NON-default params is a different
    * query and needs [[rateLimitSql]] with the same params.) */
  val rateLimit: String = rateLimitSql(
    graft.streaming.StatefulOps.DefaultRateCapacity,
    graft.streaming.StatefulOps.DefaultRatePeriodSeconds)

  def rateLimitSql(capacity: Int, periodSeconds: Int): String = {
    require(capacity >= 1 && periodSeconds >= 1)
    val full = capacity * 1000L
    val periodMs = periodSeconds * 1000L
    // base case = bucketStep from a fresh full bucket: first event per
    // user always has full >= 1000 available (capacity >= 1), spends 1000
    val baseAfter = full - 1000L
    s"""WITH RECURSIVE ev AS (
      |  SELECT user_id, ts, event_id, epoch_ms(ts) AS ts_ms,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events
      |),
      |fold AS (
      |  SELECT user_id, ts, event_id, rn,
      |         TRUE AS allowed,
      |         CAST($baseAfter AS BIGINT) AS milli_tokens_after,
      |         ts_ms AS last_ms
      |  FROM ev WHERE rn = 1
      |  UNION ALL
      |  SELECT user_id, ts, event_id, rn,
      |         avail >= 1000 AS allowed,
      |         CAST(CASE WHEN avail >= 1000 THEN avail - 1000 ELSE avail END
      |              AS BIGINT) AS milli_tokens_after,
      |         now_ms AS last_ms
      |  FROM (
      |    SELECT e.user_id, e.ts, e.event_id, e.rn,
      |           greatest(f.last_ms, e.ts_ms) AS now_ms,
      |           least($full, f.milli_tokens_after
      |             + (greatest(f.last_ms, e.ts_ms) - f.last_ms) * $full // $periodMs)
      |             AS avail
      |    FROM fold f
      |    JOIN ev e ON e.user_id = f.user_id AND e.rn = f.rn + 1
      |  )
      |)
      |SELECT user_id, ts, event_id, allowed, milli_tokens_after
      |FROM fold
      |ORDER BY user_id, ts, event_id""".stripMargin
  }

  /** Tx-overwrite round-trip twin: the DECLARATIVE final state the
    * restatement must land in — untouched months' original rollup
    * unioned with the last month's weekday-only reload. The engine
    * side reaches it through the sink's commit log + manifest-drop
    * read path; equality here proves the overwrite semantics on real
    * data. */
  /** Data-skipping twin: the range computed declaratively — the
    * engine side answers it through the stats-pruned commit read, so
    * the hash gate proves pruning loses no matching row. */
  val txSkipping: String = star(
    s""", monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |)
      |SELECT month, store_id, cents FROM monthly
      |WHERE month >= '${EtlQueries.TxSkipLo}' AND month <= '${EtlQueries.TxSkipHi}'
      |ORDER BY month, store_id""".stripMargin)

  /** Metadata-only aggregate twin: the engine answers COUNT/MIN/MAX
    * from manifests alone (zero data reads); the oracle recomputes the
    * same aggregates declaratively over the rollup, so the hash gate
    * proves manifest row counts and folded extremes equal the data's. */
  val txStatsAggregate: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |)
      |SELECT * FROM (
      |  SELECT 'cents' AS "column", count(*) AS n_rows,
      |         CAST(min(cents) AS VARCHAR) AS min_value,
      |         CAST(max(cents) AS VARCHAR) AS max_value,
      |         CAST(sum(cents) AS VARCHAR) AS sum_value FROM monthly
      |  UNION ALL
      |  SELECT 'month', count(*), min(month), max(month),
      |         CAST(NULL AS VARCHAR) FROM monthly
      |  UNION ALL
      |  SELECT 'store_id', count(*), CAST(min(store_id) AS VARCHAR),
      |         CAST(max(store_id) AS VARCHAR),
      |         CAST(sum(store_id) AS VARCHAR) FROM monthly
      |) ORDER BY "column"""".stripMargin)

  /** Predicate-driven skipping twin: the same WHERE computed
    * declaratively — the engine answers it through constraints it
    * derived itself from the parsed predicate, so the hash gate proves
    * the auto-derivation loses no row. */
  val txWhereRead: String = star(
    s""", monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |)
      |SELECT month, store_id, cents FROM monthly
      |WHERE month >= '${EtlQueries.TxSkipLo}' AND month <= '${EtlQueries.TxSkipHi}'
      |  AND store_id = (SELECT min(store_id) FROM monthly) AND cents > 0
      |ORDER BY month, store_id""".stripMargin)

  /** Boundary-exact count twin: both counts computed declaratively —
    * the engine credits fully-contained commits from manifest row
    * counts and scans only boundary files, so the hash gate proves the
    * credited rows are exactly the predicate's rows. */
  val txCountWhere: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |)
      |SELECT * FROM (
      |  SELECT 'complete' AS kind, count(*) AS n FROM monthly
      |  WHERE month >= '1996-07' AND month <= '1998-09'
      |  UNION ALL
      |  SELECT 'fallback', count(*) FROM monthly
      |  WHERE month >= '1996-07' AND month <= '1998-09'
      |    AND (cents > 0 OR month = '')
      |) ORDER BY kind""".stripMargin)

  /** 2-D box twin: the engine answers it through Hilbert-clustered
    * segments pruned by auto-derived constraints; the oracle computes
    * the box declaratively. */
  val txBoxWhere: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |), midx AS (
      |  SELECT CAST((CAST(substring(month, 1, 4) AS INT) - 1992) * 12
      |         + CAST(substring(month, 6, 2) AS INT) - 1 AS BIGINT) AS mi,
      |         store_id, cents
      |  FROM monthly
      |)
      |SELECT mi, store_id, cents FROM midx
      |WHERE mi >= 24 AND mi <= 47 AND store_id >= 5 AND store_id <= 12
      |ORDER BY mi, store_id""".stripMargin)

  /** Boundary-exact aggregate twin: COUNT/MIN/MAX under the predicate
    * computed declaratively — the engine combines manifest extremes of
    * interior commits with one boundary scan. */
  val txStatsWhere: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |), box AS (
      |  SELECT * FROM monthly
      |  WHERE month >= '1996-07' AND month <= '1998-09'
      |)
      |SELECT * FROM (
      |  SELECT 'cents' AS "column", count(*) AS n_rows,
      |         CAST(min(cents) AS VARCHAR) AS min_value,
      |         CAST(max(cents) AS VARCHAR) AS max_value,
      |         CAST(sum(cents) AS VARCHAR) AS sum_value FROM box
      |  UNION ALL
      |  SELECT 'month', count(*), min(month), max(month),
      |         CAST(NULL AS VARCHAR) FROM box
      |) ORDER BY "column"""".stripMargin)

  /** Bloom point-lookup twin: the probe customer's order history
    * computed declaratively — the engine answers it through the
    * bloom-pruned commit read, so the hash gate proves false negatives
    * cannot occur. */
  val txPointLookup: String =
    s"""SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS year,
       |       CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
       |FROM orders
       |WHERE o_custkey = ${EtlQueries.TxProbeCustomer}
       |ORDER BY o_orderkey""".stripMargin

  /** MV-rewrite twin: the per-customer profile recomputed from the
    * RAW orders — what the rule's rollup re-aggregation (sum of sums,
    * sum of counts, min of mins, max of maxes) must land exactly. */
  val mvRewrite: String =
    """WITH o AS (
      |  SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS year,
      |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |)
      |SELECT o_custkey,
      |       CAST(sum(cents) AS BIGINT) AS total_cents,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(count(cents) AS BIGINT) AS n_vals,
      |       CAST(min(cents) AS BIGINT) AS min_cents,
      |       CAST(max(cents) AS BIGINT) AS max_cents
      |FROM o GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  /** Filtered MV-rewrite twin: the same rollup probed through an
    * interior year range, grouped at view grain. */
  val mvRewriteWhere: String =
    """WITH o AS (
      |  SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS year,
      |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |),
      |b AS (SELECT min(year) + 1 AS lo, max(year) - 1 AS hi FROM o)
      |SELECT year,
      |       CAST(sum(cents) AS BIGINT) AS total_cents,
      |       CAST(count(*) AS BIGINT) AS n_orders
      |FROM o, b WHERE year >= b.lo AND year <= b.hi
      |GROUP BY year
      |ORDER BY year""".stripMargin

  /** MV-refresh twin: the per-customer profile over base ∪ delta (the
    * last year's orders restated at doubled cents) — what the
    * incrementally-maintained rollup, served through the rewrite,
    * must land exactly. */
  val mvRefresh: String =
    """WITH o AS (
      |  SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS year,
      |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |),
      |u AS (
      |  SELECT o_custkey, cents FROM o
      |  UNION ALL
      |  SELECT o_custkey, CAST(cents * 2 AS BIGINT) AS cents
      |  FROM o WHERE year = (SELECT max(year) FROM o)
      |)
      |SELECT o_custkey,
      |       CAST(sum(cents) AS BIGINT) AS total_cents,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(min(cents) AS BIGINT) AS min_cents,
      |       CAST(max(cents) AS BIGINT) AS max_cents
      |FROM u GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  /** Streamed-MV twin: the per-customer SUM/COUNT profile over the
    * replay's surviving rows — the mid-replay DELETE masks only the
    * first three years' commits (rows landed before it), so customers
    * hit by it survive through their later-year orders only. What the
    * per-commit incremental maintenance, served through the rewrite,
    * must land exactly. */
  val mvStreamRefresh: String =
    """WITH o AS (
      |  SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS year,
      |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |),
      |y3 AS (SELECT year AS cut FROM (SELECT DISTINCT year FROM o)
      |       ORDER BY year LIMIT 1 OFFSET 2),
      |u AS (
      |  SELECT * FROM o
      |  WHERE NOT (o_custkey % 7 = 3 AND year <= (SELECT cut FROM y3))
      |)
      |SELECT o_custkey,
      |       CAST(sum(cents) AS BIGINT) AS total_cents,
      |       CAST(count(*) AS BIGINT) AS n_orders
      |FROM u GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  /** Stale-MV compensation twin: the full per-customer panel over ALL
    * orders — the engine serves it from the pre-last-year rollup plus
    * the signed tail feed, so hash equality proves
    * γ(view ⊕ feed-tail) ≡ the from-scratch aggregate. */
  val mvStaleRewrite: String =
    """WITH o AS (
      |  SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS year,
      |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |)
      |SELECT o_custkey,
      |       CAST(sum(cents) AS BIGINT) AS total_cents,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(min(cents) AS BIGINT) AS min_cents,
      |       CAST(max(cents) AS BIGINT) AS max_cents
      |FROM o GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  /** AVG-through-the-MV twin: per-year average cents over the raw
    * facts — both engines divide the same exact integral sum by the
    * same count (the 2^53 proof makes the doubles bit-identical), so
    * the divide-last rewrite must hash-match AVG verbatim. */
  val mvAvgRewrite: String =
    """WITH o AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS year,
      |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |)
      |SELECT year,
      |       AVG(cents) AS avg_cents,
      |       CAST(sum(cents) AS BIGINT) AS total_cents,
      |       CAST(count(cents) AS BIGINT) AS n_vals
      |FROM o GROUP BY year
      |ORDER BY year""".stripMargin

  /** Targeted-compensation twin: the per-customer panel over the
    * SURVIVING rows — the delete retracted every seventh customer from
    * the pre-last-year load, the last year re-inserted its share — so
    * hash equality proves view ⊕ tail ⊕ affected-groups-recompute ≡
    * the from-scratch aggregate over survivors. */
  val mvDeleteRewrite: String =
    """WITH o AS (
      |  SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS year,
      |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |),
      |mx AS (SELECT max(year) AS m FROM o),
      |u AS (
      |  SELECT * FROM o WHERE year = (SELECT m FROM mx)
      |  UNION ALL
      |  SELECT * FROM o
      |  WHERE year < (SELECT m FROM mx) AND o_custkey % 7 <> 3
      |)
      |SELECT o_custkey,
      |       CAST(sum(cents) AS BIGINT) AS total_cents,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(min(cents) AS BIGINT) AS min_cents,
      |       CAST(max(cents) AS BIGINT) AS max_cents
      |FROM u GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  /** Rollup-through-the-MV twin: DuckDB's ROLLUP over the raw orders —
    * what the per-grouping-set view branches, unioned with the
    * grouping-id restored, must land exactly (DuckDB's GROUPING(a, b)
    * bit order matches Spark's grouping_id: first argument is the
    * most significant bit). */
  val mvRollupRewrite: String =
    """WITH o AS (
      |  SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS year,
      |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |)
      |SELECT year, o_custkey,
      |       CAST(sum(cents) AS BIGINT) AS total_cents,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(min(cents) AS BIGINT) AS min_cents,
      |       CAST(max(cents) AS BIGINT) AS max_cents,
      |       CAST(GROUPING(year, o_custkey) AS BIGINT) AS gid
      |FROM o GROUP BY ROLLUP(year, o_custkey)
      |ORDER BY gid, year NULLS FIRST, o_custkey NULLS FIRST""".stripMargin

  /** Composed-MV twin: DuckDB's ROLLUP over the SURVIVING rows (the
    * delete's complement below the last year, everything in the tail
    * year) — what the per-grouping-set branches, each served through
    * the targeted retraction compensation, must land exactly. */
  val mvRollupStaleDelete: String =
    """WITH o AS (
      |  SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS year,
      |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |),
      |mx AS (SELECT max(year) AS m FROM o),
      |u AS (
      |  SELECT * FROM o WHERE year = (SELECT m FROM mx)
      |  UNION ALL
      |  SELECT * FROM o
      |  WHERE year < (SELECT m FROM mx) AND o_custkey % 7 <> 3
      |)
      |SELECT year, o_custkey,
      |       CAST(sum(cents) AS BIGINT) AS total_cents,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(min(cents) AS BIGINT) AS min_cents,
      |       CAST(max(cents) AS BIGINT) AS max_cents,
      |       CAST(GROUPING(year, o_custkey) AS BIGINT) AS gid
      |FROM u GROUP BY ROLLUP(year, o_custkey)
      |ORDER BY gid, year NULLS FIRST, o_custkey NULLS FIRST""".stripMargin

  /** Multi-view-selection twin: the per-year panel recomputed from the
    * raw orders — the engine must land it from the coarse (year)
    * rollup chosen over the covering-but-larger customer cube. */
  val mvMultiRewrite: String =
    """WITH o AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS year,
      |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |)
      |SELECT year,
      |       CAST(sum(cents) AS BIGINT) AS total_cents,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(min(cents) AS BIGINT) AS min_cents,
      |       CAST(max(cents) AS BIGINT) AS max_cents
      |FROM o GROUP BY year
      |ORDER BY year""".stripMargin

  val txOverwrite: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |lastm AS (SELECT max(month) AS m FROM monthly),
      |restated AS (
      |  SELECT substring(CAST(f.time_id AS VARCHAR), 1, 7) AS month, f.store_id,
      |         CAST(sum(CAST(f.total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact f
      |  JOIN dim_time t ON t.time_id = f.time_id AND NOT t.is_weekend
      |  WHERE substring(CAST(f.time_id AS VARCHAR), 1, 7) = (SELECT m FROM lastm)
      |  GROUP BY 1, 2
      |)
      |SELECT month, store_id, cents FROM monthly
      |WHERE month <> (SELECT m FROM lastm)
      |UNION ALL
      |SELECT month, store_id, cents FROM restated
      |ORDER BY month, store_id""".stripMargin)

  /** Candidate-key twin: one per-key-count subquery per candidate from
    * the SHARED [[EtlQueries.KeyCandidates]] list, rolled up and
    * unioned. DuckDB's sum(BIGINT) widens to HUGEINT, so n_rows /
    * n_dup_keys are cast back to BIGINT to match the engine's LongType. */
  val keyCandidates: String =
    EtlQueries.KeyCandidates.map { case (table, label, cols) =>
      s"""SELECT '$label' AS candidate,
         |       CAST(sum(c) AS BIGINT) AS n_rows,
         |       count(*) AS ndv,
         |       CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
         |       max(c) AS max_dup,
         |       count(*) = CAST(sum(c) AS BIGINT) AS is_key
         |FROM (SELECT count(*) AS c FROM $table GROUP BY ${cols.mkString(", ")})""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY candidate")

  /** FD-audit twin: GROUP BY lhs with a distinct-rhs count per FD from
    * the SHARED [[EtlQueries.FdChecks]] list, rolled up and unioned. */
  val fdAudit: String =
    EtlQueries.FdChecks.map { case (table, lhs, rhs) =>
      s"""SELECT '$table: $lhs -> $rhs' AS fd,
         |       count(*) AS n_lhs,
         |       CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_lhs,
         |       max(n_rhs) AS max_rhs_per_lhs,
         |       CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT) = 0 AS holds
         |FROM (SELECT count(DISTINCT $rhs) AS n_rhs FROM $table GROUP BY $lhs)""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY fd")

  /** Time-travel diff twin: the DECLARATIVE change feed between the
    * original rollup and the weekday-only restatement of its last
    * month — what the sink's two versioned reads must reconstruct. */
  val txVersionDiff: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |lastm AS (
      |  SELECT max(substring(CAST(f.time_id AS VARCHAR), 1, 7)) AS m
      |  FROM sales_fact f
      |  JOIN dim_time t ON t.time_id = f.time_id AND t.is_weekend
      |),
      |restated AS (
      |  SELECT substring(CAST(f.time_id AS VARCHAR), 1, 7) AS month, f.store_id,
      |         CAST(sum(CAST(f.total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact f
      |  JOIN dim_time t ON t.time_id = f.time_id AND NOT t.is_weekend
      |  WHERE substring(CAST(f.time_id AS VARCHAR), 1, 7) = (SELECT m FROM lastm)
      |  GROUP BY 1, 2
      |),
      |before_m AS (SELECT * FROM monthly WHERE month = (SELECT m FROM lastm)),
      |diff AS (
      |  SELECT coalesce(b.month, r.month) AS month,
      |         coalesce(b.store_id, r.store_id) AS store_id,
      |         b.cents AS cents_before, r.cents AS cents_after
      |  FROM before_m b FULL OUTER JOIN restated r
      |    ON b.month = r.month AND b.store_id = r.store_id
      |)
      |SELECT month, store_id, cents_before, cents_after,
      |       CASE WHEN cents_after IS NULL THEN 'D'
      |            WHEN cents_before IS NULL THEN 'I'
      |            ELSE 'U' END AS op
      |FROM diff
      |WHERE cents_before IS NULL OR cents_after IS NULL
      |   OR cents_before <> cents_after
      |ORDER BY month, store_id""".stripMargin)

  /** Row-level-delete twin: the final table state computed
    * declaratively — everything except the predicate-matching rows,
    * plus the re-inserted recent slice. The engine reaches it through
    * the sink's O(1) predicate-tombstone commit and masked read path;
    * equality proves SQL DELETE semantics (predicate-true rows hidden,
    * NULL keeps, later appends untouched) on real data. */
  val txDelete: String = star(
    s""", monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |)
      |SELECT month, store_id, cents FROM monthly
      |WHERE NOT (store_id % 7 = 3)
      |   OR month >= '${EtlQueries.TxDeleteRestoreFrom}'
      |ORDER BY month, store_id""".stripMargin)

  /** Change-data-feed twin: the full I/D stream derived declaratively —
    * per-year inserts at the year's rank, the overwrite's delete/insert
    * pair at version n (n = number of year commits), the predicate
    * delete's matches over the post-overwrite state at n+1. Equality
    * proves [[EtlQueries.txChangeFeed]]'s manifest-reconstructed feed
    * carries every commit's exact row-level effect. */
  val txChangeFeed: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |lastm AS (SELECT max(month) AS m FROM monthly),
      |ny AS (
      |  SELECT CAST(count(DISTINCT substring(month, 1, 4)) AS BIGINT) AS n
      |  FROM monthly
      |),
      |inserts AS (
      |  SELECT CAST(dense_rank() OVER (ORDER BY substring(month, 1, 4)) - 1
      |              AS BIGINT) AS version,
      |         'I' AS op, month, store_id, cents
      |  FROM monthly
      |),
      |ow_d AS (
      |  SELECT (SELECT n FROM ny) AS version, 'D' AS op, month, store_id, cents
      |  FROM monthly WHERE month = (SELECT m FROM lastm)
      |),
      |ow_i AS (
      |  SELECT (SELECT n FROM ny) AS version, 'I' AS op, month, store_id,
      |         CAST(cents * 2 AS BIGINT) AS cents
      |  FROM monthly WHERE month = (SELECT m FROM lastm)
      |),
      |post AS (
      |  SELECT month, store_id, cents FROM monthly
      |  WHERE month <> (SELECT m FROM lastm)
      |  UNION ALL
      |  SELECT month, store_id, CAST(cents * 2 AS BIGINT) AS cents
      |  FROM monthly WHERE month = (SELECT m FROM lastm)
      |),
      |del_d AS (
      |  SELECT (SELECT n FROM ny) + 1 AS version, 'D' AS op, month,
      |         store_id, cents
      |  FROM post WHERE store_id % 7 = 3
      |)
      |SELECT * FROM (
      |  SELECT * FROM inserts UNION ALL SELECT * FROM ow_d
      |  UNION ALL SELECT * FROM ow_i UNION ALL SELECT * FROM del_d)
      |ORDER BY version, op, month, store_id""".stripMargin)

  /** Dynamic-file-pruning twin: the selective dimension join computed
    * declaratively — the engine serves the fact side through the
    * any-of bloom-pruned commit read, so the hash gate proves pruning
    * with a collected key SET loses no joining row. */
  val txDfpJoin: String =
    s"""SELECT c.c_custkey, c.c_name, o.o_orderkey,
       |       CAST(year(o.o_orderdate) AS INT) AS year,
       |       CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
       |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       |WHERE c.c_custkey % ${EtlQueries.TxDfpCustomerMod} = 1
       |ORDER BY o.o_orderkey""".stripMargin

  /** SCD-1 key-grain upsert twin: the final state computed
    * declaratively — original rows minus the updated keys, plus the
    * update batch (matched keys restated, shifted keys inserted). The
    * engine reaches it through key-granularity replace commits; the
    * hash gate proves key-grain replace = UPDATE ∪ INSERT. */
  val txUpsertScd1: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |lastm AS (SELECT max(month) AS m FROM monthly),
      |upd AS (
      |  SELECT month, store_id, CAST(cents + 10 AS BIGINT) AS cents
      |  FROM monthly
      |  WHERE month = (SELECT m FROM lastm) AND store_id % 3 = 0
      |)
      |SELECT month, store_id, cents FROM (
      |  SELECT month, store_id, cents FROM monthly
      |  WHERE NOT (month = (SELECT m FROM lastm) AND store_id % 3 = 0)
      |  UNION ALL
      |  SELECT month, store_id, cents FROM upd
      |  UNION ALL
      |  SELECT month, store_id + 100000 AS store_id, cents FROM upd)
      |ORDER BY month, store_id""".stripMargin)

  /** Metadata-moments twin: n / non-null n / Σx / Σx² / n·Σx²−(Σx)²
    * recomputed declaratively in DuckDB HUGEINT — exact integers in
    * both engines, so the VARCHAR renderings must match digit for
    * digit. */
  val txMoments: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |)
      |SELECT * FROM (
      |  SELECT 'cents' AS "column", count(*) AS n_rows,
      |         CAST(count(cents) AS VARCHAR) AS n_vals,
      |         CAST(sum(cents) AS VARCHAR) AS sum_value,
      |         CAST(sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT))
      |              AS VARCHAR) AS sumsq_value,
      |         CAST(CAST(count(cents) AS HUGEINT) *
      |                sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) -
      |              CAST(sum(cents) AS HUGEINT) * CAST(sum(cents) AS HUGEINT)
      |              AS VARCHAR) AS var_num_value
      |  FROM monthly
      |  UNION ALL
      |  SELECT 'store_id', count(*),
      |         CAST(count(store_id) AS VARCHAR),
      |         CAST(sum(store_id) AS VARCHAR),
      |         CAST(sum(CAST(store_id AS HUGEINT) * CAST(store_id AS HUGEINT))
      |              AS VARCHAR),
      |         CAST(CAST(count(store_id) AS HUGEINT) *
      |                sum(CAST(store_id AS HUGEINT) * CAST(store_id AS HUGEINT)) -
      |              CAST(sum(store_id) AS HUGEINT) * CAST(sum(store_id) AS HUGEINT)
      |              AS VARCHAR)
      |  FROM monthly
      |) ORDER BY "column"""".stripMargin)

  /** Streamed-merge twin: the month-sliced change batches (running
    * cumulative upserts, then deletes of store_id % 7 = 3) must land
    * the table on the plain per-store total minus the deletes —
    * convergence of the streamed conditional merge, redeliveries
    * included, computed declaratively. */
  val streamTxMerge: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |)
      |SELECT store_id, CAST(sum(cents) AS BIGINT) AS cents
      |FROM monthly
      |WHERE NOT store_id % 7 = 3
      |GROUP BY store_id
      |ORDER BY store_id""".stripMargin)

  /** Count-pushdown-rule twin: the first year's row count computed
    * declaratively — what the rewritten literal must equal. */
  val txCountRule: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |y AS (SELECT min(substring(month, 1, 4)) AS y0 FROM monthly)
      |SELECT CAST(count(*) AS BIGINT) AS n_rows FROM monthly
      |WHERE month >= (SELECT y0 || '-01' FROM y)
      |  AND month <= (SELECT y0 || '-12' FROM y)""".stripMargin)

  /** Boundary-exact-moments twin: the predicate's rows' moments
    * recomputed declaratively in HUGEINT — credited interiors plus
    * boundary scans must land on every digit. */
  val txMomentsWhere: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |rng AS (
      |  SELECT * FROM monthly
      |  WHERE month >= '1996-07' AND month <= '1998-09'
      |)
      |SELECT * FROM (
      |  SELECT 'cents' AS "column", count(*) AS n_rows,
      |         CAST(count(cents) AS VARCHAR) AS n_vals,
      |         CAST(sum(cents) AS VARCHAR) AS sum_value,
      |         CAST(sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT))
      |              AS VARCHAR) AS sumsq_value,
      |         CAST(CAST(count(cents) AS HUGEINT) *
      |                sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) -
      |              CAST(sum(cents) AS HUGEINT) * CAST(sum(cents) AS HUGEINT)
      |              AS VARCHAR) AS var_num_value
      |  FROM rng
      |  UNION ALL
      |  SELECT 'store_id', count(*),
      |         CAST(count(store_id) AS VARCHAR),
      |         CAST(sum(store_id) AS VARCHAR),
      |         CAST(sum(CAST(store_id AS HUGEINT) * CAST(store_id AS HUGEINT))
      |              AS VARCHAR),
      |         CAST(CAST(count(store_id) AS HUGEINT) *
      |                sum(CAST(store_id AS HUGEINT) * CAST(store_id AS HUGEINT)) -
      |              CAST(sum(store_id) AS HUGEINT) * CAST(sum(store_id) AS HUGEINT)
      |              AS VARCHAR)
      |  FROM rng
      |) ORDER BY "column"""".stripMargin)

  /** Profile-pushdown-rule twin: the whole aggregate panel computed
    * declaratively — what the rewritten literal row must equal. */
  val txAggRule: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |)
      |SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(count(cents) AS BIGINT) AS n_vals,
      |       CAST(min(cents) AS BIGINT) AS min_cents,
      |       CAST(max(cents) AS BIGINT) AS max_cents,
      |       CAST(sum(cents) AS BIGINT) AS sum_cents,
      |       min(month) AS min_month,
      |       max(month) AS max_month
      |FROM monthly""".stripMargin)

  /** SQL-catalog data-path twin: the first-two-years monthly totals
    * the catalog-resolved SQL must reproduce. */
  val txSqlCatalog: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |ys AS (SELECT DISTINCT substring(month, 1, 4) AS y FROM monthly),
      |b AS (SELECT (SELECT y FROM ys ORDER BY y LIMIT 1) || '-01' AS lo,
      |             (SELECT y FROM ys ORDER BY y LIMIT 1 OFFSET 1) || '-12' AS hi)
      |SELECT month, CAST(sum(cents) AS BIGINT) AS cents,
      |       CAST(count(*) AS BIGINT) AS n_stores
      |FROM monthly
      |WHERE month >= (SELECT lo FROM b) AND month <= (SELECT hi FROM b)
      |GROUP BY month ORDER BY month""".stripMargin)

  /** SQL-catalog rule-path twin: the same whole-profile panel as
    * [[txAggRule]] — the catalog path must land on identical digits. */
  val txSqlAggRule: String = txAggRule

  /** NDV-rule twin: the KMV estimator recomputed declaratively over
    * the rollup — distinct md5-prefix hashes, bottom-64, exact size
    * below capacity else `63 · 2³² / h₆₄` — what the manifest-sketch
    * fold's literal must equal bit-for-bit. */
  val txNdvRule: String = {
    def h(e: String, sfx: String): String = graft.ext.ExtOracleSql.h32(e, sfx)
    star(
      s""", monthly AS (
         |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
         |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
         |  FROM sales_fact GROUP BY 1, 2
         |),
         |hs AS (SELECT DISTINCT ${h("CAST(store_id AS VARCHAR)", "ns")} AS h FROM monthly),
         |rs AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hs),
         |es AS (SELECT CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
         |              ELSE CAST(63 AS DOUBLE) * CAST(4294967296 AS DOUBLE)
         |                   / CAST(max(CASE WHEN rn = 64 THEN h END) AS DOUBLE)
         |              END AS ndv_store
         |       FROM rs WHERE rn <= 64),
         |hc AS (SELECT DISTINCT ${h("CAST(cents AS VARCHAR)", "nc")} AS h FROM monthly),
         |rc AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hc),
         |ec AS (SELECT CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
         |              ELSE CAST(63 AS DOUBLE) * CAST(4294967296 AS DOUBLE)
         |                   / CAST(max(CASE WHEN rn = 64 THEN h END) AS DOUBLE)
         |              END AS ndv_cents
         |       FROM rc WHERE rn <= 64)
         |SELECT es.ndv_store, ec.ndv_cents,
         |       (SELECT CAST(count(*) AS BIGINT) FROM monthly) AS n_rows
         |FROM es, ec""".stripMargin)
  }

  /** Exact-distinct-rule twin: plain COUNT(DISTINCT year) + COUNT(*)
    * over the rollup — the partition-grain manifest fold's literal
    * must equal the declarative distinct count exactly. */
  val txDistinctRule: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |)
      |SELECT CAST(count(DISTINCT substring(month, 1, 4)) AS BIGINT) AS n_years,
      |       CAST(count(*) AS BIGINT) AS n_rows
      |FROM monthly""".stripMargin)

  /** Filtered-profile-rule twin: the commit-aligned two-year range
    * panel recomputed declaratively — the literal the Catalyst rule
    * substitutes from Full/Excluded manifest credit must land on
    * every digit of the data's own answer. */
  val txStatsRule: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |ys AS (SELECT DISTINCT substring(month, 1, 4) AS y FROM monthly),
      |b AS (SELECT (SELECT y FROM ys ORDER BY y LIMIT 1 OFFSET 1) || '-01' AS lo,
      |             (SELECT y FROM ys ORDER BY y LIMIT 1 OFFSET 2) || '-12' AS hi)
      |SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(count(cents) AS BIGINT) AS n_vals,
      |       CAST(min(cents) AS BIGINT) AS min_cents,
      |       CAST(max(cents) AS BIGINT) AS max_cents,
      |       CAST(sum(cents) AS BIGINT) AS sum_cents,
      |       min(month) AS min_month,
      |       max(month) AS max_month
      |FROM monthly, b
      |WHERE month >= b.lo AND month <= b.hi""".stripMargin)

  /** Grouped-rule twin: the per-year profile recomputed declaratively —
    * the literal rows the rule folds from partition-grain manifests
    * must equal the data's own GROUP BY. */
  val txGroupRule: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |)
      |SELECT substring(month, 1, 4) AS y,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(min(cents) AS BIGINT) AS min_cents,
      |       CAST(max(cents) AS BIGINT) AS max_cents,
      |       CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM monthly GROUP BY 1 ORDER BY y""".stripMargin)

  /** Rollup-rule twin: DuckDB's ROLLUP over the per-year panel — what
    * the per-grouping-set manifest folds, unioned with the grouping
    * id restored, must land exactly. */
  val txRollupRule: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |y AS (SELECT substring(month, 1, 4) AS y, cents FROM monthly)
      |SELECT y,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(min(cents) AS BIGINT) AS min_cents,
      |       CAST(max(cents) AS BIGINT) AS max_cents,
      |       CAST(sum(cents) AS BIGINT) AS sum_cents,
      |       CAST(GROUPING(y) AS BIGINT) AS gid
      |FROM y GROUP BY ROLLUP(y)
      |ORDER BY gid, y NULLS FIRST""".stripMargin)

  /** Grouped-AVG-rule twin: per-year average cents recomputed
    * declaratively — both engines divide the same exact integral sum
    * by the same non-null count (the 2^53 proof makes the doubles
    * bit-identical), so the zero-scan literal must hash-match AVG
    * verbatim. */
  val txAvgRule: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |)
      |SELECT substring(month, 1, 4) AS y,
      |       AVG(cents) AS avg_cents,
      |       CAST(count(cents) AS BIGINT) AS n_vals,
      |       CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM monthly GROUP BY 1 ORDER BY y""".stripMargin)

  /** Composite-grouped-rule twin: the filtered per-(year, half)
    * profile recomputed declaratively — the literal rows the rule
    * folds from two-dimension partition-grain manifests must equal the
    * data's own composite GROUP BY (first year restricted to h1). */
  val txGroupMultiRule: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |tagged AS (
      |  SELECT substring(month, 1, 4) AS y,
      |         CASE WHEN CAST(substring(month, 6, 2) AS INT) <= 6
      |              THEN 'h1' ELSE 'h2' END AS hh,
      |         cents
      |  FROM monthly
      |),
      |ys AS (SELECT DISTINCT substring(month, 1, 4) AS y FROM monthly),
      |b AS (SELECT (SELECT y FROM ys ORDER BY y LIMIT 1 OFFSET 1) AS lo)
      |SELECT y, hh,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(min(cents) AS BIGINT) AS min_cents,
      |       CAST(max(cents) AS BIGINT) AS max_cents,
      |       CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM tagged, b
      |WHERE y >= b.lo AND (hh = 'h1' OR y > b.lo)
      |GROUP BY y, hh ORDER BY y, hh""".stripMargin)

  /** Cross-table-transaction twin: the declarative end-state of the
    * two archiving transfers — months 01/02 tagged 'archive',
    * everything else 'ledger' with every store present (the crashed
    * mid-replay delete must leave zero trace). */
  val txMulti: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |)
      |SELECT CASE WHEN substring(month, 6, 2) IN ('01', '02')
      |            THEN 'archive' ELSE 'ledger' END AS src,
      |       month, store_id, cents
      |FROM monthly
      |ORDER BY src, month, store_id""".stripMargin)

  /** Streamed-cross-table twin: both sides of the fact+aggregate pair
    * recomputed declaratively from the raw facts — what the
    * exactly-once transactional replay (redelivery skipped whole,
    * crashed duplicate repaired) must land on BOTH tables. */
  val streamTxMulti: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |yearly AS (
      |  SELECT substring(month, 1, 4) AS y,
      |         store_id, CAST(sum(cents) AS BIGINT) AS cents
      |  FROM monthly GROUP BY 1, 2
      |)
      |SELECT store_id,
      |       CAST(sum(cents) AS BIGINT) AS agg_cents,
      |       CAST(sum(cents) AS BIGINT) AS fact_cents,
      |       CAST(count(*) AS BIGINT) AS n_years
      |FROM yearly GROUP BY store_id
      |ORDER BY store_id""".stripMargin)

  /** Grouped+filtered-rule twin: the interior-year range of the
    * per-year profile recomputed declaratively — the literal rows the
    * rule emits for the surviving groups must equal the data's own
    * filtered GROUP BY. */
  val txGroupWhereRule: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |ys AS (SELECT DISTINCT substring(month, 1, 4) AS y FROM monthly),
      |b AS (SELECT (SELECT y FROM ys ORDER BY y LIMIT 1 OFFSET 1) AS lo,
      |             (SELECT y FROM ys ORDER BY y DESC LIMIT 1 OFFSET 1) AS hi)
      |SELECT substring(month, 1, 4) AS y,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(min(cents) AS BIGINT) AS min_cents,
      |       CAST(max(cents) AS BIGINT) AS max_cents,
      |       CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM monthly, b
      |WHERE substring(month, 1, 4) >= b.lo AND substring(month, 1, 4) <= b.hi
      |GROUP BY 1 ORDER BY y""".stripMargin)

  /** UPDATE WHERE twin: the declarative CASE spelling of the same
    * UPDATE — the mask-plus-rewrite commit must land exactly here. */
  val txUpdate: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |)
      |SELECT month, store_id,
      |       CAST(CASE WHEN store_id % 5 = 2 THEN cents * 3 ELSE cents END
      |            AS BIGINT) AS cents
      |FROM monthly
      |ORDER BY month, store_id""".stripMargin)

  /** MERGE INTO twin: the final state computed declaratively — the
    * matched-update branch doubled (s.cents == t.cents for a source
    * that restates the same rows), the matched-delete branch absent,
    * untouched matched rows and earlier months verbatim, inserts
    * appended. Hash equality proves the engine's single-commit
    * key-grain merge ≡ MERGE semantics. */
  val txMerge: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |lastm AS (SELECT max(month) AS m FROM monthly),
      |last_rows AS (
      |  SELECT month, store_id, cents FROM monthly
      |  WHERE month = (SELECT m FROM lastm)
      |)
      |SELECT month, store_id, cents FROM (
      |  SELECT month, store_id, CAST(cents * 2 AS BIGINT) AS cents
      |  FROM last_rows WHERE store_id % 3 = 0
      |  UNION ALL
      |  SELECT month, store_id, cents FROM monthly
      |  WHERE NOT (month = (SELECT m FROM lastm) AND store_id % 3 IN (0, 1))
      |  UNION ALL
      |  SELECT month, store_id + 100000 AS store_id, cents
      |  FROM last_rows WHERE store_id % 3 = 0)
      |ORDER BY month, store_id""".stripMargin)

  /** Merge-policy twin: the half-year accumulation replay's final
    * state is each store's grand total (bootstrap insert + one
    * `cents += s.cents` merge per later half ≡ SUM over all months) —
    * identical for the maintained and unmaintained arms, so this one
    * oracle gates the registered row while the bench pair measures
    * what the maintenance policy is worth to a reader. */
  val txMergePolicy: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |)
      |SELECT store_id, CAST(sum(cents) AS BIGINT) AS cents
      |FROM monthly GROUP BY store_id
      |ORDER BY store_id""".stripMargin)

  /** CDC-consumer twin: the per-store aggregate over the FINAL table
    * state (post-restatement, post-delete) computed declaratively —
    * what the engine's feed-folded maintenance must reproduce. */
  val txCdfApply: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |lastm AS (SELECT max(month) AS m FROM monthly),
      |post AS (
      |  SELECT month, store_id, cents FROM monthly
      |  WHERE month <> (SELECT m FROM lastm)
      |  UNION ALL
      |  SELECT month, store_id, CAST(cents * 2 AS BIGINT) AS cents
      |  FROM monthly WHERE month = (SELECT m FROM lastm)
      |)
      |SELECT store_id, CAST(sum(cents) AS BIGINT) AS cents_total,
      |       CAST(count(*) AS BIGINT) AS n_rows
      |FROM post
      |WHERE NOT (store_id % 7 = 3)
      |GROUP BY store_id
      |ORDER BY store_id""".stripMargin)

  /** Shallow-clone twin: BOTH final states computed declaratively —
    * the source as the plain rollup, the clone as the delete + restore
    * state ([[txDelete]]'s algebra), tagged by side. Equality proves
    * the clone's borrowed-file reads carry full delete/append
    * semantics while the source is untouched by the divergence. */
  val txClone: String = star(
    s""", monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |)
      |SELECT side, month, store_id, cents FROM (
      |  SELECT 'src' AS side, month, store_id, cents FROM monthly
      |  UNION ALL
      |  SELECT 'clone' AS side, month, store_id, cents FROM monthly
      |  WHERE NOT (store_id % 7 = 3)
      |     OR month >= '${EtlQueries.TxDeleteRestoreFrom}'
      |)
      |ORDER BY side, month, store_id""".stripMargin)

  /** Constrained-load twin: the plain declarative rollup — what the
    * constrained table must hold iff every valid batch passed and
    * every must-reject probe left no trace. */
  val txConstrained: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |)
      |SELECT month, store_id, cents FROM monthly
      |ORDER BY month, store_id""".stripMargin)

  /** Manifest-sketch join-cardinality twin: re-derives BOTH sides —
    * the KMV sketches from the same md5-contract hashes (the
    * union-truncate fold across commits equals the global bottom-k, a
    * semilattice identity, so the twin sketches the whole table in one
    * window) and the estimates from the same IEEE expression trees
    * ([[graft.functions.KmvSketchAgg.estimateExpr]]'s CASE, the
    * match-fraction and uniform-multiplicity planner rules in the same
    * operation order). */
  val txJoinCard: String = {
    def h32d(e: String, sfx: String): String = graft.ext.ExtOracleSql.h32(e, sfx)
    def est(cnt: String, mx: String): String =
      s"""CASE WHEN $cnt < 64 THEN CAST($cnt AS DOUBLE)
         |     ELSE CAST(63 AS DOUBLE) * CAST(4294967296 AS DOUBLE)
         |          / CAST($mx AS DOUBLE) END""".stripMargin
    star(
      s""", monthly AS (
         |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
         |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
         |  FROM sales_fact GROUP BY 1, 2
         |),
         |ha AS (SELECT DISTINCT ${h32d("CAST(store_id AS VARCHAR)", "ja")} AS h FROM monthly),
         |hb AS (SELECT DISTINCT ${h32d("CAST(s_nationkey AS VARCHAR)", "jb")} AS h FROM supplier),
         |hc AS (SELECT DISTINCT ${h32d("CAST(cents AS VARCHAR)", "jc")} AS h FROM monthly),
         |ska AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM ha) WHERE rn <= 64),
         |skb AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hb) WHERE rn <= 64),
         |skc AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hc) WHERE rn <= 64),
         |ea AS (SELECT ${est("count(*)", "max(h)")} AS d FROM ska),
         |eb AS (SELECT ${est("count(*)", "max(h)")} AS d FROM skb),
         |ec AS (SELECT ${est("count(*)", "max(h)")} AS d FROM skc),
         |uu AS (SELECT h FROM (
         |  SELECT h, row_number() OVER (ORDER BY h) AS rn
         |  FROM (SELECT h FROM ska UNION SELECT h FROM skb)) WHERE rn <= 64),
         |eu AS (SELECT ${est("count(*)", "max(h)")} AS d, CAST(count(*) AS BIGINT) AS usize FROM uu),
         |mm AS (SELECT CAST(count(*) AS BIGINT) AS m
         |       FROM uu JOIN ska USING (h) JOIN skb USING (h)),
         |rows_ AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM monthly) AS ra,
         |                 (SELECT CAST(count(*) AS BIGINT) FROM supplier) AS rb),
         |exact AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_match_exact,
         |         CAST(sum(ca * cb) AS BIGINT) AS join_exact
         |  FROM (SELECT store_id, CAST(count(*) AS BIGINT) AS ca FROM monthly GROUP BY 1) a
         |  JOIN (SELECT s_nationkey AS store_id, CAST(count(*) AS BIGINT) AS cb
         |        FROM supplier GROUP BY 1) b USING (store_id)
         |),
         |nmk AS (SELECT (CAST(mm.m AS DOUBLE) / CAST(eu.usize AS DOUBLE)) * eu.d AS v
         |        FROM mm, eu)
         |SELECT rows_.ra AS rows_a, rows_.rb AS rows_b,
         |       (SELECT CAST(count(DISTINCT store_id) AS BIGINT) FROM monthly) AS d_a_exact,
         |       ea.d AS d_a_kmv,
         |       (SELECT CAST(count(DISTINCT s_nationkey) AS BIGINT) FROM supplier) AS d_b_exact,
         |       eb.d AS d_b_kmv,
         |       (SELECT CAST(count(DISTINCT cents) AS BIGINT) FROM monthly) AS d_cents_exact,
         |       ec.d AS d_cents_kmv,
         |       exact.n_match_exact, nmk.v AS n_match_kmv,
         |       exact.join_exact,
         |       nmk.v * (CAST(rows_.ra AS DOUBLE) / ea.d)
         |             * (CAST(rows_.rb AS DOUBLE) / eb.d) AS join_kmv,
         |       (nmk.v * (CAST(rows_.ra AS DOUBLE) / ea.d)
         |              * (CAST(rows_.rb AS DOUBLE) / eb.d)
         |        - CAST(exact.join_exact AS DOUBLE))
         |         / CAST(exact.join_exact AS DOUBLE) AS rel_err
         |FROM rows_, ea, eb, ec, eu, mm, exact, nmk""".stripMargin)
  }

  /** CONVERT twin: the adopted rollup minus the deleted stores —
    * served through hard-linked bytes on the Spark side. */
  val txConvert: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |)
      |SELECT month, store_id, cents FROM monthly
      |WHERE store_id % 7 <> 3
      |ORDER BY month, store_id""".stripMargin)

  /** DESCRIBE-HISTORY twin: the lifecycle's audit log derived
    * declaratively — append versions by year rank with the year's
    * group count, the overwrite at version n with the last month's
    * count, the O(1) delete at n+1 with zero rows and zero files. */
  val txHistory: String = star(
    """, monthly AS (
      |  SELECT substring(CAST(time_id AS VARCHAR), 1, 7) AS month, store_id
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |peryear AS (
      |  SELECT substring(month, 1, 4) AS y, CAST(count(*) AS BIGINT) AS n
      |  FROM monthly GROUP BY 1
      |),
      |ny AS (SELECT CAST(count(*) AS BIGINT) AS n FROM peryear),
      |lastm AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n FROM monthly
      |  WHERE month = (SELECT max(month) FROM monthly)
      |)
      |SELECT version, operation, n_rows, n_files FROM (
      |  SELECT CAST(dense_rank() OVER (ORDER BY y) - 1 AS BIGINT) AS version,
      |         'append' AS operation, n AS n_rows, CAST(1 AS BIGINT) AS n_files
      |  FROM peryear
      |  UNION ALL
      |  SELECT (SELECT n FROM ny), 'overwrite', (SELECT n FROM lastm),
      |         CAST(1 AS BIGINT)
      |  UNION ALL
      |  SELECT (SELECT n FROM ny) + 1, 'delete', CAST(0 AS BIGINT),
      |         CAST(0 AS BIGINT)
      |)
      |ORDER BY version""".stripMargin)

  /** Max-drawdown twin: the same running-max / earliest-trough /
    * first-recovery window algebra over exact integer cents. */
  val maxDrawdown: String = star(
    """, monthly AS (
      |  SELECT store_id, substring(CAST(time_id AS VARCHAR), 1, 7) AS month,
      |         CAST(sum(CAST(total_revenue * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM sales_fact GROUP BY 1, 2
      |),
      |dd AS (
      |  SELECT store_id, month, cents,
      |         max(cents) OVER (PARTITION BY store_id ORDER BY month
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      |  FROM monthly
      |),
      |maxdd AS (
      |  SELECT store_id, CAST(max(peak - cents) AS BIGINT) AS max_dd
      |  FROM dd GROUP BY store_id
      |),
      |trough AS (
      |  SELECT store_id, max_dd, month AS trough_month, peak AS peak_cents
      |  FROM (
      |    SELECT d.store_id, m.max_dd, d.month, d.peak,
      |           row_number() OVER (PARTITION BY d.store_id
      |                              ORDER BY d.month) AS rn
      |    FROM dd d JOIN maxdd m ON m.store_id = d.store_id
      |    WHERE d.peak - d.cents = m.max_dd
      |  ) WHERE rn = 1
      |),
      |recovery AS (
      |  SELECT d.store_id, min(d.month) AS recovery_month
      |  FROM dd d JOIN trough t ON t.store_id = d.store_id
      |  WHERE d.month > t.trough_month AND d.cents >= t.peak_cents
      |  GROUP BY d.store_id
      |)
      |SELECT t.store_id, t.max_dd, t.trough_month,
      |       CAST(t.peak_cents AS BIGINT) AS peak_cents, r.recovery_month
      |FROM trough t LEFT JOIN recovery r ON r.store_id = t.store_id
      |ORDER BY t.store_id""".stripMargin)

  /** FIFO-allocation twin: the identical dual prefix sums (same
    * extended window order key) and interval-overlap match, exact
    * BIGINT units. */
  val fifoAllocation: String =
    """WITH led AS (
      |  SELECT l_partkey, l_orderkey, l_linenumber, l_suppkey, l_shipdate,
      |         CAST(l_quantity AS BIGINT) AS qty, l_returnflag
      |  FROM lineitem
      |),
      |supply AS (
      |  SELECT *, SUM(qty) OVER (PARTITION BY l_partkey
      |      ORDER BY l_shipdate, l_orderkey, l_linenumber, l_suppkey, qty
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_end
      |  FROM led WHERE l_returnflag <> 'R'
      |),
      |demand AS (
      |  SELECT *, SUM(qty) OVER (PARTITION BY l_partkey
      |      ORDER BY l_shipdate, l_orderkey, l_linenumber, l_suppkey, qty
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_end
      |  FROM led WHERE l_returnflag = 'R'
      |)
      |SELECT s.l_partkey AS partkey,
      |       d.l_orderkey AS ret_orderkey, d.l_linenumber AS ret_linenumber,
      |       s.l_orderkey AS sup_orderkey, s.l_linenumber AS sup_linenumber,
      |       CAST(least(s.c_end, d.c_end) -
      |         greatest(s.c_end - s.qty, d.c_end - d.qty) AS BIGINT) AS qty_matched,
      |       CAST(date_diff('day', CAST(s.l_shipdate AS DATE),
      |                      CAST(d.l_shipdate AS DATE)) AS INT) AS lag_days
      |FROM supply s JOIN demand d
      |  ON s.l_partkey = d.l_partkey
      | AND s.c_end > d.c_end - d.qty
      | AND d.c_end > s.c_end - s.qty
      |ORDER BY partkey, ret_orderkey, ret_linenumber,
      |         sup_orderkey, sup_linenumber, qty_matched, lag_days""".stripMargin

  /** Sequential-pattern twin: the same islands sessionization as
    * [[eventSessions]] but over exact epoch-microsecond integers
    * (matching the engine's `unix_micros`; the feed has sub-second
    * timestamps), then the per-(session, type) min/max reduction and the
    * min(A) < max(B) subsequence join. */
  val seqPatterns: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_type,
      |         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |              OR epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts))
      |                 > 30 * 60 * 1000000
      |              THEN 1 ELSE 0 END AS brk
      |  FROM events
      |),
      |numbered AS (
      |  SELECT user_id, ts, event_type,
      |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged
      |),
      |per_type AS (
      |  SELECT user_id, session_id, event_type,
      |         min(ts) AS first_ts, max(ts) AS last_ts
      |  FROM numbered GROUP BY 1, 2, 3
      |),
      |pairs AS (
      |  SELECT a.event_type AS antecedent, b.event_type AS consequent,
      |         count(*) AS n_sessions_both
      |  FROM per_type a
      |  JOIN per_type b ON a.user_id = b.user_id
      |    AND a.session_id = b.session_id
      |    AND a.first_ts < b.last_ts
      |  GROUP BY 1, 2
      |),
      |per_a AS (
      |  SELECT event_type AS antecedent, count(*) AS n_sessions_antecedent
      |  FROM per_type GROUP BY 1
      |)
      |SELECT p.antecedent, p.consequent,
      |       CAST(p.n_sessions_both AS BIGINT) AS n_sessions_both,
      |       CAST(a.n_sessions_antecedent AS BIGINT) AS n_sessions_antecedent,
      |       CAST(p.n_sessions_both AS DOUBLE) / CAST(a.n_sessions_antecedent AS DOUBLE)
      |         AS confidence
      |FROM pairs p JOIN per_a a USING (antecedent)
      |ORDER BY antecedent, consequent""".stripMargin
}
