package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal operators beyond the reference's surface (extension tier):
  * the as-of join — for each left row, the latest right row with the
  * same key and timestamp ≤ the left timestamp. The canonical
  * enrichment join of event pipelines ("state as of this event"); the
  * reference's MESHJOIN enriches by exact key only
  * (`/root/reference/src/Meshjoin.java:345-420`), so this generalizes
  * its J1/J2 family along the time axis.
  *
  * Scale shape — union + ordered window, NOT a range join:
  * tag and union both inputs, partition by key, sort by (ts, tag) and
  * carry the right payload forward with `last_value(ignoreNulls)`.
  * ONE shuffle keyed on the join key, one in-partition sort; per-row
  * state is a single payload struct. A range-condition join
  * (`l.key = r.key AND r.ts <= l.ts` + per-left max) explodes to every
  * (left, earlier-right) pair before pruning — quadratic in per-key
  * history; a point-lookup-per-event is a driver-side loop. The window
  * form is linear in |left| + |right| after the sort, the same plan
  * Flink/kdb-style as-of joins lower to. Skew bound: one key's rows
  * must fit a partition's sort spill, same bound as any keyed window.
  */
object TemporalOps {

  /** Generic as-of join (inclusive: right.ts ≤ left.ts).
    *
    * Determinism contract: `right` rows must be UNIQUE per (key, ts) —
    * otherwise "the latest right row" is ill-defined (DuckDB's ASOF
    * JOIN silently picks one; we require the caller to collapse ties
    * first, see [[eventsWithLatestOrder]]). Left rows never collide
    * with right rows in the sort: equal-ts right rows sort FIRST
    * (tag 0 < 1), which is what makes the join inclusive.
    *
    * @param payload right-side columns to attach (already named as the
    *        output should name them); null when no right row precedes. */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // both sides packed to ONE schema: (key, ts, tag, payload, leftRow)
    val payloadType = right.select(struct(payload.map(col): _*)).schema.head.dataType
    val leftRowType = left.select(struct(leftCols.map(col): _*)).schema.head.dataType
    val l = left.select(
      col(leftKey).as("asof_key"), col(leftTs).as("asof_ts"), lit(1).as("asof_tag"),
      lit(null).cast(payloadType).as("asof_payload"),
      struct(leftCols.map(col): _*).as("asof_left"))
    val r = right.select(
      col(rightKey).as("asof_key"), col(rightTs).as("asof_ts"), lit(0).as("asof_tag"),
      struct(payload.map(col): _*).as("asof_payload"),
      lit(null).cast(leftRowType).as("asof_left"))
    val w = Window.partitionBy("asof_key").orderBy(col("asof_ts"), col("asof_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("asof_match", last("asof_payload", ignoreNulls = true).over(w))
      .where(col("asof_tag") === 1)
      .select(leftCols.map(c => col(s"asof_left.$c").as(c)) ++
        payload.map(p => col(s"asof_match.$p").as(p)): _*)
  }

  /** Each event enriched with the customer's latest order as of the
    * event time (inclusive). Orders are first collapsed to one row per
    * (customer, order date) — keeper = highest order key, its price —
    * because order dates are day-grained and the as-of "latest" must be
    * well-defined (see [[asofJoin]]'s determinism contract); the oracle
    * applies the identical collapse before DuckDB's native ASOF JOIN,
    * so the two engines implement the semantics INDEPENDENTLY (window
    * form vs. DuckDB's dedicated operator) and must agree row-for-row. */
  def eventsWithLatestOrder(spark: SparkSession, dir: String): DataFrame = {
    // Star.events handles the nanosecond-parquet read (ns → µs, lossless
    // on this µs-granular data); raw spark.read rejects TIMESTAMP(NANOS).
    val events = graft.etl.Star.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      // max(struct) keys on o_orderkey (unique) → deterministic keeper
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(struct(col("o_orderkey"), col("o_totalprice"))).as("keep"))
      .select(col("o_custkey"), col("o_orderdate").as("last_order_date"),
        col("keep.o_orderkey").as("last_order_key"),
        col("keep.o_totalprice").as("last_order_price"))
    asofJoin(events, orders,
      leftKey = "user_id", rightKey = "o_custkey",
      leftTs = "ts", rightTs = "last_order_date",
      payload = Seq("last_order_date", "last_order_key", "last_order_price"))
      .orderBy("event_id")
  }

  /** Bucketed trailing-window range join — the other temporal join the
    * as-of family needs: aggregate every right row with the same key and
    * `ts ∈ (left.ts − W, left.ts]`, not just the latest one.
    *
    * Scale shape — bucket equi-join, NOT an inequality join: a raw
    * `l.key = r.key AND r.ts BETWEEN l.ts − W AND l.ts` theta-join has no
    * equi-component beyond the key, so per-key it is |l|·|r| pairs before
    * the range prunes (quadratic in per-key history — same failure class
    * as the all-pairs near-dup join the dedup tier avoids). Bucketing
    * time into width-W cells restores a full equi-join key: a right row
    * in bucket b can only satisfy a left row in bucket b or b + 1, so the
    * right side is replicated into exactly those two cells (bounded 2×
    * blowup) and the join is `(key, bucket)` equality followed by the
    * exact range refine. One shuffle on a composite key AQE/skew handling
    * understands, candidate volume ≤ 2·|r| per probe cell regardless of W
    * skew inside the window.
    */
  def trailingWindowJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftDay: String, rightDay: String,
      windowDays: Int): DataFrame = {
    val probe = left.withColumn("twj_bucket", expr(s"$leftDay DIV $windowDays"))
    val build = right
      .withColumn("twj_bucket",
        explode(array(expr(s"$rightDay DIV $windowDays"),
          expr(s"$rightDay DIV $windowDays + 1"))))
    probe.join(build,
      probe(leftKey) === build(rightKey) &&
        probe("twj_bucket") === build("twj_bucket") &&
        build(rightDay) > probe(leftDay) - windowDays &&
        build(rightDay) <= probe(leftDay),
      "left")
  }

  /** Each order with the same customer's order count / spend / most
    * recent order day over the trailing 30 days (self range join — the
    * repeat-purchase feature of a customer pipeline). Day arithmetic is
    * integer epoch days on both engines; spend crosses the comparison
    * surface as BIGINT cents via `floor(price · 100)` (order-independent
    * sum; see [[BloomOps]]). An order is not its own prior. */
  def ordersTrailing30d(spark: SparkSession, dir: String): DataFrame = {
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("price_cents"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"))
    val prior = o.select(col("o_custkey").as("p_custkey"),
      col("o_orderkey").as("p_orderkey"), col("price_cents").as("p_cents"),
      col("day").as("p_day"))
    // Self-exclusion happens INSIDE the aggregate (count/sum/max over
    // `p != self` only), not as a post-join filter: a where-clause would
    // drop a probe row whose only trailing match is itself, losing its
    // n=0 output row. Every order self-matches, so the left join never
    // emits null build rows here — the conditionals do the exclusion.
    trailingWindowJoin(o, prior, "o_custkey", "p_custkey", "day", "p_day", 30)
      .groupBy("o_orderkey")
      .agg(
        count(when(col("p_orderkey") =!= col("o_orderkey"), lit(1)))
          .as("n_prior_30d"),
        coalesce(sum(when(col("p_orderkey") =!= col("o_orderkey"), col("p_cents"))),
          lit(0L)).as("spend_prior_30d_cents"),
        max(when(col("p_orderkey") =!= col("o_orderkey"), col("p_day")))
          .as("last_prior_day"))
      .orderBy("o_orderkey")
  }

  // ---- SAX-indexed time-series similarity search ----------------------

  /** SAX geometry: windows of [[SaxW]] consecutive observed months,
    * PAA-compressed to [[SaxSegments]] segment means, discretized on
    * the 3-letter Gaussian-tercile alphabet. The breakpoints ±0.4307…
    * are TRANSCENDENTAL (Φ⁻¹(1/3)) and therefore ship as shared
    * LITERAL constants — the HLL/bootstrap quantized-table discipline:
    * a computed `qnorm` would never bit-agree cross-engine. */
  val SaxW = 6
  val SaxSegments = 3
  val SaxBreakLo = -0.4307272992954576
  val SaxBreakHi = 0.4307272992954576
  val SaxTopK = 20

  /** TIME-SERIES SIMILARITY SEARCH, SAX-indexed (the Lin/Keogh iSAX
    * recipe, the EDBT'19 streaming-similarity shape): which stores'
    * revenue TRAJECTORIES repeat each other, and when? Each store's
    * observed monthly revenue sequence is cut into [[SaxW]]-month
    * sliding windows; every window is z-NORMALIZED (shape, not level —
    * a big and a small store with the same seasonal curve should
    * match), PAA-compressed and SAX-discretized; candidate pairs come
    * ONLY from an equi-join on the SAX word (the index property:
    * similar shapes share words, so candidates are O(collisions),
    * never all-pairs-of-windows); the exact z-normalized distance² —
    * a strict left fold, bit-identical cross-engine — re-ranks, and a
    * bounded global top-k emits.
    *
    * Exactness contract: monthly revenue in integer DOLLARS (cents²
    * overflows BIGINT at sf ≥ 0.1 — the storeCorrelation lesson);
    * window variance from exact integer sums (W·Σx² − (Σx)²), windows
    * with zero variance (flat series) are excluded BEFORE the divide
    * on both sides; all per-window arithmetic is position-ordered
    * array HOFs; the series table is store×month — calendar-bounded,
    * so the collect_list window build is the bounded-group pattern,
    * not a corpus-sized sort. */
  def saxSimilarWindows(spark: SparkSession, dir: String,
      k: Int = SaxTopK): DataFrame =
    saxSimilarFrom(
      graft.etl.Star.salesFact(spark, dir)
        .groupBy(col("store_id"),
          expr("substring(CAST(time_id AS STRING), 1, 7)").as("month"))
        .agg(expr("sum(CAST(total_revenue * 100 AS BIGINT)) div 100").as("dollars")),
      k)

  /** The SAX kernel over an arbitrary (store_id, month, dollars) frame —
    * the seam the first-principles spec drives. */
  private[ext] def saxSimilarFrom(monthly: DataFrame, k: Int): DataFrame = {
    val series = monthly.groupBy("store_id")
      .agg(expr("transform(array_sort(collect_list(struct(month, dollars))), x -> x)")
        .as("ms"))
    val w = SaxW
    val windows = series
      .select(col("store_id"), expr(
        s"explode(CASE WHEN size(ms) >= $w THEN " +
          s"transform(sequence(1, size(ms) - ${w - 1}), i -> " +
          s"struct(element_at(ms, i).month AS wstart, " +
          s"transform(sequence(0, ${w - 1}), j -> element_at(ms, i + j).dollars) AS vals)) " +
          "ELSE array() END)").as("wd"))
      .select(col("store_id"), col("wd.wstart").as("wstart"), col("wd.vals").as("vals"))
      .withColumn("sx", expr("aggregate(vals, CAST(0 AS BIGINT), (a, v) -> a + v)"))
      .withColumn("sxx", expr("aggregate(vals, CAST(0 AS BIGINT), (a, v) -> a + v * v)"))
      .withColumn("ivar", expr(s"CAST($w AS BIGINT) * sxx - sx * sx"))
      .where(col("ivar") > 0) // flat windows have no shape to match
      .withColumn("mean", expr(s"CAST(sx AS DOUBLE) / $w"))
      .withColumn("sd", expr(s"sqrt(CAST(ivar AS DOUBLE)) / $w"))
      .withColumn("z", expr("transform(vals, v -> (CAST(v AS DOUBLE) - mean) / sd)"))
      .withColumn("paa", expr(
        s"transform(sequence(0, ${SaxSegments - 1}), s -> " +
          s"aggregate(slice(z, s * ${w / SaxSegments} + 1, ${w / SaxSegments}), " +
          s"CAST(0 AS DOUBLE), (a, v) -> a + v) / ${w / SaxSegments})"))
      .withColumn("word", expr(
        s"concat_ws('', transform(paa, p -> CASE WHEN p < $SaxBreakLo THEN 'a' " +
          s"WHEN p < $SaxBreakHi THEN 'b' ELSE 'c' END))"))
      .select("store_id", "wstart", "word", "z")
    windows.as("x").join(windows.as("y"),
        col("x.word") === col("y.word") &&
          (col("x.store_id") < col("y.store_id") ||
            (col("x.store_id") === col("y.store_id") &&
              col("x.wstart") < col("y.wstart"))))
      .select(col("x.store_id").as("store_a"), col("x.wstart").as("start_a"),
        col("y.store_id").as("store_b"), col("y.wstart").as("start_b"),
        col("x.word").as("word"),
        expr("aggregate(zip_with(x.z, y.z, (p, q) -> (p - q) * (p - q)), " +
          "CAST(0 AS DOUBLE), (a, v) -> a + v)").as("dist2"))
      .orderBy(col("dist2"), col("store_a"), col("start_a"),
        col("store_b"), col("start_b"))
      .limit(k)
  }
}
