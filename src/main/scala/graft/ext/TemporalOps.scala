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
}
