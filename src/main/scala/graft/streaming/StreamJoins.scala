package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the two-moving-sides generalization of the
  * reference's MESHJOIN (stream ⋈ static master,
  * `/root/reference/src/Meshjoin.java:345-420`). The reference never
  * joins two streams; a near-real-time warehouse that correlates events
  * (view→purchase attribution, order→shipment latency) needs it, and it
  * is where unbounded state kills naive designs: every row of each side
  * must wait for possible future matches on the other.
  *
  * Scale shape: an event-time INTERVAL join with BOTH sides watermarked.
  * The join condition bounds each side's event time relative to the
  * other (`purchase − W ≤ view ≤ purchase`), so the engine can compute,
  * per side, the oldest row still joinable and evict everything older —
  * state is O(rate × (watermark + interval)) per key range, not O(stream
  * so far). Without the interval bounds Spark would keep both sides'
  * state forever (and warns so); the bounds are the operator's contract,
  * not an optimization.
  */
object StreamJoins {

  /** Purchases attributed to the same user's views within the trailing
    * `window` — inner interval join, append-mode compatible.
    *
    * @param views     streaming frame with (event_id, ts, user_id)
    * @param purchases streaming frame with (event_id, ts, user_id, value)
    * @param window    attribution lookback, e.g. "10 minutes"
    * @param watermark max accepted lateness on both sides; joined with
    *        the interval width it bounds the per-side state horizon. */
  def viewPurchaseAttribution(views: DataFrame, purchases: DataFrame,
      window: String = "10 minutes", watermark: String = "10 minutes"): DataFrame = {
    val v = views
      .select(col("event_id").as("view_id"), col("ts").as("view_ts"),
        col("user_id").as("v_user"))
      .withWatermark("view_ts", watermark)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("user_id"), col("value"))
      .withWatermark("purchase_ts", watermark)
    p.join(v,
      expr(s"""v_user = user_id
              |AND view_ts >= purchase_ts - INTERVAL $window
              |AND view_ts <= purchase_ts""".stripMargin))
      .select("purchase_id", "purchase_ts", "user_id", "value",
        "view_id", "view_ts")
  }

  /** Batch twin over a CLOSED event log — the interval join with the
    * watermark machinery stripped: the IDENTICAL predicate as a plain
    * equi+range join between the log's views and purchases. This is the
    * third (and last) spec-only streaming operator to gain an oracle
    * row: with it, every streaming operator's emission semantics are
    * hash-checked against a SQL replay, not only spec-asserted. Scale
    * shape: equi-join shuffle on user_id; the range predicate evaluates
    * post-match (per-user event counts are bounded). */
  def viewPurchaseBatch(spark: org.apache.spark.sql.SparkSession, dir: String,
      window: String = "10 minutes"): DataFrame = {
    val e = graft.etl.Star.events(spark, dir)
    val v = e.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("view_ts"),
        col("user_id").as("v_user"))
    val p = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("user_id"), col("value"))
    p.join(v,
        expr(s"""v_user = user_id
                |AND view_ts >= purchase_ts - INTERVAL $window
                |AND view_ts <= purchase_ts""".stripMargin))
      .select("purchase_id", "purchase_ts", "user_id", "value",
        "view_id", "view_ts")
      .orderBy("purchase_id", "view_id")
  }

  /** LEFT OUTER interval join — purchases WITH their attributed views
    * plus the unattributed purchases as null-view rows (the
    * "organic conversion" share a marketing report needs; the inner
    * join silently loses it). Streaming left-outer needs both
    * watermarks AND the interval bounds for the same state-eviction
    * reason, plus one more semantic: a null-extended row emits only
    * when the watermark proves no match can still arrive. */
  def viewPurchaseOuter(views: DataFrame, purchases: DataFrame,
      window: String = "10 minutes", watermark: String = "10 minutes"): DataFrame = {
    val v = views
      .select(col("event_id").as("view_id"), col("ts").as("view_ts"),
        col("user_id").as("v_user"))
      .withWatermark("view_ts", watermark)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("user_id"), col("value"))
      .withWatermark("purchase_ts", watermark)
    p.join(v,
      expr(s"""v_user = user_id
              |AND view_ts >= purchase_ts - INTERVAL $window
              |AND view_ts <= purchase_ts""".stripMargin),
      "left_outer")
      .select("purchase_id", "purchase_ts", "user_id", "value",
        "view_id", "view_ts")
  }

  /** Batch twin of [[viewPurchaseOuter]] over a closed log: the plain
    * left equi+range join. KNOWN DIVERGENCE (the
    * [[StatefulOps.abandonedCarts]] class): over a closed log the twin
    * null-extends every unmatched purchase, while the stream only
    * null-extends those whose join window the final watermark has
    * passed — the twin is a superset differing exactly in the
    * purchases inside the last watermark horizon (spec-pinned). */
  def viewPurchaseOuterBatch(spark: org.apache.spark.sql.SparkSession, dir: String,
      window: String = "10 minutes"): DataFrame = {
    val e = graft.etl.Star.events(spark, dir)
    val v = e.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("view_ts"),
        col("user_id").as("v_user"))
    val p = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("user_id"), col("value"))
    p.join(v,
        expr(s"""v_user = user_id
                |AND view_ts >= purchase_ts - INTERVAL $window
                |AND view_ts <= purchase_ts""".stripMargin),
      "left_outer")
      .select("purchase_id", "purchase_ts", "user_id", "value",
        "view_id", "view_ts")
      .orderBy("purchase_id", "view_id")
  }
}
