package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event of a user's shopping session, as the stateful operator
  * sees it. */
case class CartEvent(user_id: Long, ts: Timestamp, event_type: String, value: Double)

/** Per-user running state: what the detector remembers between
  * micro-batches. Bounded per key (four scalars — never the events). */
case class CartState(nEvents: Long, total: Double, hasPurchase: Boolean, lastTsMs: Long)

/** An emitted abandonment: the session summary at the moment the state
  * timed out without a purchase. */
case class AbandonedCart(user_id: Long, n_events: Long, total_value: Double,
    last_ts: Timestamp)

/** Custom streaming state machines via `flatMapGroupsWithState` — the
  * tier BELOW the built-in operators. Windowed aggs, session windows
  * and stream-stream joins all have native operators here (StreamETL /
  * StreamJoins); this module is for semantics none of them can express:
  * emission CONDITIONED on what happened inside the state. An
  * abandoned-cart alert fires only for sessions that ended WITHOUT a
  * purchase — `session_window` can aggregate a session but cannot
  * suppress the emission based on its content, and a post-filter on a
  * session agg would force the whole summary through the sink.
  *
  * Scale contract: state per key is a fixed-size summary (never the
  * event list), keys are distributed by the groupBy shuffle, and
  * EVENT-TIME timeouts tie eviction to the watermark — state for a user
  * is freed the moment the watermark passes their last event + gap, so
  * total state is O(active users), not O(users ever seen). A
  * processing-time timeout would make results wall-clock dependent and
  * unreplayable; the reference's hand-rolled consumer loop
  * (`/root/reference/src/GenerateStream.java:21-47`) has exactly that
  * defect — its "state" is whatever the thread got to before shutdown.
  */
object StatefulOps {

  /** Sessions that went quiet for `gapMinutes` (by event time, i.e. the
    * watermark passed last_event + gap) without ever reaching a
    * `purchase` event: emit one summary row per abandoned session, then
    * free the key's state. Browsing-only sessions with a later return
    * visit start a fresh session — same semantics as a session window,
    * plus the content condition. */
  def abandonedCarts(events: Dataset[CartEvent], gapMinutes: Int = 30,
      watermark: String = "10 minutes"): Dataset[AbandonedCart] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CartState, AbandonedCart](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[CartEvent], state: GroupState[CartState]) =>
          if (state.hasTimedOut) {
            // quiet past the gap: alert iff the session had no purchase
            val s = state.get
            state.remove()
            if (s.hasPurchase) Iterator.empty
            else Iterator.single(
              AbandonedCart(user, s.nEvents, s.total, new Timestamp(s.lastTsMs)))
          } else {
            // Gap detection must look INSIDE the batch, not only at the
            // timeout between batches: a replay/backfill can deliver two
            // event-time-separated sessions in one micro-batch, and
            // folding them into one state would silently swallow the
            // earlier session's alert — output would depend on batch
            // boundaries, which is exactly what event-time semantics
            // forbid. Sorting by ts and splitting on gap makes the
            // emitted alerts a function of the DATA alone.
            val alerts = Seq.newBuilder[AbandonedCart]
            def close(s: CartState): Unit =
              if (!s.hasPurchase && s.nEvents > 0)
                alerts += AbandonedCart(user, s.nEvents, s.total, new Timestamp(s.lastTsMs))
            val prev = state.getOption.getOrElse(CartState(0L, 0.0, false, 0L))
            val s = batch.toSeq.sortBy(_.ts.getTime).foldLeft(prev) { (acc, e) =>
              val fresh =
                if (acc.nEvents > 0 && e.ts.getTime - acc.lastTsMs > gapMs) {
                  close(acc); CartState(0L, 0.0, false, 0L)
                } else acc
              CartState(
                fresh.nEvents + 1,
                fresh.total + e.value,
                fresh.hasPurchase || e.event_type == "purchase",
                math.max(fresh.lastTsMs, e.ts.getTime))
            }
            state.update(s)
            // the timeout fires when the WATERMARK passes this timestamp,
            // so replays with the same data produce the same alerts
            state.setTimeoutTimestamp(s.lastTsMs + gapMs)
            alerts.result().iterator
          }
      }
  }

  /** Untyped entry: adapts an events frame (user_id, ts, event_type,
    * value) to the typed state machine. */
  def abandonedCartsDF(spark: SparkSession, events: DataFrame,
      gapMinutes: Int = 30, watermark: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    abandonedCarts(
      events.select(
        col("user_id").cast("long"),
        col("ts").cast("timestamp"),
        col("event_type").cast("string"),
        col("value").cast("double")).as[CartEvent],
      gapMinutes, watermark).toDF()
  }
}
