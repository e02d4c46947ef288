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

/** One keyed event for the rate limiter (the id makes the per-key
  * order total under equal timestamps). */
case class RateEvent(user_id: Long, ts: Timestamp, event_id: Long)

/** Token-bucket state per key: fixed-point millitokens + the event-time
  * of the last decision. Two scalars — never the events. */
case class BucketState(milliTokens: Long, lastTsMs: Long)

/** One admission decision, emitted per event. */
case class RateDecision(user_id: Long, ts: Timestamp, event_id: Long,
    allowed: Boolean, milli_tokens_after: Long)

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

  /** The END-OF-LOG sentinel contract (the drain that closes the
    * final-session divergence): a stream over a CLOSED log never
    * advances the watermark past the last event, so a final
    * purchase-less session's event-time timeout can never fire and the
    * batch twin used to alert on sessions the stream structurally
    * could not. The fix is a DRAIN EVENT — one sentinel row
    * ([[eolSentinel]]) appended after the last real batch, far enough
    * in event time (`max_ts + gap + watermark + 1 min`) that the
    * watermark passes every live session's timeout. The state machine
    * treats sentinels as watermark-only: they never join a session,
    * never create state, never appear in output ([[abandonedCarts]]
    * filters them before the fold). An AvailableNow replay of a closed
    * log appends the sentinel as its final input; a live deployment
    * never needs it (the next real event advances the watermark). */
  val EolUserId = -1L
  val EolEventType = "__eol__"

  /** The drain row for a log whose newest event is `maxTs` — see the
    * sentinel contract above. */
  def eolSentinel(maxTs: Timestamp, gapMinutes: Int,
      watermarkMinutes: Int): CartEvent =
    CartEvent(EolUserId,
      new Timestamp(maxTs.getTime + (gapMinutes + watermarkMinutes + 1) * 60000L),
      EolEventType, 0.0)

  /** Sessions that went quiet for `gapMinutes` (by event time, i.e. the
    * watermark passed last_event + gap) without ever reaching a
    * `purchase` event: emit one summary row per abandoned session, then
    * free the key's state. Browsing-only sessions with a later return
    * visit start a fresh session — same semantics as a session window,
    * plus the content condition. Over a closed log, drain final
    * sessions with the [[eolSentinel]] contract. */
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
            if (s.hasPurchase || s.nEvents == 0) Iterator.empty
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
            // Sentinels ([[eolSentinel]]) are watermark-only: their job
            // (advancing the global watermark) happened by their mere
            // presence in the stream; folding them in would
            // manufacture a phantom session for the sentinel key.
            val real = batch.toSeq.filter(_.event_type != EolEventType)
            if (real.isEmpty && state.getOption.isEmpty) Iterator.empty
            else {
              val alerts = Seq.newBuilder[AbandonedCart]
              def close(s: CartState): Unit =
                if (!s.hasPurchase && s.nEvents > 0)
                  alerts += AbandonedCart(user, s.nEvents, s.total, new Timestamp(s.lastTsMs))
              val prev = state.getOption.getOrElse(CartState(0L, 0.0, false, 0L))
              val s = real.sortBy(_.ts.getTime).foldLeft(prev) { (acc, e) =>
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
  }

  /** Per-key EVENT-TIME token bucket — admit at most `capacity` events
    * per `periodSeconds` per user, with continuous refill; every event
    * is emitted with its admission decision (the downstream filter picks
    * `allowed`; emitting decisions rather than dropping keeps the
    * throttled volume observable). Semantics none of the built-ins
    * express: the decision for event N depends on the decisions for
    * events 1..N−1 — a windowed count can cap a window but cannot refill
    * continuously, and a post-filter cannot see the running balance.
    *
    * Determinism contract (same discipline as [[abandonedCarts]]):
    * tokens are FIXED-POINT MILLITOKENS refilled by integer arithmetic
    * (`elapsedMs · capacity · 1000 / periodMs`, truncating), events fold
    * in (ts, event_id) order inside each batch, and refill elapses in
    * EVENT time — so a replay, a backfill, or a different micro-batch
    * carving produces identical decisions for in-order arrivals, and
    * nothing reads the wall clock. State is freed by an event-time
    * timeout one full refill period after the last event (a full bucket
    * is indistinguishable from fresh state, so eviction is lossless).
    * Out-of-order arrivals WITHIN a batch are handled by the sort;
    * across batches the bucket refuses time travel (`max` with the last
    * seen ts) rather than silently refunding tokens. */
  def rateLimit(events: Dataset[RateEvent], capacity: Int = 10,
      periodSeconds: Int = 60,
      watermark: String = "10 minutes"): Dataset[RateDecision] = {
    require(capacity >= 1 && periodSeconds >= 1)
    val spark = events.sparkSession
    import spark.implicits._
    val periodMs = periodSeconds * 1000L
    val fullMilli = capacity * 1000L

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[BucketState, RateDecision](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[RateEvent], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // a full period elapsed: the bucket is full again — fresh
            // state is equivalent, so dropping it loses nothing
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(BucketState(fullMilli, Long.MinValue))
            val out = Seq.newBuilder[RateDecision]
            val s = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
              .foldLeft(prev) { (acc, e) =>
                val (next, dec) = bucketStep(acc, e, fullMilli, periodMs)
                out += dec
                next
              }
            state.update(s)
            state.setTimeoutTimestamp(s.lastTsMs + periodMs)
            out.result().iterator
          }
      }
  }

  /** The token-bucket transition — ONE kernel shared by the streaming
    * state machine and the batch twin, so the oracle-checked batch
    * decisions are bit-identical to what the stream emits. */
  private[streaming] def bucketStep(acc: BucketState, e: RateEvent,
      fullMilli: Long, periodMs: Long): (BucketState, RateDecision) = {
    val nowMs = math.max(acc.lastTsMs, e.ts.getTime)
    val refill =
      if (acc.lastTsMs == Long.MinValue) 0L
      else (nowMs - acc.lastTsMs) * fullMilli / periodMs
    val avail = math.min(fullMilli, acc.milliTokens + refill)
    val allowed = avail >= 1000L
    val left = if (allowed) avail - 1000L else avail
    (BucketState(left, nowMs),
      RateDecision(e.user_id, e.ts, e.event_id, allowed, left))
  }

  /** Batch twin of [[rateLimit]] over a CLOSED event log: the same
    * per-key (ts, event_id)-ordered fold, run to completion. This is
    * what makes the streaming tier ORACLE-CHECKABLE — decisions over a
    * finished log are a deterministic function of the data, so a SQL
    * engine can replay them (recursive CTE) and hash-compare.
    *
    * Scale shape: ONE shuffle (hash repartition on user_id) + a
    * sort-within-partitions, then a STREAMING per-partition fold with
    * key-change detection — per-key state is two scalars and no
    * per-user event list is ever materialized (`groupByKey.flatMapGroups`
    * would give the same iterator shape; the explicit
    * repartition+sortWithinPartitions spelling documents that the sort
    * is intra-partition, never a global order). */
  def rateLimitBatch(events: Dataset[RateEvent], capacity: Int = 10,
      periodSeconds: Int = 60): Dataset[RateDecision] = {
    require(capacity >= 1 && periodSeconds >= 1)
    val spark = events.sparkSession
    import spark.implicits._
    val periodMs = periodSeconds * 1000L
    val fullMilli = capacity * 1000L
    events
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
      .mapPartitions { it =>
        var curUser = 0L
        var started = false
        var st = BucketState(fullMilli, Long.MinValue)
        it.map { e =>
          if (!started || e.user_id != curUser) {
            curUser = e.user_id
            started = true
            st = BucketState(fullMilli, Long.MinValue)
          }
          val (next, dec) = bucketStep(st, e, fullMilli, periodMs)
          st = next
          dec
        }
      }
  }

  /** The registered query's operating point — capacity 2 per 4 h (one
    * token refills every 2 h, chosen so the testdata's inter-event gaps
    * produce a real mix of allowed and throttled). The DuckDB twin
    * ([[graft.etl.EtlOracleSql.rateLimit]]) is GENERATED from these
    * constants, so query and oracle move together. */
  val DefaultRateCapacity: Int = 2
  val DefaultRatePeriodSeconds: Int = 4 * 3600

  /** Driver-contract entry for the batch twin: admission decisions for
    * every event in the events table at the default operating point. */
  def rateLimitQuery(spark: SparkSession, dir: String,
      capacity: Int = DefaultRateCapacity,
      periodSeconds: Int = DefaultRatePeriodSeconds): DataFrame = {
    import spark.implicits._
    val events = graft.etl.Star.events(spark, dir)
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long")).as[RateEvent]
    rateLimitBatch(events, capacity, periodSeconds)
      .toDF()
      .orderBy("user_id", "ts", "event_id")
  }

  /** Batch twin of [[abandonedCarts]] over a CLOSED event log — the
    * second streaming-tier operator with an oracle row. Over finished
    * data the state machine's semantics collapse to Spark's native
    * `session_window` (30-minute-gap sessions) plus the content
    * condition (no purchase), so the twin is one watermark-free
    * sessionized aggregate; the DuckDB oracle replays it as
    * gaps-and-islands SQL. total_value goes through the decimal cast
    * discipline (sum order must not leak into the hash — the streaming
    * operator's running double is fine for alerts, not for an oracle).
    * Boundary convention: `session_window` STARTS a new session at a
    * gap of exactly `gapMinutes`; the state machine merges it (strict
    * `>` in the fold). The boundary is measure-zero on µs-granular
    * data; the parity spec keeps fixtures off it. */
  def abandonedCartsQuery(spark: SparkSession, dir: String,
      gapMinutes: Int = 30): DataFrame =
    abandonedCartsBatch(graft.etl.Star.events(spark, dir), gapMinutes)

  /** The sessionized aggregate over an arbitrary events frame — the
    * seam the stream/batch parity spec drives. */
  def abandonedCartsBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .where(col("event_type") =!= lit(EolEventType)) // sentinel-blind, like the stream
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        expr("CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE)")
          .as("total_value"),
        max(col("ts")).as("last_ts"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("hp"))
      .where(col("hp") === 0)
      .select("user_id", "n_events", "total_value", "last_ts")
      .orderBy("user_id", "last_ts")

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
