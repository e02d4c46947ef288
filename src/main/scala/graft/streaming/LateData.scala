package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Late-data accounting for a watermarked streaming aggregation — the
  * observability operator that answers "how much data is my watermark
  * delay actually dropping?", which a pipeline owner needs BEFORE
  * tuning the delay (too short silently loses data; too long holds
  * state). Spark surfaces the per-batch count as
  * `StreamingQueryProgress.numRowsDroppedByWatermark`; this operator
  * REPLAYS that accounting over a closed event log so the number is
  * oracle-checkable, the same closed-log-replay recipe as
  * [[StreamDedup.incrementalStreamDedupBatch]] and
  * [[graft.ext.SketchOps.cmsStreamReplay]].
  *
  * Arrival model: the events table is event-TIME ordered with zero
  * natural disorder (generator artifact), so arrival is modeled as
  * event time plus a deterministic pseudo-random transport delay —
  * `arrival = ts + (H(event_id) mod MaxTransportMs)` on the shared md5
  * contract ([[graft.ext.TextOps.h32]]): every event is individually
  * delayed up to 6 h, which is exactly the out-of-orderness watermarks
  * exist for, and both engines derive the identical arrival stream.
  * Micro-batches are 6 h arrival-time triggers
  * (`batch = arrival div TriggerMs`, rebased to 0).
  *
  * Watermark semantics replayed (the documented Structured Streaming
  * contract): the watermark entering batch b is
  * `max(0, max{event time seen in batches < b} − DelayMs)` — updated
  * at batch END, so a batch's own rows are judged against the PREVIOUS
  * high-water mark — and a row is dropped iff its 1 h tumbling
  * window's END is ≤ that watermark (the window can no longer change:
  * its state was already finalized). Both rules are pinned against a
  * REAL `MemoryStream` aggregation's `numRowsDroppedByWatermark` by
  * `LateDataSpec` — the twin reproduces Spark's own per-batch drop
  * counts on a disordered fixture, then the DuckDB oracle hash-checks
  * the twin at corpus scale.
  *
  * Scale shape: one scan derives (arrival, batch); per-batch maxima
  * are one partial-aggregable groupBy whose output is
  * calendar-bounded (corpus span / 6 h rows), the exclusive running
  * max rides that bounded table ([[graft.etl.EtlQueries.peakOpenOrders]]'
  * calendar-bounded window discipline), and the verdict join
  * broadcasts the bounded watermark table back to the event stream.
  * Nothing driver-side, nothing event². */
/** Typed row for the parity spec's `MemoryStream` — field name `ts`
  * matches [[LateData.windowedCounts]]' watermark column. */
case class TimedEvent(ts: java.sql.Timestamp, event_id: Long)

object LateData {

  /** Transport-delay bound for the deterministic arrival model (6 h —
    * the offline-device sync band; at the testdata's event density a
    * smaller bound almost never overtakes the 1 h watermark delay and
    * the late column degenerates to zero). */
  val MaxTransportMs = 21600000L

  /** Arrival-time micro-batch trigger (6 h). */
  val TriggerMs = 21600000L

  /** Event-time tumbling window width (1 h). */
  val WindowMs = 3600000L

  /** Watermark delay (1 h). */
  val DelayMs = 3600000L

  /** End of the event-time window owning `tsMsCol` — the value the
    * watermark is compared against, shared by twin and stream spec. */
  def windowEndMs(tsMsCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (tsMsCol.cast("long") / lit(WindowMs)).cast("long") * lit(WindowMs) + lit(WindowMs)

  /** The watermark/drop KERNEL over an explicitly-batched `(batch,
    * ts_ms)` frame — the rule itself, shared by the corpus replay
    * ([[lateDataBatch]]) and the parity spec (which runs the same
    * batches through a real `MemoryStream` aggregation and compares
    * Spark's own `numRowsDroppedByWatermark`). */
  def lateVerdicts(batched: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perBatch = batched.groupBy("batch").agg(max("ts_ms").as("batch_max_ts"))
    val wmWin = Window.orderBy("batch")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wm = perBatch
      .withColumn("watermark_ms",
        greatest(coalesce(max(col("batch_max_ts")).over(wmWin), lit(0L)) - lit(DelayMs),
          lit(0L)))
      .select("batch", "watermark_ms")
    batched
      .join(broadcast(wm), Seq("batch"))
      .withColumn("late", windowEndMs(col("ts_ms")) <= col("watermark_ms"))
      .groupBy("batch", "watermark_ms")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n_late"),
        sum(when(col("late"), 0L).otherwise(1L)).as("n_admitted"))
      .select("batch", "n_events", "n_late", "n_admitted", "watermark_ms")
      .orderBy("batch")
  }

  /** The oracle-checked replay: one row per arrival micro-batch with
    * total / admitted / dropped-late counts and the watermark the batch
    * was judged against. */
  def lateDataBatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.etl.Star.events(spark, dir)
      .select(col("event_id"), expr("unix_millis(ts)").as("ts_ms"))
      .withColumn("arr_ms",
        col("ts_ms") + graft.ext.TextOps.h32(col("event_id").cast("string")) % lit(MaxTransportMs))
      .withColumn("abs_batch", expr(s"arr_ms div $TriggerMs"))
    val minBatch = ev.agg(min("abs_batch").as("min_batch"))
    lateVerdicts(ev.crossJoin(broadcast(minBatch))
      .withColumn("batch", col("abs_batch") - col("min_batch")))
  }

  /** The REAL streaming aggregation the twin models — windowed counts
    * with a [[DelayMs]] watermark over a `(ts, event_id)` stream; the
    * spec drives it with a `MemoryStream` in arrival order and reads
    * Spark's own `numRowsDroppedByWatermark` per batch. */
  def windowedCounts(events: Dataset[_]): DataFrame =
    events
      .withWatermark("ts", s"${DelayMs / 1000} seconds")
      .groupBy(window(col("ts"), s"${WindowMs / 1000} seconds"))
      .agg(count(lit(1)).as("n"))
}
