package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental sessionization + sequential-pattern maintenance over an
  * event STREAM — the streaming face of
  * [[graft.etl.EtlQueries.seqPatterns]], and the state shape a
  * production behavioral-analytics pipeline actually keeps: not raw
  * events (unbounded) but per-(user, open-or-closed session, event
  * type) first/last-timestamp SPANS, which is everything the
  * subsequence rule "an A occurred strictly before a B" needs
  * (min ts(A) < max ts(B) — the same compression that lets the batch
  * query skip the within-session self-join).
  *
  * Per micro-batch the fold is pure DataFrame algebra
  * ([[foldBatch]]):
  *
  *  1. sessionize the batch LOCALLY (gaps-and-islands per user — one
  *     shuffle of the batch, never the history);
  *  2. decide the one boundary question per user: does the batch's
  *     FIRST local session continue the user's open session (gap from
  *     the open session's last event ≤ the 30-minute threshold) or
  *     start a new one;
  *  3. assign stable session ids (open id for the continuation; open
  *     id + local index for the rest) and APPEND the batch's spans to
  *     the state log — [[mergedSpans]] min/max-folds the log at read
  *     time, the IVM partial-aggregate trade.
  *
  * State is bounded by (users × types) per open session plus closed
  * history — and the closed spans are append-only facts: a session a
  * later event can no longer extend never changes again, so a real
  * deployment ages them straight into the pattern aggregate. The fold
  * assumes event-time-ordered micro-batches ACROSS batches (within a
  * batch, any order) — the property the replay's time-range carve
  * provides and a watermarked source guarantees at the gap horizon.
  *
  * [[replay]] is the oracle gate: the events table carved into
  * [[ReplayBatches]] time-range micro-batches, folded sequentially
  * through the SAME kernel, and the final spans fed to the SHARED
  * pattern stage ([[graft.etl.EtlQueries.patternsFromSpans]]). Its
  * output must hash-match the batch twin's DuckDB SQL exactly — the
  * incremental path earns the same differential as the batch path
  * (the [[StreamDedup]] precedent), and the real-streaming parity
  * spec drives the identical kernel through an actual memory-source
  * `foreachBatch` query.
  */
object StreamSeqPatterns {

  /** Time-range micro-batches for the oracle-checked replay. */
  val ReplayBatches: Int = 4

  import graft.etl.EtlQueries.SeqGapMicros

  /** Batch-local gaps-and-islands: `bsess` numbers each user's
    * within-batch sessions from 1 in time order. */
  private def batchSessions(batch: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts")
    batch.select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("brk",
        when(lag(col("ts"), 1).over(w).isNull ||
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) >
            lit(SeqGapMicros), 1L).otherwise(0L))
      .withColumn("bsess", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Folds one micro-batch into the running state.
    *
    * @param spans per-(user, session, type) min/max spans accumulated
    *              so far: (user_id, session_id, event_type, first_ts,
    *              last_ts)
    * @param open  one row per user for the session a future event may
    *              still extend: (user_id, session_id, last_ts)
    * @return (spans, open) after the batch
    */
  def foldBatch(spans: DataFrame, open: DataFrame,
      batch: DataFrame): (DataFrame, DataFrame) = {
    val bs = batchSessions(batch)
    val bounds = bs.groupBy("user_id", "bsess")
      .agg(min("ts").as("bfirst"), max("ts").as("blast"))
    // the one boundary decision per user rides the bsess = 1 row
    val continues = bounds.where(col("bsess") === 1L)
      .join(open.select(col("user_id"), col("session_id").as("open_sid"),
        col("last_ts").as("open_last")), Seq("user_id"), "left")
      .select(col("user_id"), col("open_sid"),
        (col("open_last").isNotNull &&
          unix_micros(col("bfirst")) - unix_micros(col("open_last")) <=
            lit(SeqGapMicros)).as("extends_open"))
    // stable ids: the continuation keeps open_sid; fresh sessions
    // number on from the user's open id (0 when the user is new)
    val sidOf = bounds.join(continues, Seq("user_id"))
      .withColumn("session_id",
        when(col("extends_open") && col("bsess") === 1L, col("open_sid"))
          .otherwise(coalesce(col("open_sid"), lit(0L)) + col("bsess") -
            when(col("extends_open"), 1L).otherwise(0L)))
      .select(col("user_id"), col("bsess"), col("session_id"), col("blast"))
    val batchSpans = bs.join(sidOf, Seq("user_id", "bsess"))
      .groupBy("user_id", "session_id", "event_type")
      .agg(min("ts").as("first_ts"), max("ts").as("last_ts"))
    // spans are an APPEND-ONLY log: a continued session contributes one
    // row per batch it touches, and [[mergedSpans]] min/max-folds them
    // at read time — the IVM partial-aggregate trade, which saves the
    // per-batch re-aggregation of the whole accumulated state
    val newSpans = spans.unionByName(batchSpans)
    // the new open session per batch user is their HIGHEST id; users
    // silent this batch keep their old open row
    val openFromBatch = sidOf
      .groupBy("user_id").agg(max(struct(col("session_id"), col("blast"))).as("m"))
      .select(col("user_id"), col("m.session_id").as("session_id"),
        col("m.blast").as("last_ts"))
    val newOpen = open.join(openFromBatch, Seq("user_id"), "left_anti")
      .unionByName(openFromBatch)
    (newSpans, newOpen)
  }

  /** Oracle-checkable replay over the closed event log: time-range
    * carve into [[ReplayBatches]] micro-batches (time-range, not id —
    * the fold's cross-batch ordering contract), sequential folds with
    * one bounded `localCheckpoint` per round (lineage depth stays
    * O(batches)), then the shared pattern stage. The two driver
    * scalars (min/max ts for the carve) are a bounded metadata pull. */
  def replay(spark: SparkSession, dir: String,
      nBatches: Int = ReplayBatches): DataFrame = {
    val events = graft.etl.Star.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
    val Array(lo, hi) = events
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val width = (hi - lo) / nBatches + 1 // last batch takes the remainder
    var spans = events.limit(0)
      .select(col("user_id"), lit(0L).as("session_id"), col("event_type"),
        col("ts").as("first_ts"), col("ts").as("last_ts"))
    var open = events.limit(0)
      .select(col("user_id"), lit(0L).as("session_id"), col("ts").as("last_ts"))
    for (b <- 0 until nBatches) {
      val batch = events.where(
        expr(s"(unix_micros(ts) - ${lo}L) DIV ${width}L") === b)
      val (s2, o2) = foldBatch(spans, open, batch)
      // the span log is append-only and open is users-sized: lazy
      // checkpoints bound both lineage chains at O(nBatches) without
      // paying a per-round materialization job — the whole replay
      // executes as one composed plan at the final action
      spans = s2.localCheckpoint(false)
      open = o2.localCheckpoint(false)
    }
    graft.etl.EtlQueries.patternsFromSpans(mergedSpans(spans))
  }

  /** Read-side fold of the append-only span log: min/max per
    * (user, session, type) — associative, so merging once here equals
    * merging every batch. */
  def mergedSpans(spans: DataFrame): DataFrame =
    spans.groupBy("user_id", "session_id", "event_type")
      .agg(min("first_ts").as("first_ts"), max("last_ts").as("last_ts"))
}
