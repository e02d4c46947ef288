package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.etl.EtlQueries

/** Streaming two-sample KS monitor — the experiment-guardrail face of
  * [[EtlQueries.ksDrift]]: as events stream in, maintain per
  * (event_type, value) COUNTS for two experiment arms (user-parity
  * split — the A/B assignment every guardrail pipeline has), and read
  * the exact KS statistic between the arms' value distributions at any
  * point. A drifting arm (a buggy treatment skewing purchase values)
  * moves the full-CDF statistic long before it moves a mean.
  *
  * Why a COUNT synopsis is the right streaming state: counts are
  * additive, so the per-batch increment folds into the store by plain
  * (key, v) sum — order-independent, replay-idempotent when folded
  * from an append-only log, and EXACT: the monitor's KS after batch b
  * is bit-equal to the batch KS over the prefix, which is what lets
  * the oracle check the stream's state evolution declaratively (the
  * [[graft.ext.SketchOps.cmsStreamReplay]] argument, with exact counts
  * instead of a lossy sketch). State is O(distinct values per type) —
  * for exact integer cents this is bounded by the price domain; an
  * unbounded-domain deployment switches the synopsis to a mergeable
  * rank sketch and this module's fold shape is unchanged.
  *
  * The replay row `stream_ks_drift` carves the event log into
  * [[ReplayBatches]] day-range batches, folds increments through the
  * SAME kernel a foreachBatch sink runs, and emits the KS readout
  * after EVERY batch — pinning the state evolution, not just the final
  * answer — against a DuckDB twin that computes each prefix
  * declaratively. */
object StreamKs {

  /** Day-range carve shared with the oracle twin: batch = (day−1)÷8
    * over the one-month feed. */
  val ReplayBatches: Int = 4
  val BatchDays: Int = 8

  /** The per-batch increment kernel: (event_type, cents value, arm
    * counts). Arm A = even user ids — the pure-function experiment
    * assignment, stated identically in the twin. */
  def countsOf(batch: DataFrame): DataFrame =
    batch.select(col("event_type"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("v"),
        when(expr("pmod(user_id, 2) = 0"), 1L).otherwise(0L).as("a"))
      .groupBy("event_type", "v")
      .agg(sum("a").as("c1"), (count(lit(1)) - sum("a")).as("c2"))

  /** Additive state fold. */
  def merge(state: DataFrame, inc: DataFrame): DataFrame =
    state.unionByName(inc)
      .groupBy("event_type", "v")
      .agg(sum("c1").as("c1"), sum("c2").as("c2"))

  /** Oracle-checkable replay: per-batch prefix KS through the
    * incremental fold. One bounded driver loop of [[ReplayBatches]]
    * rounds (micro-batches are inherently sequential). */
  def ksReplay(spark: SparkSession, dir: String,
      nBatches: Int = ReplayBatches): DataFrame = {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("batch", expr(s"CAST((day(ts) - 1) DIV $BatchDays AS INT)"))
    var state: DataFrame = null
    (0 until nBatches).map { b =>
      val inc = countsOf(ev.where(col("batch") === b))
      state = (if (state == null) inc else merge(state, inc))
        .localCheckpoint(eager = true)
      EtlQueries.ksFromCounts(state, "event_type").withColumn("batch", lit(b))
    }.reduce(_ unionByName _)
      .select("batch", "event_type", "n1", "n2", "ks_num", "ks_ppm",
        "ks_at_cents")
      .orderBy("batch", "event_type")
  }

  /** The live sink: per-batch increments APPENDED to a count log (the
    * df-delta discipline of [[StreamBm25]] — parquet can't update a
    * counter in place; appends are cheap and fold exactly). Read the
    * monitor with [[ksOfStore]]; compact the log by rewriting the fold
    * when it grows. */
  def run(spark: SparkSession, stream: DataFrame, stateDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val inc = countsOf(batch)
        if (!inc.isEmpty) inc.write.mode("append").parquet(stateDir)
        ()
      }
      .start()

  /** The monitor readout over the live count log. */
  def ksOfStore(spark: SparkSession, stateDir: String): DataFrame =
    EtlQueries.ksFromCounts(
      spark.read.parquet(stateDir)
        .groupBy("event_type", "v")
        .agg(sum("c1").as("c1"), sum("c2").as("c2")),
      "event_type")
}
