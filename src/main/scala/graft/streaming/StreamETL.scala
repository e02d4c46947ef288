package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.{TimeDim, Upserts}
import graft.model.Schemas

/** The reference's near-real-time ETL pipeline (entry point 1,
  * `/root/reference/src/Main.java:9-30`) re-expressed as ONE Structured
  * Streaming query instead of two threads over a BlockingQueue:
  *
  *   readStream → exact-dedup → time derivation → stream-static broadcast
  *   join against master data (the MESHJOIN, SURVEY.md §4.3) → measures
  *   as columns → foreachBatch { anti-join upsert dims, append fact }.
  *
  * What the hand-rolled reference pipeline did imperatively maps to
  * engine-managed machinery:
  *  - micro-batching (batch=50, queue cap=10, `GenerateStream.java:8`,
  *    `Main.java:11`) → `Trigger`/`maxFilesPerTrigger`, engine backpressure;
  *  - the O(n²) seen-records dedup (`GenerateStream.java:38-43`) →
  *    `dropDuplicatesWithinWatermark` (bounded state, SURVEY.md G8);
  *  - per-record JDBC existence probes (`Meshjoin.java:612-626`) → one
  *    left-anti join per micro-batch;
  *  - the per-batch full-fact measure rescan (`Meshjoin.java:705-747`,
  *    O(n²) cumulative) → measures computed as columns pre-write,
  *    incremental by construction.
  *
  * Every transform here takes DataFrames, not paths, so the same code runs
  * under `MemoryStream` in tests, a file source in production, or a batch
  * frame — stream/batch parity is Spark's guarantee and our test
  * (`StreamingSpec`), not a hope.
  */
object StreamETL {

  /** Transaction-stream cleaning: parse the reference's timestamp format,
    * drop unparseable rows (Q-b), derive the P2 time attributes. */
  def cleanTransactions(tx: DataFrame): DataFrame =
    TimeDim.withTimeAttrs(
      tx.withColumn("order_ts", TimeDim.parseOrderDate(col("order_date_raw")))
        .where(col("order_ts").isNotNull),
      "order_ts")

  /** F2/G8 — in-stream exact dedup with BOUNDED state: the reference's
    * seen-records list grows without limit (`GenerateStream.java:38-43`);
    * `dropDuplicatesWithinWatermark` keeps only keys younger than the
    * watermark horizon. Dedup is on ALL columns — the reference drops
    * identical LINES, not same-order records — which keeps it
    * deterministic (identical rows are interchangeable) and leaves the
    * one-row-per-order rule to the sink's deterministic firstWins
    * (Q-a/D7). Re-deliveries beyond the horizon are still caught by the
    * sink-side anti-join ([[factAppendBatch]]) — belt and braces. */
  def withStreamDedup(cleaned: DataFrame, horizon: String = "1 day"): DataFrame =
    cleaned
      .withWatermark("order_ts", horizon)
      .dropDuplicatesWithinWatermark()

  /** The MESHJOIN: stream-static inner equi-join against master data.
    * Master sides are broadcast — each executor holds the dimension
    * in memory exactly like the reference's memory-resident buffers
    * (`Meshjoin.java:26-30`), but hash-indexed and replicated instead of
    * nested-loop-scanned (O(S) per batch, not O(S×P)). */
  def meshJoin(stream: DataFrame, products: DataFrame, customers: DataFrame): DataFrame =
    stream
      .join(broadcast(products), Seq("product_id"), "inner")
      .join(broadcast(customers), Seq("customer_id"), "inner")

  /** P5 measures, computed before the write (exact decimal; Q-d/Q-e). */
  def withMeasures(joined: DataFrame): DataFrame =
    joined
      .withColumn("total_units_sold", col("quantity_ordered"))
      .withColumn("total_revenue",
        round(col("quantity_ordered") * col("price"), 2).cast(Schemas.revenueType))

  /** Tumbling-window aggregation over an event stream with a watermark —
    * the streaming twin of `EtlQueries.eventsHourly`. The watermark bounds
    * state: windows older than 2 h past the max seen ts are finalized and
    * evicted, so state is O(active windows), not O(stream). */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      // group by the full window struct, NOT window.start: extracting the
      // field before the groupBy strips the event-time/watermark metadata
      // from the grouping key, which silently disables state eviction and
      // makes append mode illegal. Project start AFTER the aggregate.
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(Schemas.priceType))
          .cast(Schemas.aggRevenueType).as("total_value"))
      .select(
        col("window").getField("start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** The foreachBatch body: idempotent warehouse maintenance per
    * micro-batch. `existing` is the current fact table (may be empty);
    * returns the rows to append — new Order_IDs only (reference Q-a/D7:
    * one fact row per order, first wins). Re-delivered records are
    * dropped by the anti-join ⇒ at-most-once inserts without relying on
    * the dedup state horizon (G8).
    *
    * The ordering includes the value columns (quantity, timestamp), not
    * just the dimension keys: two records for the same order_id that
    * agree on product/customer but differ in quantity (a corrected
    * re-delivery past the dedup horizon) must still pick the SAME
    * surviving row on every run — a key-only sort would leave the
    * tie-break to partition order. */
  private val factOrderCols =
    Seq("product_id", "customer_id", "quantity_ordered", "order_ts")

  def factAppendBatch(existing: DataFrame, batch: DataFrame): DataFrame =
    Upserts.insertIfAbsent(existing, batch,
      keys = Seq("order_id"),
      orderCols = factOrderCols)

  /** Production deployment shape: the same pipeline under
    * `Trigger.AvailableNow` — process everything currently available as
    * micro-batches, then stop; re-invocations resume from the checkpoint
    * (the standard batch-catchup pattern for scheduled ingest). The fact
    * table lands in parquet partitioned by year/month — date-partitioned
    * sinks are what makes downstream OLAP scans prunable at 100 TB.
    * Dimension tables are maintained by the batch seeding path (entry
    * point 2, `MasterData`-style anti-join upserts), not here — this
    * runner owns the fact stream only.
    *
    * The known-order-id set is read ONCE per invocation and extended
    * driver-side per batch — re-reading the whole fact table inside every
    * micro-batch would cost O(batches × fact-size) I/O during catch-up.
    *
    * `dedupHorizon` bounds in-stream dedup state (G8) and therefore also
    * defines the late-data cutoff: records older than (max seen order_ts
    * − horizon) are DROPPED by the watermark. For backfill-heavy
    * schedules pass a horizon wider than the largest expected delivery
    * gap.
    *
    * `afterBatchWrite(batchId)` is a test seam invoked after the batch's
    * parquet append but BEFORE the micro-batch completes (and therefore
    * before the engine commits its offsets) — throwing there simulates a
    * crash in the exactly-once danger window: data durably written,
    * progress not recorded. The restart replays that batch; the
    * anti-join against the re-read fact table must absorb the replay
    * (spec: `CrashRecoverySpec`). Production callers leave the default
    * no-op. */
  def runAvailableNow(
      spark: SparkSession,
      txStream: DataFrame,
      products: DataFrame,
      customers: DataFrame,
      factDir: String,
      checkpointDir: String,
      dedupHorizon: String = "1 day",
      afterBatchWrite: Long => Unit = _ => ()): Unit = {
    // path-missing is the only condition that legitimately means "no fact
    // table yet"; any other failure (transient FS error, corrupt footer)
    // must abort rather than silently disable the re-delivery anti-join.
    var knownKeys: DataFrame =
      try spark.read.parquet(factDir).select("order_id").localCheckpoint(eager = true)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition != null && e.getCondition.contains("PATH_NOT_FOUND") =>
          spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("order_id", org.apache.spark.sql.types.StringType))))
      }
    val query = withMeasures(meshJoin(
        withStreamDedup(cleanTransactions(txStream), dedupHorizon), products, customers))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val toAppend = factAppendBatch(knownKeys, batch).localCheckpoint(eager = true)
        toAppend
          .withColumn("sale_year", year(col("order_ts")))
          .withColumn("sale_month", month(col("order_ts")))
          .write.mode("append")
          .partitionBy("sale_year", "sale_month")
          .parquet(factDir)
        afterBatchWrite(batchId)
        knownKeys = knownKeys
          .unionByName(toAppend.select("order_id"))
          .localCheckpoint(eager = true)
        ()
      }
      .start()
    query.awaitTermination()
  }

  /** [[runAvailableNow]] with the ACID sink: each micro-batch lands via
    * [[graft.etl.TxParquetSink.mergeUpsert]] (insert-if-absent on
    * order_id under snapshot isolation) instead of a plain parquet
    * append guarded by driver-side key bookkeeping. What that buys over
    * the plain runner:
    *  - **No torn batches.** The plain path's crash window (parquet
    *    append durable, offsets not committed) leaves a half-visible
    *    batch that only the NEXT run's anti-join repairs; here a batch
    *    is invisible until its manifest publishes atomically, and a
    *    replayed batch re-filters against the committed snapshot to
    *    zero inserts — the danger window closes by construction.
    *  - **Concurrent writers.** A backfill job or second pipeline
    *    upserting overlapping order ids interleaves safely (optimistic
    *    publish + delta re-filter); the plain path's driver-cached key
    *    set cannot see foreign commits.
    * Trade-off: the Tx sink's data layout is one directory per commit,
    * not the year/month partitioning of the plain runner — at 100 TB a
    * periodic compaction/layout job (see [[graft.etl.Layout]]) owns
    * read-side organization, exactly as Delta/Iceberg deployments pair
    * OPTIMIZE with streaming ingest. */
  def runAvailableNowTx(
      spark: SparkSession,
      txStream: DataFrame,
      products: DataFrame,
      customers: DataFrame,
      sink: graft.etl.TxParquetSink,
      checkpointDir: String,
      dedupHorizon: String = "1 day",
      afterBatchWrite: Long => Unit = _ => ()): Unit = {
    val query = withMeasures(meshJoin(
        withStreamDedup(cleanTransactions(txStream), dedupHorizon), products, customers))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink.mergeUpsert(spark, batch,
          keys = Seq("order_id"), orderCols = factOrderCols)
        afterBatchWrite(batchId)
        ()
      }
      .start()
    query.awaitTermination()
  }

  /** Wires the full pipeline on a streaming transactions frame and runs
    * it to completion against in-memory sinks (used by tests and local
    * runs; a production deployment points the same transforms at a file/
    * Kafka source and a parquet sink with checkpointing). Returns the
    * final fact table. */
  def runTransactionsToFact(
      spark: SparkSession,
      txStream: DataFrame,
      products: DataFrame,
      customers: DataFrame,
      checkpointDir: String): DataFrame = {
    import scala.collection.mutable
    val batches = mutable.ArrayBuffer.empty[DataFrame]
    // The enriched schema, derivable statically: the same transforms over
    // an empty batch frame. Returned when the stream yields no batches so
    // callers always get a correctly-typed (possibly empty) fact table.
    val emptyTyped = withMeasures(meshJoin(
      cleanTransactions(
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), txStream.schema)),
      products, customers))
    val query = withMeasures(meshJoin(withStreamDedup(cleanTransactions(txStream)), products, customers))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val toAppend =
          if (batches.isEmpty)
            Upserts.firstWins(batch, Seq("order_id"), factOrderCols)
          else factAppendBatch(batches.reduce(_ unionByName _), batch)
        batches += toAppend.localCheckpoint(eager = true)
        ()
      }
      .start()
    query.processAllAvailable()
    query.stop()
    if (batches.isEmpty) emptyTyped else batches.reduce(_ unionByName _)
  }
}
