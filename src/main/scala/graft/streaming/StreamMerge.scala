package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.TxParquetSink

/** STREAMED MERGE — a CDC-upsert consumer on
  * [[graft.etl.TxParquetSink.mergeInto]]: each micro-batch carries
  * key-grain change rows tagged `op` ('U' upsert with the key's new
  * ABSOLUTE value, 'D' delete), and the `foreachBatch` body applies
  * them as ONE atomic conditional merge — matched 'D' deletes, matched
  * 'U' updates, unmatched 'U' inserts, unmatched 'D' is a no-op (the
  * conditional insert clause: a redelivered delete must NOT resurrect
  * as an insert). This is the Delta-documented "merge in foreachBatch"
  * pattern, with its idempotence contract made explicit: values are
  * ABSOLUTE (last-writer-wins), so Spark's at-least-once retry of a
  * batch converges — re-applying sets every key to the value it
  * already has and re-deletes already-absent keys. A relative update
  * (`t.x + s.x`) would double-apply on retry; callers who need
  * accumulation send running totals, exactly like this replay does.
  *
  * At 100 TB: each batch costs one source-driven merge (bounded by the
  * batch, unmatched table rows never shuffle — [[graft.etl.TxParquetSink.mergeInto]]'s
  * cost model) plus one O(batch keys) manifest; the table is never
  * rewritten, and readers stay on their own snapshots mid-merge. */
object StreamMerge {

  /** `foreachBatch` body: apply one batch of (keys…, value cols…, op)
    * change rows to `sink`. `valueCols` update to the source's absolute
    * values; the transport `op` column never enters the table — the
    * bootstrap batch inserts the 'U' rows without it (fixing the table
    * schema to keys + values), and every later batch's insert clause
    * projects the TARGET's columns (source may carry extras).
    * `maskBudget` > 0 runs [[graft.etl.TxParquetSink.maintainIfNeeded]]
    * after the commit — a long-lived merge target degrades to
    * O(masking commits) scan groups without periodic OPTIMIZE, so the
    * policy belongs IN the writer loop, not in an ops runbook. */
  def mergeBatch(sink: TxParquetSink, keys: Seq[String],
      valueCols: Seq[String], maskBudget: Int = 0)(
      batch: DataFrame, batchId: Long): Unit = {
    if (!batch.isEmpty) {
      if (sink.version() == -1L)
        sink.append(batch.where(col("op") === "U").drop("op"))
      else {
        sink.mergeInto(batch.sparkSession, batch, keys,
          updateSet = valueCols.map(c => c -> s"s.`$c`").toMap,
          updateCond = Some("s.op = 'U'"),
          deleteCond = Some("s.op = 'D'"),
          insertCond = Some("s.op <> 'D'"))
        if (maskBudget > 0)
          sink.maintainIfNeeded(batch.sparkSession, maskBudget)
        ()
      }
    }
  }

  /** Oracle-checkable REPLAY (the [[TxStreamSink.txDailyReplay]]
    * pattern): the fact's per-store running revenue totals arrive as
    * half-year-sliced change batches — a store's first active half
    * INSERTS it, later halves UPDATE it to the new cumulative
    * (absolute values, the idempotence contract), one mid-log batch is
    * deliberately REDELIVERED (must converge), the writer-loop
    * maintenance policy ([[graft.etl.TxParquetSink.maintainIfNeeded]],
    * maskBudget = 4) OPTIMIZEs mid-replay when the merge-mask pile-up
    * crosses the budget — every merge commit masks all earlier commits
    * differently, so unbounded mask depth makes each target read
    * O(commits) scan groups — and a final batch DELETES every
    * store_id % 7 = 3 (redelivered too: unmatched deletes must not
    * resurrect). The final snapshot hash-gates against the declarative
    * per-store total minus the deletes — the streamed conditional
    * merge, composed with OPTIMIZE, provably lands the same state. */
  def mergeReplay(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthExpr = expr("substring(CAST(time_id AS STRING), 1, 7)")
    val monthly = graft.etl.Star.salesFact(spark, dir)
      .groupBy(monthExpr.as("month"), col("store_id"))
      .agg(sum((col("total_revenue") * 100).cast("long")).as("m_cents"))
    // cumulative at half-year end = the store's latest in-half row
    val cum = monthly
      .withColumn("cents", sum("m_cents").over(
        Window.partitionBy("store_id").orderBy("month")))
      .withColumn("q", expr(
        "concat(substring(month, 1, 4), '-', " +
          "CAST(ceil(CAST(substring(month, 6, 2) AS INT) / 6.0) AS INT))"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("store_id", "q").orderBy(col("month").desc)))
      .where(col("__rn") === 1)
      .select("q", "store_id", "cents")
      .localCheckpoint(true)
    val sink = TxParquetSink(
      java.nio.file.Files.createTempDirectory("graft-smerge").toString + "/t")
    val halves = cum.select("q").distinct().orderBy("q")
      .collect().map(_.getString(0)).toSeq
    val write = mergeBatch(sink, Seq("store_id"), Seq("cents"),
      maskBudget = 4) _
    def batchOf(q: String) = cum.where(col("q") === q)
      .select(col("store_id"), col("cents"), lit("U").as("op"))
    halves.zipWithIndex.foreach { case (q, i) =>
      write(batchOf(q), i.toLong)
      // the at-least-once redelivery: the second batch runs AGAIN —
      // absolute values make the re-apply a fixed point
      if (i == 1) write(batchOf(q), i.toLong)
    }
    val deletes = cum.select("store_id").distinct()
      .where(col("store_id") % 7 === 3)
      .select(col("store_id"), lit(0L).as("cents"), lit("D").as("op"))
    write(deletes, halves.size.toLong)
    // a redelivered DELETE batch: unmatched 'D' rows must not insert
    write(deletes, halves.size.toLong)
    sink.readSnapshot(spark).get
      .select("store_id", "cents")
      .orderBy("store_id")
  }
}
