package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.TxParquetSink

/** EXACTLY-ONCE streaming loads via partition overwrite — the
  * production answer to the question every `foreachBatch` writer faces:
  * what happens when Spark RETRIES a micro-batch? A plain append sink
  * double-counts the replayed batch; the usual fix (tracking batchId in
  * a side table) couples the sink to the checkpoint. Writing each batch
  * through [[TxParquetSink.overwritePartitions]] makes the load
  * IDEMPOTENT by construction: a batch REPLACES the partitions it
  * covers, so running it twice — or re-running an old batch during a
  * backfill — converges to the same table. This is the
  * replaceWhere-per-batch pattern Delta documents for exactly-once
  * foreachBatch sinks, on this sink's own ACID commit log (each retry
  * is one more atomic commit; readers never see a half-applied batch).
  *
  * CONTRACT: each micro-batch must carry COMPLETE partitions — every
  * row of the partitions it touches (e.g. source batches aligned on the
  * partition boundary, or a sessionized/windowed aggregate emitted on
  * watermark close). A batch carrying half a partition would replace
  * the other half away; that is replaceWhere semantics, not a sink bug,
  * and the spec pins both faces (idempotent replay AND the completeness
  * requirement). */
object TxStreamSink {

  /** `foreachBatch` body: load `batch` into `sink` by replacing the
    * partitions it covers. Returns the committed row count (0 for an
    * empty batch — no empty commits). */
  def overwriteBatch(sink: TxParquetSink, partitionCols: Seq[String])(
      batch: DataFrame, batchId: Long): Unit = {
    sink.overwritePartitions(batch.sparkSession, batch, partitionCols)
    ()
  }

  /** [[overwriteBatch]] recording per-batch min/max stats and null
    * counts for `statsCols` — streamed loads join the metadata read
    * tier: [[TxParquetSink.readSnapshotWhere]] prunes batches from
    * their manifests and [[TxParquetSink.countWhere]] credits the
    * newest batch's rows without a read. Same exactly-once contract;
    * the stats pass is one extra aggregate over the staged batch. */
  def overwriteBatchWithStats(sink: TxParquetSink, partitionCols: Seq[String],
      statsCols: Seq[String])(batch: DataFrame, batchId: Long): Unit = {
    sink.overwritePartitions(batch.sparkSession, batch, partitionCols,
      statsCols = statsCols)
    ()
  }

  /** STREAMED METADATA COUNT replay — [[txDailyReplay]]'s week-sliced
    * exactly-once load through [[overwriteBatchWithStats]] (a middle
    * batch deliberately REDELIVERED), then `COUNT(*)` over a two-week
    * day range answered by [[TxParquetSink.countWhere]]: the
    * redelivered commit takes manifest credit (it is the newest mask —
    * nothing can hide its rows), superseded and boundary batches scan
    * through their masks, out-of-range batches are excluded by their
    * own stats. The oracle computes the count declaratively, so the
    * gate proves exactly-once AND metadata-credit compose: a replayed
    * batch changes neither the table nor the credited count. */
  def txCountReplay(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sink = TxParquetSink(
      java.nio.file.Files.createTempDirectory("graft-txcnt").toString + "/t")
    val ev = graft.etl.Star.events(spark, dir)
      .withColumn("day", expr("CAST(CAST(ts AS DATE) AS STRING)"))
    def slice(lo: String, hi: String) =
      ev.where(col("day") >= lo && col("day") <= hi)
        .groupBy("day", "event_type")
        .agg(count(lit(1)).as("n_events"))
    val weeks = Seq(
      ("2024-01-01", "2024-01-07"), ("2024-01-08", "2024-01-14"),
      ("2024-01-15", "2024-01-21"), ("2024-01-22", "2024-01-31"))
    val write = overwriteBatchWithStats(sink, Seq("day"), Seq("day")) _
    weeks.zipWithIndex.foreach { case ((lo, hi), i) =>
      write(slice(lo, hi), i.toLong) }
    // the at-least-once redelivery: week 2 runs AGAIN
    write(slice(weeks(1)._1, weeks(1)._2), 1L)
    Seq(sink.countWhere(spark,
      "day >= '2024-01-08' AND day <= '2024-01-21'"))
      .toDF("n")
  }

  /** Oracle-checkable REPLAY of the exactly-once load over a closed
    * event log — the [[graft.streaming.StreamDedup]] replay pattern
    * applied to the sink: the events table is carved into month-sized
    * micro-batches (complete `day` partitions by construction — the
    * contract), each pushed through the SAME [[overwriteBatch]] body
    * the real stream runs, and then one mid-log batch is DELIBERATELY
    * REDELIVERED (Spark's at-least-once foreachBatch retry). The final
    * snapshot is read back and hash-gated against the plain
    * declarative daily aggregate — so the oracle differential proves,
    * on real data every round, that a double-applied batch changes
    * NOTHING: the exactly-once claim, not asserted but checked.
    * Driver loop shape: one bounded month list (calendar-domain
    * metadata), one commit per batch; the sink's own commit log is
    * the accumulating state. */
  def txDailyReplay(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val sink = TxParquetSink(
      java.nio.file.Files.createTempDirectory("graft-txreplay").toString + "/t")
    val ev = graft.etl.Star.events(spark, dir)
      .withColumn("day", expr("CAST(CAST(ts AS DATE) AS STRING)"))
    def monthly(m: String) = ev.where(expr(s"substring(day, 1, 7) = '$m'"))
      .groupBy("day", "event_type")
      .agg(count(lit(1)).as("n_events"))
    val months = ev.select(expr("substring(day, 1, 7)").as("mon"))
      .distinct().orderBy("mon").collect().map(_.getString(0)).toSeq
    val write = overwriteBatch(sink, Seq("day")) _
    months.zipWithIndex.foreach { case (m, i) => write(monthly(m), i.toLong) }
    // the at-least-once redelivery: the middle batch runs AGAIN
    val replayed = months(months.size / 2)
    write(monthly(replayed), months.size / 2)
    sink.readSnapshot(spark).get
      .select("day", "event_type", "n_events")
      .orderBy("day", "event_type")
  }
}
