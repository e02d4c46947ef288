package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental view maintenance — the delta-propagation algebra behind
  * every refresh-on-arrival materialized view (Gupta & Mumick's
  * classic survey; the reference refreshes by full reload,
  * `/root/reference/src/Main.java` re-running its whole ETL): a
  * SUM/COUNT view over a fact stream is maintained by aggregating ONLY
  * the delta batch and merging it into the stored view, never
  * re-touching history. The differential harness is the whole point
  * here: the registered query computes base-view ⊕ delta, the DuckDB
  * oracle recomputes the view over the full fact — their hash equality
  * IS the self-maintainability theorem for SUM/COUNT views, checked on
  * real data.
  */
object Ivm {

  /** The STORED daily revenue view over all days strictly before the
    * fact's last day — the materialized table a deployment would keep
    * on disk; session-cached like the other warehouse artifacts. The
    * final day plays the arriving delta batch. */
  def dailyMvBase(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionCache.getOrBuild(spark, s"ivm|$dir|daily_mv") {
      val f = Star.salesFact(spark, dir)
      val cut = f.agg(max("time_id").as("cut"))
      f.crossJoin(broadcast(cut))
        .where(col("time_id") < col("cut"))
        .groupBy("store_id", "time_id")
        .agg(sum((col("total_revenue") * 100).cast("long")).as("cents"),
          count(lit(1)).as("n_rows"))
    }

  /** Apply the last day's delta to the stored view: aggregate the
    * delta slice only (delta-sized, not history-sized), full-outer
    * merge on the group key with coalesce-to-zero sums — the
    * SUM/COUNT self-maintenance rule (inserts only here; deletes
    * would subtract, which the same merge expression handles with
    * negated deltas). Output is the refreshed view, which the oracle
    * recomputes from scratch — equality proves the algebra. */
  def ivmDailyRefresh(spark: SparkSession, dir: String): DataFrame = {
    val f = Star.salesFact(spark, dir)
    val cut = f.agg(max("time_id").as("cut"))
    val delta = f.crossJoin(broadcast(cut))
      .where(col("time_id") === col("cut"))
      .groupBy("store_id", "time_id")
      .agg(sum((col("total_revenue") * 100).cast("long")).as("d_cents"),
        count(lit(1)).as("d_rows"))
    dailyMvBase(spark, dir)
      .join(delta, Seq("store_id", "time_id"), "full_outer")
      .select(col("store_id"), col("time_id"),
        (coalesce(col("cents"), lit(0L)) +
          coalesce(col("d_cents"), lit(0L))).as("cents"),
        (coalesce(col("n_rows"), lit(0L)) +
          coalesce(col("d_rows"), lit(0L))).as("n_rows"))
      .orderBy("store_id", "time_id")
  }

  /** STREAMING maintenance of the same view, as a delta LOG: each
    * micro-batch appends its (store, day) aggregate atomically
    * ([[TxParquetSink.append]] — the crash-safe sink the fact merge
    * already uses), and the view is the additive fold of the log. The
    * append-deltas-fold-on-read split is how a sum-merge view scales:
    * writers never read-modify-write the whole view (no write
    * amplification, no lost-update races between concurrent batches),
    * and a periodic compaction — here [[readStreamedMv]] itself — is
    * the only consolidating reader. Used by the IvmAuditSpec streaming
    * parity test: stream-maintained ≡ batch recompute. */
  def maintainDailyMv(batch: DataFrame, sink: TxParquetSink): Unit =
    sink.append(
      batch.groupBy("store_id", "time_id")
        .agg(sum((col("total_revenue") * 100).cast("long")).as("cents"),
          count(lit(1)).as("n_rows")))

  /** The consolidated view over the streamed delta log. */
  def readStreamedMv(spark: SparkSession, sink: TxParquetSink): Option[DataFrame] =
    sink.readSnapshot(spark).map(
      _.groupBy("store_id", "time_id")
        .agg(sum("cents").as("cents"), sum("n_rows").as("n_rows")))
}
