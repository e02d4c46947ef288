package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.etl.TxParquetSink

/** STREAMED CDC CONSUMER — the downstream half of the sink's change
  * data feed ([[graft.etl.TxParquetSink.changesBetween]]): a
  * materialized aggregate VIEW maintained purely from the source
  * table's I/D stream, in its own ACID table, exactly once.
  *
  * Per tick ([[applyTick]] — the `foreachBatch` body a deployment
  * hangs off any trigger stream):
  *
  *  1. read the CURSOR — the last source version applied — out of the
  *     view table itself (a sentinel row, [[CursorId]]);
  *  2. if the source tip is at or below the cursor, STOP: a
  *     redelivered tick (Spark's at-least-once foreachBatch retry) is
  *     a no-op by construction;
  *  3. pull `changesBetween(cursor, tip)` — O(commits since cursor)
  *     work, never a table scan — and fold it into per-key deltas
  *     (insert adds, delete subtracts, the IVM multiplicity
  *     discipline);
  *  4. join the deltas against the view's CURRENT rows for the
  *     touched keys only, and publish new ABSOLUTE rows for exactly
  *     those keys PLUS the advanced cursor row in ONE
  *     [[graft.etl.TxParquetSink.overwritePartitions]] commit at key
  *     grain.
  *
  * Exactly-once comes from storing the cursor IN the view commit (the
  * classic offsets-with-data move): the cursor and the rows it
  * explains are one atomic commit, so a crash between source commits
  * loses nothing (the next tick resumes from the committed cursor) and
  * a redelivered tick re-reads an already-advanced cursor and applies
  * nothing. A key whose multiplicity falls to zero stays as a
  * TOMBSTONE row (n_rows = 0) that the serving read filters — the
  * merge-on-read answer to "overwrite can't replace a key with
  * nothing"; the periodic compact that every table runs anyway
  * materializes tombstones away ([[graft.etl.TxParquetSink.compact]]).
  *
  * At 100 TB this is why the feed exists: each refresh costs the
  * commits since the cursor plus a touched-keys-sized join — the view
  * never re-reads the source table.
  */
object StreamCdc {

  /** Sentinel store_id carrying the cursor row; serving reads filter
    * `store_id >= 0`, so no real key may collide. */
  val CursorId: Long = -1L

  /** One consumer tick: advance `view` to `source`'s current tip.
    * Returns the number of touched keys (0 = no news or redelivery). */
  def applyTick(spark: SparkSession, source: TxParquetSink,
      view: TxParquetSink): Long = {
    import spark.implicits._
    val state = view.readSnapshot(spark)
    val cursor = state.flatMap(df =>
      df.where(col("store_id") === CursorId)
        .select(col("cents_total")).as[Long].collect().headOption)
      .getOrElse(-1L)
    val tip = source.version()
    if (tip <= cursor) return 0L
    val feed = source.changesBetween(spark, cursor, tip)
      .getOrElse(return publishCursor(spark, view, tip))
    val delta = feed
      .withColumn("sgn",
        when(col("_change_type") === "I", lit(1L)).otherwise(lit(-1L)))
      .groupBy("store_id")
      .agg(sum(col("sgn") * col("cents")).as("d_cents"),
        sum(col("sgn")).as("d_rows"))
    val current = state
      .map(_.where(col("store_id") =!= CursorId))
      .getOrElse(delta.select(col("store_id"),
        col("d_cents").as("cents_total"), col("d_rows").as("n_rows")).limit(0))
    // touched keys only: absolute = current + delta (missing side = 0)
    val touched = delta.join(current, Seq("store_id"), "left_outer")
      .select(col("store_id"),
        (coalesce(col("cents_total"), lit(0L)) + col("d_cents")).as("cents_total"),
        (coalesce(col("n_rows"), lit(0L)) + col("d_rows")).as("n_rows"))
    val cursorRow = Seq((CursorId, tip, -1L))
      .toDF("store_id", "cents_total", "n_rows")
    val batch = touched.unionByName(cursorRow).localCheckpoint(eager = true)
    view.overwritePartitions(spark, batch, Seq("store_id"))
    batch.count() - 1
  }

  private def publishCursor(spark: SparkSession, view: TxParquetSink,
      tip: Long): Long = {
    import spark.implicits._
    view.overwritePartitions(spark,
      Seq((CursorId, tip, -1L)).toDF("store_id", "cents_total", "n_rows"),
      Seq("store_id"))
    0L
  }

  /** The view's SERVING read: real keys with live multiplicity —
    * tombstones (n_rows = 0) and the cursor row filtered out. */
  def serve(spark: SparkSession, view: TxParquetSink): DataFrame =
    view.readSnapshot(spark).get
      .where(col("store_id") >= 0 && col("n_rows") > 0)
      .select("store_id", "cents_total", "n_rows")

  /** The real streaming query: any trigger stream (a rate source, a
    * notification topic — tick CONTENT is ignored, arrival is the
    * signal) drives one [[applyTick]] per micro-batch. Exactly-once
    * needs nothing from the checkpoint: the cursor lives in the view's
    * own commits, so a redelivered or replayed batch re-reads an
    * already-advanced cursor and applies nothing — the
    * [[graft.etl.TxParquetSink]] sink-side twin of Spark's
    * source-side offset tracking. */
  def run(spark: SparkSession, ticks: DataFrame, source: TxParquetSink,
      view: TxParquetSink, checkpointDir: String): StreamingQuery =
    ticks.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (_: DataFrame, _: Long) =>
        applyTick(spark, source, view); ()
      }
      .start()

  /** Oracle-checkable REPLAY over the [[graft.etl.EtlQueries
    * .txChangeFeed]] lifecycle (per-year appends → a partition
    * restatement → a predicate delete): one consumer tick after EVERY
    * source commit — the per-commit cadence a trigger-driven stream
    * runs — plus one deliberately REDELIVERED tick (must be a no-op:
    * the cursor already advanced) and one SKIPPED tick (two source
    * commits land before the consumer wakes — the catch-up path folds
    * both at once). The serving read is hash-gated against the
    * declarative aggregate of the source's FINAL state, so the
    * differential proves feed-folded ≡ recomputed through every
    * cadence a real consumer sees. */
  def cdcViewReplay(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft-cdcview")
    val source = TxParquetSink(base.toString + "/src")
    val view = TxParquetSink(base.toString + "/view")
    val monthExpr = expr("substring(CAST(time_id AS STRING), 1, 7)")
    val monthly = graft.etl.Star.salesFact(spark, dir)
      .groupBy(monthExpr.as("month"), col("store_id"))
      .agg(sum((col("total_revenue") * 100).cast("long")).as("cents"))
      .localCheckpoint(true)
    val years = monthly.select(expr("substring(month, 1, 4)").as("y"))
      .distinct().orderBy("y").collect().map(_.getString(0))
    years.foreach { y =>
      source.append(monthly.where(expr(s"substring(month, 1, 4) = '$y'")))
      applyTick(spark, source, view)
    }
    // redelivery: the same tick fires again — cursor is at tip, no-op
    applyTick(spark, source, view)
    // catch-up: TWO source commits land before the next tick
    val lastMonth = monthly.agg(max("month")).head().getString(0)
    val restated = monthly.where(col("month") === lit(lastMonth))
      .withColumn("cents", (col("cents") * 2).cast("long"))
    source.overwritePartitions(spark, restated, Seq("month"))
    source.deleteWhere(spark, "store_id % 7 = 3")
    applyTick(spark, source, view)
    serve(spark, view).orderBy("store_id")
  }
}
