package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Warehouse sink abstraction for the upsert-append path (reference
  * S5/S7): the reference's warehouse lives behind JDBC
  * (`/root/reference/src/Meshjoin.java:325-336`, MySQL connector in
  * `lib/`); this engine's testdata path lands parquet. Both targets
  * expose the same two primitives the idempotent anti-join upsert needs —
  * the key set already present, and append — so
  * [[WarehouseSink.upsertAppend]] / [[WarehouseSink.streamUpsert]] run
  * unchanged against either.
  *
  * Scale: `existingKeys` is the per-batch cost. Both implementations
  * column-prune at the source (parquet reads only the key columns; the
  * JDBC scan generates `SELECT k1, k2 FROM t`). For a huge warehouse
  * table behind JDBC, partition the scan with the standard
  * `partitionColumn/numPartitions` reader options passed via `options` —
  * the anti-join itself is one shuffle (or a broadcast of the incoming
  * micro-batch side under AQE, the common case).
  */
trait WarehouseSink {

  /** Key projection of rows already in the sink; an empty frame with the
    * same key schema (taken from `schemaSource`) when the target doesn't
    * exist yet. Target-missing is detected EXPLICITLY (path probe /
    * catalog metadata) — any other read failure propagates rather than
    * silently disabling the re-delivery anti-join. */
  def existingKeys(spark: SparkSession, keys: Seq[String], schemaSource: DataFrame): DataFrame

  /** Append rows; creates the target on first write. */
  def append(df: DataFrame): Unit
}

/** Parquet sink, optionally partitioned (date partitioning is what makes
  * downstream OLAP scans prunable at 100 TB). */
final case class ParquetSink(dir: String, partitionCols: Seq[String] = Nil)
    extends WarehouseSink {

  def existingKeys(spark: SparkSession, keys: Seq[String], schemaSource: DataFrame): DataFrame =
    try spark.read.parquet(dir).select(keys.head, keys.tail: _*)
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition != null && e.getCondition.contains("PATH_NOT_FOUND") =>
        WarehouseSink.emptyKeys(spark, keys, schemaSource)
    }

  def append(df: DataFrame): Unit = {
    val w = df.write.mode("append")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(dir)
  }
}

/** JDBC sink (reference S5/S7 verbatim capability). Works against any
  * driver on the classpath; spec-tested against embedded Derby. The
  * upsert's idempotence does NOT rely on database constraints — the
  * anti-join filters re-deliveries before the INSERT, so the target needs
  * no unique index (the reference's MySQL tables declare PKs, but its
  * insert path also probes first — `Meshjoin.java:612-626`). */
final case class JdbcSink(url: String, table: String, options: Map[String, String] = Map.empty)
    extends WarehouseSink {

  def existingKeys(spark: SparkSession, keys: Seq[String], schemaSource: DataFrame): DataFrame =
    if (!tableExists())
      WarehouseSink.emptyKeys(spark, keys, schemaSource)
    else
      spark.read.format("jdbc")
        .option("url", url).option("dbtable", table)
        .options(options)
        .load()
        .select(keys.head, keys.tail: _*)

  def append(df: DataFrame): Unit =
    df.write.mode("append").format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options)
      .save()

  /** Catalog-metadata existence probe (driver-side, one connection):
    * explicit, so a transient connection failure aborts loudly instead of
    * being misread as "no table yet". */
  private def tableExists(): Boolean = {
    options.get("driver").foreach(Class.forName)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, null, Array("TABLE"))
      var found = false
      while (!found && rs.next()) found = rs.getString("TABLE_NAME").equalsIgnoreCase(table)
      rs.close()
      found
    } finally conn.close()
  }
}

object WarehouseSink {

  private[etl] def emptyKeys(spark: SparkSession, keys: Seq[String], schemaSource: DataFrame): DataFrame = {
    val keyFields = schemaSource.select(keys.head, keys.tail: _*).schema
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), keyFields)
  }

  /** One idempotent upsert-append: D1's anti-join (including deterministic
    * first-wins dedup of the incoming batch) against the sink's live key
    * set, then append. Returns the number of rows appended. */
  def upsertAppend(
      spark: SparkSession,
      sink: WarehouseSink,
      incoming: DataFrame,
      keys: Seq[String],
      orderCols: Seq[String]): Long = {
    val toAdd = Upserts.insertIfAbsent(
        sink.existingKeys(spark, keys, incoming), incoming, keys, orderCols)
      .localCheckpoint(eager = true)
    val n = toAdd.count()
    if (n > 0) sink.append(toAdd)
    n
  }

  /** Load-audit metrics riding the write pass itself: `Dataset.observe`
    * attaches named aggregates to the PLAN, so they are computed by the
    * same tasks that write the rows — no second scan. At 100 TB that is
    * the difference between "every load is audited" and "the audit query
    * is too expensive to run": row count, exact revenue total and
    * null-key count come back through the observation for free, to be
    * asserted or logged by the load driver. (On streams the same
    * `observe` surfaces per-batch via `StreamingQueryProgress
    * .observedMetrics` — one mechanism, both modes.) Returns the
    * observed metrics keyed by name. */
  def observedLoad(
      df: DataFrame,
      action: DataFrame => Unit,
      keyCol: String,
      revenueCol: String): Map[String, Any] = {
    import org.apache.spark.sql.functions._
    val obs = org.apache.spark.sql.Observation("load_audit")
    val observed = df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(col(revenueCol)).as("total_revenue"),
      sum(when(col(keyCol).isNull, 1L).otherwise(0L)).as("null_keys"))
    action(observed)
    obs.get
  }

  /** Streaming variant: the same upsert per micro-batch via foreachBatch.
    * Engine retries replay a batch wholesale; the anti-join drops rows
    * whose keys already landed, so the sink observes effective
    * exactly-once without transactional writes. */
  def streamUpsert(
      spark: SparkSession,
      stream: DataFrame,
      sink: WarehouseSink,
      keys: Seq[String],
      orderCols: Seq[String],
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertAppend(spark, sink, batch, keys, orderCols)
        ()
      }
      .start()
}
