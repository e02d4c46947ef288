package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftStreamBridge, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.etl.TxParquetSink

/** A REAL `readStream` SOURCE over the commit log — the round-12
  * verdict's item 3 (Delta's streaming-source move): every streamed
  * consumer used to hand-roll the cursor-in-commit loop inside
  * `foreachBatch` ([[StreamCdc]], [[StreamMv]], [[TxStreamSink]]);
  * with the source, a downstream query is a one-liner:
  *
  * {{{
  *   spark.readStream.format("graft-cdc")
  *     .option("path", tableDir)         // a TxParquetSink dir
  *     .option("startingVersion", "-1")  // optional; -1 = from genesis
  *     .load()                           // table columns + _change_type, _version
  * }}}
  *
  * OFFSETS ARE COMMIT VERSIONS: offset v means "the feed through
  * commit v is consumed", so a micro-batch (start, end] is EXACTLY
  * [[TxParquetSink.changesBetween]]`(start, end)` — O(commits in
  * range) metadata plus the masked-row reads, never a table scan, and
  * the same I/D semantics every batch consumer already relies on
  * (appends/merges as inserts; deletes/overwrites as deletes of the
  * pre-image; compaction bases as nothing). Exactly-once is Spark's
  * own offset-log contract: a restarted query replays the SAME
  * (start, end] range, and `changesBetween` over an immutable log
  * prefix is deterministic — redelivery reproduces the batch
  * bit-for-bit. A range below the truncation horizon still THROWS
  * (a CDC consumer must never silently miss commits), surfacing as a
  * failed query rather than a wrong one.
  *
  * The source is registered via `META-INF/services`
  * (`DataSourceRegister`), so `format("graft-cdc")` resolves by
  * short name with zero session configuration. */
class GraftCdcSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdc"

  private def dirOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      """graft-cdc needs .option("path", <transactional table dir>)"""))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    ("graft-cdc", schema.getOrElse(
      GraftCdcSource.feedSchema(sqlContext, dirOf(parameters))))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new GraftCdcSource(sqlContext, dirOf(parameters),
      parameters.get("startingVersion").map(_.toLong).getOrElse(-1L),
      schema.getOrElse(
        GraftCdcSource.feedSchema(sqlContext, dirOf(parameters))))
}

object GraftCdcSource {

  /** The feed's schema: the table's snapshot columns plus the change
    * tags. Needs at least one commit (or a user-supplied schema) —
    * the same contract as reading any schemaless source. */
  def feedSchema(sqlContext: SQLContext, dir: String): StructType = {
    val base = TxParquetSink(dir).readSnapshot(sqlContext.sparkSession)
      .map(_.schema).getOrElse(throw new IllegalStateException(
        s"graft-cdc: table $dir has no commits yet — pass .schema(...) " +
          "or commit first"))
    base.add("_change_type", StringType).add("_version", LongType)
  }
}

class GraftCdcSource(sqlContext: SQLContext, dir: String,
    startingVersion: Long, override val schema: StructType) extends Source {

  private val sink = TxParquetSink(dir)

  private def ver(o: Offset): Long = o.json.trim.toLong

  override def getOffset: Option[Offset] = {
    val v = sink.version()
    if (v < 0 || v <= startingVersion) None else Some(LongOffset(v))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val spark = sqlContext.sparkSession
    val fromV = start.map(ver).getOrElse(startingVersion)
    val toV = ver(end)
    sink.changesBetween(spark, fromV, toV) match {
      case None => GraftStreamBridge.emptyStreaming(spark, schema)
      case Some(df) =>
        // positional alignment to the declared schema: the engine
        // projects micro-batches by POSITION against the source's
        // output; schema-evolution columns a given range never saw
        // read back as typed nulls (the mergeSchema contract)
        val have = df.columns.toSet
        val aligned = df.select(schema.fields.toSeq.map { f =>
          if (have.contains(f.name)) col(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        }: _*)
        GraftStreamBridge.asStreaming(aligned)
    }
  }

  override def stop(): Unit = ()
}
