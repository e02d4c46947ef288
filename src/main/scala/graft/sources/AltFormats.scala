package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Additional source/sink formats beyond CSV and parquet — the events
  * feed as JSON-lines (the wire format most event collectors emit) and
  * ORC (the other columnar warehouse format a migration source is
  * likely to hold). Both readers take an EXPLICIT schema: schema
  * inference is a full extra pass over the data at 100 TB, and worse,
  * it makes the parsed types a function of whatever happens to be in
  * the batch — a drifting feed silently changes column types mid-
  * pipeline. With a declared schema, drift surfaces as nulls/errors at
  * the boundary instead.
  *
  * Round-trip fidelity (same rows back, timestamps to the microsecond)
  * is pinned by AltFormatsSpec against the parquet source of truth. */
object AltFormats {

  /** The events schema as converted by `Star.events` (ts already a
    * timestamp): what both alternate readers declare. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** JSON's DEFAULT timestamp format carries milliseconds only —
    * silently truncating event times by up to 999 µs per row (a
    * round-trip fidelity bug the spec caught); writer and reader pin
    * the same microsecond format. */
  private val JsonTsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def writeEventsJsonl(spark: SparkSession, dir: String, out: String): Unit =
    graft.etl.Star.events(spark, dir)
      .write.option("timestampFormat", JsonTsFormat)
      .mode("overwrite").json(out)

  def eventsJsonl(spark: SparkSession, out: String): DataFrame =
    spark.read.schema(eventsSchema)
      .option("timestampFormat", JsonTsFormat).json(out)

  def writeEventsOrc(spark: SparkSession, dir: String, out: String): Unit =
    graft.etl.Star.events(spark, dir)
      .write.mode("overwrite").orc(out)

  def eventsOrc(spark: SparkSession, out: String): DataFrame =
    spark.read.schema(eventsSchema).orc(out)
}
