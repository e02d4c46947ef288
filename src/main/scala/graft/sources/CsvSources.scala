package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** The reference's CSV scan layer (SURVEY.md §2.1 S1–S4) as declarative
  * Spark sources. The reference hand-rolls line splitting
  * (`/root/reference/src/Meshjoin.java:99,183,224,273` — `line.split(",")`
  * breaks on quoted commas) and patches it post-hoc with a sanitizer
  * (`:555-573`); Spark's CSV parser handles RFC-4180 quoting/escaping
  * natively, so S3+S4 collapse into reader options. The residual sanitizer
  * semantics (trim, CR/LF stripping inside quoted names) are explicit
  * column expressions.
  *
  * Scale: the batch readers are splittable parquet-style scans only if the
  * files are uncompressed/bzip2; at 100 TB the ingest tier would land CSV
  * → parquet once and everything downstream reads parquet (as the rest of
  * this engine does). The streaming reader is the production entry: file
  * discovery per micro-batch, `maxFilesPerTrigger` as the batching knob —
  * the engine-managed replacement for the reference's 50-record buffers +
  * bounded queue (`GenerateStream.java:8`, `Main.java:11`).
  */
object CsvSources {

  /** One option set for batch AND streaming readers — the two paths must
    * parse identical bytes identically or stream/batch parity breaks. */
  private val csvOptions: Map[String, String] = Map(
    "header" -> "true",
    "quote" -> "\"",
    "escape" -> "\"",
    "ignoreLeadingWhiteSpace" -> "true",
    "ignoreTrailingWhiteSpace" -> "true")

  private def reader(spark: SparkSession) =
    spark.read.options(csvOptions)

  /** S1 (batch twin): the transactions CSV with the reference's positional
    * layout (`GenerateStream.java:23-35`, SURVEY.md §1.4). */
  def transactions(spark: SparkSession, path: String): DataFrame =
    reader(spark).schema(Schemas.txSchema).csv(path)

  /** S2/S4: products master CSV — quoted store names with embedded commas
    * and `""` escapes parse natively; the reference's residual sanitizer
    * (strip CR/LF, trim) is applied to the name columns. The price parse
    * is `try_cast`: the reference SKIPS records with unparseable prices
    * (`Meshjoin.java:194-199`), so a malformed value must surface as NULL
    * for the caller to filter (per-record P3 semantics), not abort the
    * whole scan as an ANSI cast would. */
  def products(spark: SparkSession, path: String): DataFrame = {
    val raw = reader(spark).csv(path)
    raw.select(
      trim(col("Product_ID")).as("product_id"),
      sanitized(col("Product_Name")).as("product_name"),
      expr(s"try_cast(Price AS ${Schemas.priceType.sql})").as("price"),
      trim(col("Supplier_ID")).as("supplier_id"),
      sanitized(col("Supplier_Name")).as("supplier_name"),
      trim(col("Store_ID")).as("store_id"),
      sanitized(col("Store_Name")).as("store_name"))
  }

  /** S2: customers master CSV (`Meshjoin.java:230-232`). */
  def customers(spark: SparkSession, path: String): DataFrame =
    reader(spark).csv(path).select(
      trim(col("Customer_ID")).as("customer_id"),
      sanitized(col("Customer_Name")).as("customer_name"),
      trim(col("Gender")).as("gender"))

  /** S4 residue: the reference's sanitizer beyond what the CSV parser
    * already does — collapse CR/LF to spaces, trim
    * (`Meshjoin.java:555-573`). */
  def sanitized(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(c, "[\\r\\n]+", " "))

  /** S1 (streaming): the production transaction source. One file-source
    * streaming frame; micro-batch sizing via `maxFilesPerTrigger`
    * replaces the reference's hand-rolled 50-record buffering (F1). */
  /** S4 extended — quarantine ingest, the production posture for dirty
    * feeds: PERMISSIVE parsing keeps every input line. Rows that parse
    * land in `good`; rows that don't (structural damage — extra tokens,
    * broken quoting — or an unparseable typed field) land in
    * `quarantine` with the RAW line preserved for replay after a fix.
    * The reference's skip-on-parse-failure
    * (`/root/reference/src/Meshjoin.java:194-199`) loses those lines
    * forever; a warehouse ingesting third-party feeds cannot.
    *
    * The parsed batch is cached before the split: Spark refuses to
    * filter a lazy CSV scan on the internal corrupt-record column
    * alone (the parser would run twice and could disagree with
    * itself). Ingest slices are micro-batch-sized, so the cache is
    * bounded; the caller unpersists either frame when done. */
  def transactionsWithQuarantine(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val withCorrupt = Schemas.txSchema
      .add(org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType))
    val parsed = spark.read.options(csvOptions)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(path)
      .cache()
    val good = parsed.where(col("_corrupt_record").isNull).drop("_corrupt_record")
    val quarantine = parsed.where(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    (good, quarantine)
  }

  def transactionStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .options(csvOptions)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .schema(Schemas.txSchema)
      .csv(dir)
}
