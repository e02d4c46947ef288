package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Schemas._

/** Builds the METRO star schema (reference DDL
  * `/root/reference/SQL/Star_Schema_Metro.sql:16-73`) from the driver's
  * TPC-H-ish parquet testdata, per the FIXTURES.md §3 role mapping:
  *
  *   customer → Customers, supplier → Supplier, nation → Store,
  *   part (+ min-supplier FK derivation) → Products,
  *   distinct o_orderdate (+ P2 derivations) → TimeDimension,
  *   lineitem ⋈ orders ⋈ supplier → Sales_Fact.
  *
  * Scale posture (100 TB):
  *  - The fact build joins lineitem (the huge table) to orders on the join
  *    key both sides are naturally keyed by; with AQE on, Spark picks
  *    shuffled hash / sort-merge and handles skew. supplier/nation/part are
  *    bounded dimensions → `broadcast()` so the fact scan never shuffles
  *    for them.
  *  - Every measure is exact decimal: decimal sums are associative, so
  *    partial aggregation (map-side combine) is safe and results are
  *    identical regardless of partitioning — required for a deterministic
  *    1000-executor run.
  *  - All expressions are built-in (codegen'd); no UDFs anywhere.
  */
object Star {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Warehouse materialization: dimensions and the fact table are built
    * ONCE per (session, source dir) and cached — the in-memory analog of
    * the star schema being real stored tables rather than views over the
    * raw inputs. Without this every OLAP query re-runs the dimension
    * derivations (e.g. the lineitem pre-pass behind Products' FK pinning)
    * from the raw TPC-H files, which no warehouse would do. At cluster
    * scale the same role is played by writing the star tables to parquet
    * once; the per-query plans are identical either way. */
  private def warehouse(spark: SparkSession, dir: String, name: String)(
      build: => DataFrame): DataFrame =
    graft.util.SessionCache.getOrBuild(spark, s"star|$dir|$name")(build)

  /** The events stream table, normalized to a session-timezone
    * `timestamp` ts regardless of how the file spells it — generators
    * have shipped it three ways, and the engine must read all of them:
    *  - nanosecond parquet timestamps (rejected by Spark's vectorized
    *    reader): read as longs via `spark.sql.legacy.parquet.nanosAsLong`
    *    and floor-convert to µs (the data is µs-granular — lossless).
    *    That flag is DELIBERATELY session-global: it is not settable
    *    per-read, and every nanos parquet this engine touches wants the
    *    same treatment — restoring it between reads would make unrelated
    *    scans ordering-dependent on when their plans execute.
    *  - native µs timestamps without timezone metadata (TIMESTAMP_NTZ):
    *    cast to `timestamp` — the session zone is pinned UTC by every
    *    entrypoint, so the instant is unchanged.
    *  - plain `timestamp`: pass through. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // A long `ts` is ambiguous: under nanosAsLong a TIMESTAMP(NANOS)
        // column maps to long, but so would a future generator's raw
        // int64 µs — and a silent `div 1000` there would shift every
        // event-time query by 1000× while the oracle reads the raw
        // value (ADVICE r6). The parquet footer names the unit; key the
        // conversion on it and fail loudly on anything unannotated.
        tsFooterUnit(spark, s"$dir/events.parquet") match {
          case Some("NANOS")  => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          case Some("MICROS") => raw.withColumn("ts", expr("timestamp_micros(ts)"))
          case Some("MILLIS") => raw.withColumn("ts", expr("timestamp_millis(ts)"))
          case other => throw new IllegalStateException(
            s"events.ts read as long but parquet logical type is $other — " +
              "cannot infer the time unit; refusing to guess (a wrong guess " +
              "is a silent 1000x shift in every event-time query)")
        }
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Parquet logical-type unit of the events `ts` column, read from one
    * file footer — O(1) metadata, no data scan, evaluated once at plan
    * construction. Returns the annotation's unit name ("MILLIS",
    * "MICROS", "NANOS"), or None when `ts` is absent or not annotated
    * as a timestamp (e.g. a raw int64). */
  private def tsFooterUnit(spark: SparkSession, path: String): Option[String] = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(f => f.getName.endsWith(".parquet") || f.getName.startsWith("part-"))
          .sortBy(_.getName).headOption
          .getOrElse(throw new IllegalStateException(s"no parquet files under $path"))
      else p
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      if (!schema.containsField("ts")) None
      else schema.getType(schema.getFieldIndex("ts")).getLogicalTypeAnnotation match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          Some(t.getUnit.toString)
        case _ => None
      }
    } finally reader.close()
  }

  /** Customers(Customer_ID, Customer_Name, Gender) — c_mktsegment stands in
    * for the reference's Gender attribute (categorical, low-cardinality). */
  def dimCustomer(spark: SparkSession, dir: String): DataFrame =
    warehouse(spark, dir, "dim_customer") {
      table(spark, dir, "customer").select(
        col("c_custkey").as("customer_id"),
        col("c_name").as("customer_name"),
        col("c_mktsegment").as("gender"))
    }

  def dimSupplier(spark: SparkSession, dir: String): DataFrame =
    warehouse(spark, dir, "dim_supplier") {
      table(spark, dir, "supplier").select(
        col("s_suppkey").as("supplier_id"),
        col("s_name").as("supplier_name"))
    }

  /** Store dimension — nation plays the store hierarchy (FIXTURES.md §3). */
  def dimStore(spark: SparkSession, dir: String): DataFrame =
    warehouse(spark, dir, "dim_store") {
      table(spark, dir, "nation").select(
        col("n_nationkey").as("store_id"),
        col("n_name").as("store_name"))
    }

  /** Products(Product_ID, Product_Name, Price, Store_ID, Supplier_ID).
    * The reference's Products dimension is denormalized — each product
    * belongs to exactly one store and supplier
    * (`/root/reference/SQL/Star_Schema_Metro.sql:33-41`). TPC-H parts have
    * many suppliers, so we pin the FK deterministically: the minimum
    * supplier key observed in lineitem, and that supplier's nation as the
    * store. The min-aggregation is a cheap pre-pass over lineitem's two FK
    * columns only (column pruning reaches the scan). */
  def dimProduct(spark: SparkSession, dir: String): DataFrame =
    warehouse(spark, dir, "dim_product") {
    val part = table(spark, dir, "part")
    val supplier = table(spark, dir, "supplier")
    val partSupp = table(spark, dir, "lineitem")
      .groupBy(col("l_partkey").as("product_id"))
      .agg(min("l_suppkey").as("supplier_id"))
    part
      .join(partSupp, part("p_partkey") === partSupp("product_id"), "left")
      .join(broadcast(supplier), partSupp("supplier_id") === supplier("s_suppkey"), "left")
      .select(
        part("p_partkey").as("product_id"),
        col("p_name").as("product_name"),
        col("p_retailprice").cast(priceType).as("price"),
        col("s_nationkey").as("store_id"),
        partSupp("supplier_id").as("supplier_id"))
  }

  /** TimeDimension — one row per distinct order date with the P2-derived
    * attributes (`/root/reference/src/Meshjoin.java:306-313`). The date
    * itself is the key (the reference's Time_ID/Order_Date composite
    * collapses to the date at this grain). */
  def dimTime(spark: SparkSession, dir: String): DataFrame =
    warehouse(spark, dir, "dim_time") {
      val dates = table(spark, dir, "orders")
        .select(col("o_orderdate").as("time_id"), col("o_orderdate").as("order_date"))
        .distinct()
      TimeDim.withTimeAttrs(dates, "order_date")
    }

  /** Sales_Fact at line-item grain (one row per lineitem — SURVEY.md Q-j:
    * the per-order grain of the reference makes its own affinity query
    * vacuous; line-item grain is the stated intent).
    *
    * Measures (reference P5, `/root/reference/src/Meshjoin.java:724-737`):
    * total_revenue = round(qty × price, 2) re-expressed as exact decimal
    * `round(extendedprice × (1 − discount), 2)`; total_units_sold =
    * quantity_ordered (reference Q-d). */
  def salesFact(spark: SparkSession, dir: String): DataFrame =
    warehouse(spark, dir, "sales_fact") {
    val l = table(spark, dir, "lineitem")
    val o = table(spark, dir, "orders")
    val s = table(spark, dir, "supplier")
    val ext = col("l_extendedprice").cast(priceType)
    val disc = col("l_discount").cast(discountType)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .select(
        l("l_orderkey").as("order_id"),
        l("l_partkey").as("product_id"),
        o("o_custkey").as("customer_id"),
        l("l_suppkey").as("supplier_id"),
        s("s_nationkey").as("store_id"),
        o("o_orderdate").as("time_id"),
        l("l_quantity").cast("int").as("quantity_ordered"),
        l("l_quantity").cast("int").as("total_units_sold"),
        round(ext * (lit(1) - disc), 2).cast(revenueType).as("total_revenue"))
      // Hash-partition the materialized fact on order_id with an EXPLICIT
      // count: a small-SF lineitem file yields only a few input splits,
      // and with all-broadcast joins that split count would become the
      // cached table's partitioning — every downstream query's first
      // stage then runs on 3 cores of 32. Partitioning (not just
      // parallelizing) on order_id also hands consumers that join or
      // group by order grain (Q6's basket self-join, D7 fact dedup) a
      // co-located start. The cluster-scale analog is writing the fact
      // bucketed by order_id — a one-time layout cost in the warehouse
      // build, not per-query work.
      .repartition(spark.sessionState.conf.numShufflePartitions, col("order_id"))
  }

  /** DuckDB-oracle twin of the star build: a CTE prefix prepended to every
    * oracle query so both engines derive the identical star schema from
    * the same parquet tables. Decimal casts mirror the Spark side exactly
    * (exact decimal arithmetic ⇒ both engines agree bit-for-bit). */
  val oracleCte: String =
    """WITH
      |dim_customer AS (
      |  SELECT c_custkey AS customer_id, c_name AS customer_name,
      |         c_mktsegment AS gender
      |  FROM customer
      |),
      |dim_supplier AS (
      |  SELECT s_suppkey AS supplier_id, s_name AS supplier_name FROM supplier
      |),
      |dim_store AS (
      |  SELECT n_nationkey AS store_id, n_name AS store_name FROM nation
      |),
      |part_supp AS (
      |  SELECT l_partkey AS product_id, MIN(l_suppkey) AS supplier_id
      |  FROM lineitem GROUP BY l_partkey
      |),
      |dim_product AS (
      |  SELECT p.p_partkey AS product_id, p.p_name AS product_name,
      |         CAST(p.p_retailprice AS DECIMAL(12,2)) AS price,
      |         s.s_nationkey AS store_id, ps.supplier_id AS supplier_id
      |  FROM part p
      |  LEFT JOIN part_supp ps ON p.p_partkey = ps.product_id
      |  LEFT JOIN supplier s ON ps.supplier_id = s.s_suppkey
      |),
      |dim_time AS (
      |  SELECT DISTINCT o_orderdate AS time_id, o_orderdate AS order_date,
      |         CAST(year(o_orderdate) AS INT) AS year,
      |         CAST(month(o_orderdate) AS INT) AS month,
      |         CAST(day(o_orderdate) AS INT) AS day,
      |         CAST(weekofyear(o_orderdate) AS INT) AS week,
      |         CAST(quarter(o_orderdate) AS INT) AS quarter,
      |         upper(dayname(o_orderdate)) AS day_of_week,
      |         dayname(o_orderdate) IN ('Saturday','Sunday') AS is_weekend
      |  FROM orders
      |),
      |sales_fact AS (
      |  SELECT l.l_orderkey AS order_id, l.l_partkey AS product_id,
      |         o.o_custkey AS customer_id, l.l_suppkey AS supplier_id,
      |         s.s_nationkey AS store_id, o.o_orderdate AS time_id,
      |         CAST(l.l_quantity AS INT) AS quantity_ordered,
      |         CAST(l.l_quantity AS INT) AS total_units_sold,
      |         CAST(ROUND(CAST(l.l_extendedprice AS DECIMAL(12,2))
      |               * (1 - CAST(l.l_discount AS DECIMAL(4,2))), 2)
      |              AS DECIMAL(14,2)) AS total_revenue
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |)
      |""".stripMargin
}
