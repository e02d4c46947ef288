package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.CsvSources

/** The reference's dimension-seeding entry point (entry point 2,
  * `Insert_Dimensions` — `/root/reference/src/Meshjoin.java:170-239`):
  * read the two master CSVs and insert-if-absent the four dimensions
  * Products / Store / Supplier / Customers into the warehouse.
  *
  * The reference loops record-at-a-time, issuing one JDBC existence probe
  * + insert per dimension per row; here each CSV is ONE scan and each
  * dimension ONE anti-join append set ([[Upserts.insertIfAbsent]]) — the
  * per-row probes collapse into four broadcast/shuffle joins, the only
  * shape that survives a 100 TB master file.
  *
  * Record-validity semantics mirror the reference:
  *  - a products row is skipped WHOLE when any of its 7 fields is missing
  *    (`Meshjoin.java:184-188` — short rows) or its price fails to parse
  *    (`:194-199`); a skipped row seeds neither product, store nor
  *    supplier;
  *  - a customers row is skipped when any of its 3 fields is missing
  *    (`:225-228`).
  *  - "first occurrence wins" for duplicate IDs: the reference's "first"
  *    is CSV file order, which is not a stable notion on a distributed
  *    scan; per the [[Upserts]] contract we determinize with an explicit
  *    total order over the non-key columns (documented divergence — same
  *    policy as D2–D6).
  */
object MasterData {

  /** The four per-dimension append sets produced by one seeding pass. */
  final case class DimAppends(
      products: DataFrame,
      stores: DataFrame,
      suppliers: DataFrame,
      customers: DataFrame)

  /** Products-CSV rows that pass the reference's validity gate. Uses
    * `try_cast` for the price so an unparseable value becomes a skipped
    * row (reference `continue`) instead of an ANSI runtime error. */
  private[etl] def validProductRows(spark: SparkSession, productsCsv: String): DataFrame = {
    val raw = CsvSources.products(spark, productsCsv)
    raw.where(
      col("product_id").isNotNull && col("product_name").isNotNull &&
        col("price").isNotNull && col("supplier_id").isNotNull &&
        col("supplier_name").isNotNull && col("store_id").isNotNull &&
        col("store_name").isNotNull)
  }

  private[etl] def validCustomerRows(spark: SparkSession, customersCsv: String): DataFrame =
    CsvSources.customers(spark, customersCsv).where(
      col("customer_id").isNotNull && col("customer_name").isNotNull &&
        col("gender").isNotNull)

  /** One-shot seeding: derive the append set for each dimension from the
    * master CSVs, minus keys already present in the existing dims. Each
    * `existing*` frame only needs its key column; pass
    * [[emptyExisting]]`(spark, "key")` on first boot. */
  def seed(
      spark: SparkSession,
      productsCsv: String,
      customersCsv: String,
      existingProducts: DataFrame,
      existingStores: DataFrame,
      existingSuppliers: DataFrame,
      existingCustomers: DataFrame): DimAppends = {
    val p = validProductRows(spark, productsCsv)
    val c = validCustomerRows(spark, customersCsv)
    // The reference's product insert carries the FK columns, not the
    // denormalized names (`insertProductIfNotExists(productID, name,
    // price, supplierID, storeID)` — Meshjoin.java:205).
    val products = Upserts.insertIfAbsent(
      existingProducts,
      p.select("product_id", "product_name", "price", "supplier_id", "store_id"),
      keys = Seq("product_id"),
      orderCols = Seq("product_name", "price", "supplier_id", "store_id"))
    val stores = Upserts.insertIfAbsent(
      existingStores,
      p.select("store_id", "store_name"),
      keys = Seq("store_id"),
      orderCols = Seq("store_name"))
    val suppliers = Upserts.insertIfAbsent(
      existingSuppliers,
      p.select("supplier_id", "supplier_name"),
      keys = Seq("supplier_id"),
      orderCols = Seq("supplier_name"))
    val customers = Upserts.insertIfAbsent(
      existingCustomers,
      c,
      keys = Seq("customer_id"),
      orderCols = Seq("customer_name", "gender"))
    DimAppends(products, stores, suppliers, customers)
  }

  /** An empty keyed frame for first-boot seeding (no warehouse yet). */
  def emptyExisting(spark: SparkSession, key: String): DataFrame = {
    import spark.implicits._
    Seq.empty[String].toDF(key)
  }
}
