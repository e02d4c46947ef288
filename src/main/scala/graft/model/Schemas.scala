package graft.model

import org.apache.spark.sql.types._

/** Star-schema model re-expressed from the reference DDL
  * (`/root/reference/SQL/Star_Schema_Metro.sql:16-73`) over the driver's
  * TPC-H-ish testdata (FIXTURES.md §3 mapping).
  *
  * Money is `DecimalType` end-to-end (SURVEY.md G5): the reference computes
  * in `double` and lets MySQL re-round to DECIMAL(10,2)
  * (`/root/reference/src/Meshjoin.java:725`); we standardize on exact decimal
  * arithmetic so aggregates are associative (order-independent) — a hard
  * requirement for deterministic results on a many-executor cluster.
  */
object Schemas {

  /** transactions stream schema — the reference's positional CSV layout
    * (`/root/reference/src/GenerateStream.java:23`,
    * `/root/reference/src/Meshjoin.java:277-278,363-365`). */
  val txSchema: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("order_date_raw", StringType),
    StructField("product_id", StringType),
    StructField("quantity_ordered", IntegerType),
    StructField("customer_id", StringType),
    StructField("time_id", StringType)
  ))

  val priceType: DecimalType = DecimalType(12, 2)
  val discountType: DecimalType = DecimalType(4, 2)
  val revenueType: DecimalType = DecimalType(14, 2)
  val aggRevenueType: DecimalType = DecimalType(18, 2)

  /** Comparison-surface contract: all arithmetic stays in exact decimal
    * (associative, order-independent), but every DECIMAL column is cast to
    * IEEE double in a query's FINAL projection — before the final ORDER BY,
    * so both engines sort the same surface. Rationale: decimal canonical
    * text differs across engines (`Decimal('1335751.80')` vs `1335751.8`),
    * while a double derived from the same exact decimal is bit-identical
    * in Spark and DuckDB. Each oracle twin applies the matching
    * `CAST(... AS DOUBLE)` in its outer projection. */
  def outputDoubles(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: DecimalType => col(f.name).cast(DoubleType).as(f.name)
        case _              => col(f.name)
      }
    }
    df.select(scala.collection.immutable.ArraySeq.unsafeWrapArray(cols): _*)
  }

  // Star-schema case classes (Dataset[T] views where type safety helps).
  case class DimCustomer(customer_id: Long, customer_name: String, gender: String)
  case class DimSupplier(supplier_id: Long, supplier_name: String)
  case class DimStore(store_id: Int, store_name: String)
  case class DimProduct(
      product_id: Long,
      product_name: String,
      price: java.math.BigDecimal,
      store_id: Option[Int],
      supplier_id: Option[Long])
  case class DimTime(
      time_id: java.sql.Timestamp,
      order_date: java.sql.Timestamp,
      year: Int,
      month: Int,
      day: Int,
      week: Int,
      quarter: Int,
      day_of_week: String,
      is_weekend: Boolean)
  case class SalesFact(
      order_id: Long,
      product_id: Long,
      customer_id: Long,
      supplier_id: Long,
      store_id: Int,
      time_id: java.sql.Timestamp,
      quantity_ordered: Int,
      total_units_sold: Int,
      total_revenue: java.math.BigDecimal)
}
