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
