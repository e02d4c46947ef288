package graft.olap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.Star
import graft.model.Schemas._

/** The reference's OLAP query surface (Q1–Q10,
  * `/root/reference/SQL/OLAP Queries - Metro.sql`) re-expressed as
  * DataFrame plans over the star schema. Each query has a DuckDB oracle
  * twin in [[OracleSql]].
  *
  * Determinism rules (shared with the oracle):
  *  - aggregates in exact decimal; ratio outputs as IEEE double derived
  *    from identical exact decimals; no rounding of doubles;
  *  - every query ends in a total deterministic ORDER BY (ties broken).
  *
  * The reference filters on year=2019; the testdata spans 1995–2001, so
  * the parameterized year is pinned to 1996 in both engines.
  */
object Queries {

  val Year = 1996

  /** Q1 (weekend variant): top-5 revenue (month, product) groups on
    * weekends of the pinned year — global top-5, not per-month
    * (reference Q-h). `/root/reference/SQL/OLAP Queries - Metro.sql:5-14`. */
  def q01TopProducts(spark: SparkSession, dir: String, weekend: Boolean): DataFrame = {
    val fact = Star.salesFact(spark, dir)
    val time = Star.dimTime(spark, dir)
    val product = Star.dimProduct(spark, dir)
    fact
      .join(broadcast(time), Seq("time_id"))
      .join(broadcast(product), Seq("product_id"))
      .where(col("is_weekend") === lit(weekend) && col("year") === lit(Year))
      .groupBy(col("month"), col("product_name"))
      .agg(sum("total_revenue").cast(aggRevenueType).as("total_revenue"))
      .orderBy(desc("total_revenue"), asc("month"), asc("product_name"))
      .limit(5)
  }
}
