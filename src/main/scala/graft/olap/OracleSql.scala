package graft.olap

import graft.etl.Star

/** DuckDB oracle SQL twins for [[Queries]] — ANSI SQL over the same raw
  * parquet tables, prefixed with the shared star-schema CTE
  * ([[Star.oracleCte]]) so both engines compute over the identical model. */
object OracleSql {

  private def star(body: String): String = Star.oracleCte + body

  def q01(weekend: Boolean): String = star(
    s"""SELECT t.month AS month, p.product_name AS product_name,
       |       CAST(SUM(f.total_revenue) AS DECIMAL(18,2)) AS total_revenue
       |FROM sales_fact f
       |JOIN dim_time t ON f.time_id = t.time_id
       |JOIN dim_product p ON f.product_id = p.product_id
       |WHERE t.is_weekend = $weekend AND t.year = ${Queries.Year}
       |GROUP BY t.month, p.product_name
       |ORDER BY total_revenue DESC, month ASC, product_name ASC
       |LIMIT 5""".stripMargin)
}
