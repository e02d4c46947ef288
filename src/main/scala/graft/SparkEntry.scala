package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  import graft.olap.{Queries, OracleSql}

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q01TopProducts(spark, "/root/testdata/sf0.001", weekend = true)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_weekend" -> ((s, dir) => Queries.q01TopProducts(s, dir, weekend = true)),
    "q01_weekday" -> ((s, dir) => Queries.q01TopProducts(s, dir, weekend = false))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_weekend" -> OracleSql.q01(weekend = true),
    "q01_weekday" -> OracleSql.q01(weekend = false)
  )
}
