package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared ScalaTest base: one local SparkSession per suite, UTC, small
  * shuffle parallelism (test data is tiny; 200 partitions would be pure
  * scheduling overhead). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }

  /** Writes rows as a parquet table under a temp dir laid out like the
    * testdata (`<dir>/<name>.parquet`), for ops that take (spark, dir). */
  def tempDataDir(tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-test").toString
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    dir
  }

  val sfSmoke = "/root/testdata/sf0.001"
}
