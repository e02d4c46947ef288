package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The z-interleave itself (known values + generator parity) and the
  * layout claim: a two-dimensional box predicate touches fewer files
  * under z-clustering than under a linear sort. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleaves bits: z(0b101, 0b011) = 27, z(x,0)/z(0,y) spread bits") {
    val row = Seq((5L, 3L), (5L, 0L), (0L, 3L)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), bits = 3).as("z"))
      .as[Long].collect().toSeq
    // x bits land at even positions (1,4,16…), y at odd (2,8,32…)
    assert(row === Seq(17L + 10L, 17L, 10L))
  }

  test("the SQL generator computes the same values as the column generator") {
    val df = spark.range(1024)
      .select((col("id") % 32).as("x"), (col("id") / 32).as("y"))
    val mismatches = df
      .withColumn("zc", ZOrder.zValue(col("x"), col("y"), bits = 5))
      .withColumn("zs", expr(ZOrder.zOrderSql("x", "y", bits = 5)))
      .where(col("zc") =!= col("zs")).count()
    assert(mismatches === 0)
  }

  test("a full-width slab touches fewer z-clustered files than x-sorted ones") {
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val grid = spark.range(1024)
      .select((col("id") % 32).as("x"), (col("id") / 32).as("y"))

    ZOrder.writeZOrdered(grid, "x", "y", s"$base/z", numFiles = 4, bits = 5)
    grid.repartitionByRange(4, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$base/linear")

    // the slab y < 4 spans ALL of x: an x-sorted layout has matching
    // rows in every file; the z layout confines it to the low z-range
    def filesTouched(path: String): Long =
      spark.read.parquet(path).where(col("y") < 4)
        .select(input_file_name()).distinct().count()
    val zFiles = filesTouched(s"$base/z")
    val linFiles = filesTouched(s"$base/linear")
    assert(linFiles === 4L)
    assert(zFiles < linFiles, s"z layout touched $zFiles of $linFiles")
  }
}
