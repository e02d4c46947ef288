package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the MULTI-dimensional companion to
  * [[Layout]]'s single-axis date partitioning. Sorting a table by one
  * column gives perfect min/max row-group skipping on that column and
  * none on any other; interleaving the bits of two columns into one
  * sort key gives useful skipping on BOTH: a box predicate
  * (`x BETWEEN … AND y BETWEEN …`) maps to a bounded set of z-ranges,
  * so a z-sorted layout touches a small fraction of files where a
  * linearly-sorted one scans everything for the second column
  * (pinned by ZOrderSpec on a constructed grid: a full-width slab
  * touches every x-sorted file but a strict subset of z-sorted ones).
  * At 100 TB this is free scan reduction for every query that filters
  * two dimensions at once — no index structure, just row order, and
  * parquet's existing min/max stats do the skipping.
  *
  * The z-value is pure unrolled bit arithmetic — `bits` OR-terms of
  * shift/mask pairs, whole-stage-codegen friendly (no interpreted
  * higher-order functions) — and [[zOrderSql]] emits the same
  * computation as engine-neutral SQL text for the DuckDB twin: shared
  * construction, so the two engines cannot drift.
  *
  * The reference's warehouse has no layout axis at all (single MySQL
  * heap table, `/root/reference/SQL/Star_Schema_Metro.sql:37-47`).
  */
object ZOrder {

  /** Interleaved z-value of the low `bits` bits of two non-negative
    * integer columns: x occupies even bit positions, y odd. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      val xbit = shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
      val ybit = shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xbit.bitwiseOR(ybit)
    }.reduce(_.bitwiseOR(_))

  /** The same interleave as SQL text (DuckDB dialect = plain `>> << &
    * |` integer ops), generated from the same loop. */
  def zOrderSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Orders clustered on (customer, order-day): the driver query dumps
    * each order's z-key — the cross-engine check of the interleave
    * itself; the layout win it buys is pinned by ZOrderSpec. */
  def ordersZKeys(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Star.table(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        zValue(
          col("o_custkey").bitwiseAND(lit(0xFFFFL)),
          datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
            .cast("long").bitwiseAND(lit(0xFFFFL))).as("z"))
      .orderBy("z", "o_orderkey")

  /** Writes `df` z-clustered: range-partitioned AND sorted by the
    * z-value of (x, y), so every output file owns a contiguous z-range
    * and carries tight min/max stats on both source columns. */
  def writeZOrdered(df: DataFrame, x: String, y: String, out: String,
      numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(col(x), col(y), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(out)
}
