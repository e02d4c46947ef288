package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hilbert-curve clustering — [[ZOrder]]'s stronger sibling. Both map
  * two dimensions onto one sort key so parquet min/max stats skip on
  * either column; the difference is LOCALITY: the Hilbert curve is
  * continuous (every step moves to a grid-ADJACENT cell — the property
  * `HilbertSpec` proves exhaustively), while the Z curve takes long
  * diagonal jumps at every power-of-two boundary. A box predicate
  * therefore decomposes into strictly fewer, longer key ranges under
  * Hilbert order — fewer files touched, fewer seeks, which is why
  * large-table OPTIMIZE implementations cluster by Hilbert when they
  * outgrow Morton. Cost: the key is a per-level ROTATION fold instead
  * of a pure bit interleave — still integer-only, still
  * whole-stage-codegen friendly, but sequential across levels.
  *
  * The transform is the classical xy→d walk (convert + rotate per
  * level, Warren's "Hacker's Delight" formulation): at each scale s =
  * 2^i the quadrant bits (rx, ry) contribute s²·((3·rx) XOR ry) to the
  * key and the frame rotates so the child quadrant's curve enters at
  * the right corner:
  *
  *   nx = ry = 1 ? x : (rx = 1 ? s−1−y : y)
  *   ny = ry = 1 ? y : (rx = 1 ? s−1−x : x)
  *
  * Both engines run the SAME generated per-level expressions —
  * [[withHilbert]] as a chained column fold (each level references the
  * previous level's aliases once: linear expression size, no
  * substitution blowup), [[hilbertCteChain]] as a generated CTE chain
  * for the DuckDB twin — so the two spellings cannot drift.
  */
object Hilbert {

  /** Default key width: 16 bits per dimension = a 2³²-cell curve. */
  val Bits = 16

  /** Adds `out` = Hilbert d-value of the low `bits` bits of (x, y),
    * via one chained projection per level. Inputs must be
    * non-negative; callers mask (the [[ZOrder.ordersZKeys]]
    * convention). Scratch columns are dropped. */
  def withHilbert(df: DataFrame, x: Column, y: Column, out: String,
      bits: Int = Bits): DataFrame = {
    var d = df.withColumn("__hx", x.cast("long"))
      .withColumn("__hy", y.cast("long"))
      .withColumn(out, lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      d = d
        .withColumn("__rx",
          when(col("__hx").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
        .withColumn("__ry",
          when(col("__hy").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
        .withColumn(out,
          col(out) + lit(s * s) *
            (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
        .withColumn("__nx",
          when(col("__ry") === 1, col("__hx"))
            .otherwise(when(col("__rx") === 1, lit(s - 1) - col("__hy"))
              .otherwise(col("__hy"))))
        .withColumn("__ny",
          when(col("__ry") === 1, col("__hy"))
            .otherwise(when(col("__rx") === 1, lit(s - 1) - col("__hx"))
              .otherwise(col("__hx"))))
        .withColumn("__hx", col("__nx"))
        .withColumn("__hy", col("__ny"))
    }
    d.drop("__hx", "__hy", "__rx", "__ry", "__nx", "__ny")
  }

  /** The identical fold as a generated SQL CTE chain for the twin:
    * `<prefix>0 … <prefix><bits>` over a base relation exposing
    * `keyCols`, `hx`, `hy`; the final CTE carries `hd`. Plain integer
    * ops (`& CASE + -`), one reference to the previous level per
    * expression — linear text size. */
  def hilbertCteChain(base: String, keyCols: Seq[String], prefix: String,
      bits: Int = Bits): String = {
    val keys = keyCols.mkString(", ")
    val first = s"${prefix}0 AS (SELECT $keys, hx, hy, CAST(0 AS BIGINT) AS hd FROM $base)"
    val steps = ((bits - 1) to 0 by -1).zipWithIndex.map { case (i, lvl) =>
      val s = 1L << i
      val rx = s"(CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)"
      s"""${prefix}${lvl + 1} AS (
         |  SELECT $keys,
         |    CASE WHEN $ry = 1 THEN hx
         |         WHEN $rx = 1 THEN ${s - 1} - hy ELSE hy END AS hx,
         |    CASE WHEN $ry = 1 THEN hy
         |         WHEN $rx = 1 THEN ${s - 1} - hx ELSE hx END AS hy,
         |    hd + ${s * s} * xor(3 * $rx, $ry) AS hd
         |  FROM ${prefix}$lvl)""".stripMargin
    }
    (first +: steps).mkString(",\n")
  }

  /** Orders clustered on (customer, order-day) — the Hilbert twin of
    * [[ZOrder.ordersZKeys]]: the driver query dumps each order's
    * Hilbert key, the cross-engine check of the rotation fold itself;
    * the locality win over Z-order is pinned by HilbertSpec. */
  def ordersHilbertKeys(spark: SparkSession, dir: String): DataFrame =
    withHilbert(Star.table(spark, dir, "orders"),
      col("o_custkey").bitwiseAND(lit(0xFFFFL)),
      datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
        .cast("long").bitwiseAND(lit(0xFFFFL)),
      "h")
      .select("o_orderkey", "h")
      .orderBy("h", "o_orderkey")

  /** Writes `df` Hilbert-clustered — range-partitioned and sorted by
    * the key, so every file owns one contiguous curve segment and
    * tight min/max stats on both source columns. */
  def writeHilbertOrdered(df: DataFrame, x: String, y: String, out: String,
      numFiles: Int, bits: Int = Bits): Unit =
    withHilbert(df, col(x), col(y), "__h", bits)
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.mode("overwrite").parquet(out)
}
