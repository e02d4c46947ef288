package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned warehouse layout — the second storage-side lever
  * next to [[Bucketing]]: where bucketing removes the JOIN shuffle,
  * directory partitioning removes the SCAN. A fact table laid out as
  * `.../event_date=2024-01-05/...` lets any time-filtered query read
  * only the matching directories — partition PRUNING happens at
  * planning/file-listing time, before a single byte of parquet is
  * opened. At 100 TB with daily partitions, a one-week query touches
  * 7/365ths of the data regardless of total table size; that property —
  * cost proportional to the slice, not the table — is what makes
  * time-windowed queries viable at all. (Row-group min/max skipping
  * via `PushedFilters` still applies WITHIN the chosen partitions —
  * the two prune at different granularities.)
  *
  * The reference's warehouse has no layout axis at all (one MySQL
  * fact table, `/root/reference/SQL/Star_Schema_Metro.sql:37-47`);
  * every time-ranged OLAP query scans the full table and filters.
  * Partition keys must be LOW cardinality (days, not timestamps:
  * a per-second key would create millions of directories and kill
  * the file listing that pruning relies on).
  */
object Layout {

  /** Events written date-partitioned: one directory per event day. */
  def writeEventsPartitioned(spark: SparkSession, dir: String, out: String): Unit =
    Star.events(spark, dir)
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_date").parquet(out)

  /** A day-sliced read over the partitioned layout. The filter lands in
    * the scan's `PartitionFilters` (pinned by LayoutSpec): only that
    * day's directory is listed and read. */
  def eventsForDay(spark: SparkSession, out: String, day: String): DataFrame =
    spark.read.parquet(out).where(col("event_date") === lit(day).cast("date"))

  /** Day dimension for the partitioned events: one row per calendar day
    * with the attributes a time-sliced query actually filters on. Tiny
    * (365 rows/year even at 100 TB of facts) — always broadcastable. */
  def dayDim(spark: SparkSession, dir: String): DataFrame =
    Star.events(spark, dir)
      .select(to_date(col("ts")).as("event_date")).distinct()
      .withColumn("is_weekend", dayofweek(col("event_date")).isin(1, 7))

  /** Dimension-driven slice over the partitioned fact — the dynamic
    * partition pruning case. [[eventsForDay]]'s literal day is pruned
    * STATICALLY at planning time; here the filter is on a dimension
    * attribute (`is_weekend`), so the matching partition values are only
    * known at runtime. Spark's dynamic partition pruning closes that
    * gap: the broadcast of the filtered dim side is reused as a runtime
    * IN-subquery on the fact scan's partition column
    * (`PartitionFilters: [... dynamicpruningexpression(...)]`), so the
    * fact side still lists and reads ONLY the matching day directories.
    * At 100 TB this is the difference between scanning 2/7ths and 7/7ths
    * of the fact table for every dimension-filtered query — static
    * layout (partitionBy) and runtime pruning (DPP) have to work
    * together, and LayoutSpec pins both halves. */
  def eventsForDimSlice(spark: SparkSession, out: String, dimDays: DataFrame): DataFrame =
    spark.read.parquet(out)
      .join(broadcast(dimDays.where(col("is_weekend"))), Seq("event_date"))

  /** Small-file compaction — the maintenance half of any layout story.
    * Streaming sinks and fine-grained partitioning both shed files far
    * below the ~128 MB the scanner wants; at 100 TB a million 1 MB
    * files turn every query's file listing and task scheduling into
    * the bottleneck (and row-group stats stop paying because each file
    * holds one tiny group). Compaction rewrites a directory into
    * `ceil(bytes / targetBytes)` files: size is measured from the
    * FileSystem listing (what the scanner itself sees), not estimated
    * from row counts, and the rewrite is one shuffle-free-read →
    * repartition → write pass. Returns the output file count.
    *
    * Round-robin repartition (not coalesce): coalesce(n) would glue
    * existing splits together without rebalancing — skewed input files
    * stay skewed; the shuffle buys evenly-sized output files, which is
    * the point of the exercise. */
  /** Target partition count and BOUNDED sample size for
    * [[rangeBounds]] — shared with the oracle twin. The sample
    * modulus is DERIVED from the table's row count
    * (`max(1, n div RangeSampleTarget)`), so the sample the driver
    * sorts holds ≈ [[RangeSampleTarget]]..2·RangeSampleTarget keys at
    * ANY table size — a fixed-rate sample (the previous 1/16 rule)
    * grows linearly with the data and turns the single-row sorted
    * array into a heap cliff at 100×. Deterministic (a pure function
    * of n and the row key), so the DuckDB twin reproduces the exact
    * same sample — the [[graft.ext.VectorOps]] KnnEvalQueryCap
    * precedent. 128 sample keys per cut point at P=32 keeps the
    * boundary rank error ≪ one bucket. */
  val RangeP = 32
  val RangeSampleTarget = 4096L

  /** Equi-depth RANGE-PARTITION boundaries — the third layout lever
    * beside directory partitioning and bucketing: what Spark's own
    * `RangePartitioner` computes before every global sort / sorted
    * write. Boundaries come from a SAMPLE (sorting the full key column
    * to find 31 cut points would cost the very shuffle the boundaries
    * exist to plan), but where RangePartitioner samples randomly —
    * unreproducible, so untestable — this uses the salted-hash keep
    * rule (1/mod of rows, mod = max(1, n div [[RangeSampleTarget]]),
    * a pure function of the row count and the row key), making
    * boundary j exactly the sample's (j·m div P)-th order statistic
    * in BOTH engines. The report then audits the boundaries against
    * the FULL table: per-bucket row counts and the skew ratio vs the
    * ideal n/P — ties on the key (many rows share a ship day)
    * surface as visible imbalance, exactly the skew a real range
    * shuffle would suffer, instead of hiding inside a partitioner.
    *
    * Scale: the sample is the only sorted thing, and the
    * count-derived modulus BOUNDS it at ≈ RangeSampleTarget keys
    * whatever the table size (one extra count() pass buys a sorted
    * array that can never outgrow the driver); the audit is one scan
    * with a 31-entry broadcast fold per row, and the output is P
    * rows. */
  def rangeBounds(spark: SparkSession, dir: String): DataFrame = {
    val li = Star.table(spark, dir, "lineitem")
      .select(
        expr("datediff(l_shipdate, DATE '1970-01-01')").cast("long").as("key"),
        col("l_orderkey"), col("l_linenumber"))
    val mod = math.max(1L, li.count() / RangeSampleTarget)
    val sampled = li.where(
      pmod(graft.ext.TextOps.h32(concat(
        lit("rb:"), col("l_orderkey").cast("string"),
        lit(":"), col("l_linenumber").cast("string"))),
        lit(mod)) === 0)
    val bounds = sampled.agg(sort_array(collect_list("key")).as("ss"))
      .select(
        expr(s"transform(sequence(1, ${RangeP - 1}), j -> element_at(ss, " +
          s"CAST(greatest(1, (j * size(ss)) div $RangeP) AS INT)))").as("bounds"),
        size(col("ss")).cast("long").as("n_sampled"))
    val bucketed = li.crossJoin(broadcast(bounds.select("bounds")))
      .withColumn("bucket", expr(
        "aggregate(bounds, 0, (acc, b) -> acc + CASE WHEN key > b THEN 1 ELSE 0 END)"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
    val spine = spark.range(0, RangeP).select(col("id").cast("int").as("bucket"))
    val total = li.agg(count(lit(1)).as("total"))
    spine.join(bucketed, Seq("bucket"), "left")
      .crossJoin(broadcast(bounds))
      .crossJoin(broadcast(total))
      .withColumn("n_rows", coalesce(col("cnt"), lit(0L)))
      .select(col("bucket"),
        expr("CASE WHEN bucket >= 1 THEN element_at(bounds, bucket) END")
          .as("lo_key"),
        col("n_rows"), col("n_sampled"),
        expr(s"CAST(n_rows AS DOUBLE) / (CAST(total AS DOUBLE)" +
          s" / CAST($RangeP AS DOUBLE))").as("skew"))
      .orderBy("bucket")
  }

  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L << 20): Int = {
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(path).getLength
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir).repartition(n)
      .write.mode("overwrite").parquet(outDir)
    n
  }
}
