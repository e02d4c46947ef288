package graft.etl

import graft.SparkSpec

/** Partition-pruning pins for the date-partitioned layout: the day
  * filter must reach `PartitionFilters` (pruned at file-listing time,
  * before any parquet is opened) and the pruned read must touch a
  * strict subset of the files. */
class LayoutSpec extends SparkSpec {

  test("day filter prunes partitions at the file listing, not per row") {
    val out = java.nio.file.Files.createTempDirectory("graft-layout").toString + "/events"
    Layout.writeEventsPartitioned(spark, sfSmoke, out)

    val all = spark.read.parquet(out)
    val day = Layout.eventsForDay(spark, out, "2024-01-05")

    // the filter is a partition filter on the scan — not a data filter.
    // Every scan of a partitioned relation PRINTS "PartitionFilters:
    // [...]" (possibly empty), so the pin must be that the list itself
    // CONTAINS the day predicate.
    val plan = day.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*event_date".r.findFirstIn(plan).isDefined,
      s"day filter did not reach PartitionFilters:\n$plan")

    // pruning is real: strictly fewer files READ than the full table
    // (inputFiles lists the relation pre-pruning, so count the files the
    // executed scan actually touches instead)
    import org.apache.spark.sql.functions.input_file_name
    val readFiles = day.select(input_file_name()).distinct().count()
    val allFiles = all.select(input_file_name()).distinct().count()
    assert(readFiles > 0)
    assert(readFiles < allFiles,
      s"pruned read touched $readFiles of $allFiles files")

    // and the slice is the right rows (testdata spans Jan 2024)
    val expected = Star.events(spark, sfSmoke)
      .where("CAST(ts AS DATE) = DATE'2024-01-05'").count()
    assert(day.count() === expected)
  }

  test("dimension filter prunes fact partitions at runtime (dynamic partition pruning)") {
    val out = java.nio.file.Files.createTempDirectory("graft-dpp").toString + "/events"
    Layout.writeEventsPartitioned(spark, sfSmoke, out)

    val dim = Layout.dayDim(spark, sfSmoke)
    val sliced = Layout.eventsForDimSlice(spark, out, dim)

    // the partition values are only known at runtime (they come from the
    // filtered dim side), so the scan must carry a dynamicpruning
    // subquery in its PartitionFilters — not a static literal, and not
    // nothing (which would mean a full scan + post-join discard).
    val plan = sliced.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning expression on the fact scan:\n$plan")

    // pruning is real at execution: strictly fewer files read than the
    // full table (Jan 2024 has 8 weekend days of ~31). input_file_name()
    // must sit directly over the fact scan (it cannot span a two-source
    // join), so instrument a twin of the same join shape.
    import org.apache.spark.sql.functions.{broadcast, col, input_file_name}
    val readFiles = spark.read.parquet(out)
      .withColumn("src_file", input_file_name())
      .join(broadcast(dim.where(col("is_weekend"))), Seq("event_date"))
      .select("src_file").distinct().count()
    val allFiles = spark.read.parquet(out)
      .select(input_file_name()).distinct().count()
    assert(readFiles > 0)
    assert(readFiles < allFiles,
      s"DPP read $readFiles of $allFiles files — no runtime pruning")

    // and the join is semantically just the weekend slice
    val expected = Star.events(spark, sfSmoke)
      .where("dayofweek(CAST(ts AS DATE)) IN (1, 7)").count()
    assert(sliced.count() === expected)
  }

  test("compaction rewrites a many-small-files dir into the size-targeted count") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString
    Star.events(spark, sfSmoke).repartition(20)
      .write.mode("overwrite").parquet(s"$base/shredded")
    val inFiles = new java.io.File(s"$base/shredded")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(inFiles === 20)

    // generous target → everything fits one file
    val n = Layout.compact(spark, s"$base/shredded", s"$base/compacted")
    assert(n === 1)
    val outFiles = new java.io.File(s"$base/compacted")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(outFiles === 1)

    // lossless: same multiset of rows
    val a = spark.read.parquet(s"$base/shredded")
    val b = spark.read.parquet(s"$base/compacted")
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("range bounds: buckets partition the table, boundaries ascend, skew is tamed") {
    import org.apache.spark.sql.functions._
    val rb = Layout.rangeBounds(spark, sfSmoke).cache()
    try {
      assert(rb.count() == Layout.RangeP)
      // the buckets PARTITION the table: counts conserve exactly
      val total = Star.table(spark, sfSmoke, "lineitem").count()
      assert(rb.agg(sum("n_rows")).collect().head.getLong(0) == total)
      // boundaries are order statistics of a sorted sample: non-decreasing
      val los = rb.where(col("lo_key").isNotNull)
        .orderBy("bucket").collect().map(_.getAs[Long]("lo_key"))
      assert(los.zip(los.tail).forall { case (a2, b2) => a2 <= b2 })
      assert(rb.where(col("bucket") === 0 && col("lo_key").isNotNull).count() == 0)
      // equi-depth from a bounded sample on a tie-heavy day key: no
      // bucket should exceed 4x its ideal share, most rows sit near 1x
      assert(rb.agg(max("skew")).collect().head.getDouble(0) < 4.0)
      // the sample is BOUNDED: the count-derived modulus keeps the one
      // sorted array at ≈ RangeSampleTarget keys at any table size
      // (n < target ⇒ mod 1 keeps all n; else expectation ≈ target —
      // allow 3x for hash variance)
      val nSampled = rb.select("n_sampled").head.getLong(0)
      assert(nSampled > 0 &&
        (nSampled == total || nSampled <= 3L * Layout.RangeSampleTarget),
        s"sample size $nSampled exceeds the bounded-sample contract")
      // skew is n_rows re-expressed: ratios reconstruct counts exactly
      val t = rb.select(
        (col("skew") * (lit(total.toDouble) / Layout.RangeP.toDouble))
          .cast("long").as("re"), col("n_rows"))
      assert(t.where(abs(col("re") - col("n_rows")) > 1).count() == 0)
    } finally rb.unpersist()
  }
}
