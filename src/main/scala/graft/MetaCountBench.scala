package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.etl.TxParquetSink

/** Micro-benchmark for the metadata read tier: QUERY-TIME cost of
  * [[TxParquetSink.countWhere]] / [[TxParquetSink.statsAggregate]]
  * versus the full-scan spellings, ingest excluded — the isolation the
  * registered harness slots (which time ingest + query together)
  * cannot give. Builds one table of `commits × rowsPerCommit` day-keyed
  * rows, then times, min-of-N:
  *
  *  - `count_meta`:  countWhere over a range covering ~half the commits
  *    with two boundary commits (the dashboard-slice shape);
  *  - `count_scan`:  readSnapshot().where(pred).count() — what every
  *    engine without manifest credit must do;
  *  - `agg_meta`:    statsAggregate (zero data I/O);
  *  - `agg_scan`:    the declarative count/min/max over the snapshot.
  *
  * Usage: runMain graft.MetaCountBench [commits] [rowsPerCommit] [passes]
  * Prints one JSON line. The interesting number is how the scan side
  * grows with rowsPerCommit while the meta side does not.
  */
object MetaCountBench {
  def main(args: Array[String]): Unit = {
    val nCommits = args.lift(0).map(_.toInt).getOrElse(24)
    val rowsPer = args.lift(1).map(_.toInt).getOrElse(100000)
    val passes = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val t = TxParquetSink(
      java.nio.file.Files.createTempDirectory("metacount").toString + "/t")
    // one commit per "day", rowsPer rows each — the daily-loader shape
    (0 until nCommits).foreach { d =>
      val day = f"2024-${d / 28 + 1}%02d-${d % 28 + 1}%02d"
      t.appendWithStats(
        spark.range(rowsPer.toLong)
          .select(lit(day).as("day"), col("id").as("amount")),
        Seq("day", "amount"))
    }
    // half the commits interior, two on the boundary of the day range
    val lo = f"2024-${(nCommits / 4) / 28 + 1}%02d-${(nCommits / 4) % 28 + 1}%02d"
    val hi = f"2024-${(3 * nCommits / 4) / 28 + 1}%02d-${(3 * nCommits / 4) % 28 + 1}%02d"
    val pred = s"day >= '$lo' AND day <= '$hi'"

    def time(f: () => Long): (Double, Long) = {
      var best = Double.MaxValue
      var v = 0L
      (1 to passes).foreach { _ =>
        val t0 = System.nanoTime()
        v = f()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, v)
    }
    val (tMeta, vMeta) = time(() => t.countWhere(spark, pred))
    val (tScan, vScan) = time(() =>
      t.readSnapshot(spark).get.where(expr(pred)).count())
    require(vMeta == vScan, s"count mismatch: $vMeta vs $vScan")
    val (tAggM, _) = time(() =>
      t.statsAggregate(spark, Seq("amount")).collect().length.toLong)
    val (tAggS, _) = time(() =>
      t.readSnapshot(spark).get
        .agg(count(lit(1)), min("amount"), max("amount")).collect().length.toLong)
    println(
      s"""{"metric":"meta_count","commits":$nCommits,"rows_per":$rowsPer,""" +
      s""""count_meta_s":${f"$tMeta%.3f"},"count_scan_s":${f"$tScan%.3f"},""" +
      s""""count_speedup":${f"${tScan / tMeta}%.2f"},""" +
      s""""agg_meta_s":${f"$tAggM%.3f"},"agg_scan_s":${f"$tAggS%.3f"},""" +
      s""""agg_speedup":${f"${tAggS / tAggM}%.2f"},"n":$vMeta}""")
    spark.stop()
  }
}
