package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.etl.TxParquetSink

/** Optimizer-time metadata throughput — the number behind the commit-
  * log snapshot cache (round-11 "What's missing #3"): a dashboard
  * planning hundreds of queries per second against the SAME governed
  * table re-reads version/commits/stats per PLAN. Two measurements:
  *
  *  - `meta_read_throughput`: the metadata surface the cache serves
  *    (version + restatedBetween + maskedBetween + columnMetaProfile —
  *    one plan's worth of optimizer-rule reads), warm vs dropped-
  *    per-iteration (the pre-cache behavior re-read and re-parsed the
  *    manifests each time). This is where the O(manifests)→O(1)
  *    change lives.
  *  - `meta_plan_throughput`: END-TO-END optimizations of a
  *    rule-served grouped panel. Honest caveat recorded with the
  *    number: at bench commit counts the plan cost is dominated by
  *    scan-relation construction (file listing, Catalyst passes), so
  *    the cache's end-to-end effect is small — its guarantee is the
  *    counted-I/O spec (zero parses on a hit), not plan latency.
  *
  * Usage: runMain graft.MetaPlanBench [plans] [commits]
  * Prints two JSON lines; numbers recorded in BASELINE.md. */
object MetaPlanBench {
  def main(args: Array[String]): Unit = {
    val plans = args.lift(0).map(_.toInt).getOrElse(300)
    val commits = args.lift(1).map(_.toInt).getOrElse(40)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val t = TxParquetSink(java.nio.file.Files
      .createTempDirectory("metaplan").toString + "/t")
    (1 to commits).foreach { c =>
      t.appendWithStats(
        (1 to 25).map(i => (f"m$c%03d", (c * 100 + i).toLong)).toDF("m", "v"),
        statsCols = Seq("m", "v"))
    }
    spark.experimental.extraOptimizations = Seq(graft.plans.MetadataAggregates)
    def planOnce(): Unit = {
      val df = t.readSnapshot(spark).get.groupBy("m").agg(
        count(lit(1)).as("n"), min(col("v")).as("mn"),
        max(col("v")).as("mx"), sum(col("v")).as("sm"))
      require(df.queryExecution.optimizedPlan.collectLeaves().forall(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]))
    }
    def timed(drop: Boolean): Double = {
      (1 to 20).foreach(_ => planOnce()) // JIT warm
      val t0 = System.nanoTime()
      (1 to plans).foreach { _ =>
        if (drop) TxParquetSink.dropCaches()
        planOnce()
      }
      plans / ((System.nanoTime() - t0) / 1e9)
    }
    def metaReads(): Unit = {
      require(t.version() >= 0)
      require(!t.restatedBetween(0L, t.version()))
      require(!t.maskedBetween(0L, t.version()))
      require(t.columnMetaProfile("v").nonEmpty)
    }
    def timedMeta(drop: Boolean, n: Int): Double = {
      (1 to 50).foreach(_ => metaReads())
      val t0 = System.nanoTime()
      (1 to n).foreach { _ =>
        if (drop) TxParquetSink.dropCaches()
        metaReads()
      }
      n / ((System.nanoTime() - t0) / 1e9)
    }
    val metaCold = timedMeta(drop = true, plans * 10)
    val metaWarm = timedMeta(drop = false, plans * 10)
    println(f"""{"metric":"meta_read_throughput","commits":$commits,"""
      + f""""warm_reads_per_sec":$metaWarm%.0f,"cold_reads_per_sec":$metaCold%.0f,"""
      + f""""speedup":${metaWarm / metaCold}%.2f}""")
    val cold = timed(drop = true) // pre-cache behavior: reparse per plan
    val warm = timed(drop = false)
    println(f"""{"metric":"meta_plan_throughput","plans":$plans,"commits":$commits,"""
      + f""""warm_plans_per_sec":$warm%.1f,"cold_plans_per_sec":$cold%.1f,"""
      + f""""speedup":${warm / cold}%.2f}""")
    spark.stop()
  }
}
