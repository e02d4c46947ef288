package graft

import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong
import graft.etl.TxParquetSink

/** Multi-writer commit-throughput measurement for [[graft.etl.TxParquetSink]] —
  * the number behind the partition-scoped conflict-detection design:
  * the concurrency hammers in TxSinkSpec prove SAFETY; this measures
  * the WIN. N writer threads each publish `commitsPer` merge commits
  * into their own disjoint `day` partition, twice: once with
  * `partitionCols = Seq("day")` (scoped — a lost version race
  * re-publishes after a metadata-only disjointness proof) and once
  * unscoped (a lost race pays the key-level re-filter: read the delta
  * commits, anti-join the staged rows, re-stage). Reported per mode:
  * wall seconds, commits/sec, and the number of key-level re-filters
  * actually paid (via the `onRefilter` seam) — scoped runs should show
  * ~zero re-filters at any writer count, unscoped runs approach one
  * re-filter per lost race.
  *
  * Usage: runMain graft.TxThroughputBench [writers] [commitsPerWriter]
  * Prints one JSON line; numbers recorded in BASELINE.md.
  */
object TxThroughputBench {

  def main(args: Array[String]): Unit = {
    val writers = args.lift(0).map(_.toInt).getOrElse(4)
    val commitsPer = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def run(scoped: Boolean): (Double, Double, Long) = {
      val dir = java.nio.file.Files
        .createTempDirectory("tx-throughput").toString + "/t"
      val t = TxParquetSink(dir)
      // seed commit so every writer races against a non-empty table
      t.mergeUpsert(spark,
        Seq(("seed", "P0", "v")).toDF("day", "product_id", "product_name"),
        Seq("day", "product_id"), Seq("product_name"),
        partitionCols = if (scoped) Seq("day") else Nil)
      val refilters = new AtomicLong(0)
      val failures = new AtomicLong(0)
      val start = System.nanoTime()
      val threads = (0 until writers).map { w =>
        new Thread(() => {
          try {
            for (i <- 0 until commitsPer) {
              val rows = (0 until 200)
                .map(j => (s"d$w", s"P$w-$i-$j", s"v$j"))
              t.mergeUpsert(spark,
                rows.toDF("day", "product_id", "product_name"),
                Seq("day", "product_id"), Seq("product_name"),
                partitionCols = if (scoped) Seq("day") else Nil,
                onRefilter = () => { refilters.incrementAndGet(); () })
            }
          } catch { case e: Throwable =>
            failures.incrementAndGet()
            System.err.println(s"[txbench] writer $w failed: $e")
          }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      val sec = (System.nanoTime() - start) / 1e9
      require(failures.get() == 0, s"${failures.get()} writers failed")
      val expect = writers.toLong * commitsPer * 200 + 1
      val got = t.readSnapshot(spark).get.count()
      require(got == expect, s"row loss: $got != $expect")
      (sec, writers * commitsPer / sec, refilters.get())
    }

    // warm the JIT/Spark paths once with a tiny scoped run, then measure
    run(scoped = true)
    val (su, cu, ru) = run(scoped = false)
    val (ss, cs, rs) = run(scoped = true)
    println(
      f"""{"metric":"tx_throughput","writers":$writers,"commits_per_writer":$commitsPer,""" +
      f""""unscoped":{"sec":$su%.2f,"commits_per_sec":$cu%.2f,"refilters":$ru},""" +
      f""""scoped":{"sec":$ss%.2f,"commits_per_sec":$cs%.2f,"refilters":$rs}}""")
    spark.stop()
  }
}
