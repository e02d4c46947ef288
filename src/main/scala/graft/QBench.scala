package graft

import org.apache.spark.sql.SparkSession

/** Developer micro-bench: time a SUBSET of [[SparkEntry.queries]] by
  * name, n passes, min-of-n per query (the shared box shows ±40 %
  * per-run noise — see BASELINE.md). Complements [[Bench]] (the
  * driver's fixed full-suite contract) during optimization work.
  *
  * Usage: runMain graft.QBench <sfDir> <passes> <query>...
  * Each pass runs in a FRESH SparkSession so session caches don't let
  * later passes skip the index builds the first pass paid for.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val names = args.drop(2).toSeq match {
      case Seq() => SparkEntry.queries.keys.toSeq.sorted
      case qs => qs
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val best = scala.collection.mutable.Map[String, Double]()
    for (p <- 1 to passes) {
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      for (name <- names) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        best(name) = math.min(best.getOrElse(name, Double.MaxValue), sec)
        println(f"[qbench] pass $p $name%-28s $sec%7.2f s")
      }
      spark.stop()
      // fresh session per pass ⇒ cleared session caches
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
    println(names.map(n => f"[qbench] BEST ${n}%-28s ${best(n)}%7.2f s").mkString("\n"))
  }
}
