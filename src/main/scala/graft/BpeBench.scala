package graft

import org.apache.spark.sql.SparkSession

/** BPE at production merge counts: runs `rounds` merges over the full
  * corpus vocabulary and reports per-round wall time by quintile. The
  * claim under test is FLATNESS — each round wraps the encoding in
  * another literal replace, so without the periodic `localCheckpoint`
  * ([[graft.ext.BpeOps.CheckpointEvery]]) plan/codegen growth makes
  * round cost climb linearly; with it, late rounds must cost what early
  * rounds cost. One JSON line:
  * `{"metric":"bpe_round_sec","rounds":N,"q":[q1..q5],"late_over_early":r}`
  * where q's are mean seconds per round in each fifth of the run.
  *
  * Usage: runMain graft.BpeBench [sfDir] [rounds]
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val times = new Array[Double](rounds)
    val merges = graft.ext.BpeOps.bpeMerges(spark, sfDir, rounds,
      onRound = (r, sec) => times(r - 1) = sec)
    val nMerges = merges.count()

    val fifth = math.max(1, rounds / 5)
    val qs = (0 until 5).map { i =>
      val slice = times.slice(i * fifth, math.min(rounds, (i + 1) * fifth))
      if (slice.isEmpty) 0.0 else slice.sum / slice.length
    }
    // skip the first fifth (JIT/warehouse warmup) for the flatness ratio
    val early = qs(1)
    val late = qs(4)
    val ratio = if (early > 0) late / early else 0.0
    val qsJson = qs.map(q => f"$q%.3f").mkString("[", ",", "]")
    println(s"""{"metric":"bpe_round_sec","rounds":$rounds,"merges":$nMerges,""" +
      s""""q":$qsJson,"late_over_early":${f"$ratio%.2f"}}""")
    spark.stop()
  }
}
