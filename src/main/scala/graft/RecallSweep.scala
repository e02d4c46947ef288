package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the IVF recall/cost curve that picks the engine's default
  * operating point (VERDICT r6 item 2): for each nProbe, mean recall@3
  * of [[graft.ext.SimilarityOps.ivfTopK]] against the brute-force
  * ground truth over 64 queries, plus the min-of-2 wall time of the
  * full IVF search at that probe width. The recall side reuses the
  * oracle-checked [[graft.ext.SimilarityOps.recallAtK]] query — the
  * measurement itself is verified machinery, not ad-hoc analysis code.
  *
  * Usage: runMain graft.RecallSweep [sfDir] [nProbe...]
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val probes =
      if (args.length > 1) args.drop(1).toSeq.map(_.toInt)
      else Seq(1, 2, 3, 4, 6, 8, 12, 16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val rows = probes.map { p =>
      // index build (cached per nProbe) is setup, not query cost
      graft.ext.SimilarityOps.ivfIndex(spark, dir, nProbe = p).count()
      val mean = graft.ext.SimilarityOps.recallAtK(spark, dir, nProbe = p)
        .agg(avg(col("recall_at_3"))).head().getDouble(0)
      var best = Double.MaxValue
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        graft.ext.SimilarityOps.ivfTopK(spark, dir, nProbe = p)
          .write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      f""""$p":{"recall":$mean%.3f,"search_sec":$best%.2f}"""
    }
    // the trained-quantizer variant at ITS operating point (kCent = 8,
    // nProbe = 2) — recorded alongside so BASELINE.md can state both
    val brute = graft.ext.SimilarityOps.bruteForceTopK(spark, dir, 3, 64)
      .select(col("query_id"), col("neighbor_id"))
    val km = graft.ext.VectorOps.ivfKmeansTopK(spark, dir)
      .where(col("query_id") < 64).select(col("query_id"), col("neighbor_id"))
    val kmRecall = brute.join(km, Seq("query_id", "neighbor_id"), "left_semi")
      .count().toDouble / (64 * 3)
    // IVF+PQ composed-index sweep over its two levers (coarse probes ×
    // ADC shortlist) on the √n-cell scaled router — the measurement
    // that picks ivfPqTopK's (IvfPqNProbe, IvfPqShortlist) default
    val pqRows = for (p <- Seq(2, 4, 8, 12); s <- Seq(32, 64, 96, 128)) yield {
      val mean = graft.ext.VectorOps
        .ivfPqRecallAtK(spark, dir, nProbe = p, shortlist = s)
        .agg(avg(col("recall_at_3"))).head().getDouble(0)
      f""""p${p}_s$s":$mean%.3f"""
    }
    // mining pool recall: does the cell-routed retrieval stage
    // (hardNegatives/mmrSelect stage 1) hold the brute top-10 pool?
    val bruteP = graft.ext.SimilarityOps.bruteForceTopK(spark, dir, 10, 8)
      .select(col("query_id"), col("neighbor_id"))
    val poolRows = Seq(4, 6, 8, 12).map { p =>
      val routed = graft.ext.VectorOps
        .cellCandidates(spark, dir, nQueries = 8, nProbe = p)
        .select(col("query_id"), col("neighbor_id"))
      val r = bruteP.join(routed, Seq("query_id", "neighbor_id"), "left_semi")
        .count().toDouble / (8 * 10)
      f""""p$p":$r%.3f"""
    }
    println(s"""{"metric":"ivf_recall_curve","n_vectors":$n,"sf":"$dir",""" +
      s""""k":3,"n_queries":64,"by_nprobe":${rows.mkString("{", ",", "}")},""" +
      f""""kmeans_8cell_2probe_recall":$kmRecall%.3f,""" +
      s""""scaled_kcent":${graft.ext.VectorOps.scaledKCent(n)},""" +
      s""""ivfpq_recall_by_probe_shortlist":${pqRows.mkString("{", ",", "}")},""" +
      s""""mining_pool10_recall_by_nprobe":${poolRows.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
