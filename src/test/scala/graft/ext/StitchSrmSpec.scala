package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Chunk stitch, SRM audit, and pHash clusters: in-engine round-trip
  * identity at edge lengths, deviation conservation, and cluster
  * consistency with the pair table. End-to-end values are pinned by
  * the DuckDB twins. */
class StitchSrmSpec extends SparkSpec {
  import spark.implicits._

  test("stitch ∘ chunk is the identity at every edge length") {
    // lengths around the window/stride boundaries: sub-window, exact
    // window, window+1 (minimal second chunk), stride-aligned end,
    // multi-chunk
    val docs = Seq(1, 31, 32, 33, 56, 57, 80, 200).zipWithIndex.map {
      case (n, i) => (i.toLong, (1 to n).map(t => s"w$t").mkString(" "))
    }.toDF("doc_id", "text")
    val dir = tempDataDir("documents" -> docs)
    val rebuilt = ChunkOps.stitchChunks(spark, dir)
      .select("doc_id", "rebuilt_hash")
    val direct = TextOps.withWords(TextOps.docs(spark, dir))
      .select(col("doc_id"),
        TextOps.h32(concat_ws(" ", col("ws"))).as("direct_hash"))
    assert(rebuilt.join(direct, "doc_id")
      .where(col("rebuilt_hash") =!= col("direct_hash")).count() == 0)
    // chunk counts match chunkWindows' enumeration
    val nc = ChunkOps.stitchChunks(spark, dir)
      .select("doc_id", "n_chunks")
    val ncw = ChunkOps.chunkWindows(spark, dir)
      .groupBy("doc_id").agg(max("chunk_id").as("m"))
    assert(nc.join(ncw, "doc_id").where(col("n_chunks") =!= col("m")).count() == 0)
  }

  test("srm audit: three design rows, deviations conserve to zero, chi2 nonnegative") {
    val r = SampleOps.splitBalanceAudit(spark, sfSmoke).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2),
        row.getLong(3), row.getDouble(4)))
    assert(r.map(_._1).toSeq == Seq("test", "train", "val"))
    assert(r.map(_._3).sum == 1000000L)
    assert(r.map(_._4).sum == 0L) // Σ(n·10⁶ − p·N) telescopes exactly
    r.foreach { case (_, n, _, _, contrib) =>
      assert(n > 0 && contrib >= 0.0)
    }
  }

  test("media clusters: pair-connected docs share a cluster; keepers are minima") {
    val cl = MediaOps.phashClusters(spark, sfSmoke).cache()
    try {
      val byDoc = cl.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byDoc.size == TextOps.docs(spark, sfSmoke).count())
      MediaOps.phashPairs(spark, sfSmoke).collect().foreach { r =>
        assert(byDoc(r.getLong(0)) == byDoc(r.getLong(1)))
      }
      // keeper flag is exactly doc == cluster, and sizes add up
      assert(cl.where(col("is_keeper") =!= (col("doc_id") === col("cluster")))
        .count() == 0)
      val sz = cl.groupBy("cluster").count()
        .join(cl.select("cluster", "cluster_size").distinct(), "cluster")
      assert(sz.where(col("count") =!= col("cluster_size")).count() == 0)
    } finally cl.unpersist()
  }
}
