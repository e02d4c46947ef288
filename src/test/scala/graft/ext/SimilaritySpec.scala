package graft.ext

import graft.SparkSpec

/** Cosine similarity search on hand-crafted vectors with known geometry. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // v0 ∥ v1 (cos 1), v0 ⟂ v2 (cos 0), v3 ≈ v0, v4 opposite to v0.
  // 8-dim: the sign-LSH bucket reads the first 8 components.
  private def v(xs: Float*): Array[Float] = (xs ++ Seq.fill(8 - xs.length)(0f)).toArray
  private lazy val dir = tempDataDir(
    "embeddings" -> Seq(
      (0L, v(1f), 0),
      (1L, v(2f), 0),
      (2L, v(0f, 3f), 1),
      (3L, v(10f, -0.1f), 0), // same sign pattern as v0 in the first 8 dims
      (4L, v(-1f), 2)
    ).toDF("vec_id", "embedding", "label"))

  test("brute-force top-k ranks by exact cosine with id tie-break") {
    val rows = SimilarityOps.bruteForceTopK(spark, dir, k = 4, nQueries = 1).collect()
    val ranked = rows.sortBy(_.getInt(1)).map(r => (r.getLong(2), r.getDouble(3)))
    // query 0: cos(v1)=1 (tie with nothing), cos(v3)≈0.99995, cos(v2)=0, cos(v4)=-1
    assert(ranked.map(_._1).toSeq == Seq(1L, 3L, 2L, 4L))
    assert(ranked(0)._2 == 1.0)
    assert(ranked(2)._2 == 0.0 && ranked(3)._2 == -1.0)
  }

  test("embedding near-dup finds only the high-cosine pairs") {
    val pairs = DedupOps.embeddingNearDup(spark, dir, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L), (0L, 3L), (1L, 3L)))
  }

  test("multi-probe candidates dominate single-bucket results per query") {
    // multi-probe searches a strict superset of buckets, so its rank-1
    // score per query must be >= the single-bucket rank-1 score.
    def rank1(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.where($"rank" === 1).collect()
        .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("score")).toMap
    val single = rank1(SimilarityOps.lshTopK(spark, dir, k = 1))
    val multi = rank1(SimilarityOps.lshMultiProbeTopK(spark, dir, k = 1))
    single.foreach { case (q, s) => assert(multi(q) >= s) }
    // multi-probe reaches neighbors single-bucket misses: v2 (bucket 2)
    // is 1 sign-bit from v0/v1/v3 (bucket 1) and has no same-bucket peer.
    assert(!single.contains(2L) && multi.contains(2L))
  }

  test("IVF and LSH scores never exceed the brute-force optimum") {
    val brute = SimilarityOps.bruteForceTopK(spark, dir, k = 1, nQueries = 5)
      .where($"rank" === 1).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("score")).toMap
    Seq(SimilarityOps.lshMultiProbeTopK(spark, dir, k = 1),
        SimilarityOps.ivfTopK(spark, dir, k = 1)).foreach { ann =>
      ann.where($"rank" === 1).collect().foreach { r =>
        assert(r.getAs[Double]("score") <= brute(r.getAs[Long]("query_id")))
      }
    }
  }

  test("sign-LSH buckets separate opposite-sign vectors and keep aligned ones") {
    val out = SimilarityOps.lshTopK(spark, dir, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    // v4 (negative first component) shares no bucket with v0/v1/v3.
    assert(!out.contains((0L, 4L)) && !out.contains((4L, 0L)))
    // v0's bucket contains v1 and v3 (same sign pattern).
    val v0Neighbors = out.filter(_._1 == 0L).map(_._2).toSet
    assert(v0Neighbors == Set(1L, 3L))
  }

  test("recall@k is 1.0 under exhaustive probing and within [0,1] always") {
    // probing every cell IS brute force: recall must be exactly 1
    val exhaustive = SimilarityOps.recallAtK(spark, dir, k = 2, nQueries = 4,
        nProbe = 1000, nCentroids = 3)
      .collect()
    assert(exhaustive.nonEmpty)
    exhaustive.foreach { r =>
      assert(r.getDouble(2) == 1.0,
        s"exhaustive probe must reach full recall, got $r")
    }
    // a narrow probe can only lose neighbors, never invent them
    val narrow = SimilarityOps.recallAtK(spark, dir, k = 2, nQueries = 4,
        nProbe = 1, nCentroids = 3)
      .collect()
    narrow.foreach { r =>
      val rec = r.getDouble(2)
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }
}
