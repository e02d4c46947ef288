package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** MMR selection properties on the driver testdata (exact selections are
  * pinned by the DuckDB twin `ext_sim_mmr`). */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private lazy val out =
    VectorOps.mmrSelect(spark, sfSmoke).as[(Int, Long, Double, Double)].collect().toSeq

  test("returns exactly k ranked rows, rank 1 is the most relevant candidate") {
    assert(out.map(_._1) == (1 to 8))
    // First pick has no diversity penalty: it is the global argmax of rel.
    assert(out.head._3 == out.map(_._3).max)
    assert(out.head._4 == out.head._3 / 2)
  }

  test("marginal stays inside the cosine-bound envelope and picks are distinct") {
    // marginal = (rel − pen)/2 with pen ∈ [−1, 1] ⇒ (rel−1)/2 ≤ m ≤ (rel+1)/2.
    assert(out.forall { case (_, _, rel, m) => m >= (rel - 1) / 2 && m <= (rel + 1) / 2 })
    assert(out.map(_._2).distinct.size == out.size)
  }

  test("selection is more diverse than plain top-k at equal size") {
    def avgPairwiseCos(ids: Seq[Long]): Double = {
      val e = SimilarityOps.withNorm(SimilarityOps.embeddings(spark, sfSmoke))
        .where(col("vec_id").isin(ids: _*))
      val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .selectExpr(s"${SimilarityOps.cosExpr("a.embedding", "b.embedding", "a.norm", "b.norm")} AS c")
        .as[Double].collect()
      pairs.sum / pairs.length
    }
    val topk = SimilarityOps.bruteForceTopK(spark, sfSmoke, k = 8, nQueries = 1)
      .select("neighbor_id").as[Long].collect().toSeq
    val mmr = out.map(_._2)
    assert(avgPairwiseCos(mmr) <= avgPairwiseCos(topk))
  }
}
