package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions.lit

/** Co-occurrence lift semantics on a controlled corpus (exact top-k is
  * pinned by the DuckDB twin `ext_text_cooccur`). */
class CooccurSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String)*): String =
    tempDataDir("documents" -> rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t")))

  // 10 docs: "alpha beta" always together in 4 docs; "gamma" in 4 other
  // docs with "delta" split across both groups.
  private lazy val dir = corpus(
    (1L, "alpha beta delta"), (2L, "alpha beta"), (3L, "alpha beta delta"),
    (4L, "alpha beta"), (5L, "gamma delta"), (6L, "gamma"),
    (7L, "gamma delta"), (8L, "gamma epsilon zeta"), (9L, "epsilon zeta eta"),
    (10L, "zeta eta theta"))

  test("perfectly coupled terms get the maximal lift N/df") {
    val out = TextOps.cooccurLift(spark, dir)
      .as[(String, String, Long, Double)].collect().toSeq
    val ab = out.find(r => r._1 == "alpha" && r._2 == "beta")
    assert(ab.isDefined)
    // alpha and beta each appear in 4 docs, always together:
    // lift = (4 × 10) / (4 × 4) = 2.5 — and it is the top pair.
    assert(ab.get._4 == 2.5)
    assert(out.head._4 == out.map(_._4).max)
  }

  test("pairs below the support floor are absent") {
    val out = TextOps.cooccurLift(spark, dir)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out.forall(_._3 >= 3))
    // gamma+epsilon co-occur once only — never emitted.
    assert(!out.exists(r => r._1 == "epsilon" && r._2 == "gamma"))
  }

  test("each unordered pair appears once, in lexicographic order") {
    val out = TextOps.cooccurLift(spark, dir)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out.forall(r => r._1 < r._2))
    assert(out.map(r => (r._1, r._2)).distinct.size == out.size)
  }
}
