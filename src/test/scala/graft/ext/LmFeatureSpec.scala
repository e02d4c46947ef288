package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bigram-LM quality scoring and feature hashing: hand-computed
  * quantized probabilities, ordering sensitivity (the property the
  * unigram commonness surrogate cannot see), and the hashing trick's
  * mass-conservation identity. Exact end-to-end values on the real
  * corpus are pinned by the DuckDB twins (`ext_text_lm_score`,
  * `ext_feature_hash`). */
class LmFeatureSpec extends SparkSpec {
  import spark.implicits._

  test("lm score: add-one quantized probabilities from first principles") {
    // corpus: "a b" ×3 and "a c" ×1 → c(a·)=4, c(ab)=3, c(ac)=1, V=3
    val docs = Seq(
      (0L, "a b"), (1L, "a b"), (2L, "a b"), (3L, "a c")
    ).toDF("doc_id", "text")
    val res = TextOps.bigramLmScoreOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val qab = (TextOps.Ppm * (3 + 1)) / (4 + 3) // 571428
    val qac = (TextOps.Ppm * (1 + 1)) / (4 + 3) // 285714
    assert(qab == 571428L && qac == 285714L)
    (0L to 2L).foreach(id => assert(res(id) == ((1L, qab, qab))))
    assert(res(3L) == ((1L, qac, qac)))
  }

  test("lm score ranks natural order above shuffled order of the same tokens") {
    // ten docs share one phrasing; one doc uses the same TOKENS in an
    // order never seen elsewhere — same unigram profile, lower LM score
    val docs = ((0L to 9L).map(id => (id, "the cat sat on the mat")) :+
      (10L, "mat the on sat cat the")).toDF("doc_id", "text")
    val res = TextOps.bigramLmScoreOf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(res(0L) > res(10L))
    // docs with < 2 tokens contribute no row
    val short = TextOps.bigramLmScoreOf(Seq((0L, "solo")).toDF("doc_id", "text"))
    assert(short.count() == 0)
  }

  test("feature hash: per-doc signed mass is conserved and buckets are bounded") {
    val res = TextOps.featureHash(spark, sfSmoke).cache()
    try {
      assert(res.where(col("bucket") < 0 ||
        col("bucket") >= TextOps.FeatureHashDim).count() == 0)
      // Σ_b w(d, b) == Σ_t ξ(t)·tf(d, t): regroup the identical signed
      // terms straight from the token table — the hash trick only
      // REDISTRIBUTES mass across buckets, it never creates or drops it
      val words = TextOps.withWords(TextOps.docs(spark, sfSmoke))
        .select(col("doc_id"), explode(col("ws")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .withColumn("hh", TextOps.h32(col("term")))
        .withColumn("sgn", expr(
          s"CASE WHEN (hh div ${TextOps.FeatureHashDim}) % 2 = 0 THEN 1 ELSE -1 END"))
        .groupBy("doc_id").agg(sum(expr("sgn * tf")).as("mass"))
      val perDoc = res.groupBy("doc_id").agg(sum("weight").as("mass2"))
      val joined = words.join(perDoc, "doc_id")
      assert(joined.where(col("mass") =!= col("mass2")).count() == 0)
      assert(joined.count() == TextOps.docs(spark, sfSmoke).count())
    } finally res.unpersist()
  }
}
