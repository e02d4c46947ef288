package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Weighted (multiset) Jaccard: the repetition sensitivity that
  * distinguishes it from set Jaccard, plus exact ppm values from first
  * principles. End-to-end corpus values are pinned by the DuckDB twin
  * (`ext_dedup_weighted_jaccard`). */
class WeightedJaccardSpec extends SparkSpec {
  import spark.implicits._

  private def run(dir: String) = DedupOps.weightedJaccardPairs(spark, dir)

  test("identical docs score exactly 10^6; repetition discounts the weighted score") {
    val phrase = "alpha beta gamma delta epsilon zeta"
    val dir = tempDataDir("documents" -> Seq(
      (0L, phrase), // original
      (1L, phrase), // exact copy: J_w = 1
      (2L, phrase + " " + phrase + " " + phrase) // 3x self-repeat
    ).toDF("doc_id", "text"))
    val res = run(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(res((0L, 1L)) == TextOps.Ppm)
    // doc 2 (18 tokens, 16 shingles): doc 0's 4 shingles 3x each plus
    // two wrap-around shingles 2x each → Σmin = 4,
    // J_w = 4 / (4 + 16 − 4) = 1/4 < τ_w = 0.5, so the exact-copy
    // pair is the only survivor — set Jaccard would have scored the
    // self-repeat 4/6 and kept it; repetition-awareness is the point
    assert(res.keySet == Set((0L, 1L)))
  }

  test("near-identical with one tripled sentence: exact ppm from first principles") {
    // B repeats A's 6-token text then appends one extra token:
    // A's shingles (4 of them) each once; B holds those 4 once plus
    // one extra shingle ("epsilon zeta omega") → Σmin = 4,
    // T_A = 4, T_B = 5, J_w = 4/(4+5-4) = 0.8
    val dir = tempDataDir("documents" -> Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta omega")
    ).toDF("doc_id", "text"))
    val row = run(dir).collect()
    assert(row.length == 1)
    assert(row(0).getLong(2) == 4L) // inter
    assert(row(0).getLong(3) == (TextOps.Ppm * 4L) / 5L) // 800000
  }

  test("corpus pass: pairs are canonical and the ratio respects the Σmax identity") {
    val res = run(sfSmoke).cache()
    try {
      assert(res.where(col("doc_a") >= col("doc_b")).count() == 0)
      assert(res.where(col("j_wppm") < DedupOps.WJaccardPpm ||
        col("j_wppm") > TextOps.Ppm).count() == 0)
    } finally res.unpersist()
  }
}
