package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE merge induction pinned on the classic hand-computable corpus
  * (Sennrich's low/lower/newest/widest example); corpus-trained values
  * are pinned by the unrolled DuckDB twin (`ext_bpe_merges`). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merges follow frequency with deterministic tie-breaks (hand-computed)") {
    // pair counts over char symbols, frequency-weighted:
    //   round 1: 'es' 6+3=9 ties 'st' 9 → left asc picks (e, s)
    //   round 2: after es: ('es','t') 9 beats lo/ow 7 → (es, t)
    //   round 3: after est: 'lo' 7 ties 'ow' 7 → left asc picks (l, o)
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("w", "freq")
    val merges = BpeOps.mergesFrom(spark, vocab, rounds = 3)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(merges == Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "l", "o", 7L)))
  }

  test("greedy left-to-right overlap rule: 'aaaa' merges to two 'aa' symbols") {
    // (a,a) counts 3 adjacent occurrences in 'aaaa'; the merge pass is
    // non-overlapping left-to-right, so round 2's top pair is (aa, aa)
    // with count 1 — NOT (a, aa) — which pins the replace semantics.
    val vocab = Seq(("aaaa", 1L)).toDF("w", "freq")
    val merges = BpeOps.mergesFrom(spark, vocab, rounds = 2)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(merges == Seq(
      (1, "a", "a", 3L),
      (2, "aa", "aa", 1L)))
  }

  test("merges respect symbol boundaries: a suffix of a merged symbol never matches") {
    // round 1 merges (x,a) cnt 6 → "xab" becomes [xa, b]. Round 2 merges
    // (a,b) cnt 3 (from the "ab" words) — under a boundary-BLIND
    // substring replace that pattern also matches the tail of [xa, b]
    // (… "a⟂b") and fuses the word into one bogus "xab" symbol, leaving
    // NO pair for round 3. Boundary-correct, [xa, b] is untouched (its
    // pair is (xa, b), not (a, b)) and round 3 merges it with count 1.
    val vocab = Seq(("xa", 5L), ("ab", 3L), ("xab", 1L)).toDF("w", "freq")
    val merges = BpeOps.mergesFrom(spark, vocab, rounds = 3)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(merges == Seq(
      (1, "x", "a", 6L),
      (2, "a", "b", 3L),
      (3, "xa", "b", 1L)))
  }

  test("corpus merges are well-formed: positive counts, grown symbols, k rows") {
    val m = BpeOps.bpeMerges(spark, sfSmoke).cache()
    try {
      assert(m.count() == BpeOps.Rounds)
      assert(m.where(col("pair_count") <= 0).count() == 0)
      // a later round's pair may reference an earlier merged symbol but
      // never a separator-carrying one
      assert(m.where(col("left_sym").contains("\u001f") ||
        col("right_sym").contains("\u001f")).count() == 0)
      // counts never increase across rounds (merging cannot create a
      // more frequent pair than the previous argmax)
      val counts = m.orderBy("round").select("pair_count")
        .collect().map(_.getLong(0)).toSeq
      assert(counts == counts.sorted.reverse)
    } finally m.unpersist()
  }

  test("encoding with the trained merges compresses: n_words <= n_bpe_tokens <= n_chars") {
    val e = BpeOps.bpeEncode(spark, sfSmoke).cache()
    try {
      assert(e.count() == TextOps.docs(spark, sfSmoke)
        .where(length(trim(col("text"))) > 0).count())
      // each word is >= 1 symbol and <= its character count
      assert(e.where(col("n_bpe_tokens") < col("n_words") ||
        col("n_bpe_tokens") > col("n_chars")).count() == 0)
      // the merges actually fire somewhere: global symbol count strictly
      // below the character count
      val sums = e.agg(sum("n_bpe_tokens"), sum("n_chars")).collect().head
      assert(sums.getLong(0) < sums.getLong(1))
    } finally e.unpersist()
  }
}
