package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dedup Venn, vocab growth and pack stats: set-conservation
  * identities against the constituent tables. End-to-end values are
  * pinned by the DuckDB twins. */
class VennGrowthSpec extends SparkSpec {

  test("venn cells conserve both pair tables") {
    val venn = DedupOps.dedupVenn(spark, sfSmoke).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
    val lex = DedupOps.jaccardPairs(spark, sfSmoke, threshold = 0.5).count()
    assert(venn("both") + venn("lexical_only") == lex)
    assert(venn.values.sum >= lex)
  }

  test("vocab growth: full grid, monotone, conserves the distinct vocabulary") {
    val rows = TextOps.vocabGrowth(spark, sfSmoke).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (0 until TextOps.GrowthBuckets))
    rows.sliding(2).foreach { case Array(a, b) => assert(b._3 >= a._3) }
    val vocab = TextOps.withWords(TextOps.docs(spark, sfSmoke))
      .select(explode(col("ws")).as("t")).agg(countDistinct("t"))
      .collect()(0).getLong(0)
    assert(rows.last._3 == vocab && rows.map(_._2).sum == vocab)
  }

  test("pack stats reconcile against the packing layout") {
    val r = PackOps.packStats(spark, sfSmoke).collect()(0)
    val layout = PackOps.packSequences(spark, sfSmoke).cache()
    try {
      assert(r.getLong(0) == layout.count())
      val total = layout.agg(sum("n_tokens")).collect()(0).getLong(0)
      assert(r.getLong(1) == total)
      val budget = PackOps.DefaultBudget
      assert(r.getLong(2) == (total + budget - 1) / budget)
      assert(r.getLong(5) <= 1000000L && r.getLong(5) > 0L)
      val crossings = layout.agg(sum(col("packs_spanned") - 1))
        .collect()(0).getLong(0)
      assert(r.getLong(4) == crossings)
    } finally layout.unpersist()
  }
}
