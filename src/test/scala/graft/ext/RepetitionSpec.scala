package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the repetition signals and the histogram-quantile sketch on
  * hand-computable corpora (the oracle rows check engine parity; these
  * check the NUMBERS are the intended ones). */
class RepetitionSpec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    tempDataDir("documents" -> df)
  }

  test("repetition fractions on hand-built documents") {
    val dir = docsDir(Seq(
      0L -> "a b a b a", // 2-grams: ab,ba,ab,ba → 4/2/2; 3-grams: aba,bab,aba → 3/2/2
      1L -> "x y",       // one 2-gram, no 3-gram row
      2L -> "z"          // too short for either → absent entirely
    ))
    val out = TextOps.repetitionStats(spark, dir)
      .select("doc_id", "gram_n", "n_grams", "n_distinct", "top_cnt", "dup_frac", "top_frac")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(out === Seq(
      (0L, 2, 4L, 2L, 2L, 0.5, 0.5),
      (0L, 3, 3L, 2L, 2L, 1.0 / 3.0, 2.0 / 3.0),
      (1L, 2, 1L, 1L, 1L, 0.0, 1.0)))
  }

  test("histogram quantiles: upper bin edges at exact integer thresholds") {
    // n_chars 1..100 (text is irrelevant here): bin0 = 1..63 (63 docs),
    // bin1 = 64..100 (37 docs). ⌈p·N⌉: 25→bin0, 75/90/99→bin1.
    import spark.implicits._
    val df = (1L to 100L).toDF("doc_id")
      .withColumn("text", lit("t")).withColumn("lang", lit("en"))
      .withColumn("source", lit("t")).withColumn("n_chars", col("doc_id"))
    val dir = tempDataDir("documents" -> df)
    val out = TextOps.lengthHistQuantiles(spark, dir)
      .select("pct", "n_docs", "bin", "upper_chars")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out === Seq(
      (25, 100L, 0L, 64L), (50, 100L, 0L, 64L), (75, 100L, 1L, 128L),
      (90, 100L, 1L, 128L), (99, 100L, 1L, 128L)))
  }

  test("sketch reports exactly the bin of the ⌈p·N⌉-th order statistic") {
    val lens = TextOps.docs(spark, sfSmoke)
      .select("n_chars").collect().map(_.getLong(0)).sorted
    val n = lens.length
    val sketch = TextOps.lengthHistQuantiles(spark, sfSmoke)
      .select("pct", "bin").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    for (pct <- Seq(25, 50, 75, 90, 99)) {
      val v = lens((pct * n + 99) / 100 - 1) // ⌈p·N⌉-th smallest, 1-indexed
      assert(sketch(pct) === v / 64,
        s"p$pct: sketch bin ${sketch(pct)} != bin of order statistic $v")
    }
  }
}
