package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit}

/** Winnowing (SIGMOD'03) structural guarantees. Exact fingerprint values
  * are pinned by the DuckDB twin (`ext_text_winnowing`). */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String)*): String =
    tempDataDir("documents" -> rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t")))

  test("identical documents select identical fingerprint sets") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val dir = corpus((1L, text), (2L, text))
    val fps = TextOps.winnowing(spark, dir)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(2L) && fps(1L) > 0)
    val sets = TextOps.winnowing(spark, dir).select("doc_id", "pos", "fp")
      .as[(Long, Int, Long)].collect().groupBy(_._1)
      .map { case (d, rs) => d -> rs.map(r => (r._2, r._3)).toSet }
    assert(sets(1L) == sets(2L))
  }

  test("the winnowing guarantee: a shared substring of length >= k + w - 1 shares a fingerprint") {
    // k = 8, w = 4 ⇒ any common substring of length >= 11 must yield at
    // least one common selected (gram-hash) fingerprint VALUE.
    val shared = "zqxjkvbwmfp" // 11 chars, appears in both documents
    val dir = corpus(
      (1L, s"completely different prefix text $shared and then one tail"),
      (2L, s"other words entirely here $shared closing differently now"))
    val byDoc = TextOps.winnowing(spark, dir).select("doc_id", "fp")
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (d, rs) => d -> rs.map(_._2).toSet }
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty)
  }

  test("fingerprint density is bounded by the window width") {
    // Each full window selects exactly one position; consecutive windows
    // mostly agree, so |selected| <= n_windows and is far below n_grams.
    val dir = corpus((1L,
      "a long enough synthetic document body with plenty of distinct words " +
        "so the hash sequence is effectively random across all window frames"))
    val nFp = TextOps.winnowing(spark, dir).count()
    val nGrams = TextOps.winnowing(spark, dir, w = 2).count()
    assert(nFp > 0 && nFp < nGrams) // wider window selects fewer
  }

  test("positions decode into valid gram range") {
    val dir = corpus((1L, "some reasonable document text for range checking"))
    val bad = TextOps.winnowing(spark, dir)
      .where(col("pos") < 1 || col("fp") < 0 || col("fp") > 4294967295L)
    assert(bad.count() == 0)
  }
}
