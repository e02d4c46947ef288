package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation — the flagship composition of
  * the extension tier. One declarative plan chains what a production
  * data pipeline runs as stages:
  *
  *   quality gate (token count + composite score)
  *   → language gate (n-gram language-ID must resolve)
  *   → exact-dedup keeper gate (content-hash first-wins)
  *   → near-dup keeper gate (MinHash-LSH cluster representative)
  *   → reproducible train/val/test assignment (salted hash)
  *
  * Every stage is an already-oracle-checked operator; composing them in
  * one query additionally pins their INTERACTIONS (join key alignment,
  * filter ordering independence) against a DuckDB twin that nests the
  * same component subqueries.
  *
  * Scale shape: the gates are two semi-joins (exact keepers, cluster
  * keepers — both shuffle on doc_id) over per-row expression filters;
  * Catalyst pushes the cheap quality/language predicates below the
  * joins, so the expensive dedup machinery only sees surviving rows'
  * ids. Nothing here adds driver-side work to the component operators. */
object PipelineOps {

  val MinTokens = 20
  val MinQuality = 0.33

  def cleanCorpus(spark: SparkSession, dir: String): DataFrame = {
    val stats = TextOps.textStats(spark, dir)
      .select("doc_id", "n_tokens", "quality_score")
    val lid = TextOps.langId(spark, dir) // (doc_id, lang, pred_lang)
    val exactKeepers = DedupOps.exact(spark, dir).select("doc_id")
    val clusterKeepers = DedupOps.clusters(spark, dir)
      .where(col("is_keeper")).select("doc_id")
    val split = SampleOps.datasetSplit(spark, dir).select("doc_id", "split")
    stats
      .join(lid, "doc_id")
      .join(split, "doc_id")
      .where(col("n_tokens") >= MinTokens &&
        col("quality_score") >= MinQuality &&
        col("pred_lang") =!= "unknown")
      .join(exactKeepers, Seq("doc_id"), "left_semi")
      .join(clusterKeepers, Seq("doc_id"), "left_semi")
      .select("doc_id", "lang", "pred_lang", "split", "n_tokens", "quality_score")
      .orderBy("doc_id")
  }
}
