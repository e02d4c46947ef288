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
  * Scale shape: the three per-row stages (quality signals, language
  * votes, split assignment) are COLUMN DEFINITIONS over one shared
  * tokenized scan — fused into a single pass, not three scans joined
  * on doc_id (the column logic lives once, in
  * [[TextOps.withTextSignals]]/[[TextOps.withPredLang]]/
  * [[SampleOps.withSplit]], so the composition cannot drift from the
  * standalone operators the oracle pins). The dedup gates are two
  * semi-joins (exact keepers, cluster keepers — both shuffle on
  * doc_id); Catalyst pushes the cheap per-row predicates below them,
  * so the dedup machinery only sees surviving rows' ids. */
object PipelineOps {

  val MinTokens = 20
  val MinQuality = 0.33

  def cleanCorpus(spark: SparkSession, dir: String): DataFrame = {
    val base = SampleOps.withSplit(
      TextOps.withPredLang(
        TextOps.withTextSignals(
          TextOps.withWords(TextOps.docs(spark, dir)))))
    val exactKeepers = DedupOps.exact(spark, dir).select("doc_id")
    val clusterKeepers = DedupOps.clusters(spark, dir)
      .where(col("is_keeper")).select("doc_id")
    base
      .where(col("n_tokens") >= MinTokens &&
        col("quality_score") >= MinQuality &&
        col("pred_lang") =!= "unknown")
      .join(exactKeepers, Seq("doc_id"), "left_semi")
      .join(clusterKeepers, Seq("doc_id"), "left_semi")
      .select("doc_id", "lang", "pred_lang", "split", "n_tokens", "quality_score")
      .orderBy("doc_id")
  }
}
