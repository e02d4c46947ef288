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

  /** CORPUS DATASHEET — the composition report of the CLEANED corpus
    * (Gebru et al.'s "Datasheets for Datasets" summary table, the
    * artifact a training-data release ships): per (language, split)
    * cell — document count, token count, and each cell's exact ppm
    * share of cleaned documents and of cleaned tokens. Where the
    * funnel answers "where do documents DIE", this answers "what is
    * the survivor mix" — the number a mixture-weighting or
    * per-language budget decision reads. The grid is zero-filled over
    * the FULL source-language × split domain, so a language that the
    * cleaning emptied out (or a split that lost a language) is a
    * visible 0-row, not a missing one. Shares are ⌊10⁶·cell/total⌋
    * integer ppm — cross-engine exact. One aggregate over the cleaned
    * frame + a broadcast 1-row total + a domain-grid left join. */
  def corpusDatasheet(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val clean = cleanCorpus(spark, dir)
      .select("lang", "split", "n_tokens")
    val cells = clean.groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
    val tot = cells.agg(sum("n_docs").as("tot_docs"),
      sum("n_tokens").as("tot_tokens"))
    val langs = TextOps.docs(spark, dir).select("lang").distinct()
    val splits = Seq("train", "val", "test").toDF("split")
    val grid = langs.crossJoin(splits)
    grid.join(cells, Seq("lang", "split"), "left")
      .crossJoin(broadcast(tot))
      .select(col("lang"), col("split"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        expr("(CAST(1000000 AS BIGINT) * coalesce(n_docs, 0)) div tot_docs")
          .as("doc_share_ppm"),
        expr("(CAST(1000000 AS BIGINT) * coalesce(n_tokens, 0)) div tot_tokens")
          .as("token_share_ppm"))
      .orderBy("lang", "split")
  }

  /** FILTER FUNNEL — [[cleanCorpus]]'s observability twin: per stage,
    * how many documents entered, died, and survived. This is the
    * dashboard every curation pipeline runs next to its filters ("where
    * does my corpus go?"): a threshold that silently eats 40 % of a
    * source shows up here, not in the cleaned output. Stages are the
    * pipeline's own gates in the pipeline's own order (length →
    * quality → language → exact-dedup keeper → near-dup keeper), with
    * the SAME shared constants and keeper tables — so the final
    * stage's `n_out` equals `cleanCorpus.count()` BY CONSTRUCTION, and
    * `PipelineSpec` pins that theorem in-engine while the DuckDB twin
    * (which nests the same component oracles) hash-gates every count.
    *
    * Shape: the per-row gates are column definitions over the one
    * tokenized scan; the keeper memberships are two left joins on
    * doc_id; the funnel itself is ONE aggregate of running
    * conjunctions (fully partial-aggregable — at 100 TB this is a
    * single pass and a 5-row result). */
  def filterFunnel(spark: SparkSession, dir: String): DataFrame = {
    val base = TextOps.withPredLang(
        TextOps.withTextSignals(TextOps.withWords(TextOps.docs(spark, dir))))
      .select(col("doc_id"), col("n_tokens"), col("quality_score"), col("pred_lang"))
    val exactK = DedupOps.exact(spark, dir)
      .select(col("doc_id")).withColumn("ek", lit(true))
    val clusterK = DedupOps.clusters(spark, dir).where(col("is_keeper"))
      .select(col("doc_id")).withColumn("ck", lit(true))
    val flags = base
      .join(exactK, Seq("doc_id"), "left")
      .join(clusterK, Seq("doc_id"), "left")
      .withColumn("p1", col("n_tokens") >= lit(MinTokens))
      .withColumn("p2", col("quality_score") >= lit(MinQuality))
      .withColumn("p3", col("pred_lang") =!= "unknown")
      .withColumn("p4", coalesce(col("ek"), lit(false)))
      .withColumn("p5", coalesce(col("ck"), lit(false)))
    flags.agg(
        count(lit(1)).as("n0"),
        sum(when(col("p1"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("p1") && col("p2"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("p1") && col("p2") && col("p3"), 1L).otherwise(0L)).as("n3"),
        sum(when(col("p1") && col("p2") && col("p3") && col("p4"), 1L)
          .otherwise(0L)).as("n4"),
        sum(when(col("p1") && col("p2") && col("p3") && col("p4") && col("p5"), 1L)
          .otherwise(0L)).as("n5"))
      .selectExpr("stack(5, " +
        "1, 'length', n0, n1, " +
        "2, 'quality', n1, n2, " +
        "3, 'language', n2, n3, " +
        "4, 'exact_dedup', n3, n4, " +
        "5, 'near_dup', n4, n5) AS (stage, stage_name, n_in, n_out)")
      .withColumn("n_dropped", col("n_in") - col("n_out"))
      .select("stage", "stage_name", "n_in", "n_dropped", "n_out")
      .orderBy("stage")
  }
}
