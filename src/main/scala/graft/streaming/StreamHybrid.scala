package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{SimilarityOps, TextOps}

/** Streamed HYBRID retrieval — the end-to-end composition of the two
  * incremental index families: the dense leg is served from the
  * incrementally-maintained ANN assignment ([[StreamAnnIndex]] —
  * bootstrap-trained frozen √n router, per-batch appends), the
  * lexical leg from the incrementally-maintained BM25 index
  * ([[StreamBm25]] — postings/lengths/df-delta appends), fused with
  * the same RRF integer kernel as the batch
  * [[SimilarityOps.hybridFusionAnn]]. This closes the retrieval
  * tier's streaming story: a live corpus is ingested once, BOTH
  * indexes stay current per micro-batch, and search serves from the
  * maintained stores — no batch rebuild anywhere.
  *
  * The oracle gate is incremental ≡ batch END TO END: the replay
  * accumulates both indexes batch-by-batch through the real per-batch
  * kernels, then serves one fused search; the DuckDB twin builds the
  * same frozen-router dense leg (trained on the bootstrap range) and
  * the same capped BM25 leg in one pass and fuses identically — the
  * hash gate proves the composed incremental path changes nothing. */
object StreamHybrid {

  /** Replay: both indexes accumulated incrementally, then one hybrid
    * search from the maintained frames. Dense candidates come through
    * the STORED assignment (crank = 1 is the cell, crank ≤
    * [[StreamAnnIndex.StoreNProbe]] the probe list), both legs
    * restricted to document-backed ids so fusion ranks one universe. */
  def hybridSearchReplay(spark: SparkSession, dir: String,
      k: Int = SimilarityOps.RrfTopK, pool: Int = SimilarityOps.RrfPool,
      nQueries: Int = 8): DataFrame = {
    val docIds = TextOps.docs(spark, dir).select(col("doc_id"))
    // dense leg from the incrementally-accumulated ANN assignment
    val assign = StreamAnnIndex.incrementalAnnBatch(spark, dir)
    val e = SimilarityOps.withNorm(SimilarityOps.embeddings(spark, dir))
      .select(col("vec_id"), col("embedding"), col("norm"))
    val cells = assign.where(col("crank") === 1)
      .select(col("vec_id"), col("cent_id").as("cell"))
      .join(e, "vec_id")
    val qv = cells.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("qv"), col("norm").as("qn"))
    val probes = assign.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("cent_id").as("pcell"))
    val cands = broadcast(probes.join(qv, "query_id"))
      .join(cells, col("pcell") === col("cell") && col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        expr(SimilarityOps.cosExpr("qv", "embedding", "qn", "norm")))
      .join(broadcast(docIds), col("vec_id") === col("doc_id"), "left_semi")
      .join(broadcast(docIds), col("query_id") === col("doc_id"), "left_semi")
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"))
    val dense = SimilarityOps.topKPerGroup(cands, col("query_id"), Seq.empty,
      col("cos"), col("neighbor_id"), pool)
    // lexical leg from the incrementally-accumulated BM25 frames
    val (tf, dlen, df) = StreamBm25.incrementalBm25Frames(spark, dir)
    val lexical = TextOps.bm25ScoreOf(tf, dlen, df, pool, nQueries)
      .select(col("query_id"), col("doc_id").as("neighbor_id"), col("rank"))
    SimilarityOps.rrfOf(dense, "rank_dense", lexical, "rank_lex", k)
  }

  /** Streamed hybrid retrieval UNDER CHURN — the round-9 verdict's
    * closing composition: both incremental indexes maintained through
    * interleaved appends AND deletes, then one fused search over the
    * SURVIVING corpus. The dense leg accumulates through
    * [[StreamAnnIndex.incrementalAnnDeleteBatch]] (tombstoned ids
    * excluded, redelivered deletes stay dead, compaction applied); the
    * lexical leg applies the same delete set through
    * [[StreamBm25.retractDocs]] (postings/lengths dropped, df
    * recomputed from survivors). A deleted document can appear in
    * NEITHER leg — not as a query (its terms and cell are gone) and
    * not as a neighbor. Gated against the DuckDB twin that builds both
    * legs from scratch on the surviving corpus and fuses identically:
    * churn-maintained ≡ rebuilt-on-survivors, end to end. */
  def hybridChurnReplay(spark: SparkSession, dir: String,
      k: Int = SimilarityOps.RrfTopK, pool: Int = SimilarityOps.RrfPool,
      nQueries: Int = 8): DataFrame = {
    val docIds = TextOps.docs(spark, dir).select(col("doc_id"))
    // dense leg from the churned ANN accumulation (live rows only)
    val assign = StreamAnnIndex.incrementalAnnDeleteBatch(spark, dir)
    val e = SimilarityOps.withNorm(SimilarityOps.embeddings(spark, dir))
      .select(col("vec_id"), col("embedding"), col("norm"))
    val cells = assign.where(col("crank") === 1)
      .select(col("vec_id"), col("cent_id").as("cell"))
      .join(e, "vec_id")
    val qv = cells.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("qv"), col("norm").as("qn"))
    val probes = assign.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("cent_id").as("pcell"))
    val cands = broadcast(probes.join(qv, "query_id"))
      .join(cells, col("pcell") === col("cell") && col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        expr(SimilarityOps.cosExpr("qv", "embedding", "qn", "norm")))
      .join(broadcast(docIds), col("vec_id") === col("doc_id"), "left_semi")
      .join(broadcast(docIds), col("query_id") === col("doc_id"), "left_semi")
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"))
    val dense = SimilarityOps.topKPerGroup(cands, col("query_id"), Seq.empty,
      col("cos"), col("neighbor_id"), pool)
    // lexical leg: the same delete set retracted from the BM25 frames —
    // ONE definition of the churn arithmetic (churnDeletedIds), so the
    // two legs can never silently retract different id sets
    val deleted = StreamAnnIndex.churnDeletedIds(spark, dir)
      .select(col("vec_id").as("doc_id"))
    val (tf, dlen, df) = StreamBm25.incrementalBm25Frames(spark, dir)
    val (tf2, dlen2, df2) = StreamBm25.retractDocs(tf, dlen, deleted)
    val lexical = TextOps.bm25ScoreOf(tf2, dlen2, df2, pool, nQueries)
      .select(col("query_id"), col("doc_id").as("neighbor_id"), col("rank"))
    SimilarityOps.rrfOf(dense, "rank_dense", lexical, "rank_lex", k)
  }
}
