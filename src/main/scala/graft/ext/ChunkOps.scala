package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Context-window chunking — the step that turns variable-length
  * documents into fixed-size overlapping token windows for model
  * training (every pretraining pipeline runs this between cleaning and
  * packing; the stride < window overlap preserves cross-boundary
  * context, the standard sliding-window scheme).
  *
  * Scale shape: pure per-row work. The chunk enumeration is a
  * `transform(sequence(...))` over the token array followed by ONE
  * `posexplode` — no shuffle, no state, no join; the fan-out is
  * bounded by ⌈len/stride⌉ rows per document, each of bounded width
  * (≤ window tokens), so the operator streams through a 100 TB corpus
  * as a map. Chunk count and boundaries use INTEGER arithmetic only
  * (`(n - window + stride - 1) DIV stride` — no float ceil), so the
  * layout is exact and engine-portable; the chunk fingerprint rides
  * the cross-engine hash contract ([[TextOps.h32]]).
  */
object ChunkOps {

  val Window = 32
  val Stride = 24

  /** One row per (document, chunk): 1-based chunk ordinal, 1-based
    * start-token offset, actual token count (the tail chunk may be
    * short), and the h32 fingerprint of the space-joined chunk text.
    * Chunks start at offsets 0, S, 2S, …; a document yields
    * `1 + max(0, ⌈(n − W) / S⌉)` chunks, so every token lands in ≥ 1
    * chunk and consecutive chunks overlap by W − S tokens. */
  def chunkWindows(spark: SparkSession, dir: String,
      window: Int = Window, stride: Int = Stride): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    // No pre-repartition: one md5 per chunk is light enough that the
    // full-text exchange costs more than it parallelizes at test SFs
    // (measured; contrast TextOps.shingleSet where the blowup is 6×
    // the exchange). Multi-split inputs at scale parallelize at the scan.
    TextOps.withWords(TextOps.docs(spark, dir))
      .withColumn("n", expr("size(ws)"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(
           |  sequence(0, CASE WHEN n <= $window THEN 0
           |              ELSE (n - $window + ${stride - 1}) DIV $stride END),
           |  i -> slice(ws, 1 + i * $stride, $window))""".stripMargin)))
      .select(
        col("doc_id"),
        (col("pos") + 1).cast("int").as("chunk_id"),
        (col("pos") * stride + 1).cast("int").as("start_tok"),
        size(col("col")).as("n_tok"),
        TextOps.h32(concat_ws(" ", col("col"))).as("chunk_hash"))
      .orderBy("doc_id", "chunk_id")
  }

  /** CHUNK STITCH — the inverse of [[chunkWindows]], and the proof the
    * chunking loses nothing: re-enumerate each document's overlapping
    * chunks, keep chunk 1 whole and each later chunk's NON-overlap
    * suffix, and rebuild the document in chunk order. Because chunks
    * advance by exactly `stride`, the new-token suffix starts at the
    * CONSTANT local offset window − stride + 1 in every later chunk
    * (a fully-covered short tail slices to empty and is filtered out).
    * The oracle twin does NOT mirror the reconstruction — it hashes
    * the normalized original text directly — so the hash gate checks
    * stitch ∘ chunk ≡ identity, the round-trip contract itself.
    *
    * Shape: the same per-row enumeration as chunking, one per-doc
    * bounded sort_array rebuild (the boilerplateStrip machinery) —
    * no joins, no windows. */
  def stitchChunks(spark: SparkSession, dir: String,
      window: Int = Window, stride: Int = Stride): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    TextOps.withWords(TextOps.docs(spark, dir))
      .withColumn("n", expr("size(ws)"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(
           |  sequence(0, CASE WHEN n <= $window THEN 0
           |              ELSE (n - $window + ${stride - 1}) DIV $stride END),
           |  i -> slice(ws, 1 + i * $stride, $window))""".stripMargin)))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("chunk_id"),
        expr(s"CASE WHEN pos = 0 THEN col " +
          s"ELSE slice(col, ${window - stride + 1}, $window) END").as("nw"))
      .withColumn("nt", concat_ws(" ", col("nw")))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_chunks"),
        sort_array(collect_list(struct(col("chunk_id"), col("nt")))).as("kp"))
      .select(col("doc_id"), col("n_chunks"),
        TextOps.h32(concat_ws(" ",
          expr("transform(filter(kp, x -> x.nt != ''), x -> x.nt)")))
          .as("rebuilt_hash"))
      .orderBy("doc_id")
  }

  /** Paragraph size (tokens) for the boilerplate strip: non-overlapping
    * windows stand in for paragraphs — the corpus has no newlines, so
    * fixed token windows are the deterministic paragraph surrogate. */
  val Para = 16

  /** Sub-document (paragraph-grain) exact dedup — the boilerplate strip
    * of LLM corpus cleaning (headers, footers, nav bars repeat VERBATIM
    * across pages; document-level dedup never fires on them because the
    * surrounding text differs). A paragraph whose text occurs in ≥
    * `minDf` DISTINCT documents is boilerplate and is removed from
    * EVERY document (the standard strip — no canonical copy survives,
    * unlike document dedup's first-wins); each document is then
    * reconstructed from its surviving paragraphs in order.
    *
    * Paragraph identity is the cross-engine hash of the paragraph text
    * ([[TextOps.h32]]) — hash-grain semantics, same contract as the
    * whole dedup family.
    *
    * Scale shape: per-row window explode (no shuffle) → one df
    * aggregate keyed on the paragraph hash → equi-join back on that
    * hash → one per-document aggregate. Shuffles carry (doc_id, hash,
    * n_tok) plus the paragraph text for reconstruction — the same
    * volume class as the shingle index; the per-doc `collect_list` is
    * bounded by document length, like every per-doc array here.
    *
    * Output per document: paragraph counts before/after, surviving
    * token count, and the h32 fingerprint of the reconstructed text
    * (the compact cross-engine witness that the rebuilt string —
    * order included — is identical; a doc stripped to nothing yields
    * the empty-string hash). */
  /** The paragraph table (doc_id, para_id, n_tok, pt, ph) — an index
    * artifact of the sub-document dedup family, session-cached like the
    * shingle index: [[boilerplateStrip]] consumes it on BOTH sides of
    * its df join, which would otherwise scan and re-tokenize the corpus
    * twice (the subtrees differ below the exchanges, so Catalyst's
    * exchange reuse cannot collapse them). */
  def paragraphTable(spark: SparkSession, dir: String,
      para: Int = Para): DataFrame =
    graft.util.SessionCache.getOrBuild(spark, s"text|$dir|paras|$para") {
      TextOps.withWords(TextOps.docs(spark, dir)
          .repartition(spark.sparkContext.defaultParallelism, col("doc_id")))
        .withColumn("n", expr("size(ws)"))
        .select(col("doc_id"), posexplode(expr(
          s"""transform(sequence(0, CASE WHEN n <= $para THEN 0
             |            ELSE (n - 1) DIV $para END),
             |  i -> slice(ws, 1 + i * $para, $para))""".stripMargin)))
        .select(col("doc_id"), (col("pos") + 1).cast("int").as("para_id"),
          size(col("col")).as("n_tok"), concat_ws(" ", col("col")).as("pt"))
        .withColumn("ph", TextOps.h32(col("pt")))
    }

  def boilerplateStrip(spark: SparkSession, dir: String,
      para: Int = Para, minDf: Int = 2): DataFrame = {
    require(para > 0 && minDf >= 2, s"need para > 0, minDf >= 2, got $para/$minDf")
    val paras = paragraphTable(spark, dir, para)
    val dfreq = paras.groupBy("ph")
      .agg(countDistinct(col("doc_id")).as("df"))
    paras.join(dfreq, "ph")
      .withColumn("kept", col("df") < minDf)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("int").as("n_paras"),
        sum(when(col("kept"), 1).otherwise(0)).cast("int").as("n_kept"),
        sum(when(col("kept"), col("n_tok")).otherwise(0L)).as("kept_tokens"),
        // collect_list drops the CASE's null (non-kept) rows; sort by
        // para_id restores document order after the unordered aggregate
        sort_array(collect_list(when(col("kept"),
          struct(col("para_id"), col("pt"))))).as("kp"))
      .select(col("doc_id"), col("n_paras"), col("n_kept"), col("kept_tokens"),
        TextOps.h32(concat_ws(" ", expr("transform(kp, x -> x.pt)"))).as("kept_hash"))
      .orderBy("doc_id")
  }
}
