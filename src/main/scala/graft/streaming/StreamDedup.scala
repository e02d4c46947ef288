package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ext.{DedupOps, TextOps}

/** Incremental near-duplicate filtering of a DOCUMENT STREAM against a
  * growing corpus — the streaming face of the batch dedup tier, and the
  * shape a production ingestion pipeline actually runs: the corpus is
  * deduplicated once (batch [[DedupOps]]), then every new micro-batch
  * is checked against the accumulated LSH index, and only novel
  * documents (plus their index entries) are appended.
  *
  * Per micro-batch (foreachBatch — the corpus/index appends must be
  * transactionally simple, and the band join needs the batch-side
  * DataFrame API):
  *
  *  1. in-batch first-wins exact dedup (the stream may repeat ids);
  *  2. shingle → minhash → band keys for the batch only (tiny);
  *  3. band equi-join against the persisted index → candidate pairs
  *     (O(near-dups), the LSH property — never batch × corpus);
  *  4. exact Jaccard verification of candidates against the corpus
  *     shingle arrays (array_intersect on two hash-joined arrays —
  *     same verifier as batch [[DedupOps.minhashLsh]]);
  *  5. verified-duplicate docs dropped; novel docs appended to the
  *     corpus store AND their band/array rows appended to the index —
  *     so a later batch that duplicates an EARLIER batch's novel doc is
  *     caught too (the index is live, not frozen at bootstrap).
  *
  * Recall semantics are the batch operator's: a near-dup pair missed by
  * all 4 bands is admitted (LSH false negative, probability (1−j³)⁴);
  * EXACT duplicates are always caught regardless — a content-hash
  * anti-join against the corpus covers them, including documents too
  * short to shingle (< 3 words), which the LSH path cannot see.
  *
  * Delivery semantics (foreachBatch is at-least-once): a fully
  * re-delivered batch is dropped by the doc_id anti-join against the
  * corpus. A crash BETWEEN the docs append and the index appends leaves
  * index-missing corpus docs; [[run]] repairs that at the start of
  * every batch (re-deriving index rows for corpus docs absent from the
  * band store), so the index converges to complete and the corpus
  * never loses or duplicates a document.
  */
object StreamDedup {

  /** Storage layout for the growing corpus + its LSH index. The docs
    * table carries `text_hash` (md5 of whitespace-normalized text, the
    * batch [[DedupOps.exact]] key) so the exact-dup check is a
    * column-pruned anti-join, not a corpus text scan. */
  final case class CorpusStore(docsDir: String, bandsDir: String, arraysDir: String)

  private def withTextHash(docs: DataFrame): DataFrame =
    docs.withColumn("text_hash",
      expr("md5(regexp_replace(trim(lower(text)), '\\\\s+', ' '))"))

  /** One-time bootstrap: seed the store from an existing deduplicated
    * corpus table (its docs, band index, and verification arrays). */
  def bootstrap(spark: SparkSession, sourceDir: String, store: CorpusStore): Unit = {
    withTextHash(TextOps.docs(spark, sourceDir))
      .write.mode("overwrite").parquet(store.docsDir)
    DedupOps.lshBands(spark, sourceDir).write.mode("overwrite").parquet(store.bandsDir)
    DedupOps.docShingleArraysOf(TextOps.shingleSet(spark, sourceDir))
      .write.mode("overwrite").parquet(store.arraysDir)
  }

  /** Filters one batch of documents against the store; returns the
    * NOVEL rows, text_hash included (batch-deduped by id AND content,
    * not an exact or near dup of any stored doc). Factored out of the
    * streaming sink so the logic is testable (and usable) as a batch
    * operator too. */
  def novelDocs(spark: SparkSession, batch: DataFrame, store: CorpusStore,
      threshold: Double = 0.5): DataFrame =
    novelAgainst(spark, batch,
      spark.read.parquet(store.docsDir),
      spark.read.parquet(store.bandsDir),
      spark.read.parquet(store.arraysDir), threshold)

  /** The per-batch filtering KERNEL, over corpus/index FRAMES instead
    * of the parquet store — ONE function shared by the streaming sink
    * (via [[novelDocs]]) and the oracle-checked batch replay
    * ([[incrementalStreamDedupBatch]]), the same shared-kernel pattern
    * as [[StatefulOps.rateLimitBatch]]: the DuckDB twin then checks
    * the logic the stream actually runs. */
  def novelAgainst(spark: SparkSession, batch: DataFrame,
      corpusDocs: DataFrame, bands: DataFrame, arrays: DataFrame,
      threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // 1. in-batch dedup: first-wins by id (stream may repeat doc ids),
    //    then first-wins by CONTENT (same text under two fresh ids in
    //    one batch must collapse — the index can't catch intra-batch
    //    pairs); finally drop ids/content already in the corpus (the
    //    id check also makes full re-delivery a no-op).
    val byId = batch.withColumn("rn",
        row_number().over(Window.partitionBy("doc_id").orderBy("text")))
      .where(col("rn") === 1).drop("rn")
    val deduped = withTextHash(byId)
      .withColumn("rn",
        row_number().over(Window.partitionBy("text_hash").orderBy("doc_id")))
      .where(col("rn") === 1).drop("rn")
      .join(corpusDocs.select("doc_id"), Seq("doc_id"), "left_anti")
      .join(corpusDocs.select("text_hash"), Seq("text_hash"), "left_anti")
    val shingles = TextOps.shingleSetOf(deduped)
    val batchBands = DedupOps.lshBandsOf(
      DedupOps.minhashSignaturesOf(TextOps.shingleHashesOf(shingles)))
    val batchArrays = DedupOps.docShingleArraysOf(shingles)
    val indexBands = bands
      .select(col("doc_id").as("corpus_id"), col("band"), col("key"))
    val corpusArrays = arrays
      .select(col("doc_id").as("corpus_id"), col("n").as("nc"), col("arr").as("ac"))
    // 3. candidates: batch docs sharing any band bucket with the corpus,
    //    PLUS intra-batch band collisions (earlier id wins)
    val corpusCand = batchBands.join(indexBands, Seq("band", "key"))
      .select("doc_id", "corpus_id")
    val intraCand = batchBands.as("x").join(batchBands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") > col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("corpus_id"))
    val cand = corpusCand.unionByName(intraCand).distinct()
    // 4. exact-Jaccard verification restricted to candidates; the
    //    "corpus" side of an intra-batch pair is the batch's own arrays
    val verifyArrays = corpusArrays.unionByName(
      batchArrays.select(col("doc_id").as("corpus_id"), col("n").as("nc"),
        col("arr").as("ac")))
    val dupIds = cand
      .join(batchArrays, "doc_id")
      .join(verifyArrays, "corpus_id")
      .withColumn("shared", size(array_intersect(col("arr"), col("ac"))))
      .where(expr(s"CAST(shared AS DOUBLE) / (n + nc - shared) >= $threshold"))
      .select("doc_id").distinct()
    // 5. novel = batch minus verified duplicates
    deduped.join(dupIds, Seq("doc_id"), "left_anti")
  }

  /** Appends a doc set's band + array index rows (only for docs that
    * CAN shingle — short docs have no LSH presence; their exact-dup
    * protection is the text_hash column on the docs table). */
  private def appendIndexRows(docs: DataFrame, store: CorpusStore): Unit = {
    val shingles = TextOps.shingleSetOf(docs).localCheckpoint(eager = true)
    DedupOps.lshBandsOf(
        DedupOps.minhashSignaturesOf(TextOps.shingleHashesOf(shingles)))
      .write.mode("append").parquet(store.bandsDir)
    DedupOps.docShingleArraysOf(shingles)
      .write.mode("append").parquet(store.arraysDir)
  }

  /** Self-healing for the non-atomic docs-then-index append: corpus
    * docs with ≥ 3 words but no band rows (a crash landed the docs
    * write and lost the index writes) get their index rows re-derived.
    * Normally the anti-join is empty and this is one cheap id-only
    * pass; after a crash it converges the index in the next batch. */
  def repairIndex(spark: SparkSession, store: CorpusStore): Unit = {
    val missing = spark.read.parquet(store.docsDir)
      .where(expr(s"size(split(trim(lower(text)), '\\\\s+')) >= 3"))
      .join(spark.read.parquet(store.bandsDir).select("doc_id").distinct(),
        Seq("doc_id"), "left_anti")
      .localCheckpoint(eager = true)
    if (!missing.isEmpty) appendIndexRows(missing, store)
  }

  /** Batch carving for the oracle-checked replay: the documents table
    * split into this many doc_id-range micro-batches. Shared with the
    * DuckDB twin ([[graft.ext.ExtOracleSql.streamIncrementalDedup]]) so
    * engine and oracle replay the same schedule. */
  val ReplayBatches: Int = 4

  /** Oracle-checkable REPLAY of the incremental stream dedup over a
    * closed document log (VERDICT r6 item 3 — the last spec-only
    * streaming family): the documents table is carved into
    * [[ReplayBatches]] doc_id-range micro-batches and pushed through
    * the SAME per-batch kernel the streaming sink runs
    * ([[novelAgainst]]), with the corpus/index accumulating in memory
    * exactly as the parquet store accumulates under [[run]]. Emits one
    * row per document: its batch and whether it was admitted as novel.
    *
    * The semantics this pins are the GREEDY SEQUENTIAL ones that
    * distinguish streaming ingestion from batch clustering
    * ([[graft.ext.DedupOps.clusters]]): a document is dropped iff it
    * duplicates an already-ADMITTED document (the index only ever
    * holds survivors) or an earlier-id document of its own batch —
    * so in a chain A←B←C with J(A,C) < t, batch order decides whether
    * C survives (B dropped against admitted A; C admitted unless it
    * shares a batch with B). A connected-components pass would drop C
    * everywhere; the replay must not.
    *
    * Driver loop shape: [[ReplayBatches]] sequential rounds (micro-
    * batches are inherently sequential — same class as BPE's merge
    * rounds); per round one bounded `localCheckpoint` of the novel
    * set truncates lineage, so plan depth stays O(batches). The one
    * driver scalar (max doc_id, for the batch carve) is a bounded
    * metadata pull. */
  def incrementalStreamDedupBatch(spark: SparkSession, dir: String,
      nBatches: Int = ReplayBatches, threshold: Double = 0.5): DataFrame = {
    val docs = TextOps.docs(spark, dir)
    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
    val batchSize = (maxId + nBatches) / nBatches  // = ceil((max+1)/B)
    val withBatch = docs.withColumn("batch",
      expr(s"CAST(doc_id DIV $batchSize AS INT)"))

    // empty corpus/index frames with the store's exact schemas (lazy
    // limit(0) pipelines — never executed beyond schema derivation)
    val none = docs.limit(0)
    var corpusDocs = withTextHash(none)
    var bands = DedupOps.lshBandsOf(
      DedupOps.minhashSignaturesOf(TextOps.shingleHashesOf(TextOps.shingleSetOf(none))))
    var arrays = DedupOps.docShingleArraysOf(TextOps.shingleSetOf(none))

    var novelAll: DataFrame = null
    for (b <- 0 until nBatches) {
      val batch = withBatch.where(col("batch") === b).drop("batch")
      val novel = novelAgainst(spark, batch, corpusDocs, bands, arrays, threshold)
        .localCheckpoint(eager = true)
      val shingles = TextOps.shingleSetOf(novel)
      corpusDocs = corpusDocs.unionByName(novel)
      bands = bands.unionByName(DedupOps.lshBandsOf(
        DedupOps.minhashSignaturesOf(TextOps.shingleHashesOf(shingles))))
      arrays = arrays.unionByName(DedupOps.docShingleArraysOf(shingles))
      val ids = novel.select("doc_id")
      novelAll = if (novelAll == null) ids else novelAll.unionByName(ids)
    }
    withBatch.select(col("doc_id"), col("batch"))
      .join(novelAll.withColumn("__novel", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"), col("batch"),
        coalesce(col("__novel"), lit(false)).as("is_novel"))
      .orderBy("doc_id")
  }

  /** The streaming query: micro-batches of documents filtered against
    * the store; novel docs + their index rows appended (docs first —
    * see the delivery-semantics note above and [[repairIndex]]). */
  def run(spark: SparkSession, stream: DataFrame, store: CorpusStore,
      checkpointDir: String, threshold: Double = 0.5): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        repairIndex(spark, store)
        val novel = novelDocs(spark, batch, store, threshold)
          .localCheckpoint(eager = true) // plan reused for three writes
        if (!novel.isEmpty) {
          novel.write.mode("append").parquet(store.docsDir)
          appendIndexRows(novel, store)
        }
        ()
      }
      .start()
}
