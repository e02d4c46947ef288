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
  * all 4 bands is admitted (LSH false negative, probability (1−j³)⁴).
  * Exactly-once: re-delivered batches re-verify against the index and
  * their docs come back as duplicates of themselves — idempotent by the
  * same anti-join argument as [[WarehouseSink.streamUpsert]], provided
  * batch appends land before the checkpoint commit (foreachBatch's
  * at-least-once contract).
  */
object StreamDedup {

  /** Storage layout for the growing corpus + its LSH index. */
  final case class CorpusStore(docsDir: String, bandsDir: String, arraysDir: String)

  /** One-time bootstrap: seed the store from an existing deduplicated
    * corpus table (its docs, band index, and verification arrays). */
  def bootstrap(spark: SparkSession, sourceDir: String, store: CorpusStore): Unit = {
    TextOps.docs(spark, sourceDir).write.mode("overwrite").parquet(store.docsDir)
    DedupOps.lshBands(spark, sourceDir).write.mode("overwrite").parquet(store.bandsDir)
    DedupOps.docShingleArraysOf(TextOps.shingleSet(spark, sourceDir))
      .write.mode("overwrite").parquet(store.arraysDir)
  }

  /** Filters one batch of documents against the store; returns the
    * NOVEL rows (batch-deduped, not near-dup of any stored doc).
    * Factored out of the streaming sink so the logic is testable (and
    * usable) as a batch operator too. */
  def novelDocs(spark: SparkSession, batch: DataFrame, store: CorpusStore,
      threshold: Double = 0.5): DataFrame = {
    // 1. in-batch exact first-wins by id (stream may repeat doc ids)
    val deduped = batch.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("text")))
      .where(col("rn") === 1).drop("rn")
    val shingles = TextOps.shingleSetOf(deduped)
    val batchBands = DedupOps.lshBandsOf(
      DedupOps.minhashSignaturesOf(TextOps.shingleHashesOf(shingles)))
    val batchArrays = DedupOps.docShingleArraysOf(shingles)
    val indexBands = spark.read.parquet(store.bandsDir)
      .select(col("doc_id").as("corpus_id"), col("band"), col("key"))
    val corpusArrays = spark.read.parquet(store.arraysDir)
      .select(col("doc_id").as("corpus_id"), col("n").as("nc"), col("arr").as("ac"))
    // 3. candidates: batch docs sharing any band bucket with the corpus
    val cand = batchBands.join(indexBands, Seq("band", "key"))
      .select("doc_id", "corpus_id").distinct()
    // 4. exact verification restricted to candidates
    val dupIds = cand
      .join(batchArrays, "doc_id")
      .join(corpusArrays, "corpus_id")
      .withColumn("shared", size(array_intersect(col("arr"), col("ac"))))
      .where(expr(s"CAST(shared AS DOUBLE) / (n + nc - shared) >= $threshold"))
      .select("doc_id").distinct()
    // 5. novel = batch minus verified duplicates
    deduped.join(dupIds, Seq("doc_id"), "left_anti")
  }

  /** The streaming query: micro-batches of documents filtered against
    * the store; novel docs + their index rows appended. */
  def run(spark: SparkSession, stream: DataFrame, store: CorpusStore,
      checkpointDir: String, threshold: Double = 0.5): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val novel = novelDocs(spark, batch, store, threshold)
          .localCheckpoint(eager = true) // plan reused for three writes
        if (!novel.isEmpty) {
          val shingles = TextOps.shingleSetOf(novel)
          novel.write.mode("append").parquet(store.docsDir)
          DedupOps.lshBandsOf(
              DedupOps.minhashSignaturesOf(TextOps.shingleHashesOf(shingles)))
            .write.mode("append").parquet(store.bandsDir)
          DedupOps.docShingleArraysOf(shingles)
            .write.mode("append").parquet(store.arraysDir)
        }
        ()
      }
      .start()
}
