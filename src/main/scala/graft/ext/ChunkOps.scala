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
}
