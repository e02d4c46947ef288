package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Engine-level properties of the sliding-window chunker; exact
  * row values are pinned by the DuckDB oracle twin. */
class ChunkSpec extends SparkSpec {

  private lazy val chunks = ChunkOps.chunkWindows(spark, sfSmoke)
  private lazy val docTokens = TextOps.withWords(TextOps.docs(spark, sfSmoke))
    .select(col("doc_id"), size(col("ws")).as("n"))

  test("every token of every document is covered and chunk layout is exact") {
    val layout = chunks.groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"),
      min("chunk_id").as("lo"),
      max("chunk_id").as("hi"),
      max(col("start_tok") + col("n_tok") - 1).as("last_tok"))
      .join(docTokens, "doc_id")
    // ordinals contiguous from 1; the last chunk's end IS the doc end
    assert(layout.where(col("lo") =!= 1 || col("hi") =!= col("n_chunks") ||
      col("last_tok") =!= col("n")).count() == 0)
    // chunk count matches the closed form 1 + max(0, ceil((n-W)/S))
    val w = ChunkOps.Window
    val s = ChunkOps.Stride
    assert(layout.where(col("n_chunks") =!=
      expr(s"CASE WHEN n <= $w THEN 1 ELSE 1 + (n - $w + ${s - 1}) DIV $s END")).count() == 0)
  }

  test("all chunks are full-width except possibly the tail, and starts step by stride") {
    val w = ChunkOps.Window
    val s = ChunkOps.Stride
    val withMax = chunks.join(
      chunks.groupBy("doc_id").agg(max("chunk_id").as("max_id")), "doc_id")
    // non-tail chunks carry exactly `window` tokens
    assert(withMax.where(col("chunk_id") < col("max_id") && col("n_tok") =!= w).count() == 0)
    // start offsets are the arithmetic sequence 1, 1+S, 1+2S, ...
    assert(chunks.where(col("start_tok") =!= (col("chunk_id") - 1) * s + 1).count() == 0)
    // overlap of consecutive chunks is W - S for full-width pairs
    assert(w - s == 8)
  }
}
