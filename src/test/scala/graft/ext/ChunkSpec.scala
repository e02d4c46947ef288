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

  test("boilerplate strip removes cross-doc paragraphs everywhere, keeps unique text") {
    import spark.implicits._
    val header = (1 to 16).map(i => s"h$i").mkString(" ")
    val bodyA = (1 to 20).map(i => s"a$i").mkString(" ")
    val bodyB = (1 to 16).map(i => s"b$i").mkString(" ")
    val dir = tempDataDir("documents" -> Seq(
      (0L, s"$header $bodyA"), // paras: header | a1..a16 | a17..a20
      (1L, s"$header $bodyB"), // paras: header | b1..b16
      (2L, header) //            pure boilerplate -> stripped to nothing
    ).toDF("doc_id", "text"))
    val out = ChunkOps.boilerplateStrip(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getInt(1) == 3 && out(0L).getInt(2) == 2 &&
      out(0L).getLong(3) == 20L)
    assert(out(1L).getInt(1) == 2 && out(1L).getInt(2) == 1 &&
      out(1L).getLong(3) == 16L)
    assert(out(2L).getInt(1) == 1 && out(2L).getInt(2) == 0 &&
      out(2L).getLong(3) == 0L)
    // the rebuilt text is the in-order concat of surviving paragraphs
    def h(s: String): Long = Seq(s).toDF("t")
      .select(TextOps.h32(col("t"))).head().getLong(0)
    assert(out(0L).getLong(4) == h(bodyA))
    assert(out(1L).getLong(4) == h(bodyB))
    assert(out(2L).getLong(4) == h(""))
  }

  test("boilerplate strip on the corpus: counts conserved, strip is idempotent-safe") {
    val out = ChunkOps.boilerplateStrip(spark, sfSmoke)
    val docs = TextOps.docs(spark, sfSmoke)
    assert(out.count() == docs.count()) // every doc reported, even fully stripped
    assert(out.where(col("n_kept") > col("n_paras") ||
      col("kept_tokens") < lit(0)).count() == 0)
  }
}
