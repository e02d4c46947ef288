package graft.streaming

import graft.SparkSpec
import graft.ext.TextOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Bm25Doc(doc_id: Long, text: String)

/** Incremental BM25 index maintenance: a real MemoryStream run must
  * serve rankings bit-identical to the batch-built index over the same
  * documents; re-delivery is a no-op; df-delta folding and compaction
  * preserve the index; repair heals a crash between the postings and
  * registry appends. The corpus-level equivalence is hash-gated by
  * `stream_bm25_index` (registered against the BATCH twin). */
class StreamBm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    Bm25Doc(0L, "rare common filler words for the query document"),
    Bm25Doc(1L, "common terms appear here together with filler"),
    Bm25Doc(2L, "rare appearance in a second document with padding"),
    Bm25Doc(3L, "entirely unrelated content about engines and storage"),
    Bm25Doc(4L, "more common filler text that mentions the query words"))

  private def newStore(tag: String) = {
    val root = java.nio.file.Files.createTempDirectory(s"graft-bm25-$tag").toString
    StreamBm25.IndexStore(s"$root/postings", s"$root/dlen", s"$root/df")
  }

  test("streamed index serves rankings identical to the batch index; redelivery is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val store = newStore("run")
    // bootstrap with the first two docs
    val bootDir = tempDataDir("documents" ->
      corpus.take(2).toDF().withColumn("lang", lit("en"))
        .withColumn("source", lit("web"))
        .withColumn("n_chars", length(col("text")).cast("long")))
    StreamBm25.bootstrap(spark, bootDir, store)

    val stream = MemoryStream[Bm25Doc]
    val q = StreamBm25.run(spark, stream.toDF(), store,
      java.nio.file.Files.createTempDirectory("graft-bm25-ckpt").toString)
    try {
      stream.addData(corpus(2), corpus(3), corpus(3)) // in-batch id repeat
      q.processAllAvailable()
      stream.addData(corpus(2), corpus(4)) // doc 2 redelivered across batches
      q.processAllAvailable()
    } finally q.stop()

    // registry holds each doc exactly once
    val reg = spark.read.parquet(store.dlenDir).groupBy("doc_id").count()
    assert(reg.where(col("count") > 1).isEmpty)
    assert(reg.count() == 5)

    val served = StreamBm25.scoreFromStore(spark, store, k = 10, nQueries = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val batch = TextOps.bm25TopKOf(corpus.toDF("doc_id", "text"), 10, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(served.toSeq == batch.toSeq,
      "incrementally maintained index must serve the batch index's rankings")

    // df compaction preserves the served rankings and folds the log
    StreamBm25.compactDf(spark, store)
    val afterCompact = StreamBm25.scoreFromStore(spark, store, k = 10, nQueries = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(afterCompact.toSeq == batch.toSeq)
    val dfRows = spark.read.parquet(store.dfDir).groupBy("term").count()
    assert(dfRows.where(col("count") > 1).isEmpty, "compaction left delta rows")
    // the rename-swap leaves no scratch directories behind
    val parent = java.nio.file.Paths.get(store.dfDir).getParent
    val leftovers = java.nio.file.Files.list(parent).iterator()
    while (leftovers.hasNext) {
      val p = leftovers.next().getFileName.toString
      assert(!p.contains(".compact") && !p.contains(".old"),
        s"compactDf left scratch dir $p")
    }
  }

  test("repair heals orphan postings from a crash before the registry append") {
    val store = newStore("repair")
    val bootDir = tempDataDir("documents" ->
      corpus.take(3).toDF().withColumn("lang", lit("en"))
        .withColumn("source", lit("web"))
        .withColumn("n_chars", length(col("text")).cast("long")))
    StreamBm25.bootstrap(spark, bootDir, store)
    val before = StreamBm25.scoreFromStore(spark, store, k = 10, nQueries = 2)
      .collect().toSeq

    // simulate the crash: postings + df appended for doc 9, registry not
    val orphan = Seq((9L, "orphan words never registered")).toDF("doc_id", "text")
    val words = TextOps.withWords(orphan)
      .select(col("doc_id"), explode(col("ws")).as("term"))
    val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    tf.write.mode("append").parquet(store.postingsDir)
    tf.groupBy("term").agg(count(lit(1)).as("df_delta"))
      .write.mode("append").parquet(store.dfDir)

    // scoring filters through the registry even before repair
    assert(StreamBm25.scoreFromStore(spark, store, k = 10, nQueries = 2)
      .collect().toSeq == before)
    StreamBm25.repairIndex(spark, store)
    // after repair the stores themselves are clean again
    assert(spark.read.parquet(store.postingsDir)
      .where(col("doc_id") === 9L).isEmpty)
    assert(StreamBm25.dfOf(spark, store)
      .join(spark.read.parquet(store.postingsDir)
          .groupBy("term").agg(count(lit(1)).as("pdf")), "term")
      .where(col("df") =!= col("pdf")).isEmpty,
      "repaired df log must equal postings-derived df")
    assert(StreamBm25.scoreFromStore(spark, store, k = 10, nQueries = 2)
      .collect().toSeq == before)
  }
}
