package graft.streaming

import graft.SparkSpec
import graft.ext.SketchOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class QDoc(doc_id: Long, source: String, n_chars: Long)

/** Incremental quantile-sketch maintenance: a real MemoryStream run
  * must leave the folded store identical to the one-pass sketch of the
  * distinct documents; in-batch and cross-batch re-delivery are
  * no-ops under the semilattice fold; compaction never changes the
  * served answer. The corpus-level incremental ≡ batch readout is
  * hash-gated by `stream_quantile_sketch`. */
class StreamQuantileSpec extends SparkSpec {
  import spark.implicits._

  private def doc(i: Long): QDoc = QDoc(i, s"src${i % 2}", 20L + (i * 31) % 300)
  private val all = (0L until 50L).map(doc)

  private def newStore(tag: String) = StreamQuantile.QuantStore(
    java.nio.file.Files.createTempDirectory(s"graft-qsk-$tag").toString + "/sk")

  test("streamed store folds to the one-pass sketch; re-delivery and compaction are no-ops") {
    implicit val sqlCtx = spark.sqlContext
    val store = newStore("run")
    val stream = MemoryStream[QDoc]
    val q = StreamQuantile.run(spark, stream.toDF(), store,
      java.nio.file.Files.createTempDirectory("graft-qsk-ckpt").toString)
    try {
      // batch 0 with an in-batch repeat; batch 1 re-delivers 5 rows of
      // batch 0 plus the rest
      stream.addData(all.take(20) :+ all(3): _*)
      q.processAllAvailable()
      stream.addData(all.drop(20) ++ all.slice(5, 10): _*)
      q.processAllAvailable()
    } finally q.stop()

    val onePass = SketchOps.quantSketchOf(
        SketchOps.quantRows(all.toDF().select("doc_id", "source", "n_chars")))
      .orderBy("source").collect().toSeq
    assert(StreamQuantile.sketchFromStore(spark, store)
      .orderBy("source").collect().toSeq == onePass,
      "folded store must equal the one-pass sketch despite re-delivery")

    // the delta log holds one row per (source, batch) before compaction
    assert(spark.read.parquet(store.skDir).count() == 4)
    StreamQuantile.compactStore(spark, store)
    assert(spark.read.parquet(store.skDir).count() == 2)
    assert(StreamQuantile.sketchFromStore(spark, store)
      .orderBy("source").collect().toSeq == onePass,
      "compaction must not change the served sketch")
  }

  test("replay readout equals the one-shot batch readout on real data") {
    val inc = StreamQuantile.incrementalQuantileBatch(spark, sfSmoke).collect().toSeq
    val one = SketchOps.quantileSketch(spark, sfSmoke).collect().toSeq
    assert(inc == one, "incremental ≡ batch, bit-for-bit")
  }
}
