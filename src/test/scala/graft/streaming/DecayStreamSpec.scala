package graft.streaming

import graft.SparkSpec
import graft.ext.{SketchOps, TextOps}
import org.apache.spark.sql.functions._

/** Real-stream parity for the decayed heavy-hitter state: a
  * `foreachBatch` sink folding [[SketchOps.decayStep]] over an
  * AvailableNow file stream (one file per micro-batch) reaches the
  * identical final state as the oracle-checked replay — so
  * `stream_decayed_topk`'s twin checks the logic a real sink runs. */
class DecayStreamSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch decay fold matches the replay's final state") {
    // the replay's batch carving is doc_id DIV batchSize; writing one
    // parquet file PER carved batch, consumed with maxFilesPerTrigger=1
    // in name order, replays the identical batch sequence
    val docs = TextOps.docs(spark, sfSmoke)
    val maxId = docs.agg(max("doc_id")).collect()(0).getLong(0)
    val nB = SketchOps.ReplayBatches
    val batchSize = (maxId + nB) / nB
    val src = java.nio.file.Files.createTempDirectory("decay-src").toString
    (0 until nB).foreach { b =>
      docs.where(expr(s"doc_id DIV $batchSize") === b)
        .coalesce(1).write.parquet(f"$src/b$b%02d.parquet")
    }
    var state: org.apache.spark.sql.DataFrame = null
    val q = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src + "/*.parquet")
      .writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) => {
        val inc = TextOps.withWords(batch)
          .select(explode(col("ws")).as("term"))
          .groupBy("term").agg(count(lit(1)).as("c"))
        state = SketchOps.decayStep(state, inc).localCheckpoint(true)
      })
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("decay-ckpt").toString)
      .start()
    q.awaitTermination()
    val streamed = state.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val replayed = SketchOps.decayedTopkReplay(spark, sfSmoke)
      .where(col("batch") === nB - 1)
      .collect().map(r => r.getString(2) -> r.getLong(3)).toMap
    // the replay emits top-k of the final state; every emitted (term,
    // score) must equal the stream-maintained state exactly
    assert(replayed.nonEmpty)
    replayed.foreach { case (t, s) => assert(streamed.get(t).contains(s), t) }
  }
}
