package graft.streaming

import graft.SparkSpec
import graft.etl.EtlQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

case class SeqEv(user_id: Long, ts: Timestamp, event_type: String)

/** The incremental sessionizer's boundary semantics, plus real-stream
  * parity: the same kernel driven by an actual memory-source
  * foreachBatch query must land on the batch query's exact rows. The
  * full-data differential is `stream_seq_patterns`' oracle row (gated
  * against the BATCH twin's SQL). */
class StreamSeqPatternsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def emptyState(): (DataFrame, DataFrame) = {
    val none = Seq.empty[SeqEv].toDF()
    (none.select(col("user_id"), lit(0L).as("session_id"), col("event_type"),
      col("ts").as("first_ts"), col("ts").as("last_ts")),
      none.select(col("user_id"), lit(0L).as("session_id"),
        col("ts").as("last_ts")))
  }

  // three time-ordered micro-batches exercising every boundary case:
  // u1's purchase continues a cross-batch session (20-min gap), u2's
  // view starts a new one (45-min gap), u1's late view opens a fresh
  // session after silence, and u2 stays silent in batch 3 (open-state
  // retention)
  private val batches = Seq(
    Seq(SeqEv(1, ts("2024-01-01 00:00:00"), "view"),
      SeqEv(1, ts("2024-01-01 00:10:00"), "click"),
      SeqEv(2, ts("2024-01-01 00:05:00"), "click")),
    Seq(SeqEv(1, ts("2024-01-01 00:30:00"), "purchase"),
      SeqEv(2, ts("2024-01-01 00:50:00"), "view")),
    Seq(SeqEv(1, ts("2024-01-01 02:00:00"), "view")))

  private def batchTwin(): DataFrame = {
    val dir = tempDataDir("events" -> batches.flatten.toDF()
      .withColumn("event_id", monotonically_increasing_id()))
    EtlQueries.seqPatterns(spark, dir)
  }

  private def rows(df: DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap

  test("sequential folds reproduce the batch query across every session boundary case") {
    var (spans, open) = emptyState()
    for (b <- batches) {
      val r = StreamSeqPatterns.foldBatch(spans, open, b.toDF())
      spans = r._1.localCheckpoint(true)
      open = r._2.localCheckpoint(true)
    }
    val got = rows(EtlQueries.patternsFromSpans(StreamSeqPatterns.mergedSpans(spans)))
    assert(got == rows(batchTwin()))
    // and the boundary cases actually happened as designed. Sessions:
    // u1s1 = {view@0:00, click@0:10, purchase@0:30 (cross-batch)},
    // u1s2 = {view@2:00}, u2s1 = {click@0:05}, u2s2 = {view@0:50}.
    // the cross-batch merge is what makes view→purchase exist at all
    assert(got(("view", "purchase")) == ((1L, 3L, 1.0 / 3.0)))
    assert(got(("click", "purchase")) == ((1L, 2L, 0.5)))
    // u2's 45-min gap split: their click and view share no session, so
    // the only view→click evidence is u1's merged session
    assert(got(("view", "click")) == ((1L, 3L, 1.0 / 3.0)))
    assert(!got.contains(("click", "view")))
    // no type recurs within one session anywhere in the fixture
    assert(!got.contains(("view", "view")))
  }

  test("a real memory-source stream lands on the same rows as the batch query") {
    implicit val sqlCtx = spark.sqlContext
    var (spans, open) = emptyState()
    val stream = MemoryStream[SeqEv]
    val q = stream.toDF().writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-seq-ckpt").toString)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val r = StreamSeqPatterns.foldBatch(spans, open, batch)
        spans = r._1.localCheckpoint(true)
        open = r._2.localCheckpoint(true)
        ()
      }
      .start()
    try {
      for (b <- batches) { stream.addData(b); q.processAllAvailable() }
    } finally q.stop()
    assert(rows(EtlQueries.patternsFromSpans(StreamSeqPatterns.mergedSpans(spans))) == rows(batchTwin()))
  }

  test("open-state retention: a user silent for a whole batch still extends their session") {
    // u7 appears in batch 1, is silent in batch 2, returns in batch 3
    // within the gap of their batch-1 last event — one session
    var (spans, open) = emptyState()
    val seq = Seq(
      Seq(SeqEv(7, ts("2024-01-01 00:00:00"), "view")),
      Seq(SeqEv(8, ts("2024-01-01 00:05:00"), "click")),
      Seq(SeqEv(7, ts("2024-01-01 00:20:00"), "purchase")))
    for (b <- seq) {
      val r = StreamSeqPatterns.foldBatch(spans, open, b.toDF())
      spans = r._1.localCheckpoint(true)
      open = r._2.localCheckpoint(true)
    }
    val got = rows(EtlQueries.patternsFromSpans(StreamSeqPatterns.mergedSpans(spans)))
    assert(got(("view", "purchase")) == ((1L, 1L, 1.0)))
  }
}
