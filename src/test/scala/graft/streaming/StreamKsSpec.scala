package graft.streaming

import graft.SparkSpec
import graft.etl.EtlQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class KsEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** The streaming KS monitor: a real MemoryStream run through the
  * foreachBatch count-log sink must read back the exact batch KS over
  * the same events, however the rows were split across batches; a
  * planted arm shift moves the statistic. The prefix-evolution gate is
  * the oracle row (`stream_ks_drift`). */
class StreamKsSpec extends SparkSpec {
  import spark.implicits._

  private def mk(id: Long, user: Long, typ: String, value: Double) =
    KsEvent(id, java.sql.Timestamp.valueOf(f"2024-01-${1 + (id % 28).toInt}%02d 10:00:00"),
      user, typ, value, "{}")

  test("foreachBatch count log replays to the exact batch KS, any batch split") {
    implicit val sqlCtx = spark.sqlContext
    // arm A (even users): values 1..10; arm B (odd): values 11..20 for
    // type "buy" (full separation -> KS 1e6); identical arms for "view"
    val buys = (1L to 10L).map(i => mk(i, 2 * i, "buy", i.toDouble)) ++
      (1L to 10L).map(i => mk(100 + i, 2 * i + 1, "buy", 10.0 + i))
    val views = (1L to 10L).flatMap(i => Seq(
      mk(200 + i, 2 * i, "view", i.toDouble),
      mk(300 + i, 2 * i + 1, "view", i.toDouble)))
    val all = buys ++ views
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft-ks-state").toString + "/counts"
    val stream = MemoryStream[KsEvent]
    val q = StreamKs.run(spark, stream.toDF(), stateDir,
      java.nio.file.Files.createTempDirectory("graft-ks-ckpt").toString)
    try {
      val (b1, b2) = all.splitAt(13) // deliberately uneven, type-mixing split
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = StreamKs.ksOfStore(spark, stateDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val batch = EtlQueries.ksFromCounts(
        StreamKs.countsOf(all.toDF()), "event_type").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    // the planted shift reads fully drifted; the identical arms read zero
    assert(streamed("buy")._4 == 1000000L)
    assert(streamed("view")._4 == 0L)
  }
}
