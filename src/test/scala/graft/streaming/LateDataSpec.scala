package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The late-data accounting twin vs a REAL watermarked streaming
  * aggregation: the same explicit batches are pushed through a
  * `MemoryStream` windowed count, and Spark's own per-round
  * `numRowsDroppedByWatermark` must equal the kernel's `n_late` —
  * including the window-end == watermark boundary case, which pins the
  * `<=` in the drop rule. */
class LateDataSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ms(s: String) = ts(s).getTime

  /** batch → event times. Batch 1's 09:30 row is plainly late (window
    * end 10:00 ≤ watermark 10:45); batch 2's 10:30 row sits EXACTLY on
    * the boundary (window end 11:00 == watermark 11:00). */
  private val fixture: Seq[(Int, Seq[String])] = Seq(
    0 -> Seq("2024-01-01 10:00:00", "2024-01-01 10:30:00", "2024-01-01 11:45:00"),
    1 -> Seq("2024-01-01 09:30:00", "2024-01-01 10:50:00", "2024-01-01 12:00:00"),
    2 -> Seq("2024-01-01 10:30:00", "2024-01-01 11:30:00", "2024-01-01 13:00:00"))

  test("kernel n_late == Spark's numRowsDroppedByWatermark per batch (boundary included)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TimedEvent]
    val q = LateData.windowedCounts(in.toDS())
      .writeStream.format("memory").queryName("late_counts")
      .outputMode("append").start()
    val streamedDrops = scala.collection.mutable.ArrayBuffer[Long]()
    try {
      var seen = 0L
      fixture.foreach { case (_, times) =>
        in.addData(times.zipWithIndex.map { case (t, i) => TimedEvent(ts(t), i.toLong) })
        q.processAllAvailable()
        val cum = q.recentProgress
          .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
        streamedDrops += (cum - seen)
        seen = cum
      }
    } finally q.stop()

    val batched = fixture.flatMap { case (b, times) =>
      times.map(t => (b.toLong, ms(t)))
    }.toDF("batch", "ts_ms")
    val verdicts = LateData.lateVerdicts(batched)
      .select("batch", "n_late", "watermark_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)

    // the kernel's watermark replay: 0 entering batch 0, then running
    // max of prior batch maxima minus the 1h delay
    assert(verdicts.map(_._3).toSeq ==
      Seq(0L, ms("2024-01-01 10:45:00"), ms("2024-01-01 11:00:00")))
    // batch 1 drops the 09:30 straggler; batch 2 drops the boundary row
    assert(verdicts.map(_._2).toSeq == Seq(0L, 1L, 1L))
    // and the REAL stream agrees round for round
    assert(streamedDrops.toSeq == verdicts.map(_._2).toSeq,
      s"stream drops ${streamedDrops.toSeq} != kernel ${verdicts.map(_._2).toSeq}")
  }

  test("corpus replay: conservation, monotone watermark, and a nonzero late tail") {
    val res = LateData.lateDataBatch(spark, sfSmoke).cache()
    try {
      assert(res.where(col("n_late") + col("n_admitted") =!= col("n_events")).count() == 0)
      // watermark never regresses across batches
      val wms = res.orderBy("batch").select("watermark_ms").collect().map(_.getLong(0))
      assert(wms.zip(wms.tail).forall { case (a, b) => a <= b })
      // the 2h transport jitter against a 1h delay must actually drop
      // something — an all-zero column would mean the arrival model or
      // the verdict is vacuous
      assert(res.agg(sum("n_late")).collect().head.getLong(0) > 0)
      // total conservation against the raw table
      val total = graft.etl.Star.events(spark, sfSmoke).count()
      assert(res.agg(sum("n_events")).collect().head.getLong(0) == total)
    } finally res.unpersist()
  }
}
