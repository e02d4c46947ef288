package graft.streaming

import graft.SparkSpec
import graft.etl.TxParquetSink
import org.apache.spark.sql.functions._

/** The streamed CDC consumer: exactly-once via the cursor-in-commit
  * discipline (redelivered ticks are no-ops, catch-up ticks fold
  * multiple source commits), tombstones for keys whose multiplicity
  * reaches zero, and convergence to the recomputed aggregate at every
  * cadence. The real-data hash gate is `stream_cdc_view`. */
class StreamCdcSpec extends SparkSpec {
  import spark.implicits._

  private def pair() = {
    val base = java.nio.file.Files.createTempDirectory("cdcspec")
    (TxParquetSink(base.toString + "/src"), TxParquetSink(base.toString + "/view"))
  }

  private def rows(rs: (String, Long, Long)*) =
    rs.toDF("month", "store_id", "cents")

  private def served(view: TxParquetSink): Map[Long, (Long, Long)] =
    StreamCdc.serve(spark, view)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("per-commit ticks converge; redelivery is a no-op; cursor rides the commit") {
    val (src, view) = pair()
    src.append(rows(("m1", 1L, 100L), ("m1", 2L, 50L)))
    assert(StreamCdc.applyTick(spark, src, view) == 2)
    assert(served(view) == Map(1L -> (100L, 1L), 2L -> (50L, 1L)))
    // the cursor is IN the view table, at the source tip
    val cursor = view.readSnapshot(spark).get
      .where(col("store_id") === StreamCdc.CursorId)
      .select("cents_total").as[Long].collect().toSeq
    assert(cursor == Seq(src.version()))
    // redelivered tick: nothing applied, no version consumed
    val v = view.version()
    assert(StreamCdc.applyTick(spark, src, view) == 0)
    assert(view.version() == v)
  }

  test("catch-up tick folds several source commits at once, same result") {
    val (src, view) = pair()
    src.append(rows(("m1", 1L, 100L), ("m1", 2L, 50L)))
    StreamCdc.applyTick(spark, src, view)
    // three commits land before the consumer wakes: append, partition
    // restatement, predicate delete
    src.append(rows(("m2", 1L, 10L)))
    src.overwritePartitions(spark, rows(("m1", 1L, 200L), ("m1", 2L, 50L)),
      Seq("month"))
    src.deleteWhere(spark, "store_id = 2")
    StreamCdc.applyTick(spark, src, view)
    // recomputed truth: store 1 = m1:200 + m2:10; store 2 deleted
    assert(served(view) == Map(1L -> (210L, 2L)))
    // store 2 is a TOMBSTONE (multiplicity 0), physically present,
    // filtered by the serving read — compact's job to erase
    val tomb = view.readSnapshot(spark).get
      .where(col("store_id") === 2L)
      .select("n_rows").as[Long].collect().toSeq
    assert(tomb == Seq(0L))
    view.compact(spark)
    assert(served(view) == Map(1L -> (210L, 2L)))
  }

  test("real tick stream: redelivered and idle ticks converge to the recomputed truth") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val (src, view) = pair()
    src.append(rows(("m1", 1L, 100L), ("m1", 2L, 50L)))
    val ticks = MemoryStream[Int]
    val q = StreamCdc.run(spark, ticks.toDF(), src, view,
      java.nio.file.Files.createTempDirectory("cdc-ckpt").toString)
    try {
      ticks.addData(1); q.processAllAvailable()
      assert(served(view) == Map(1L -> (100L, 1L), 2L -> (50L, 1L)))
      // idle ticks (no source news): views must not churn versions
      val v = view.version()
      ticks.addData(2, 3); q.processAllAvailable()
      assert(view.version() == v)
      // catch-up: two source commits between ticks
      src.overwritePartitions(spark,
        rows(("m1", 1L, 200L), ("m1", 2L, 50L)), Seq("month"))
      src.deleteWhere(spark, "store_id = 2")
      ticks.addData(4); q.processAllAvailable()
      assert(served(view) == Map(1L -> (200L, 1L)))
    } finally q.stop()
  }

  test("a key deleted and re-inserted across ticks resurrects cleanly") {
    val (src, view) = pair()
    src.append(rows(("m1", 7L, 70L)))
    StreamCdc.applyTick(spark, src, view)
    src.deleteWhere(spark, "store_id = 7")
    StreamCdc.applyTick(spark, src, view)
    assert(served(view).isEmpty)
    src.append(rows(("m2", 7L, 5L)))
    StreamCdc.applyTick(spark, src, view)
    assert(served(view) == Map(7L -> (5L, 1L)))
  }
}
