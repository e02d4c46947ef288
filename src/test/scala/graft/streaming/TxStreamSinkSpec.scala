package graft.streaming

import graft.SparkSpec
import graft.etl.TxParquetSink
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The exactly-once streaming load: micro-batches written through
  * partition overwrite are idempotent under Spark's foreachBatch retry
  * semantics — a replayed batch (or a re-run backfill of an old batch)
  * converges to the same table instead of double-counting. */
class TxStreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private def sink() = TxParquetSink(
    Files.createTempDirectory("txstream").toString + "/t")

  private def dailyAgg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("day").agg(
      count(lit(1)).as("n"), sum("amount").as("total"))

  private def tableState(t: TxParquetSink): Seq[(String, Long, Long)] =
    t.readSnapshot(spark)
      .map(_.orderBy("day").as[(String, Long, Long)].collect().toSeq)
      .getOrElse(Nil)

  test("a real stream loads per-batch; a retried batch changes nothing") {
    implicit val sqlCtx = spark.sqlContext
    val t = sink()
    val in = MemoryStream[(String, Long)]
    val q = in.toDS().toDF("day", "amount")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        TxStreamSink.overwriteBatch(t, Seq("day"))(dailyAgg(b), id)
      }
      .start()
    try {
      // batch 0: day1 + day2, complete
      in.addData(("d1", 10L), ("d1", 5L), ("d2", 7L))
      q.processAllAvailable()
      assert(tableState(t) == Seq(("d1", 2L, 15L), ("d2", 1L, 7L)))
      // batch 1: day3 plus a COMPLETE restatement reload of day2
      in.addData(("d2", 9L), ("d2", 1L), ("d3", 4L))
      q.processAllAvailable()
      assert(tableState(t) == Seq(("d1", 2L, 15L), ("d2", 2L, 10L), ("d3", 1L, 4L)))
    } finally q.stop()
    val v = t.version()
    // Spark redelivers batch 1 after a sink failure: the foreachBatch
    // body runs AGAIN with the same content — replace converges
    TxStreamSink.overwriteBatch(t, Seq("day"))(
      dailyAgg(Seq(("d2", 9L), ("d2", 1L), ("d3", 4L)).toDF("day", "amount")), 1L)
    assert(tableState(t) == Seq(("d1", 2L, 15L), ("d2", 2L, 10L), ("d3", 1L, 4L)),
      "a retried batch must not change the table")
    assert(t.version() == v + 1, "the retry is its own atomic commit")
    // an append sink would have doubled d2/d3 here — that is the bug
    // this pattern exists to exclude
  }

  test("stats-recording batches: the redelivered commit takes metadata credit") {
    val t = sink()
    val write = TxStreamSink.overwriteBatchWithStats(t, Seq("day"), Seq("day")) _
    def batch(days: Range) =
      days.map(d => (f"2024-01-$d%02d", d.toLong)).toDF("day", "amount")
    write(batch(1 to 7), 0L)
    write(batch(8 to 14), 1L)
    write(batch(15 to 21), 2L)
    write(batch(22 to 30), 3L)
    write(batch(8 to 14), 1L) // the at-least-once redelivery
    val (n, full, boundary, excluded) =
      t.countWhereAudit(spark, "day >= '2024-01-08' AND day <= '2024-01-21'")
    assert(n == 14L, s"exactly-once count wrong: $n")
    // the redelivered commit is the newest mask — its rows take
    // manifest credit; the superseded week-2 and the boundary week-3
    // scan through the masks; weeks 1 and 4 are excluded by stats
    assert((full, boundary, excluded) == ((1, 2, 2)),
      s"classification drifted: ($full, $boundary, $excluded)")
    // pruned read agrees with the unpruned filter through the masks
    assert(t.readSnapshotWhere(spark,
      "day >= '2024-01-08' AND day <= '2024-01-21'").get.count() == 14L)
  }

  test("the completeness contract: a half-partition batch replaces the other half away") {
    val t = sink()
    TxStreamSink.overwriteBatch(t, Seq("day"))(
      dailyAgg(Seq(("d1", 10L), ("d1", 5L)).toDF("day", "amount")), 0L)
    // a later batch carrying only PART of d1's data (a misaligned
    // source) replaces the whole partition — the documented
    // replaceWhere semantic the contract warns about
    TxStreamSink.overwriteBatch(t, Seq("day"))(
      dailyAgg(Seq(("d1", 1L)).toDF("day", "amount")), 1L)
    assert(tableState(t) == Seq(("d1", 1L, 1L)))
  }

  test("schema evolution: a commit adding a column reads back null-filled") {
    val t = sink()
    t.append(Seq(("d1", 5L)).toDF("day", "amount"))
    t.append(Seq(("d2", 7L, "web")).toDF("day", "amount", "channel"))
    val rows = t.readSnapshot(spark).get.orderBy("day")
      .select("day", "amount", "channel")
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.get(2))))
    assert(rows.toSeq == Seq(("d1", 5L, None), ("d2", 7L, Some("web"))),
      "old rows must null-fill the evolved column")
    // overwrite still resolves across the evolved schema
    t.overwritePartitions(spark, Seq(("d1", 6L, "store")).toDF("day", "amount", "channel"),
      Seq("day"))
    assert(t.readSnapshot(spark).get.where($"day" === "d1")
      .select("channel").as[String].collect().toSeq == Seq("store"))
  }
}
