package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Ev(ts: Timestamp, event_type: String, value: Double)
case class HEv(user_id: Long, event_type: String)
case class Tx(order_id: Long, order_date_raw: String, product_id: Long,
    quantity_ordered: Int, customer_id: Long, time_id: String)

/** Stream/batch parity — the Structured Streaming guarantee the
  * reference's hand-rolled producer/consumer pipeline lacks (SURVEY.md
  * §2.10): the same transforms over the same records yield the same
  * warehouse state regardless of micro-batch boundaries. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed aggregation: streaming result equals batch result") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Ev(ts("2024-01-01 10:05:00"), "view", 1.0),
      Ev(ts("2024-01-01 10:55:00"), "view", 2.0),
      Ev(ts("2024-01-01 11:05:00"), "buy", 10.0),
      Ev(ts("2024-01-01 11:45:00"), "view", 3.0),
      Ev(ts("2024-01-01 12:30:00"), "buy", 5.0))

    val stream = MemoryStream[Ev]
    val q = StreamETL.hourlyAgg(stream.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    stream.addData(events.take(2))
    q.processAllAvailable()
    stream.addData(events.drop(2)) // second micro-batch
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("hourly")
      .orderBy("window_start", "event_type").collect().toSeq
    val batch = StreamETL.hourlyAgg(events.toDF())
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed == batch)
    assert(streamed.size == 4) // (10h view)(11h buy)(11h view)(12h buy)
  }

  test("HLL sketch folded per micro-batch equals the one-shot batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    // distinct users skewed across two event types, delivered in 3 batches
    val evs = (1L to 300L).map(u => HEv(u, if (u % 3 == 0) "view" else "click"))
    val stream = MemoryStream[HEv]
    // the stored synopsis a foreachBatch sink maintains: bucket-wise MAX
    // (collected per batch — the micro-batch frame is only valid inside
    // the callback)
    val acc = scala.collection.mutable.Map[(String, Int), Int]()
    val q = stream.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[HEv], _: Long) =>
        graft.ext.SketchOps.hllPerBucket(batch.toDF()).collect().foreach { r =>
          val k = (r.getString(0), r.getInt(1))
          acc(k) = math.max(acc.getOrElse(k, 0), r.getInt(2))
        }
      }.start()
    evs.grouped(100).foreach { g => stream.addData(g); q.processAllAvailable() }
    q.stop()
    val oneShot = graft.ext.SketchOps.hllPerBucket(evs.toDF())
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(acc.toMap == oneShot,
      "streamed bucket-max sketch diverged from the one-shot sketch")
  }

  test("windowed aggregation supports append mode and evicts finalized windows") {
    // Regression: grouping by window(ts).start instead of the window
    // struct strips watermark metadata — append mode then throws
    // STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION and state never evicts.
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = StreamETL.hourlyAgg(stream.toDF())
      .writeStream.format("memory").queryName("hourly_append")
      .outputMode("append").start() // throws at start() if watermark is lost
    stream.addData(Ev(ts("2024-01-01 10:05:00"), "view", 1.0))
    q.processAllAvailable()
    // advance event time far past the 2h watermark → 10:00 window finalizes
    stream.addData(Ev(ts("2024-01-02 09:00:00"), "view", 2.0))
    q.processAllAvailable()
    stream.addData(Ev(ts("2024-01-02 09:30:00"), "view", 3.0))
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("hourly_append").collect()
    assert(emitted.exists(_.getTimestamp(0) == ts("2024-01-01 10:00:00")))
  }

  test("full ETL: MESHJOIN + measures + idempotent fact upsert under replay") {
    implicit val sqlCtx = spark.sqlContext
    val products = Seq((100L, "widget", BigDecimal("2.50")), (200L, "gadget", BigDecimal("4.00")))
      .toDF("product_id", "product_name", "price")
    val customers = Seq((7L, "alice"), (8L, "bob")).toDF("customer_id", "customer_name")

    val txs = Seq(
      Tx(1L, "2024-03-05 9:05:00", 100L, 4, 7L, "t1"),
      Tx(2L, "2024-03-09 12:00:00", 200L, 2, 8L, "t2"),
      Tx(2L, "2024-03-09 12:00:00", 200L, 2, 8L, "t2"), // duplicate delivery
      Tx(3L, "not-a-date", 100L, 1, 7L, "t3"), // Q-b: dropped
      Tx(4L, "2024-03-10 08:00:00", 999L, 1, 7L, "t4")) // no product match (Q-c)

    val stream = MemoryStream[Tx]
    val checkpoint = java.nio.file.Files.createTempDirectory("ckpt").toString
    stream.addData(txs.take(2))
    stream.addData(txs.drop(2)) // replay of order 2 lands in a later batch
    val fact = StreamETL.runTransactionsToFact(spark, stream.toDF(), products, customers, checkpoint)

    val rows = fact.select("order_id", "total_units_sold", "total_revenue", "is_weekend")
      .orderBy("order_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // 2 deduped, 3 dropped, 4 unmatched
    assert(rows(0).getInt(1) == 4)
    assert(rows(0).getDecimal(2) == new java.math.BigDecimal("10.00")) // 4 × 2.50
    assert(!rows(0).getBoolean(3)) // Tuesday
    assert(rows(1).getBoolean(3)) // Saturday
  }

  test("stream and batch paths produce the same fact table") {
    implicit val sqlCtx = spark.sqlContext
    val products = Seq((100L, "widget", BigDecimal("2.50"))).toDF("product_id", "product_name", "price")
    val customers = Seq((7L, "alice")).toDF("customer_id", "customer_name")
    val txs = (1 to 20).map(i =>
      Tx(i.toLong, f"2024-03-${i % 28 + 1}%02d 10:00:00", 100L, i, 7L, s"t$i"))

    val stream = MemoryStream[Tx]
    txs.grouped(7).foreach(stream.addData(_)) // uneven micro-batches
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt2").toString
    val streamed = StreamETL.runTransactionsToFact(spark, stream.toDF(), products, customers, ckpt)

    val batch = Upserts_firstWins(
      StreamETL.withMeasures(StreamETL.meshJoin(
        StreamETL.cleanTransactions(txs.toDF()), products, customers)))

    val key = Seq("order_id", "quantity_ordered", "total_revenue")
    assert(streamed.select(key.head, key.tail: _*).orderBy("order_id").collect().toSeq ==
      batch.select(key.head, key.tail: _*).orderBy("order_id").collect().toSeq)
  }

  private def Upserts_firstWins(df: org.apache.spark.sql.DataFrame) =
    graft.etl.Upserts.firstWins(df, Seq("order_id"), Seq("product_id", "customer_id"))
}
