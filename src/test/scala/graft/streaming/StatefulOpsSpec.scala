package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** The abandoned-cart state machine: alerts only for quiet-without-
  * purchase sessions, keyed per user, driven by event-time timeouts
  * (so results replay identically — no wall clock anywhere). */
class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("browsing session with no purchase alerts after the gap; purchased one stays silent") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[CartEvent]
    val out = StatefulOps.abandonedCarts(in.toDS(), gapMinutes = 30, watermark = "0 seconds")
    val q = out.toDF().writeStream.format("memory").queryName("carts")
      .outputMode("append").start()
    try {
      // user 1 browses twice, never buys; user 2 browses then buys
      in.addData(
        CartEvent(1L, ts("2024-01-01 10:00:00"), "view", 5.0),
        CartEvent(1L, ts("2024-01-01 10:10:00"), "cart_add", 7.5),
        CartEvent(2L, ts("2024-01-01 10:00:00"), "view", 3.0),
        CartEvent(2L, ts("2024-01-01 10:05:00"), "purchase", 40.0))
      q.processAllAvailable()
      // advance the watermark far past both sessions' gap windows
      in.addData(CartEvent(9L, ts("2024-01-01 12:00:00"), "view", 0.0))
      q.processAllAvailable()
      // and once more so the timeout emissions reach the sink
      in.addData(CartEvent(9L, ts("2024-01-01 12:00:01"), "view", 0.0))
      q.processAllAvailable()

      val got = spark.table("carts")
        .select("user_id", "n_events", "total_value", "last_ts")
        .as[(Long, Long, Double, Timestamp)].collect().toSet
      assert(got === Set((1L, 2L, 12.5, ts("2024-01-01 10:10:00"))))
    } finally q.stop()
  }

  test("backfill determinism: two sessions arriving in ONE batch still split on the gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[CartEvent]
    val out = StatefulOps.abandonedCarts(in.toDS(), gapMinutes = 30, watermark = "0 seconds")
    val q = out.toDF().writeStream.format("memory").queryName("carts3")
      .outputMode("append").start()
    try {
      // a replay delivers the whole history at once: the 09:00 browse
      // session and the 12:00 purchase session are separated by event
      // time only — the alert for session 1 must not depend on them
      // having arrived in different micro-batches
      in.addData(
        CartEvent(3L, ts("2024-01-01 09:00:00"), "view", 4.0),
        CartEvent(3L, ts("2024-01-01 09:05:00"), "cart_add", 6.0),
        CartEvent(3L, ts("2024-01-01 12:00:00"), "view", 1.0),
        CartEvent(3L, ts("2024-01-01 12:10:00"), "purchase", 30.0))
      q.processAllAvailable()
      val got = spark.table("carts3")
        .select("user_id", "n_events", "total_value", "last_ts")
        .as[(Long, Long, Double, Timestamp)].collect().toSet
      assert(got === Set((3L, 2L, 10.0, ts("2024-01-01 09:05:00"))))
    } finally q.stop()
  }

  test("a returning user starts a fresh session after an alert") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[CartEvent]
    val out = StatefulOps.abandonedCarts(in.toDS(), gapMinutes = 30, watermark = "0 seconds")
    val q = out.toDF().writeStream.format("memory").queryName("carts2")
      .outputMode("append").start()
    try {
      // the timeout must FIRE (watermark past last+gap) before the user
      // returns — otherwise the return event merges into the old state;
      // user 9 only advances the watermark. The watermark a batch sees
      // is the one computed at the END of the previous batch, hence the
      // extra nudge batches.
      // user 9 only advances the watermark; "purchase" events so their
      // own gap-split sessions never alert
      in.addData(CartEvent(5L, ts("2024-01-01 09:00:00"), "view", 1.0))
      q.processAllAvailable()
      in.addData(CartEvent(9L, ts("2024-01-01 10:30:00"), "purchase", 0.0))
      q.processAllAvailable()
      in.addData(CartEvent(9L, ts("2024-01-01 10:31:00"), "purchase", 0.0))
      q.processAllAvailable() // watermark 10:30 ≥ 09:30 → session 1 alerts
      in.addData(CartEvent(5L, ts("2024-01-01 11:00:00"), "view", 2.0))
      q.processAllAvailable() // fresh state for user 5
      in.addData(CartEvent(9L, ts("2024-01-01 13:00:00"), "purchase", 0.0))
      q.processAllAvailable()
      in.addData(CartEvent(9L, ts("2024-01-01 13:01:00"), "purchase", 0.0))
      q.processAllAvailable() // watermark 13:00 ≥ 11:30 → session 2 alerts

      val alerts = spark.table("carts2")
        .select("user_id", "total_value").as[(Long, Double)].collect().toList.sorted
      // two separate abandonments, with the second session's own total
      assert(alerts === List((5L, 1.0), (5L, 2.0)))
    } finally q.stop()
  }
}
