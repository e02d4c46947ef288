package graft.ext

import graft.SparkSpec
import java.sql.Timestamp

/** Pins [[TemporalOps.asofJoin]] semantics at the edges the oracle query
  * can't isolate: inclusive boundary, no-preceding-row → null payload,
  * and per-key independence. */
class TemporalSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join attaches the latest right row at or before each left ts") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-05 00:00:00")), // after both orders for key 10
      (2L, 10L, ts("2024-01-03 00:00:00")), // exactly at order B → inclusive
      (3L, 10L, ts("2024-01-01 12:00:00")), // between A and B → A
      (4L, 20L, ts("2024-01-02 00:00:00")), // other key, own history
      (5L, 30L, ts("2024-01-09 00:00:00"))  // key with no right rows → null
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), "A"),
      (10L, ts("2024-01-03 00:00:00"), "B"),
      (20L, ts("2024-01-01 00:00:00"), "X"),
      (20L, ts("2024-01-04 00:00:00"), "Y")  // after event 4 → must not match
    ).toDF("k2", "rts", "tag")
    val out = TemporalOps.asofJoin(left, right, "k", "k2", "ts", "rts", Seq("tag"))
      .orderBy("event_id")
      .select("event_id", "tag").as[(Long, Option[String])].collect().toSeq
    assert(out === Seq(
      (1L, Some("B")), (2L, Some("B")), (3L, Some("A")),
      (4L, Some("X")), (5L, None)))
  }

  test("events-orders asof enriches every event deterministically") {
    val out = TemporalOps.eventsWithLatestOrder(spark, sfSmoke).cache()
    try {
      assert(out.count() > 0)
      // testdata property: every user has at least one order before the
      // events window (orders span 1995-2001, events 2024) → no nulls
      assert(out.where("last_order_key IS NULL").count() === 0)
      // as-of invariant: the attached order never postdates the event
      // (last_order_date is NTZ, ts is LTZ; the session is pinned UTC so
      // the cast compares the same instant)
      assert(out.where("CAST(last_order_date AS TIMESTAMP) > ts").count() === 0)
    } finally out.unpersist()
  }
}
