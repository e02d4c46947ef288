package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** First-principles fixtures for the schema-trust profilers
  * (`etl_key_candidates`, `etl_fd_audit`) and the gapped
  * sequential-pattern miner (`etl_seq_patterns`); the real-data values
  * are pinned by their DuckDB twins. */
class SchemaTrustSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** A fixture dir whose lineitem breaks BOTH expected keys (one exact
    * duplicate of (orderkey, linenumber)) while orders and events keep
    * theirs. */
  private lazy val dir: String = {
    import spark.implicits._
    val lineitem = Seq(
      (1L, 1, 10L, 100L, "N"), (1L, 2, 11L, 100L, "R"),
      (1L, 2, 11L, 100L, "R"), // the duplicate line the profiler must surface
      (2L, 1, 10L, 101L, "N"))
      .toDF("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_returnflag")
    val orders = Seq(
      (1L, 5L, "HIGH"), (2L, 5L, "LOW"), (3L, 6L, "LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val events = Seq(
      // user 1, session 1: view → click → view (29-min gaps keep one session)
      (1L, 1L, ts("2024-01-01 00:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 00:29:00"), "click"),
      (3L, 1L, ts("2024-01-01 00:58:00"), "view"),
      // user 1, session 2 (31-min gap): click only — no view pairs here
      (4L, 1L, ts("2024-01-01 01:29:00.000001"), "click"),
      // user 2, one session: click BEFORE view — the (view→click) rule
      // must not count it
      (5L, 2L, ts("2024-01-01 00:00:00"), "click"),
      (6L, 2L, ts("2024-01-01 00:10:00"), "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    tempDataDir("lineitem" -> lineitem, "orders" -> orders,
      "events" -> events)
  }

  test("key discovery: the duplicated line sinks every lineitem candidate, true keys survive") {
    val rows = EtlQueries.keyCandidates(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    // (orderkey, linenumber): 4 rows, 3 distinct, one combo seen twice
    assert(rows("lineitem(l_orderkey,l_linenumber)") == ((4L, 3L, 1L, 2L, false)))
    // even the widest candidate cannot absorb an exact duplicate row
    assert(!rows("lineitem(l_orderkey,l_linenumber,l_partkey)")._5)
    assert(rows("orders(o_orderkey)") == ((3L, 3L, 0L, 1L, true)))
    // o_custkey 5 covers two orders: not a key, max_dup 2
    assert(rows("orders(o_custkey)") == ((3L, 2L, 1L, 2L, false)))
    assert(rows("events(event_id)")._5)
  }

  test("fd audit: a key lhs always holds; a many-to-many lhs reports its violators") {
    val rows = EtlQueries.fdAudit(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    // key lhs: three orders, three custkeys bound once each
    assert(rows("orders: o_orderkey -> o_custkey") == ((3L, 0L, 1L, true)))
    // custkey 5 → {HIGH, LOW}: exactly one violating lhs, fan-out 2
    assert(rows("orders: o_custkey -> o_orderpriority") == ((2L, 1L, 2L, false)))
    // order 1 mixes flags N and R; order 2 is single-flag
    assert(rows("lineitem: l_orderkey -> l_returnflag") == ((2L, 1L, 2L, false)))
    // part 10 ships from suppliers 100 and 101; part 11 from 100 only
    assert(rows("lineitem: l_partkey -> l_suppkey") == ((2L, 1L, 2L, false)))
  }

  test("seq patterns: subsequence support counts sessions, respects order, gaps, and strictness") {
    val rows = EtlQueries.seqPatterns(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // view→click: only user 1 session 1 (user 2 has click BEFORE view);
    // sessions containing view: u1s1, u2 — confidence 1/2
    assert(rows(("view", "click")) == ((1L, 2L, 0.5)))
    // click→view: u1s1 (click 00:29 < view 00:58) and u2 — 2 of 3
    // click-bearing sessions (u1s2 has no view at all)
    assert(rows(("click", "view")) == ((2L, 3L, 2.0 / 3.0)))
    // view→view: u1s1 has two views at distinct times; u2 has one view —
    // a type must RECUR to pair with itself
    assert(rows(("view", "view")) == ((1L, 2L, 0.5)))
    // click→click never happens (each session has at most one click)
    assert(!rows.contains(("click", "click")))
    // the 31-minute gap split u1's click into its own session: that
    // session contributes to the antecedent denominator only
    assert(rows(("click", "view"))._2 == 3L)
  }

  test("seq patterns: real-data marginals agree with the transition matrix's reach bound") {
    // adjacent transitions are a subset of gapped subsequences: every
    // (a,b) adjacency inside one session implies a <… b, so each pair's
    // subsequence support must cover at least the sessions where the
    // adjacency appears — spot-check the global sanity: supports are
    // positive, confidence ≤ 1, and (a,b) support ≤ sessions with a
    val df = EtlQueries.seqPatterns(spark, sfSmoke).cache()
    try {
      assert(df.count() > 0)
      assert(df.where(col("n_sessions_both") >
        col("n_sessions_antecedent")).count() == 0)
      assert(df.where(col("confidence") <= 0 ||
        col("confidence") > 1).count() == 0)
    } finally df.unpersist()
  }
}
