package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the JSON-props extraction and the hopping-window
  * aggregation on the sf0.001 smoke events; exact values are pinned by
  * the DuckDB twins (`etl_event_props`, `etl_events_sliding`). */
class EventShapeSpec extends SparkSpec {

  test("json extraction: parse coverage is counted, bounds sandwich the sum") {
    val p = EtlQueries.eventProps(spark, sfSmoke).cache()
    try {
      assert(p.count() > 0)
      // parse failures are counted, never dropped: n_parsed <= n_events
      assert(p.where(col("n_parsed") > col("n_events")).count() == 0)
      // the synthetic props are well-formed — full coverage here
      assert(p.where(col("n_parsed") =!= col("n_events")).count() == 0)
      // min·n <= sum <= max·n on every row
      assert(p.where(col("sum_k") < col("min_k") * col("n_parsed") ||
        col("sum_k") > col("max_k") * col("n_parsed")).count() == 0)
      // row totals reconcile with the raw event count
      val total = p.agg(sum("n_events")).first().getLong(0)
      assert(total == Star.events(spark, sfSmoke).count())
    } finally p.unpersist()
  }

  test("events(): a raw-int64 ts with no timestamp annotation fails loudly") {
    // Generator schema drift has shipped ts three ways already; the one
    // shape the engine must NOT guess at is a bare long with no parquet
    // logical type — µs-as-long misread as ns would shift every
    // event-time query 1000× while the DuckDB oracle reads the raw
    // value (ADVICE r6). events() keys the conversion on the footer
    // annotation and refuses unannotated longs.
    val dir = java.nio.file.Files.createTempDirectory("graft-rawts").toString
    try {
      spark.range(10).selectExpr(
          "id AS event_id", "id * 1000000 AS ts", "id AS user_id",
          "'view' AS event_type", "1.0 AS value", "'{}' AS props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val e = intercept[IllegalStateException](Star.events(spark, dir))
      assert(e.getMessage.contains("cannot infer the time unit"))
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("session paths: session totals reconcile, tokens are real event types") {
    // sf0.001 smoke has few sessions — every path survives the top-k,
    // so the path-table row count must equal the session count
    val paths = EtlQueries.sessionPaths(spark, sfSmoke, k = 1000000).cache()
    try {
      val nSessions = EtlQueries.eventSessions(spark, sfSmoke).count()
      val pathTotal = paths.agg(sum("n_sessions")).first().getLong(0)
      assert(pathTotal == nSessions,
        s"paths account for $pathTotal sessions, expected $nSessions")
      val types = Star.events(spark, sfSmoke).select("event_type")
        .distinct().collect().map(_.getString(0)).toSet
      paths.select("path").collect().foreach { r =>
        r.getString(0).split(">").foreach(t =>
          assert(types.contains(t), s"unknown event type '$t' in a path"))
      }
    } finally paths.unpersist()
  }

  test("hopping windows: every event covered by exactly 4 windows; tumbling is the marginal") {
    val s = EtlQueries.eventsSliding(spark, sfSmoke).cache()
    try {
      val events = Star.events(spark, sfSmoke)
      // 1h windows every 15m ⇒ each event in exactly 4 windows
      assert(s.agg(sum("n_events")).first().getLong(0) == 4 * events.count())
      // all window starts sit on the 15-minute grid
      assert(s.where(
        expr("CAST(window_start AS LONG) % 900") =!= 0).count() == 0)
      // each window's count equals the events inside [start, start+1h)
      // for a sampled window (brute force)
      val row = s.orderBy(desc("n_events")).first()
      val ws = row.getTimestamp(row.fieldIndex("window_start"))
      val et = row.getString(row.fieldIndex("event_type"))
      val brute = events.where(col("event_type") === et &&
        col("ts") >= lit(ws) &&
        col("ts") < lit(new java.sql.Timestamp(ws.getTime + 3600 * 1000L)))
        .count()
      assert(row.getLong(row.fieldIndex("n_events")) == brute)
    } finally s.unpersist()
  }
}
