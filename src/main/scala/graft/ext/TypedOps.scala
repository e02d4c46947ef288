package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed Dataset operators — the `KeyValueGroupedDataset` surface for
  * per-group logic that is genuinely imperative (order-sensitive scans
  * over a group's rows) rather than expressible as aggregates. The
  * batch sibling of `streaming/StatefulOps`' flatMapGroupsWithState:
  * same encoder-backed case-class API, no state timeout machinery.
  *
  * The contract `flatMapGroups` imposes — and the reason it is the
  * LAST resort after built-in aggregates/windows (SURVEY.md §7.3) — is
  * that one group's rows are materialized in memory on one task. That
  * is the right trade exactly when groups are entity-sized (a user's
  * events, a session's clicks: bounded by real-world activity, not by
  * corpus size) and the per-group computation wants random access.
  * Anything growing with the corpus per group belongs in window
  * functions instead — the DuckDB twin here IS that window
  * formulation, so the differential test also pins the equivalence of
  * the two formulations.
  */
object TypedOps {

  /** One event of one user — the group element type. */
  case class UserEvent(user_id: Long, ts: java.sql.Timestamp)

  /** Inter-event gap distribution of one user; all integer
    * milliseconds, so every value is exact cross-engine (no float
    * summation order anywhere). `median_gap_ms` is the LOWER median —
    * an element of the gap multiset, not an interpolation. */
  case class UserGaps(
      user_id: Long,
      n_events: Long,
      n_gaps: Long,
      min_gap_ms: Long,
      max_gap_ms: Long,
      median_gap_ms: Long,
      span_ms: Long)

  /** Per-user inter-arrival statistics via typed `flatMapGroups`: sort
    * the user's event times, walk consecutive differences. Users with a
    * single event have no gap distribution and emit nothing (flatMap
    * semantics — 0 rows, not a row of fabricated zeros).
    *
    * Gap values are epoch-millisecond differences of the SORTED
    * timestamp multiset, so they are invariant to tie order among
    * equal timestamps — which is what lets the window-formulated
    * oracle (whose ORDER BY ts breaks ties arbitrarily) match
    * row-for-row. */
  def userGaps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Star.events(spark, dir)
      .select(col("user_id"), col("ts"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid: Long, it: Iterator[UserEvent]) =>
        val times = it.map(_.ts.getTime).toArray
        if (times.length < 2) Iterator.empty
        else {
          java.util.Arrays.sort(times)
          val gaps = new Array[Long](times.length - 1)
          var i = 0
          while (i < gaps.length) { gaps(i) = times(i + 1) - times(i); i += 1 }
          val sortedGaps = gaps.sorted
          Iterator(UserGaps(
            user_id = uid,
            n_events = times.length.toLong,
            n_gaps = gaps.length.toLong,
            min_gap_ms = sortedGaps.head,
            max_gap_ms = sortedGaps.last,
            median_gap_ms = sortedGaps((sortedGaps.length - 1) / 2),
            span_ms = times.last - times.head))
        }
      }
      .toDF()
      .orderBy("user_id")
  }
}
