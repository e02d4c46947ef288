package graft.etl

import graft.SparkSpec

/** Pins maintained ≡ recomputed for the incremental hourly rollup (the
  * cross-engine differential does the same against DuckDB; this is the
  * fast in-engine twin) and that the default cutoff actually exercises
  * the partial-merge arithmetic. */
class IncrementalSpec extends SparkSpec {

  test("merged partials equal the full recompute, row for row") {
    val inc = EtlQueries.incrementalHourly(spark, sfSmoke).collect()
    val full = EtlQueries.eventsHourly(spark, sfSmoke).collect()
    assert(inc.toSeq === full.toSeq)
  }

  test("the straddled window merges partials from both sides") {
    val cutoff = "2024-01-24 00:30:00"
    val events = Star.events(spark, sfSmoke)
    val straddled = events.where(
      s"ts >= TIMESTAMP'2024-01-24 00:00:00' AND ts < TIMESTAMP'2024-01-24 01:00:00'")
    assert(straddled.where(s"ts < TIMESTAMP'$cutoff'").count() > 0,
      "no stored-side events in the straddled hour — cutoff exercises nothing")
    assert(straddled.where(s"ts >= TIMESTAMP'$cutoff'").count() > 0,
      "no delta-side events in the straddled hour — cutoff exercises nothing")
  }
}
