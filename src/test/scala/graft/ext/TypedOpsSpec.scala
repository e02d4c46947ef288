package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the typed flatMapGroups gap statistics; exact values
  * are pinned by the DuckDB window-formulation twin (`ext_user_gaps`),
  * which doubles as an equivalence proof of the two formulations. */
class TypedOpsSpec extends SparkSpec {

  test("user gaps: arithmetic invariants hold and single-event users emit nothing") {
    val gaps = TypedOps.userGaps(spark, sfSmoke).cache()
    try {
      // only multi-event users appear
      val multi = graft.etl.Star.events(spark, sfSmoke)
        .groupBy("user_id").count().where(col("count") >= 2).count()
      assert(gaps.count() == multi)
      // n_gaps = n_events - 1; span = max ts - min ts = sum of gaps,
      // and the median is bracketed by min and max
      assert(gaps.where(col("n_gaps") =!= col("n_events") - 1).count() == 0)
      assert(gaps.where(col("span_ms") < col("max_gap_ms")).count() == 0)
      assert(gaps.where(
        col("median_gap_ms") < col("min_gap_ms") ||
          col("median_gap_ms") > col("max_gap_ms")).count() == 0)
      // span matches an independent min/max aggregation
      val direct = graft.etl.Star.events(spark, sfSmoke)
        .groupBy("user_id")
        .agg((unix_millis(max("ts")) - unix_millis(min("ts"))).as("direct_span"))
      assert(gaps.join(direct, "user_id")
        .where(col("span_ms") =!= col("direct_span")).count() == 0)
    } finally gaps.unpersist()
  }
}
