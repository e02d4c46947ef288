package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SCD2 chain audit, salted-join equivalence, lang confusion and
  * filtered ANN: planted chain defects, in-engine plan equivalence,
  * and predicate-before-scoring. End-to-end values are pinned by the
  * DuckDB twins. */
class Scd2AuditSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("scd2 audit: clean chains pass; gaps, overlaps, double-current, dangling flagged") {
    val hist = Seq(
      // customer 1: clean two-version chain
      (1L, ts("2024-01-01 00:00:00"), Some(ts("2024-06-01 00:00:00")), false),
      (1L, ts("2024-06-01 00:00:00"), None, true),
      // customer 2: GAP between versions
      (2L, ts("2024-01-01 00:00:00"), Some(ts("2024-03-01 00:00:00")), false),
      (2L, ts("2024-06-01 00:00:00"), None, true),
      // customer 3: OVERLAP
      (3L, ts("2024-01-01 00:00:00"), Some(ts("2024-07-01 00:00:00")), false),
      (3L, ts("2024-06-01 00:00:00"), None, true),
      // customer 4: open version SHADOWED by a successor + two currents
      (4L, ts("2024-01-01 00:00:00"), None, true),
      (4L, ts("2024-06-01 00:00:00"), None, true)
    ).toDF("customer_id", "valid_from", "valid_to", "is_current")
    val r = EtlQueries.scd2AuditOf(hist).collect()
      .map(row => row.getLong(0) ->
        (row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5),
          row.getBoolean(6))).toMap
    assert(r(1L) == ((1L, 0L, 0L, 0L, true)))
    assert(r(2L) == ((1L, 1L, 0L, 0L, false)))
    assert(r(3L) == ((1L, 0L, 1L, 0L, false)))
    assert(r(4L) == ((2L, 0L, 0L, 1L, false)))
  }

  test("salted join aggregates exactly as the plain join") {
    val plain = Star.events(spark, sfSmoke).select("user_id", "event_type")
      .join(Star.table(spark, sfSmoke, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment")),
        "user_id")
      .groupBy("segment", "event_type").agg(count(lit(1)).as("n_events"))
    val salted = EtlQueries.saltedJoinCounts(spark, sfSmoke)
    assert(salted.join(plain, Seq("segment", "event_type"), "full_outer")
      .where(salted("n_events") =!= plain("n_events") ||
        salted("n_events").isNull || plain("n_events").isNull)
      .count() == 0)
  }

  test("lang confusion: class shares quantize to the class total") {
    val r = graft.ext.TextOps.langConfusion(spark, sfSmoke).collect()
      .map(row => (row.getString(0), row.getString(1), row.getLong(2),
        row.getBoolean(3), row.getLong(4)))
    assert(r.nonEmpty)
    r.groupBy(_._1).foreach { case (_, cells) =>
      val share = cells.map(_._5).sum
      // floor rounding loses < 1 ppm per cell
      assert(share <= 1000000L && share > 1000000L - cells.length)
    }
    r.foreach { case (l, p, _, c, _) => assert(c == (l == p)) }
  }

  test("filtered ANN pre-filters: a nearer wrong-label vector never appears") {
    val dir = tempDataDir("embeddings" -> Seq(
      (0L, Seq(1.0f, 0.0f), 1), // query
      (10L, Seq(0.99f, 0.14f), 2), // nearest overall but wrong label
      (11L, Seq(0.9f, 0.44f), 1), // nearest same-label
      (12L, Seq(0.0f, 1.0f), 1),
      (13L, Seq(-1.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label"))
    val r = graft.ext.SimilarityOps.filteredTopK(spark, dir, k = 3, nQueries = 1)
      .collect().map(row => (row.getInt(2), row.getLong(3)))
    assert(r.head == ((1, 11L)))
    assert(!r.map(_._2).contains(10L))
    assert(r.map(_._2).toSet == Set(11L, 12L, 13L))
  }
}
