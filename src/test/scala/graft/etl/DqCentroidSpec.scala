package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DQ rule engine and nearest-centroid evaluation: planted violations
  * counted per rule, and a hand-quantized two-cluster confusion
  * matrix. End-to-end values are pinned by the DuckDB twins
  * (`etl_dq_rules`, `ext_embed_centroid_eval`). */
class DqCentroidSpec extends SparkSpec {
  import spark.implicits._

  test("dq rules: planted violations are counted, clean rows pass") {
    val dir = tempDataDir("lineitem" -> Seq(
      // clean row
      (1L, 5.0, 0.05, "A", "O", Some(java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))),
      // violations: quantity, discount, flag, status, null date
      (2L, 100.0, 0.5, "X", "Z", None),
      (-1L, 1.0, 0.0, "N", "F", Some(java.sql.Timestamp.valueOf("2024-01-03 00:00:00"))))
      .toDF("l_orderkey", "l_quantity", "l_discount", "l_returnflag",
        "l_linestatus", "l_shipdate"))
    val r = EtlQueries.dqRules(spark, dir).collect()
      .map(row => row.getString(0) ->
        (row.getLong(1), row.getLong(2), row.getBoolean(3))).toMap
    assert(r.keySet == EtlQueries.DqRules.map(_._1).toSet)
    assert(r("quantity_range") == ((3L, 1L, false)))
    assert(r("discount_range") == ((3L, 1L, false)))
    assert(r("returnflag_domain") == ((3L, 1L, false)))
    assert(r("linestatus_domain") == ((3L, 1L, false)))
    assert(r("shipdate_not_null") == ((3L, 1L, false)))
    assert(r("orderkey_positive") == ((3L, 1L, false)))
  }

  test("dq rules corpus pass: one row per rule, full row coverage") {
    val n = Star.table(spark, sfSmoke, "lineitem").count()
    val r = EtlQueries.dqRules(spark, sfSmoke).collect()
    assert(r.length == EtlQueries.DqRules.size)
    assert(r.forall(_.getLong(1) == n))
  }

  test("centroid eval: separated clusters go diagonal, a planted stray crosses") {
    val dir = tempDataDir("embeddings" -> Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 0), (3L, Seq(1.0f, 0.0f), 0),
      (4L, Seq(0.0f, 1.0f), 1), (5L, Seq(0.0f, 1.0f), 1), (6L, Seq(0.0f, 1.0f), 1),
      // labeled 1 but sitting on cluster 0 → predicted 0
      (7L, Seq(0.9f, 0.1f), 1)
    ).toDF("vec_id", "embedding", "label"))
    val r = graft.ext.VectorOps.centroidEval(spark, dir).collect()
      .map(row => (row.getInt(0), row.getInt(1)) -> row.getLong(2)).toMap
    assert(r == Map((0, 0) -> 3L, (1, 0) -> 1L, (1, 1) -> 3L))
  }
}
