package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Blocked fuzzy entity resolution over the customer master: candidates
  * come from an equi-join on the 16-char name-prefix blocking key, then
  * exact Levenshtein verification inside the block. The spec pins both
  * the match semantics (threshold, symmetry-free id_a < id_b emission,
  * cross-block blindness) and the scale-critical plan shape (a shuffled
  * or broadcast EQUI-join on the block key — never a cartesian).
  */
class EntityMatchSpec extends SparkSpec {
  import spark.implicits._

  // Names are >16 chars so the blocking prefix is a real prefix.
  private def customers(rows: (Long, String)*): String =
    tempDataDir("customer" -> rows.toDF("c_custkey", "c_name")
      .withColumn("c_mktsegment", org.apache.spark.sql.functions.lit("X")))

  test("pairs within a block at dist <= 1; each pair once, a < b") {
    val dir = customers(
      (1L, "Customer#000000001xx"),
      (2L, "Customer#000000002xx"), // dist 1 vs id 1 (one digit differs)
      (3L, "Customer#000000001xy") // dist 1 vs id 1, dist 2 vs id 2
    )
    val got = EtlQueries.entityMatch(spark, dir)
      .as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 2L, 1), (1L, 3L, 1)))
  }

  test("cross-block near-duplicates are invisible (blocking contract)") {
    // dist 1 overall, but the difference is INSIDE the 16-char prefix,
    // so the two land in different blocks and are never compared.
    val dir = customers(
      (1L, "Customer#000000001xx"),
      (2L, "Xustomer#000000001xx"))
    assert(EtlQueries.entityMatch(spark, dir).count() == 0)
  }

  test("threshold widens the match set monotonically") {
    val dir = customers(
      (1L, "Customer#000000001ab"),
      (2L, "Customer#000000001cd")) // dist 2
    assert(EtlQueries.entityMatch(spark, dir, maxDist = 1).count() == 0)
    assert(EtlQueries.entityMatch(spark, dir, maxDist = 2)
      .as[(Long, Long, Int)].collect().toSeq == Seq((1L, 2L, 2)))
  }

  test("plans an equi-join on the blocking key, not a cartesian") {
    val dir = customers(
      (1L, "Customer#000000001xx"),
      (2L, "Customer#000000002xx"))
    val plan = EtlQueries.entityMatch(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
