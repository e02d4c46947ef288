package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted join ≡ plain join, including on pathologically skewed keys. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted equi-join returns exactly the plain join result under heavy skew") {
    // 10k rows, 90% on one hot key.
    val left = (1 to 10000)
      .map(i => (if (i % 10 == 0) i.toLong % 50 else 7L, i))
      .toDF("k", "v")
    val right = (0L to 49L).map(k => (k, s"dim$k")).toDF("k", "name")

    val plain = left.join(right, Seq("k"))
      .select("k", "v", "name").orderBy("k", "v").collect().toSeq
    val salted = Skew.saltedEquiJoin(left, right, "k", factor = 8)
      .select("k", "v", "name").orderBy("k", "v").collect().toSeq
    assert(salted == plain)
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // Salting (above) is the manual lever; AQE's skew-join split is the
    // runtime one — at 100 TB it is what turns a straggler partition
    // into parallel subtasks without touching the query. Force a
    // sort-merge join (no broadcast) with thresholds scaled to test
    // size, and pin that the final adaptive plan marks the join skewed.
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      val pad = "x" * 200
      val left = (1 to 50000)
        .map(i => (if (i % 20 == 0) i.toLong % 50 else 7L, pad + i))
        .toDF("k", "payload")
      val right = (0L to 49L).map(k => (k, s"dim$k")).toDF("k", "name")

      val joined = left.join(right, Seq("k"))
      // collect() drives THIS DataFrame's query execution — count()
      // would plan and execute a separate one, leaving this plan
      // unadapted (isFinalPlan=false)
      assert(joined.collect().length == 50000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join preserves multiplicity with duplicate right keys") {
    val left = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val right = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "w")
    val plain = left.join(right, Seq("k")).count()
    val salted = Skew.saltedEquiJoin(left, right, "k", factor = 4).count()
    assert(salted == plain) // 2 left ×2 right for k=1 (4) + 1 for k=2 = 5
  }
}
