package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TxParquetSink

/** The manifest-driven broadcast rule, pinned in isolation: Spark's own
  * size-based auto-broadcast is disabled (threshold −1) and AQE's
  * runtime re-planning is off, so a BroadcastHashJoin in the physical
  * plan can ONLY come from the hint [[ManifestBroadcastJoins]] injected
  * from the commit-log row counts. Results must be identical either
  * way — the rule changes strategy, never semantics. */
class ManifestBroadcastSpec extends AnyFunSuite {

  private def fresh(maxRows: String): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("ManifestBroadcastSpec")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .config(ManifestBroadcastJoins.MaxRowsKey, maxRows)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  private def tables(s: SparkSession): (TxParquetSink, TxParquetSink) = {
    import s.implicits._
    val big = TxParquetSink(
      Files.createTempDirectory("mbj-big").toString + "/t")
    big.append(s.range(10000).selectExpr("id", "id % 97 AS k"))
    val small = TxParquetSink(
      Files.createTempDirectory("mbj-small").toString + "/t")
    small.append((0L until 97L).map(k => (k, s"g$k")).toDF("k", "name"))
    (big, small)
  }

  test("a manifest-small side is hinted broadcast; results unchanged") {
    val s = fresh(maxRows = "500000")
    try {
      val (big, small) = tables(s)
      val j = big.readSnapshot(s).get.join(small.readSnapshot(s).get, "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"manifest-small side must broadcast:\n${plan.take(800)}")
      assert(j.count() == 10000L)
    } finally s.stop()
  }

  test("above the row ceiling the rule stays silent — shuffle join survives") {
    val s = fresh(maxRows = "50") // small side holds 97 rows > 50
    try {
      val (big, small) = tables(s)
      val j = big.readSnapshot(s).get.join(small.readSnapshot(s).get, "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin") &&
        plan.contains("SortMergeJoin"),
        s"no side qualifies — must stay a shuffle join:\n${plan.take(800)}")
      assert(j.count() == 10000L)
    } finally s.stop()
  }

  test("plain parquet (no _txlog) is never sized — the rule stays out") {
    val s = fresh(maxRows = "500000")
    try {
      import s.implicits._
      val dir = Files.createTempDirectory("mbj-plain").toString
      s.range(500).selectExpr("id", "id % 7 AS k")
        .write.parquet(s"$dir/a.parquet")
      (0L until 7L).map(k => (k, s"g$k")).toDF("k", "name")
        .write.parquet(s"$dir/b.parquet")
      val j = s.read.parquet(s"$dir/a.parquet")
        .join(s.read.parquet(s"$dir/b.parquet"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), plan.take(800))
      assert(j.count() == 500L)
    } finally s.stop()
  }
}
