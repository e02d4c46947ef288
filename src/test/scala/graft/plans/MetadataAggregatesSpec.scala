package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TxParquetSink

/** The metadata count-pushdown rule, pinned in isolation: a bare
  * COUNT over a full-coverage tx scan optimizes to a LocalRelation
  * (zero scan stages), answers match the scanning plan exactly, and
  * every guard failure leaves the plan untouched. */
class MetadataAggregatesSpec extends AnyFunSuite {

  private def fresh(): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("MetadataAggregatesSpec")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  private def table(s: SparkSession): TxParquetSink = {
    import s.implicits._
    val t = TxParquetSink(Files.createTempDirectory("metaagg").toString + "/t")
    (1 to 30).map(d => (f"2024-01-$d%02d", d.toLong)).grouped(10).foreach(g =>
      t.appendWithStats(g.toDF("day", "amount"), Seq("day", "amount")))
    t
  }

  private def isLocal(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.isInstanceOf[LocalRelation])

  test("bare COUNT(*) and commit-aligned WHERE optimize to a literal") {
    val s = fresh()
    try {
      val t = table(s)
      val whole = t.readSnapshot(s).get.agg(count(lit(1)).as("n"))
      assert(isLocal(whole), whole.queryExecution.optimizedPlan.toString)
      assert(whole.collect().head.getLong(0) == 30L)
      // commit-aligned predicate: commit 2 is exactly amount 11..20
      val aligned = t.readSnapshot(s).get
        .where("amount >= 11 AND amount <= 20").agg(count(lit(1)).as("n"))
      assert(isLocal(aligned), aligned.queryExecution.optimizedPlan.toString)
      assert(aligned.collect().head.getLong(0) == 10L)
    } finally s.stop()
  }

  test("guards: boundary cut, masks, pruned reads, distinct all stay on the scan") {
    val s = fresh()
    try {
      val t = table(s)
      def snap = t.readSnapshot(s).get
      // a mid-commit cut needs a boundary scan → no rewrite, right answer
      val cut = snap.where("amount >= 15 AND amount <= 20")
        .agg(count(lit(1)).as("n"))
      assert(!isLocal(cut))
      assert(cut.collect().head.getLong(0) == 6L)
      // count(DISTINCT) is not a plain count → no rewrite
      val dist = snap.agg(countDistinct(col("day")).as("n"))
      assert(!isLocal(dist) && dist.collect().head.getLong(0) == 30L)
      // a PRUNED read (skipping) does not cover the snapshot → no rewrite
      val pruned = t.readSnapshotRange(s, "amount", "11", "20").get
        .agg(count(lit(1)).as("n"))
      assert(!isLocal(pruned))
      // a row-hiding mask forbids metadata credit → no rewrite
      t.deleteWhere(s, "amount = 25")
      val masked = t.readSnapshot(s).get.agg(count(lit(1)).as("n"))
      assert(!isLocal(masked) && masked.collect().head.getLong(0) == 29L)
    } finally s.stop()
  }

  test("unfiltered MIN/MAX/SUM/COUNT(col) rewrite to literals, all-or-nothing") {
    val s = fresh()
    try {
      val t = table(s)
      val snap = t.readSnapshot(s).get
      val profile = snap.agg(
        count(lit(1)).as("n"), count(col("amount")).as("nn"),
        min(col("amount")).as("mn"), max(col("amount")).as("mx"),
        sum(col("amount")).as("sm"),
        min(col("day")).as("d0"), max(col("day")).as("d1"))
      assert(isLocal(profile), profile.queryExecution.optimizedPlan.toString)
      val r = profile.collect().head
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getString(6)) ==
        ((30L, 30L, 1L, 30L, 465L, "2024-01-01", "2024-01-30")))
      // all-or-nothing: avg is not answerable → the WHOLE plan scans,
      // including the count that alone would have rewritten
      val mixed = snap.agg(count(lit(1)).as("n"), avg("amount").as("a"))
      assert(!isLocal(mixed))
      assert(mixed.collect().head.getLong(0) == 30L)
      // filters + extremes don't rewrite (stats describe whole commits)
      val filteredMin = snap.where("amount >= 11 AND amount <= 20")
        .agg(min(col("amount")).as("mn"))
      assert(!isLocal(filteredMin))
      assert(filteredMin.collect().head.getLong(0) == 11L)
    } finally s.stop()
  }

  test("the rewrite equals the scanning plan on every probe") {
    val s = fresh()
    try {
      val t = table(s)
      val preds = Seq("amount >= 11 AND amount <= 20", "amount >= 1",
        "day >= '2024-01-11' AND day <= '2024-01-20'")
      preds.foreach { p =>
        val withRule = t.readSnapshot(s).get.where(p)
          .agg(count(lit(1)).as("n")).collect().head.getLong(0)
        // the ground truth through a plain filter-count (rule can't
        // fire: .count() plans through a different aggregate shape)
        val ground = t.readSnapshot(s).get.where(p).count()
        assert(withRule == ground, s"pred '$p': $withRule vs $ground")
      }
    } finally s.stop()
  }
}
