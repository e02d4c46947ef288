package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.{TxFixtures, TxParquetSink}
import graft.plans.MvCatalog

/** STREAMED MATERIALIZED-VIEW MAINTENANCE — the [[MvCatalog]] refresh
  * loop run as a writer-side consumer, the way a deployment keeps its
  * rollups warm: every commit the base table takes is followed by one
  * [[MvCatalog.refresh]] tick, which folds exactly that commit's
  * change feed into the stored view (O(delta) + O(view) per tick,
  * never a base rescan) and re-registers at the new version — so
  * [[graft.plans.MvRewrite]] is re-armed the moment the data moves
  * and a dashboard aggregate NEVER falls back to the fact scan for
  * staleness.
  *
  * The replay drives the full churn taxonomy through a SUM/COUNT-only
  * view (the fully self-maintainable algebra — extremes would force
  * rebuilds under retraction, [[MvCatalog.registerRollup]] scaladoc):
  * year-sliced appends (group growth + new groups), one mid-replay
  * predicate DELETE (signed decrements; a customer whose every order
  * is retracted must LEAVE the view), and post-delete appends that
  * re-insert some of those customers (vanished groups must reappear
  * from zero, not from stale state). Every tick is REQUIRED to take
  * the incremental path — a silent fall-back to rebuild would fake
  * the scaling claim. The final rule-served query hash-gates against
  * DuckDB's recompute over the surviving rows: stream-maintained ≡
  * batch, served through the optimizer rewrite. */
object StreamMv {

  def mvStreamRefresh(spark: SparkSession, dir: String): DataFrame = {
    val o = TxFixtures.ordersProjected(spark, dir)
    val years = o.select("year").distinct().orderBy("year")
      .collect().map(_.getInt(0)).toSeq
    require(years.size >= 4, s"replay needs >= 4 year slices, got $years")
    val t = TxParquetSink(
      java.nio.file.Files.createTempDirectory("graft-smv").toString + "/t")
    val mvPath = t.dir + "_mv"
    t.append(o.where(col("year") === lit(years.head)))
    MvCatalog.registerRollup(spark, t, Seq("o_custkey"), Seq("cents"),
      mvPath, minMax = false)
    def tick(): Unit = {
      // the writer-loop hook: refreshIfStale decides from the version
      // gap alone (the maintainIfNeeded pattern) — no caller-side
      // version bookkeeping. A content-preserving commit in the gap
      // (the mid-replay compact) re-stamps the version without a merge,
      // so the incremental-path require only runs when a refresh ran.
      // keep = 2 with no grace: the replay is single-threaded, so the
      // per-tick GC may reclaim superseded view copies immediately —
      // the storage side of the per-commit maintenance story (without
      // it a continuous writer accretes one full view copy per commit)
      MvCatalog.refreshIfStale(spark, t,
        retention = MvCatalog.Retention(keep = 2, graceMs = 0L))
        .foreach { case (d, outcome) =>
          require(d.baseVersion == t.version(), "refresh must reach the head")
          require(outcome != MvCatalog.RefreshOutcome.Rebuilt,
            "streamed maintenance must stay incremental — a rebuild here " +
              "silently rescans the base every tick")
        }
      val d = MvCatalog.lookup(t.dir).get
      require(d.baseVersion == t.version(),
        "the policy must leave the registered view FRESH after every commit")
    }
    years.drop(1).zipWithIndex.foreach { case (y, i) =>
      if (i == 2) { // after the first three years landed: the retraction
        t.deleteWhere(spark, "o_custkey % 7 = 3")
        tick()
        // the maintenance window the delete schedules anyway (the
        // maintainIfNeeded discipline): materialize the mask so the
        // snapshot is a single multi-path scan again — a masked log
        // shatters the read into per-mask scan groups, which the
        // rewrite's coverage walk refuses by construction. The view is
        // already current, so this tick only re-stamps the version.
        t.compact(spark)
        tick()
      }
      t.append(o.where(col("year") === lit(y)))
      tick()
    }
    // the storage half of the claim: the replay took one refresh per
    // commit, each landing a full view copy at a new path — retention
    // must have reclaimed all but the last `keep` of them, or a
    // 100-TB deployment's maintenance loop grows view-size × commits
    val stemDir = java.nio.file.Paths.get(t.dir + "_mv").getParent
    val stemName = java.nio.file.Paths.get(t.dir + "_mv").getFileName.toString
    val viewDirs = {
      val l = java.nio.file.Files.list(stemDir)
      try {
        import scala.jdk.CollectionConverters._
        l.iterator().asScala.map(_.getFileName.toString)
          .count(_.startsWith(stemName))
      } finally l.close()
    }
    require(viewDirs <= 2,
      s"retention keep=2 must leave at most two view dirs, found $viewDirs")
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ graft.plans.MvRewrite
    try {
      val rolled = t.readSnapshot(spark).get
        .groupBy("o_custkey")
        .agg(sum(col("cents")).as("total_cents"),
          count(lit(1)).as("n_orders"))
      graft.etl.EtlQueries.requireMvOnly(rolled,
        MvCatalog.lookup(t.dir).get.mvPath, t.dir)
      graft.etl.EtlQueries.frozen(rolled, "o_custkey")
    } finally spark.experimental.extraOptimizations = prev
  }
}
