package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.TxParquetSink

/** [[MvRewrite]] is only safe if it fires EXACTLY when the registered
  * rollup provably answers the query: the positive paths must redirect
  * the plan to the view (and agree with the rule-off answer row for
  * row), and every guard — staleness, shadowing projections, foreign
  * aggregates, filters off the view grain, type drift — must keep the
  * fact scan. */
class MvRewriteSpec extends SparkSpec {

  import spark.implicits._

  /** A small governed base: (g, h, v) with two grouping grains. */
  private def freshBase(): (TxParquetSink, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mvspec").toString
    val t = TxParquetSink(s"$dir/base")
    val rows = (1 to 200).map(i => (i % 5, i % 3, i.toLong))
    t.append(rows.toDF("g", "h", "v").where(col("g") < 3))
    t.append(rows.toDF("g", "h", "v").where(col("g") >= 3))
    (t, s"$dir/mv")
  }

  private def withRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ MvRewrite
    try body finally spark.experimental.extraOptimizations = prev
  }

  private def readsOnly(df: DataFrame, path: String): Boolean = {
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    leaves.nonEmpty && leaves.forall {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.forall(_.toUri.getPath.startsWith(path))
        case _ => false
      }
      case _ => false
    }
  }

  private def readsBase(df: DataFrame, t: TxParquetSink): Boolean =
    df.queryExecution.optimizedPlan.collectLeaves().exists {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.exists(_.toUri.getPath.startsWith(t.dir))
        case _ => false
      }
      case _ => false
    }

  test("coarser-grain rollup fires, reads only the view, and matches the rule-off answer") {
    val (t, mvPath) = freshBase()
    MvCatalog.registerRollup(spark, t, Seq("g", "h"), Seq("v"), mvPath)
    def q() = t.readSnapshot(spark).get
      .groupBy("g")
      .agg(sum("v").as("s"), count(lit(1)).as("c"),
        min("v").as("lo"), max("v").as("hi"))
      .orderBy("g")
    val off = q().collect().toSeq
    withRule {
      val on = q()
      assert(readsOnly(on, mvPath), on.queryExecution.optimizedPlan.toString)
      assert(on.collect().toSeq === off)
    }
  }

  test("same-grain direct hit and global rollup both fire and agree") {
    val (t, mvPath) = freshBase()
    MvCatalog.registerRollup(spark, t, Seq("g", "h"), Seq("v"), mvPath)
    def grain() = t.readSnapshot(spark).get
      .groupBy("g", "h").agg(sum("v").as("s")).orderBy("g", "h")
    def global() = t.readSnapshot(spark).get
      .agg(sum("v").as("s"), count(lit(1)).as("c"))
    val (offGrain, offGlobal) = (grain().collect().toSeq, global().collect().toSeq)
    withRule {
      assert(readsOnly(grain(), mvPath))
      assert(grain().collect().toSeq === offGrain)
      assert(readsOnly(global(), mvPath))
      assert(global().collect().toSeq === offGlobal)
    }
  }

  test("filter on a view grouping column transplants; filter on a value column keeps the scan") {
    val (t, mvPath) = freshBase()
    MvCatalog.registerRollup(spark, t, Seq("g", "h"), Seq("v"), mvPath)
    def byGroup() = t.readSnapshot(spark).get
      .where(col("h") === 1).groupBy("g").agg(sum("v").as("s")).orderBy("g")
    val off = byGroup().collect().toSeq
    withRule {
      assert(readsOnly(byGroup(), mvPath))
      assert(byGroup().collect().toSeq === off)
      val byValue = t.readSnapshot(spark).get
        .where(col("v") > 50).groupBy("g").agg(sum("v").as("s"))
      assert(readsBase(byValue, t), "value filter must keep the fact scan")
    }
  }

  /** The compensated-plan shape gate — the ONE runtime implementation
    * ([[graft.etl.EtlQueries.mvPlusDeltaOnly]], also behind the
    * `etl_mv_stale_rewrite` oracle row) so the spec can never drift
    * from the gate the driver row enforces. */
  private def readsViewPlusDelta(df: DataFrame, mvPath: String,
      t: TxParquetSink, baseVersion: Long): Boolean =
    graft.etl.EtlQueries.mvPlusDeltaOnly(df, mvPath, t, baseVersion)

  test("a stale view COMPENSATES: view + delta commits only, answers match the rule-off plan") {
    val (t, mvPath) = freshBase()
    val d = MvCatalog.registerRollup(spark, t, Seq("g", "h"), Seq("v"), mvPath)
    t.append(Seq((7, 9, 1000L), (1, 1, 11L)).toDF("g", "h", "v"))
    t.append(Seq((7, 9, 2L), (0, 0, 3L)).toDF("g", "h", "v"))
    def q() = t.readSnapshot(spark).get
      .groupBy("g").agg(sum("v").as("s"), count(lit(1)).as("c"),
        min("v").as("lo"), max("v").as("hi"))
      .orderBy("g")
    val off = q().collect().toSeq
    withRule {
      val on = q()
      assert(readsViewPlusDelta(on, mvPath, t, d.baseVersion),
        on.queryExecution.optimizedPlan.toString)
      assert(on.collect().toSeq === off)
    }
    // a refresh (or re-registration) returns the rule to the direct hit
    MvCatalog.refresh(spark, t)
    withRule {
      assert(readsOnly(
        t.readSnapshot(spark).get.groupBy("g").agg(sum("v").as("s")),
        MvCatalog.lookup(t.dir).get.mvPath))
    }
  }

  test("a value-column delete in the tail structurally keeps the scan (the mask filter is the guard)") {
    val (t, mvPath) = freshBase()
    MvCatalog.registerRollup(spark, t, Seq("g", "h"), Seq("v"), mvPath)
    t.deleteWhere(spark, "v > 150")
    // the masked read injects NOT(v > 150) over a VALUE column — the
    // filter guard refuses, so compensation never mis-serves a tail it
    // cannot represent; the correct answer comes from the masked scan
    def sums() = t.readSnapshot(spark).get
      .groupBy("g").agg(sum("v").as("s"), count(lit(1)).as("c")).orderBy("g")
    val off = sums().collect().toSeq
    withRule {
      val on = sums()
      assert(!readsView(on, mvPath) && readsBase(on, t),
        on.queryExecution.optimizedPlan.toString)
      assert(on.collect().toSeq === off)
    }
  }

  test("AVG serves as one division of exact partials under the 2^53 proof — and declines past it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mvavg").toString
    val t = TxParquetSink(s"$dir/base")
    val rows = (1 to 200).map(i => (i % 5, i % 3, i.toLong))
    t.appendWithStats(rows.toDF("g", "h", "v").where(col("g") < 3),
      statsCols = Seq("v"))
    t.appendWithStats(rows.toDF("g", "h", "v").where(col("g") >= 3),
      statsCols = Seq("v"))
    MvCatalog.registerRollup(spark, t, Seq("g", "h"), Seq("v"), s"$dir/mv")
    def q() = t.readSnapshot(spark).get
      .groupBy("g").agg(avg("v").as("a"), sum("v").as("s")).orderBy("g")
    val off = q().collect().toSeq
    withRule {
      val on = q()
      assert(readsOnly(on, s"$dir/mv"), on.queryExecution.optimizedPlan.toString)
      val got = on.collect().toSeq
      assert(got.length === off.length)
      got.zip(off).foreach { case (a, b) =>
        assert(a.getDouble(1) == b.getDouble(1), // bit-exact, not approx
          s"AVG drift at g=${a.getInt(0)}: ${a.getDouble(1)} vs ${b.getDouble(1)}")
        assert(a.getLong(2) === b.getLong(2))
      }
    }
    // past the bound: max|v| · rows ≥ 2^53 — the proof fails, scan stays
    val big = TxParquetSink(s"$dir/big")
    big.appendWithStats(
      Seq((0, 0, (1L << 51)), (0, 1, (1L << 51)), (1, 0, 7L), (1, 1, 9L))
        .toDF("g", "h", "v"), statsCols = Seq("v"))
    MvCatalog.registerRollup(spark, big, Seq("g", "h"), Seq("v"), s"$dir/bigmv")
    withRule {
      val over = big.readSnapshot(spark).get
        .groupBy("g").agg(avg("v").as("a"))
      assert(readsBase(over, big),
        "AVG past the 2^53 subset-sum bound must keep the scan")
      // SUM on the same view still fires (long re-summing needs no bound)
      assert(readsOnly(big.readSnapshot(spark).get
        .groupBy("g").agg(sum("v").as("s")), s"$dir/bigmv"))
    }
  }

  test("a stale view compensates AVG too (divide-last over compensated partials)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mvavgst").toString
    val t = TxParquetSink(s"$dir/base")
    t.appendWithStats((1 to 100).map(i => (i % 4, i.toLong)).toDF("g", "v"),
      statsCols = Seq("v"))
    MvCatalog.registerRollup(spark, t, Seq("g"), Seq("v"), s"$dir/mv")
    t.appendWithStats(Seq((1, 999L), (7, 5L)).toDF("g", "v"),
      statsCols = Seq("v"))
    def q() = t.readSnapshot(spark).get
      .groupBy("g").agg(avg("v").as("a"), count(lit(1)).as("c")).orderBy("g")
    val off = q().collect().toSeq
    withRule {
      val on = q()
      assert(readsView(on, s"$dir/mv"), on.queryExecution.optimizedPlan.toString)
      val got = on.collect().toSeq
      assert(got.length === off.length)
      got.zip(off).foreach { case (a, b) =>
        assert(a.getDouble(1) == b.getDouble(1) && a.getLong(2) == b.getLong(2))
      }
    }
  }

  test("view selection: the cheapest covering grain wins; uncovered queries fall to the finer view") {
    val (t, mvPath) = freshBase()
    val fine = MvCatalog.registerRollup(spark, t, Seq("g", "h"), Seq("v"),
      mvPath + "_fine")
    val coarse = MvCatalog.registerRollup(spark, t, Seq("g"), Seq("v"),
      mvPath + "_coarse")
    assert(MvCatalog.lookupAll(t.dir).size === 2)
    assert(coarse.rows < fine.rows, "fixture: the coarse view is smaller")
    def byG() = t.readSnapshot(spark).get
      .groupBy("g").agg(sum("v").as("s"), count(lit(1)).as("c")).orderBy("g")
    def byGH() = t.readSnapshot(spark).get
      .groupBy("g", "h").agg(sum("v").as("s")).orderBy("g", "h")
    val (offG, offGH) = (byG().collect().toSeq, byGH().collect().toSeq)
    withRule {
      // both views cover GROUP BY g — the 5-row coarse one must win
      assert(readsOnly(byG(), mvPath + "_coarse"),
        byG().queryExecution.optimizedPlan.toString)
      assert(byG().collect().toSeq === offG)
      // only the fine view covers GROUP BY g, h
      assert(readsOnly(byGH(), mvPath + "_fine"))
      assert(byGH().collect().toSeq === offGH)
    }
    MvCatalog.unregister(t.dir)
  }

  test("view selection prefers a FRESH fine view over a STALE coarse one; refresh flips it back") {
    val (t, mvPath) = freshBase()
    MvCatalog.registerRollup(spark, t, Seq("g"), Seq("v"),
      mvPath + "_coarse", minMax = false)
    t.append(Seq((1, 1, 77L)).toDF("g", "h", "v")) // coarse is now stale
    MvCatalog.registerRollup(spark, t, Seq("g", "h"), Seq("v"),
      mvPath + "_fine", minMax = false) // fine is fresh at the new head
    def q() = t.readSnapshot(spark).get
      .groupBy("g").agg(sum("v").as("s")).orderBy("g")
    val off = q().collect().toSeq
    withRule {
      // fresh beats small: the fine view serves with zero feed reads
      assert(readsOnly(q(), mvPath + "_fine"),
        q().queryExecution.optimizedPlan.toString)
      assert(q().collect().toSeq === off)
    }
    // refresh brings BOTH grains forward; the small coarse view wins again
    MvCatalog.refresh(spark, t)
    assert(MvCatalog.lookupAll(t.dir).forall(_.baseVersion == t.version()),
      "refresh must bring every registered grain forward")
    withRule {
      val on = q()
      assert(readsView(on, mvPath + "_coarse"),
        on.queryExecution.optimizedPlan.toString)
      assert(on.collect().toSeq === off)
    }
    MvCatalog.unregister(t.dir)
  }

  test("the lag budget is PER GRAIN: a due fine cube does not drag a within-budget coarse view") {
    val (t, mvPath) = freshBase()
    val fine0 = MvCatalog.registerRollup(spark, t, Seq("g", "h"), Seq("v"),
      mvPath + "_fine", minMax = false)
    t.append(Seq((1, 1, 5L)).toDF("g", "h", "v"))
    t.append(Seq((2, 2, 6L)).toDF("g", "h", "v"))
    // the coarse view registers ONE commit behind the head the fine
    // cube is now three commits behind
    val coarse0 = MvCatalog.registerRollup(spark, t, Seq("g"), Seq("v"),
      mvPath + "_coarse", minMax = false)
    t.append(Seq((3, 0, 7L)).toDF("g", "h", "v"))
    val refreshed = MvCatalog.refreshIfStale(spark, t, lagBudget = 2)
    assert(refreshed.nonEmpty, "the fine cube is past the budget")
    val after = MvCatalog.lookupAll(t.dir)
    val fine1 = after.find(_.groupCols == Seq("g", "h")).get
    val coarse1 = after.find(_.groupCols == Seq("g")).get
    assert(fine1.baseVersion === t.version(),
      "the due grain must be brought forward")
    assert(coarse1.baseVersion === coarse0.baseVersion &&
      coarse1.mvPath === coarse0.mvPath,
      "the within-budget grain must NOT pay a refresh")
    assert(fine1.mvPath !== fine0.mvPath)
    MvCatalog.unregister(t.dir)
  }

  test("multi-grain registrations persist: save + unregister + load keeps both candidates") {
    val (t, mvPath) = freshBase()
    MvCatalog.registerRollup(spark, t, Seq("g", "h"), Seq("v"), mvPath + "_f")
    MvCatalog.registerRollup(spark, t, Seq("g"), Seq("v"), mvPath + "_c")
    val catDir = java.nio.file.Files
      .createTempDirectory("graft-mvmulti-save").toString
    MvCatalog.save(catDir)
    val before = MvCatalog.lookupAll(t.dir).map(d => (d.groupCols, d.rows))
    MvCatalog.unregister(t.dir)
    assert(MvCatalog.lookupAll(t.dir).isEmpty)
    assert(MvCatalog.load(catDir) >= 2)
    assert(MvCatalog.lookupAll(t.dir).map(d => (d.groupCols, d.rows))
      .toSet === before.toSet, "both grains and their row counts round-trip")
    withRule {
      assert(readsOnly(t.readSnapshot(spark).get
        .groupBy("g").agg(sum("v").as("s")), mvPath + "_c"))
    }
    MvCatalog.unregister(t.dir)
  }

  test("a registration below the truncation horizon declines quietly (no optimizer crash)") {
    // review finding: compensated() called changesBetween without a
    // horizon check, so a truncated history made an ordinary aggregate
    // THROW during planning instead of falling back to the scan
    val dir = java.nio.file.Files.createTempDirectory("graft-mvtrunc").toString
    val t = TxParquetSink(s"$dir/base")
    t.append((1 to 40).map(i => (i % 4, i.toLong)).toDF("g", "v"))
    MvCatalog.registerRollup(spark, t, Seq("g"), Seq("v"), s"$dir/mv",
      minMax = false)
    t.append(Seq((1, 100L)).toDF("g", "v"))
    t.compact(spark)      // base commit
    t.truncateHistory()   // horizon moves past the registered version
    t.append(Seq((2, 200L)).toDF("g", "v"))
    def q() = t.readSnapshot(spark).get
      .groupBy("g").agg(sum("v").as("s")).orderBy("g")
    val off = q().collect().toSeq
    withRule {
      val on = q() // must not throw during optimization
      assert(readsBase(on, t) && !readsView(on, s"$dir/mv"),
        "an incomplete feed range must keep the scan")
      assert(on.collect().toSeq === off)
    }
  }

  test("refreshIfStale: appends through the policy keep every registered view fresh, ticks incremental") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mvpol").toString
    val t = TxParquetSink(s"$dir/base")
    t.append((1 to 50).map(i => (i % 5, i.toLong)).toDF("g", "v"))
    val d0 = MvCatalog.registerRollup(spark, t, Seq("g"), Seq("v"),
      s"$dir/mv", minMax = false)
    // fresh view: the policy is a no-op
    assert(MvCatalog.refreshIfStale(spark, t).isEmpty)
    (1 to 4).foreach { i =>
      t.append(Seq((i, 1000L + i)).toDF("g", "v"))
      val d = MvCatalog.refreshIfStale(spark, t)
      assert(d.nonEmpty, s"commit $i: the policy must refresh")
      assert(d.head._1.baseVersion === t.version(),
        s"commit $i: the view must be FRESH after the policy tick")
      assert(d.head._2 === MvCatalog.RefreshOutcome.Merged,
        s"commit $i: the tick must be the incremental merge, not a rebuild")
    }
    // the view answers exactly like a rebuild would
    val d1 = MvCatalog.lookup(t.dir).get
    val inc = spark.read.schema(d1.schema).parquet(d1.mvPath)
      .orderBy("g").collect().toSeq
    val d2 = MvCatalog.registerRollup(spark, t, Seq("g"), Seq("v"),
      s"$dir/mv_rebuild", minMax = false)
    val full = spark.read.schema(d2.schema).parquet(d2.mvPath)
      .orderBy("g").collect().toSeq
    assert(inc === full)
    assert(d0.baseVersion < d1.baseVersion)
  }

  test("ROLLUP/CUBE/GROUPING SETS serve from the view: every branch view-only, answers match") {
    val (t, mvPath) = freshBase()
    MvCatalog.registerRollup(spark, t, Seq("g", "h"), Seq("v"), mvPath)
    def rollq() = t.readSnapshot(spark).get.rollup("g", "h")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"),
        min(col("v")).as("mn"), max(col("v")).as("mx"),
        grouping_id().as("gid"))
      .orderBy("gid", "g", "h")
    def cubeq() = t.readSnapshot(spark).get.cube("g", "h")
      .agg(sum(col("v")).as("s")).orderBy("g", "h")
    val rollOff = rollq().collect().toSeq
    val cubeOff = cubeq().collect().toSeq
    withRule {
      val on = rollq()
      assert(readsOnly(on, mvPath),
        "every grouping-set branch must read the view:\n" +
          on.queryExecution.optimizedPlan.toString)
      assert(on.collect().toSeq === rollOff)
      val cu = cubeq()
      assert(readsOnly(cu, mvPath))
      assert(cu.collect().toSeq === cubeOff)
      // SQL GROUPING SETS spelling through the same pattern
      t.readSnapshot(spark).get.createOrReplaceTempView("gs_tv")
      val sq = spark.sql("SELECT g, sum(v) AS s FROM gs_tv " +
        "GROUP BY g GROUPING SETS ((g), ())")
      assert(readsOnly(sq, mvPath))
    }
    MvCatalog.unregister(t.dir)
  }

  test("rollup over an empty (filtered) input yields ZERO rows, not a spurious grand total") {
    // review finding: the () grouping set used to become a global
    // Aggregate(Nil, …), which yields ONE row over empty input — the
    // native Aggregate-over-Expand groups by the grouping id and
    // yields none. The grand-total branch now carries a COUNT(*) > 0
    // guard.
    val (t, mvPath) = freshBase()
    MvCatalog.registerRollup(spark, t, Seq("g", "h"), Seq("v"), mvPath)
    def q() = t.readSnapshot(spark).get.where(col("g") === 99)
      .rollup("g").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val off = q().collect().toSeq
    assert(off.isEmpty, "fixture: native rollup over empty input is empty")
    withRule {
      val on = q()
      assert(readsOnly(on, mvPath),
        on.queryExecution.optimizedPlan.toString)
      assert(on.collect().toSeq === off,
        "the rewritten rollup must not invent a grand-total row")
      // and the guard must not SUPPRESS a legitimate grand total
      val full = t.readSnapshot(spark).get.rollup("g")
        .agg(count(lit(1)).as("n")).where(col("g").isNull)
      assert(full.collect().map(_.getLong(1)).toSeq === Seq(200L))
    }
    MvCatalog.unregister(t.dir)
  }

  test("retention GC reclaims only directories the refresher wrote — a user _r-named sibling survives") {
    // a name-pattern sweep would match a user table that happens to be
    // named like a refresh output and delete it; candidates are now
    // exactly the recorded engine writes
    val dir = java.nio.file.Files.createTempDirectory("graft-mvgcsafe").toString
    val t = TxParquetSink(s"$dir/base")
    t.append((1 to 30).map(i => (i % 3, i.toLong)).toDF("g", "v"))
    // the user's own parquet table, pattern-colliding name
    spark.range(5).toDF("x").write.parquet(s"$dir/mv_r2021")
    MvCatalog.registerRollup(spark, t, Seq("g"), Seq("v"),
      s"$dir/mv_r2020", minMax = false)
    (1 to 3).foreach { i =>
      t.append(Seq((i % 3, 100L + i)).toDF("g", "v"))
      val r = MvCatalog.refreshIfStale(spark, t,
        retention = MvCatalog.Retention(keep = 1, graceMs = 0L))
      assert(r.map(_._2) === Seq(MvCatalog.RefreshOutcome.Merged))
    }
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(s"$dir/mv_r2021")),
      "a user table matching the refresh name pattern must never be GC'd")
    val cur = MvCatalog.lookup(t.dir).get.mvPath
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(cur)))
    assert(!java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(s"$dir/mv_r2020")),
      "the superseded engine-written original IS reclaimed under keep=1")
    withRule {
      val q = t.readSnapshot(spark).get.groupBy("g").agg(sum("v").as("s"))
      assert(readsOnly(q, cur))
    }
    MvCatalog.unregister(t.dir)
  }

  test("a refresh write hops over a pattern-colliding user directory instead of overwriting it") {
    // second-review finding: the GC whitelist protected user tables
    // from DELETION, but refreshDef's mode-overwrite write to
    // <stem>_r<v> could still CLOBBER one when the base version
    // collides with the user's suffix
    val dir = java.nio.file.Files.createTempDirectory("graft-mvclob").toString
    val t = TxParquetSink(s"$dir/base")
    t.append((1 to 30).map(i => (i % 3, i.toLong)).toDF("g", "v"))
    // the user's own table at exactly the next refresh output name
    spark.range(7).toDF("x").write.parquet(s"$dir/mv_r1")
    MvCatalog.registerRollup(spark, t, Seq("g"), Seq("v"), s"$dir/mv",
      minMax = false)
    t.append(Seq((1, 100L)).toDF("g", "v")) // base moves to v1 = 1
    val r = MvCatalog.refreshIfStale(spark, t)
    assert(r.map(_._2) === Seq(MvCatalog.RefreshOutcome.Merged))
    val newDef = r.head._1
    assert(newDef.mvPath === s"$dir/mv_r1_x",
      s"the write must hop the foreign dir, landed ${newDef.mvPath}")
    assert(spark.read.parquet(s"$dir/mv_r1").count() === 7L,
      "the user's colliding table must be byte-for-byte untouched")
    withRule {
      val q = t.readSnapshot(spark).get.groupBy("g").agg(sum("v").as("s"))
      assert(readsOnly(q, newDef.mvPath))
    }
    MvCatalog.unregister(t.dir)
  }

  test("a STALE view still serves the rollup through per-branch compensation") {
    val (t, mvPath) = freshBase()
    MvCatalog.registerRollup(spark, t, Seq("g", "h"), Seq("v"), mvPath,
      minMax = false)
    t.append(Seq((1, 1, 500L), (9, 9, 900L)).toDF("g", "h", "v"))
    def q() = t.readSnapshot(spark).get.rollup("g")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n")).orderBy("g")
    val off = q().collect().toSeq
    withRule {
      val on = q()
      assert(readsView(on, mvPath),
        on.queryExecution.optimizedPlan.toString)
      assert(!readsPreRegistration(on, t, MvCatalog.lookup(t.dir).get.baseVersion),
        "compensated branches must read view + delta commits, never " +
          "the pre-registration base:\n" +
          on.queryExecution.optimizedPlan.toString)
      assert(on.collect().toSeq === off)
    }
    MvCatalog.unregister(t.dir)
  }

  test("rollup declines whole: computed grouping expression or uncoverable aggregate keeps the scan") {
    val (t, mvPath) = freshBase()
    MvCatalog.registerRollup(spark, t, Seq("g", "h"), Seq("v"), mvPath)
    withRule {
      // a computed grouping expression: the Expand projection carries
      // an alias of (g % 2), not a view grouping column
      val expr = t.readSnapshot(spark).get
        .rollup((col("g") % 2).as("gm"), col("h"))
        .agg(sum(col("v")).as("s"))
      assert(readsBase(expr, t) && !readsView(expr, mvPath))
      // one branch uncoverable -> ALL branches keep the scan (avg needs
      // the 2^53 stats proof this base does not carry)
      val av = t.readSnapshot(spark).get.rollup("g")
        .agg(avg(col("v")).as("a"))
      assert(readsBase(av, t) && !readsView(av, mvPath))
    }
    MvCatalog.unregister(t.dir)
  }

  private def readsPreRegistration(df: DataFrame, t: TxParquetSink,
      baseVersion: Long): Boolean = {
    val preBase = t.pathRows().collect {
      case (p, (v, _)) if v <= baseVersion => p
    }.toSet
    df.queryExecution.optimizedPlan.collectLeaves().exists {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.exists(p => preBase.contains(p.toUri.getPath))
        case _ => false
      }
      case _ => false
    }
  }

  test("refreshIfStale reports HOW each grain moved; a forced rebuild is loud, not silent") {
    // round-11 finding: the StreamMv "must stay incremental" pin
    // checked the output path, which rebuilds also write — vacuous. The
    // outcome is now part of the contract: this test FAILS if a rebuild
    // is ever reported as a merge (or vice versa).
    val dir = java.nio.file.Files.createTempDirectory("graft-mvout").toString
    val t = TxParquetSink(s"$dir/base")
    t.append((1 to 50).map(i => (i % 5, i.toLong)).toDF("g", "v"))
    MvCatalog.registerRollup(spark, t, Seq("g"), Seq("v"), s"$dir/mv",
      minMax = true)
    // insert-only tail: the incremental merge
    t.append(Seq((1, 500L)).toDF("g", "v"))
    val r1 = MvCatalog.refreshIfStale(spark, t)
    assert(r1.map(_._2) === Seq(MvCatalog.RefreshOutcome.Merged))
    // content-preserving commit only: a re-stamp, no job
    t.compact(spark)
    val r2 = MvCatalog.refreshIfStale(spark, t)
    assert(r2.map(_._2) === Seq(MvCatalog.RefreshOutcome.Restamped))
    // a retraction against STORED EXTREMES takes the targeted
    // affected-groups recompute — and the outcome says so (the
    // replay-path pin rejects only full rebuilds)
    t.deleteWhere(spark, "v = 500")
    val r3 = MvCatalog.refreshIfStale(spark, t)
    assert(r3.map(_._2) === Seq(MvCatalog.RefreshOutcome.Targeted),
      "a delete-bearing feed on a min/max view must report Targeted")
    assert(r3.head._1.baseVersion === t.version())
    // the targeted content equals a from-scratch rebuild
    val tchk = MvCatalog.registerRollup(spark, t, Seq("g"), Seq("v"),
      s"$dir/mv_tchk")
    assert(spark.read.schema(r3.head._1.schema).parquet(r3.head._1.mvPath)
      .orderBy("g").collect().toSeq ===
      spark.read.schema(tchk.schema).parquet(tchk.mvPath)
        .orderBy("g").collect().toSeq)
    MvCatalog.unregister(t.dir)
    MvCatalog.register(t.dir, r3.head._1)
    // a restated range (restore) also reports the rebuild
    t.append(Seq((2, 600L)).toDF("g", "v"))
    val v = t.version()
    t.restore(spark, v - 1)
    val r4 = MvCatalog.refreshIfStale(spark, t)
    assert(r4.map(_._2) === Seq(MvCatalog.RefreshOutcome.Rebuilt),
      "a restore in range must report Rebuilt")
    MvCatalog.unregister(t.dir)
  }

  test("refreshIfStale returns exactly the grains that MOVED, not the primary") {
    // ADVICE round-11: refreshIfStale returned lookup(dir) — the
    // first-registered grain — whenever ANY grain refreshed, so a
    // caller asserting freshness on the returned def could check a
    // grain the tick never touched.
    val (t, mvPath) = freshBase()
    MvCatalog.registerRollup(spark, t, Seq("g", "h"), Seq("v"),
      mvPath + "_fine", minMax = false) // PRIMARY (first-registered)
    t.append(Seq((1, 1, 5L)).toDF("g", "h", "v"))
    t.append(Seq((2, 2, 6L)).toDF("g", "h", "v"))
    // the coarse grain registers at the head; the fine one is 2 behind
    MvCatalog.registerRollup(spark, t, Seq("g"), Seq("v"),
      mvPath + "_coarse", minMax = false)
    val moved = MvCatalog.refreshIfStale(spark, t, lagBudget = 1)
    assert(moved.map(_._1.groupCols) === Seq(Seq("g", "h")),
      "only the past-budget fine grain moved; the primary-def shortcut " +
        "would have returned it anyway, but a COARSE-primary layout " +
        "must not report the untouched grain")
    assert(moved.head._1.baseVersion === t.version())
    MvCatalog.unregister(t.dir)
  }

  test("retention reclaims superseded view dirs; the registered and grace-protected ones survive") {
    // round-11 perf_weak: every refresh lands a full view copy at a new
    // path and nothing ever deleted the old ones — view-size × commits
    // storage under a per-commit maintenance loop.
    def viewDirs(dir: String): Seq[String] = {
      val l = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      try {
        import scala.jdk.CollectionConverters._
        l.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("mv")).toSeq.sorted
      } finally l.close()
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-mvgc").toString
    val t = TxParquetSink(s"$dir/base")
    t.append((1 to 50).map(i => (i % 5, i.toLong)).toDF("g", "v"))
    MvCatalog.registerRollup(spark, t, Seq("g"), Seq("v"), s"$dir/mv",
      minMax = false)
    (1 to 4).foreach { i =>
      t.append(Seq((i, 100L + i)).toDF("g", "v"))
      val r = MvCatalog.refreshIfStale(spark, t,
        retention = MvCatalog.Retention(keep = 2, graceMs = 0L))
      assert(r.map(_._2) === Seq(MvCatalog.RefreshOutcome.Merged))
      val dirs = viewDirs(dir)
      assert(dirs.size <= 2, s"keep=2 must bound the dirs, got $dirs")
      val cur = MvCatalog.lookup(t.dir).get.mvPath
      assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(cur)),
        "the CURRENT registered view must never be reclaimed")
    }
    // the surviving view still answers (and the rewrite still fires)
    withRule {
      val q = t.readSnapshot(spark).get.groupBy("g").agg(sum("v").as("s"))
      assert(readsOnly(q, MvCatalog.lookup(t.dir).get.mvPath))
      assert(q.collect().map(r => (r.getInt(0), r.getLong(1))).toMap ===
        t.readSnapshot(spark).get.groupBy("g").agg(sum("v"))
          .collect().map(r => (r.getInt(0), r.getLong(1))).toMap)
    }
    // a GENEROUS grace window protects in-flight readers: nothing young
    // is reclaimed even past the keep count
    t.append(Seq((1, 999L)).toDF("g", "v"))
    val before = viewDirs(dir).size
    MvCatalog.refreshIfStale(spark, t,
      retention = MvCatalog.Retention(keep = 1, graceMs = 60L * 60 * 1000))
    assert(viewDirs(dir).size === before + 1,
      "dirs inside the grace window must survive keep=1")
    MvCatalog.unregister(t.dir)
  }

  test("save prunes .mv files for bases that are no longer registered") {
    val (t, mvPath) = freshBase()
    MvCatalog.registerRollup(spark, t, Seq("g"), Seq("v"), mvPath,
      minMax = false)
    val catDir = java.nio.file.Files
      .createTempDirectory("graft-mvprune").toString
    MvCatalog.save(catDir)
    def mvFiles(): Set[String] = {
      val l = java.nio.file.Files.list(java.nio.file.Paths.get(catDir))
      try {
        import scala.jdk.CollectionConverters._
        l.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".mv")).toSet
      } finally l.close()
    }
    val mine = java.net.URLEncoder.encode(t.dir,
      java.nio.charset.StandardCharsets.UTF_8) + ".mv"
    assert(mvFiles().contains(mine))
    MvCatalog.unregister(t.dir)
    // with the base retired, the next save must not leave the stale
    // file behind for load() to re-arm a dropped table from (other
    // live registrations — fixtures in this JVM — are untouched)
    MvCatalog.save(catDir)
    assert(!mvFiles().contains(mine),
      "save must prune .mv files for unregistered bases")
  }

  test("refreshIfStale with a lag budget amortizes; compensation serves the in-between window") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mvlag").toString
    val t = TxParquetSink(s"$dir/base")
    t.append((1 to 50).map(i => (i % 5, i.toLong)).toDF("g", "v"))
    MvCatalog.registerRollup(spark, t, Seq("g"), Seq("v"), s"$dir/mv",
      minMax = false)
    val v0 = MvCatalog.lookup(t.dir).get.baseVersion
    t.append(Seq((1, 500L)).toDF("g", "v"))
    assert(MvCatalog.refreshIfStale(spark, t, lagBudget = 2).isEmpty,
      "one commit behind is inside the budget")
    t.append(Seq((2, 600L)).toDF("g", "v"))
    assert(MvCatalog.refreshIfStale(spark, t, lagBudget = 2).isEmpty)
    // inside the lag window the rewrite still serves: view + tail
    withRule {
      def q() = t.readSnapshot(spark).get
        .groupBy("g").agg(sum("v").as("s")).orderBy("g")
      val on = q()
      assert(readsView(on, s"$dir/mv"),
        on.queryExecution.optimizedPlan.toString)
      assert(on.collect().toSeq === {
        val prev = spark.experimental.extraOptimizations
        spark.experimental.extraOptimizations =
          prev.filterNot(_ == MvRewrite)
        try q().collect().toSeq
        finally spark.experimental.extraOptimizations = prev
      })
    }
    // the third commit crosses the budget: one amortized refresh
    t.append(Seq((3, 700L)).toDF("g", "v"))
    val d = MvCatalog.refreshIfStale(spark, t, lagBudget = 2)
    assert(d.nonEmpty && d.head._1.baseVersion === t.version())
    assert(d.head._1.baseVersion === v0 + 3)
    assert(d.head._2 === MvCatalog.RefreshOutcome.Merged)
  }

  private def readsView(df: DataFrame, mvPath: String): Boolean =
    df.queryExecution.optimizedPlan.collectLeaves().exists {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.forall(_.toUri.getPath.startsWith(mvPath))
        case _ => false
      }
      case _ => false
    }

  test("a fully-retracted group leaves the compensated answer; a RESTORE in range stands down") {
    val (t, mvPath) = freshBase()
    MvCatalog.registerRollup(spark, t, Seq("g", "h"), Seq("v"), mvPath)
    // g = 4 exists only via v ≡ 4 (mod 5) rows; retract them all
    t.deleteWhere(spark, "g = 4")
    def q() = t.readSnapshot(spark).get
      .groupBy("g").agg(sum("v").as("s"), count(lit(1)).as("c")).orderBy("g")
    def eq() = t.readSnapshot(spark).get
      .groupBy("g").agg(max("v").as("hi"), min("v").as("lo")).orderBy("g")
    val off = q().collect().toSeq
    val eOff = eq().collect().toSeq
    assert(!off.exists(_.getInt(0) == 4), "fixture: group 4 must be gone")
    withRule {
      assert(q().collect().toSeq === off,
        "a retracted group must leave the compensated view")
      // MIN/MAX over a retraction serves through the TARGETED
      // affected-groups compensation (round 12): only the retracted
      // groups recompute from the base, the rest stay view ⊕ tail —
      // before this, an extremes query here fell back to the fact scan
      val e = eq()
      assert(readsView(e, mvPath),
        "extremes over a delete-bearing tail must serve through the " +
          "targeted compensation:\n" +
          e.queryExecution.optimizedPlan.toString)
      assert(e.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
      }.nonEmpty, "the base recompute must be SEMI-JOIN-restricted to " +
        "the affected groups")
      assert(e.collect().toSeq === eOff)
    }
    // restore restates contents the feed cannot represent: stand down
    t.restore(spark, 1L)
    val off2 = q().collect().toSeq
    withRule {
      val on = q()
      assert(readsBase(on, t) && !readsOnly(on, mvPath),
        "a restored range must keep the scan")
      assert(on.collect().toSeq === off2)
    }
  }

  test("targeted compensation prunes by the delete predicate; SUM-only panels never touch the base") {
    val (t, mvPath) = freshBase()
    MvCatalog.registerRollup(spark, t, Seq("g", "h"), Seq("v"), mvPath)
    t.deleteWhere(spark, "g = 2") // a GROUP-column predicate delete
    // materialize the mask (the maintainIfNeeded discipline): a masked
    // log shatters the snapshot into per-mask scan groups, which the
    // coverage walk refuses; post-compact the scan is whole again while
    // the FEED still carries the delete's retractions
    t.compact(spark)
    t.append(Seq((2, 1, 77L), (0, 0, 5L)).toDF("g", "h", "v"))
    def eq() = t.readSnapshot(spark).get.groupBy("g")
      .agg(min("v").as("lo"), max("v").as("hi"), sum("v").as("s"))
      .orderBy("g")
    def sq() = t.readSnapshot(spark).get.groupBy("g")
      .agg(sum("v").as("s"), count(lit(1)).as("c")).orderBy("g")
    val (eOff, sOff) = (eq().collect().toSeq, sq().collect().toSeq)
    withRule {
      val e = eq()
      val semis = e.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
      }
      assert(semis.nonEmpty, "extremes need the targeted recompute")
      // the base recompute branch is pre-filtered by the tail's own
      // delete predicate (group-column-only, so it transplants): the
      // base read tracks the delete footprint, not the table
      val pruned = semis.exists(_.left.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.references.map(_.name).toSet == Set("g") &&
            !f.condition.sql.toUpperCase.contains("NOT") &&
            f.condition.sql.contains("2") => f
      }.nonEmpty)
      assert(pruned, "the delete predicate must transplant onto the " +
        "recompute branch:\n" + e.queryExecution.optimizedPlan.toString)
      assert(e.collect().toSeq === eOff)
      // a SUM/COUNT panel over the same tail takes the CHEAP path:
      // view ⊕ signed feed, no semi-join, no base recompute
      val sP = sq()
      assert(sP.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
      }.isEmpty, "SUM-only must not pay the affected-groups recompute:\n" +
        sP.queryExecution.optimizedPlan.toString)
      assert(sP.collect().toSeq === sOff)
    }
    MvCatalog.unregister(t.dir)
  }

  test("shadowing projection, foreign aggregate, and derived grouping all keep the scan") {
    val (t, mvPath) = freshBase()
    MvCatalog.registerRollup(spark, t, Seq("g", "h"), Seq("v"), mvPath)
    withRule {
      // a computed alias shadowing the value column by name must never
      // reach the view's pre-aggregates
      val shadow = t.readSnapshot(spark).get
        .select(col("g"), (col("v") % 3).as("v"))
        .groupBy("g").agg(sum("v").as("s"))
      assert(readsBase(shadow, t), "shadowed column must keep the scan")
      val avg_ = t.readSnapshot(spark).get
        .groupBy("g").agg(avg("v").as("a"))
      assert(readsBase(avg_, t),
        "AVG without commit-log stats (no 2^53 proof) must keep the scan")
      val derived = t.readSnapshot(spark).get
        .groupBy((col("g") + 1).as("g1")).agg(sum("v").as("s"))
      assert(readsBase(derived, t), "derived grouping must keep the scan")
      val distinct_ = t.readSnapshot(spark).get
        .groupBy("g").agg(countDistinct(col("v")).as("d"))
      assert(readsBase(distinct_, t), "DISTINCT is not re-aggregable")
    }
  }

  test("insert-only refresh merges incrementally and equals a from-scratch rebuild") {
    val (t, mvPath) = freshBase()
    val d0 = MvCatalog.registerRollup(spark, t, Seq("g", "h"), Seq("v"), mvPath)
    t.append(Seq((1, 1, 500L), (9, 9, 7L)).toDF("g", "h", "v"))
    val d1 = MvCatalog.refresh(spark, t).get
    assert(d1.baseVersion === t.version())
    assert(d1.mvPath !== d0.mvPath, "refresh must land at a new path")
    // incremental contents ≡ recompute from the current snapshot
    val inc = spark.read.schema(d1.schema).parquet(d1.mvPath)
      .orderBy("g", "h").collect().toSeq
    val d2 = MvCatalog.registerRollup(spark, t, Seq("g", "h"), Seq("v"),
      mvPath + "_rebuild")
    val full = spark.read.schema(d2.schema).parquet(d2.mvPath)
      .orderBy("g", "h").collect().toSeq
    assert(inc === full, "incremental refresh diverged from rebuild")
    // and the refreshed registration re-arms the rule
    MvCatalog.register(t.dir, d1)
    withRule {
      val q = t.readSnapshot(spark).get.groupBy("g").agg(sum("v").as("s"))
      assert(readsOnly(q, d1.mvPath))
    }
  }

  test("a delete-bearing feed recomputes affected groups on a view with extremes, merges a SUM/COUNT-only view") {
    val (t, mvPath) = freshBase()
    // extremes stored: retraction takes the targeted recompute path,
    // whose content must equal a from-scratch rebuild exactly
    MvCatalog.registerRollup(spark, t, Seq("g"), Seq("v"), mvPath)
    t.deleteWhere(spark, "h = 2")
    val d1 = MvCatalog.refresh(spark, t).get
    val rebuilt = spark.read.schema(d1.schema).parquet(d1.mvPath)
      .orderBy("g").collect().toSeq
    val check = MvCatalog.registerRollup(spark, t, Seq("g"), Seq("v"),
      mvPath + "_chk")
    assert(rebuilt === spark.read.schema(check.schema).parquet(check.mvPath)
      .orderBy("g").collect().toSeq)

    // SUM/COUNT-only view: the same retraction merges incrementally
    // (signed deltas), including a group vanishing outright
    val (t2, mvPath2) = freshBase()
    val s0 = MvCatalog.registerRollup(spark, t2, Seq("g"), Seq("v"),
      mvPath2, minMax = false)
    assert(s0.mins.isEmpty && s0.maxs.isEmpty)
    t2.deleteWhere(spark, "g = 2")
    val s1 = MvCatalog.refresh(spark, t2).get
    assert(s1.mvPath != s0.mvPath && s1.mvPath.contains("_r"),
      "SUM/COUNT-only refresh must take the incremental path")
    val inc = spark.read.schema(s1.schema).parquet(s1.mvPath)
      .orderBy("g").collect().toSeq
    val chk = MvCatalog.registerRollup(spark, t2, Seq("g"), Seq("v"),
      mvPath2 + "_chk", minMax = false)
    assert(inc === spark.read.schema(chk.schema).parquet(chk.mvPath)
      .orderBy("g").collect().toSeq)
    assert(!inc.exists(_.getInt(0) == 2), "the deleted group must leave the view")
  }

  test("the rewrite serves a DIVERGED clone from its own registered view") {
    val (t, mvPath) = freshBase()
    val cloneDir = java.nio.file.Files
      .createTempDirectory("graft-mvspec-clone").toString + "/c"
    val c = TxParquetSink(cloneDir)
    t.cloneTo(c)
    c.append(Seq((1, 1, 999L)).toDF("g", "h", "v"))
    MvCatalog.registerRollup(spark, c, Seq("g", "h"), Seq("v"), mvPath)
    def q() = c.readSnapshot(spark).get
      .groupBy("g").agg(sum("v").as("s"), count(lit(1)).as("c"))
      .orderBy("g")
    val off = q().collect().toSeq
    withRule {
      val on = q()
      assert(readsOnly(on, mvPath),
        "a diverged clone's mixed-root scan must still resolve to the clone")
      assert(on.collect().toSeq === off)
    }
  }

  test("COUNT(col) re-sums the view's non-null counts, including through refresh") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mvspec-n").toString
    val t = TxParquetSink(s"$dir/base")
    t.append(Seq((1, Some(10L)), (1, None), (2, Some(5L)), (2, None))
      .toDF("g", "v"))
    MvCatalog.registerRollup(spark, t, Seq("g"), Seq("v"), s"$dir/mv")
    def q() = t.readSnapshot(spark).get
      .groupBy("g")
      .agg(count(col("v")).as("nv"), count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("g")
    val off = q().collect().toSeq
    withRule {
      val on = q()
      assert(readsOnly(on, s"$dir/mv"), on.queryExecution.optimizedPlan.toString)
      assert(on.collect().toSeq === off)
    }
    t.append(Seq((1, None: Option[Long]), (3, Some(2L))).toDF("g", "v"))
    val d1 = MvCatalog.refresh(spark, t).get
    val off2 = q().collect().toSeq
    withRule {
      val on2 = q()
      assert(readsOnly(on2, d1.mvPath))
      assert(on2.collect().toSeq === off2)
    }
  }

  test("HAVING composes above the rewritten aggregate (output exprIds preserved)") {
    val (t, mvPath) = freshBase()
    MvCatalog.registerRollup(spark, t, Seq("g", "h"), Seq("v"), mvPath)
    def q() = t.readSnapshot(spark).get
      .groupBy("g").agg(sum("v").as("s"), count(lit(1)).as("c"))
      .where(col("s") > 1000L && col("c") > 10L)
      .orderBy("g")
    val off = q().collect().toSeq
    withRule {
      val on = q()
      assert(readsOnly(on, mvPath), on.queryExecution.optimizedPlan.toString)
      assert(on.collect().toSeq === off)
      assert(off.nonEmpty, "the HAVING probe must keep some groups")
    }
  }

  test("a RESTORE in the refresh range forces a rebuild — the feed cannot represent it") {
    val (t, mvPath) = freshBase()
    val d0 = MvCatalog.registerRollup(spark, t, Seq("g"), Seq("v"), mvPath,
      minMax = false)
    val vReg = t.version()
    t.deleteWhere(spark, "g = 2")
    t.restore(spark, vReg) // puts g=2 back; the feed shows only the delete
    val d1 = MvCatalog.refresh(spark, t).get
    assert(d1.baseVersion === t.version())
    val inc = spark.read.schema(d1.schema).parquet(d1.mvPath)
      .orderBy("g").collect().toSeq
    val chk = MvCatalog.registerRollup(spark, t, Seq("g"), Seq("v"),
      mvPath + "_chk", minMax = false)
    assert(inc === spark.read.schema(chk.schema).parquet(chk.mvPath)
      .orderBy("g").collect().toSeq,
      "refresh across a restore must rebuild, not fold a feed that " +
        "subtracts rows the restore put back")
    // restore-only range: the None-feed re-stamp must NOT mark a
    // stale view fresh either
    val (t2, mvPath2) = freshBase()
    MvCatalog.registerRollup(spark, t2, Seq("g"), Seq("v"), mvPath2,
      minMax = false)
    val vReg2 = t2.version()
    t2.deleteWhere(spark, "g = 1")
    MvCatalog.refresh(spark, t2) // folds the delete (correct)
    t2.restore(spark, vReg2)     // g=1 rows return; feed for this range: empty
    val d2 = MvCatalog.refresh(spark, t2).get
    val inc2 = spark.read.schema(d2.schema).parquet(d2.mvPath)
      .where(col("g") === 1).collect()
    assert(inc2.nonEmpty, "the restored group must be back in the view")
  }

  test("a non-deterministic filter keeps the scan (whole-cell sampling is not row sampling)") {
    val (t, mvPath) = freshBase()
    MvCatalog.registerRollup(spark, t, Seq("g", "h"), Seq("v"), mvPath)
    withRule {
      // rand() has no attribute references, so the reference check
      // alone passes vacuously — the deterministic guard must catch it
      // (bound not provably true, or Spark folds the conjunct away)
      val q = t.readSnapshot(spark).get
        .where(rand(7) <= 0.99 && col("h") === 1)
        .groupBy("g").agg(sum("v").as("s"))
      assert(readsBase(q, t), "non-deterministic filters must keep the scan")
    }
  }

  test("NULL group keys and all-NULL sums survive the refresh merge") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mvspec-null").toString
    val t = TxParquetSink(s"$dir/base")
    // group null: 2 rows; group 1: values all NULL (sum must be NULL)
    t.append(Seq((Option.empty[Int], Some(10L)), (None, Some(20L)),
      (Some(1), None), (Some(2), Some(5L))).toDF("g", "v"))
    MvCatalog.registerRollup(spark, t, Seq("g"), Seq("v"), s"$dir/mv",
      minMax = false)
    // retract the whole NULL group; touch nothing else
    t.deleteWhere(spark, "g IS NULL")
    val d1 = MvCatalog.refresh(spark, t).get
    val mv1 = spark.read.schema(d1.schema).parquet(d1.mvPath)
      .orderBy("g").collect().toSeq
    val chk = MvCatalog.registerRollup(spark, t, Seq("g"), Seq("v"),
      s"$dir/mv_chk", minMax = false)
    val full = spark.read.schema(chk.schema).parquet(chk.mvPath)
      .orderBy("g").collect().toSeq
    assert(mv1 === full,
      "a fully-retracted NULL group must leave the view (null-safe join)")
    assert(!mv1.exists(_.isNullAt(0)), "the NULL group is gone")
    // group 1 (all-NULL values) must keep sum = NULL through the merge
    val g1 = mv1.find(r => !r.isNullAt(0) && r.getInt(0) == 1).get
    assert(g1.isNullAt(g1.fieldIndex("sum_v")),
      "SUM over zero non-null values is NULL, not 0, after a refresh")
    // and the rewrite serves that NULL
    MvCatalog.register(t.dir, d1)
    withRule {
      val q = t.readSnapshot(spark).get.groupBy("g")
        .agg(sum("v").as("s")).where(col("g") === 1)
      assert(readsOnly(q, d1.mvPath))
      assert(q.collect().head.isNullAt(1))
    }
  }

  test("the registry persists: save + unregister + load re-arms the rule; stale loads stay disarmed") {
    val (t, mvPath) = freshBase()
    MvCatalog.registerRollup(spark, t, Seq("g", "h"), Seq("v"), mvPath)
    val catDir = java.nio.file.Files
      .createTempDirectory("graft-mvcat").toString
    MvCatalog.save(catDir)
    MvCatalog.unregister(t.dir)
    withRule {
      val q = t.readSnapshot(spark).get.groupBy("g").agg(sum("v").as("s"))
      assert(readsBase(q, t), "no registration, no rewrite")
    }
    assert(MvCatalog.load(catDir) >= 1)
    withRule {
      val q = t.readSnapshot(spark).get
        .groupBy("g").agg(sum("v").as("s"), count(lit(1)).as("c"),
          min("v").as("lo"), count(col("v")).as("nv"))
      assert(readsOnly(q, mvPath), "the loaded def re-arms the full panel")
    }
    // base moves after the save: the loaded def is stale and must not
    // fire until refreshed — then it fires again
    t.append(Seq((8, 8, 8L)).toDF("g", "h", "v"))
    MvCatalog.unregister(t.dir)
    MvCatalog.load(catDir)
    withRule {
      val q = t.readSnapshot(spark).get.groupBy("g").agg(sum("v").as("s"))
      assert(readsBase(q, t), "stale persistence must stay disarmed")
    }
    val d = MvCatalog.refresh(spark, t).get
    withRule {
      assert(readsOnly(
        t.readSnapshot(spark).get.groupBy("g").agg(sum("v").as("s")),
        d.mvPath))
    }
  }

  test("the rewrite fires through SQL text too (temp view + spark.sql)") {
    val (t, mvPath) = freshBase()
    MvCatalog.registerRollup(spark, t, Seq("g", "h"), Seq("v"), mvPath)
    t.readSnapshot(spark).get.createOrReplaceTempView("mv_sql_base")
    try {
      def q() = spark.sql(
        """SELECT g, sum(v) AS s, count(*) AS c, min(v) AS lo
          |FROM mv_sql_base WHERE h = 1 GROUP BY g ORDER BY g""".stripMargin)
      val off = q().collect().toSeq
      withRule {
        val on = q()
        assert(readsOnly(on, mvPath),
          on.queryExecution.optimizedPlan.toString)
        assert(on.collect().toSeq === off)
      }
    } finally spark.catalog.dropTempView("mv_sql_base")
  }

  test("a query grouping outside the view grain keeps the scan") {
    val (t, mvPath) = freshBase()
    MvCatalog.registerRollup(spark, t, Seq("g"), Seq("v"), mvPath)
    withRule {
      val q = t.readSnapshot(spark).get
        .groupBy("h").agg(sum("v").as("s"))
      assert(readsBase(q, t), "h is not a view grouping column")
    }
  }
}
