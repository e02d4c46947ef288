package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-min sketch invariants: the one-sided error bound and the
  * bounded-state property that justifies the sketch at scale. */
class SketchCmsSpec extends SparkSpec {

  test("CMS estimates never undercount and heavy hitters come back in exact order") {
    val hh = SketchOps.cmsHeavyHitters(spark, sfSmoke).cache()
    try {
      // one-sided error: est >= exact for EVERY term (the CMS guarantee)
      assert(hh.where(col("est_cnt") < col("exact_cnt")).count() == 0)
      assert(hh.where(col("overcount") =!= col("est_cnt") - col("exact_cnt")).count() == 0)
      // ranked output is exact-count descending
      val rows = hh.select("exact_cnt").collect().map(_.getLong(0)).toSeq
      assert(rows == rows.sortBy(-_))
      assert(rows.size == 20)
    } finally hh.unpersist()
  }

  test("join-cardinality estimates audit against exact sizes on every FK relation") {
    val jc = SketchOps.joinCardinality(spark, sfSmoke).cache()
    try {
      assert(jc.count() == SketchOps.JoinCardPairs.size)
      val rows = jc.collect().map(r => r.getString(0) -> r).toMap
      // FK integrity makes matching keys == child-side distinct keys
      SketchOps.JoinCardPairs.foreach { case (ta, _, tb, _) =>
        val r = rows(s"$ta-$tb")
        assert(r.getAs[Long]("n_match_exact") == r.getAs[Long]("d_a_exact"))
        // every child row finds exactly one parent -> join == child rows
        assert(r.getAs[Long]("join_exact") == r.getAs[Long]("rows_a"))
      }
      // a side with < k distinct keys sketches EXACTLY (estimate == count)
      val sup = rows("lineitem-supplier")
      if (sup.getAs[Long]("d_b_exact") < SketchOps.JoinCardK)
        assert(sup.getAs[Double]("d_b_kmv") == sup.getAs[Long]("d_b_exact").toDouble)
      // estimator sanity: within 60% relative error at k=64 (4σ ~ 1/sqrt(63))
      assert(jc.where(abs(col("rel_err")) > 0.6).count() == 0,
        jc.select("rel", "rel_err").collect().mkString(", "))
    } finally jc.unpersist()
  }

  test("micro-batch sketches merge to exactly the one-shot corpus sketch") {
    import spark.implicits._
    val docs = TextOps.withWords(TextOps.docs(spark, sfSmoke))
      .select(col("doc_id"), explode(col("ws")).as("w"))
    // three disjoint "micro-batches" by doc_id stripe
    val parts = (0 until 3).map(i =>
      SketchOps.cmsSketchOf(docs.where(pmod(col("doc_id"), lit(3)) === i).select("w")))
    val merged = parts.reduce(SketchOps.mergeSketches)
    val oneShot = SketchOps.cmsSketch(spark, sfSmoke)
    // counter-exact equality both ways (anti-join in each direction)
    assert(merged.join(oneShot, Seq("r", "bucket", "cnt"), "left_anti").count() == 0)
    assert(oneShot.join(merged, Seq("r", "bucket", "cnt"), "left_anti").count() == 0)
  }

  test("CMS stream replay: monotone state, one-sided bound at every prefix, final = one-shot") {
    val rep = SketchOps.cmsStreamReplay(spark, sfSmoke).cache()
    try {
      // one-sided bound holds at EVERY prefix, not just the corpus
      assert(rep.where(col("est_cnt") < col("exact_prefix")).count() == 0)
      assert(rep.where(col("overcount") < 0).count() == 0)
      // counters only ever grow: est monotone non-decreasing per term
      val shrunk = rep.as("a").join(rep.as("b"),
          col("a.term") === col("b.term") && col("a.batch") < col("b.batch") &&
            col("a.est_cnt") > col("b.est_cnt"))
        .count()
      assert(shrunk == 0, "sketch state shrank between batches")
      // after the last batch the replayed state IS the corpus sketch:
      // final estimates equal the one-shot heavy-hitter estimates
      val last = rep.where(col("batch") === SketchOps.ReplayBatches - 1)
        .select(col("term"), col("est_cnt"), col("exact_prefix"))
      val oneShot = SketchOps.cmsHeavyHitters(spark, sfSmoke)
        .select(col("term"), col("est_cnt").as("os_est"),
          col("exact_cnt").as("os_exact"))
      val joined = last.join(oneShot, Seq("term")).cache()
      try {
        assert(joined.count() == 20) // same probe set
        assert(joined.where(col("est_cnt") =!= col("os_est") ||
          col("exact_prefix") =!= col("os_exact")).count() == 0)
      } finally joined.unpersist()
    } finally rep.unpersist()
  }

  test("HLL estimate lands inside the m=64 error budget; halves merge to the one-shot sketch") {
    val res = SketchOps.hllDistinctUsers(spark, sfSmoke).cache()
    try {
      assert(res.count() > 0)
      // 3σ of the raw-estimator standard error 1.04/√m ≈ 0.13 → 0.39
      assert(res.where(col("rel_err") > 0.39).count() == 0,
        "HLL raw estimate outside three standard errors")
      assert(res.where(col("n_empty_buckets") < 0 ||
        col("n_empty_buckets") > SketchOps.HllM).count() == 0)
      // sketch state is bounded: ≤ m occupied buckets per group
      val events = graft.etl.Star.events(spark, sfSmoke)
      val full = SketchOps.hllPerBucket(events)
      assert(full.groupBy("event_type").count()
        .where(col("count") > SketchOps.HllM).count() == 0)
      // mergeability: bucket-wise MAX of two disjoint halves == one-shot
      val merged = SketchOps.hllPerBucket(events.where(col("event_id") % 2 === 0))
        .unionByName(SketchOps.hllPerBucket(events.where(col("event_id") % 2 =!= 0)))
        .groupBy("event_type", "bucket").agg(max("mrho").as("mrho"))
      assert(merged.join(full, Seq("event_type", "bucket", "mrho"), "left_anti").count() == 0)
      assert(full.join(merged, Seq("event_type", "bucket", "mrho"), "left_anti").count() == 0)
    } finally res.unpersist()
  }

  test("trailing HLL window: merged sketch == one-shot sketch of the window slice") {
    val res = SketchOps.hllTrailingDistinct(spark, sfSmoke).cache()
    try {
      assert(res.count() > 0)
      // same 3σ raw-estimator budget as the per-type sketch
      assert(res.where(col("rel_err") > 0.39).count() == 0)
      // the window merge is exact: for a probe day, the trailing merged
      // estimate equals the one-shot estimate over the raw 7-day slice —
      // sketch(∪ days) == bucket-max of daily sketches, per definition
      val act = graft.etl.Star.events(spark, sfSmoke)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val probe = res.orderBy(col("day").desc).limit(1)
        .select(col("day").cast("date")).collect().head.getDate(0)
      val slice = act.where(col("day") > date_sub(lit(probe), SketchOps.TrailingDays)
        && col("day") <= lit(probe))
      val oneShot = SketchOps.hllPerBucket(
        slice.select(lit("x").as("event_type"), col("user_id")))
        .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${SketchOps.HllWBits + 1} - mrho)")))
        .collect().head.getLong(0)
      val exactSlice = slice.select("user_id").distinct().count()
      val probeRow = res.where(col("day").cast("date") === lit(probe)).collect().head
      assert(probeRow.getAs[Long]("n_exact") == exactSlice)
      // reconstruct t_present from the reported estimate path: estimates
      // agree iff the merged sketch state equals the one-shot state
      val merged = SketchOps.hllTrailingDistinct(spark, sfSmoke) // plan reuse
      assert(merged.where(col("day").cast("date") === lit(probe))
        .collect().head.getDouble(2) == probeRow.getDouble(2))
      val mergedState = {
        val daily = act
          .select(col("day"), TextOps.h32(col("user_id").cast("string")).as("h"))
          .withColumn("bucket", expr(s"CAST(h DIV ${1L << SketchOps.HllWBits} AS INT)"))
          .withColumn("w", col("h") % lit(1L << SketchOps.HllWBits))
          .withColumn("rho", expr(SketchOps.hllRhoCase("w")))
          .groupBy("day", "bucket").agg(max("rho").as("mrho"))
        daily.where(col("day") > date_sub(lit(probe), SketchOps.TrailingDays)
          && col("day") <= lit(probe))
          .groupBy("bucket").agg(max("mrho").as("mrho"))
          .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${SketchOps.HllWBits + 1} - mrho)")))
          .collect().head.getLong(0)
      }
      assert(mergedState == oneShot, "bucket-max window merge != one-shot window sketch")
    } finally res.unpersist()
  }

  test("sketch state is bounded by depth x width regardless of corpus") {
    val sk = SketchOps.cmsSketch(spark, sfSmoke).cache()
    try {
      assert(sk.count() <= SketchOps.Depth.toLong * SketchOps.Width)
      assert(sk.select("r").distinct().count() == SketchOps.Depth)
      assert(sk.where(col("bucket") < 0 || col("bucket") >= SketchOps.Width).count() == 0)
      // total mass per row equals the token-stream length (counters are sums)
      val tokenCount = TextOps.withWords(TextOps.docs(spark, sfSmoke))
        .select(explode(col("ws"))).count()
      val perRow = sk.groupBy("r").agg(sum("cnt").as("mass"))
        .select("mass").collect().map(_.getLong(0)).toSet
      assert(perRow == Set(tokenCount))
    } finally sk.unpersist()
  }
}
