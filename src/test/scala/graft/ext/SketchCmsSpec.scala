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
