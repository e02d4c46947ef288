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
