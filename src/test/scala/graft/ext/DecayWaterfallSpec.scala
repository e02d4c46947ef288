package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Decayed top-k, Q30 waterfall, and embedding outliers: planted
  * trend decay, delta conservation, and a hand-computed far point.
  * End-to-end values are pinned by the DuckDB twins. */
class DecayWaterfallSpec extends SparkSpec {
  import spark.implicits._

  test("decayed top-k: a burst decays off the board, a new burst takes over") {
    // 40 docs → 4 batches of 10. "hot" bursts in batch 0 (4/doc = 40),
    // "fresh" bursts in batch 3 (30); "base" is constant (10/batch).
    val docs = (0L to 39L).map { id =>
      val batch = id / 10
      val txt =
        if (batch == 0) "base hot hot hot hot"
        else if (batch == 3) "base fresh fresh fresh"
        else "base"
      (id, txt)
    }.toDF("doc_id", "text")
    val dir = tempDataDir("documents" -> docs)
    val r = SketchOps.decayedTopkReplay(spark, dir).collect()
      .map(row => (row.getInt(0), row.getString(2)) -> (row.getInt(1), row.getLong(3)))
      .toMap
    // batch 0: hot leads 40 vs base 10
    assert(r((0, "hot"))._1 == 1 && r((0, "hot"))._2 == 40L)
    // halving: 40 → 20 → 10 → 5; base recharges to 10+carry
    assert(r((1, "hot"))._2 == 20L && r((2, "hot"))._2 == 10L)
    assert(r((3, "hot"))._2 == 5L)
    // batch 3: the new burst leads, the old one has decayed below base
    assert(r((3, "fresh"))._1 == 1 && r((3, "fresh"))._2 == 30L)
    assert(r((3, "base"))._1 == 2)
    assert(r((3, "hot"))._1 == 3)
  }

  test("q30 waterfall: deltas reconcile against the yearly aggregate, ranks complete") {
    val res = graft.olap.Queries.q30Waterfall(spark, sfSmoke).collect()
      .map(r => (r.getInt(0), r.getAs[Number](1).longValue, r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(res.map(_._1).sorted.toSeq == (1 to res.length))
    val yearly = graft.etl.Star.salesFact(spark, sfSmoke)
      .groupBy(expr("CAST(year(time_id) AS INT)").as("year"), col("store_id"))
      .agg(sum((col("total_revenue") * 100).cast("long")).as("cents"))
    val ym = yearly.agg(max("year")).collect()(0).getInt(0)
    val cur = yearly.where(col("year") === ym)
      .collect().map(r => r.getAs[Number](1).longValue -> r.getLong(2)).toMap
    val prev = yearly.where(col("year") === ym - 1)
      .collect().map(r => r.getAs[Number](1).longValue -> r.getLong(2)).toMap
    res.foreach { case (_, store, rp, rc, d) =>
      assert(rp == prev.getOrElse(store, 0L))
      assert(rc == cur.getOrElse(store, 0L))
      assert(d == rc - rp)
    }
    assert(res.map(_._2).toSet == (cur.keySet ++ prev.keySet))
  }

  test("embed outliers: a planted far point ranks first with the exact integer d2") {
    // label 0: three vectors at [1, 0] and one far point at [-1, 0]
    // (mislabeled): q = (1024, 0) x3 and (-1024, 0); centroid =
    // (3*1024 - 1024) div 4 = 512, 0; far d2 = (-1024-512)^2 = 1536^2
    val dir = tempDataDir("embeddings" -> Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 0),
      (3L, Seq(1.0f, 0.0f), 0), (4L, Seq(-1.0f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label"))
    val r = graft.ext.VectorOps.embedOutliers(spark, dir).collect()
      .map(row => (row.getInt(0), row.getLong(1), row.getLong(3)))
    assert(r.head == ((1, 4L, 1536L * 1536L)))
    assert(r.tail.forall(_._3 == 512L * 512L))
  }
}
