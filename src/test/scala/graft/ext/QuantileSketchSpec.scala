package graft.ext

import graft.SparkSpec
import graft.streaming.StreamQuantile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bottom-k-by-hash quantile sketch: the sample IS the k smallest
  * (h, doc_id) per group (TopK aggregate ≡ window spelling), the
  * canonical arrays form a semilattice under union-sort-truncate
  * (fold of ANY batch partition ≡ the one-pass sketch, re-delivery a
  * no-op), and on real data every audited rank error sits inside the
  * DKW envelope for k = 256. Cross-engine equality of estimate AND
  * error is hash-gated by `ext_sketch_quantiles` /
  * `stream_quantile_sketch`. */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, s"src${i % 3}", 10L + (i * 37) % 500))
      .toDF("doc_id", "source", "n_chars")

  test("sketch keeps exactly the k smallest (h, doc_id) per group, ascending") {
    val k = 5
    val rows = SketchOps.quantRows(docsDf(0L until 40L))
    val sk = SketchOps.quantSketchOf(rows, k)
      .select(col("source"), explode(col("sk")).as("e"))
      .select(col("source"), col("e.h"), col("e.d"), col("e.v"))
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4)).toSeq).toMap
    val expect = rows.select("source", "h", "doc_id", "v")
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(
        _.map(t => (t._2, t._3, t._4)).sorted.take(k).toSeq).toMap
    assert(sk == expect,
      "aggregate sample must equal the window spelling, already ascending")
  }

  test("undersized groups keep every row — the sketch IS the group") {
    val rows = SketchOps.quantRows(docsDf(0L until 9L)) // 3 per source
    val sizes = SketchOps.quantSketchOf(rows)
      .select(col("source"), size(col("sk")).as("m"))
      .as[(String, Int)].collect().toMap
    assert(sizes.values.toSet == Set(3))
  }

  test("semilattice: fold of any batch partition equals the one-pass sketch; re-delivery is a no-op") {
    val k = 7
    val all = docsDf(0L until 60L)
    val onePass = SketchOps.quantSketchOf(SketchOps.quantRows(all), k)
      .orderBy("source").collect().toSeq
    // uneven partition + a fully re-delivered middle batch
    val batches = Seq(0L until 11L, 11L until 40L, 11L until 40L, 40L until 60L)
    val perBatch = batches.map(r =>
      SketchOps.quantSketchOf(SketchOps.quantRows(docsDf(r)), k))
      .reduce(_ unionByName _)
    val folded = StreamQuantile.foldSketches(perBatch, k)
      .orderBy("source").collect().toSeq
    assert(folded == onePass)
  }

  test("readout rank errors sit inside the DKW envelope on real data") {
    val out = SketchOps.quantileSketch(spark, sfSmoke)
      .select("source", "q", "n_docs", "m_sample", "err_ppm")
      .as[(String, Int, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (src, q, n, m, err) =>
      // full groups carry the k-sample guarantee; a group smaller than
      // k is sampled exactly and errs only by rank discretization
      val bound = if (m >= SketchOps.QuantK) 120000L else 1000000L / m + 10000L
      assert(err <= bound,
        s"$src q$q: err $err ppm over bound $bound (n=$n, m=$m)")
    }
  }

  test("estimate is the nearest-rank sample value (hand-checked group)") {
    // one source, values 1..10, k large: sample = the group, so the
    // q-th estimate is the classic nearest-rank order statistic
    val rows = SketchOps.quantRows(
      (1L to 10L).map(i => (i, "s", i)).toDF("doc_id", "source", "n_chars"))
    val out = SketchOps.quantReadout(rows, SketchOps.quantSketchOf(rows))
      .select("q", "est_len", "rank_ppm", "err_ppm")
      .as[(Int, Long, Long, Long)].collect()
      .map { case (q, e, r, er) => q -> ((e, r, er)) }.toMap
    assert(out(25) == ((3L, 300000L, 50000L)))  // ceil(.25*10)=3 → rank 3/10
    assert(out(50) == ((5L, 500000L, 0L)))
    assert(out(90) == ((9L, 900000L, 0L)))
    assert(out(99) == ((10L, 1000000L, 10000L))) // ceil(.99*10)=10 → rank 10/10
  }
}
