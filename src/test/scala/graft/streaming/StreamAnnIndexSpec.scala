package graft.streaming

import graft.SparkSpec
import graft.ext.VectorOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class AnnVec(vec_id: Long, embedding: Array[Float])

/** Incremental ANN index maintenance: a real MemoryStream run must
  * leave the stored assignment identical to a one-pass assignment of
  * the same vectors against the frozen bootstrap centroids;
  * re-delivery (in-batch and cross-batch) is a no-op; the drift
  * monitor flags a collapsed batch and stays quiet on a
  * bootstrap-like one. The corpus-level incremental ≡ batch
  * equivalence is hash-gated by `stream_ann_index`. */
class StreamAnnIndexSpec extends SparkSpec {
  import spark.implicits._

  /** Two well-separated deterministic clusters in dim 8: ids < 40 near
    * +e1, ids ≥ 40 near −e1, with a per-id jitter so vectors are
    * distinct and quantization is non-degenerate. */
  private def vec(id: Long): AnnVec = {
    val sign = if (id < 40) 1f else -1f
    AnnVec(id, Array.tabulate(8)(d =>
      sign * (if (d == 0) 1f else 0.1f) + 0.01f * ((id * 7 + d * 3) % 11).toFloat))
  }
  private val all = (0L until 80L).map(vec)

  private def newStore(tag: String) = {
    val root = java.nio.file.Files.createTempDirectory(s"graft-ann-$tag").toString
    StreamAnnIndex.AnnStore(s"$root/cents", s"$root/assign", s"$root/monitor")
  }

  test("streamed assignments equal one-pass assignment against the frozen centroids") {
    implicit val sqlCtx = spark.sqlContext
    val store = newStore("run")
    StreamAnnIndex.bootstrap(spark, all.take(40).toDF(), store)
    val centsFrozen = spark.read.parquet(store.centroidsDir).collect()

    val stream = MemoryStream[AnnVec]
    val q = StreamAnnIndex.run(spark, stream.toDF(), store,
      java.nio.file.Files.createTempDirectory("graft-ann-ckpt").toString)
    try {
      // in-batch repeat of 40; cross-batch redelivery of 40..44 and a
      // bootstrap vector (0) later
      stream.addData(all.slice(40, 60) :+ all(40): _*)
      q.processAllAvailable()
      stream.addData(all.slice(60, 80) ++ all.slice(40, 45) :+ all(0): _*)
      q.processAllAvailable()
    } finally q.stop()

    // centroids are FROZEN: byte-identical to the bootstrap artifact
    assert(spark.read.parquet(store.centroidsDir).collect().toSeq ==
      centsFrozen.toSeq)

    // registry holds each vector exactly once at crank 1
    val reg = spark.read.parquet(store.assignDir)
      .where(col("crank") === 1).groupBy("vec_id").count()
    assert(reg.where(col("count") > 1).isEmpty, "duplicate assignment rows")
    assert(reg.count() == 80)

    // stored index ≡ one-pass assignment of all 80 vectors against
    // the frozen centroids (the incremental ≡ batch contract)
    val stored = spark.read.parquet(store.assignDir)
      .select("vec_id", "crank", "cent_id")
      .orderBy("vec_id", "crank").collect().toSeq
    val onePass = VectorOps.assignToCells(
        spark.read.parquet(store.centroidsDir),
        VectorOps.withQuantized(
          graft.ext.SimilarityOps.withNorm(all.toDF()))
          .select(col("vec_id"), col("embedding"), col("norm"), col("q")),
        StreamAnnIndex.StoreNProbe)
      .select("vec_id", "crank", "cent_id")
      .orderBy("vec_id", "crank").collect().toSeq
    assert(stored == onePass,
      "incrementally maintained assignment must equal the batch assignment")
  }

  test("drift monitor flags a collapsed batch, stays quiet on a bootstrap-like one") {
    implicit val sqlCtx = spark.sqlContext
    val store = newStore("drift")
    StreamAnnIndex.bootstrap(spark, all.toDF(), store)

    val stream = MemoryStream[AnnVec]
    val q = StreamAnnIndex.run(spark, stream.toDF(), store,
      java.nio.file.Files.createTempDirectory("graft-ann-ckpt2").toString)
    try {
      // batch 0: drawn like the bootstrap mix (every other bootstrap
      // vector, re-keyed) — each cell keeps ~its bootstrap share
      stream.addData((0L until 80L by 2).map(i =>
        vec(i).copy(vec_id = i + 1000)): _*)
      q.processAllAvailable()
      // batch 1: COLLAPSED — every vector lands near one bootstrap
      // point, so one cell takes ~the whole batch share
      stream.addData((200L until 240L).map(i =>
        vec(0).copy(vec_id = i + 2000)): _*)
      q.processAllAvailable()
    } finally q.stop()

    val mon = spark.read.parquet(store.monitorDir)
      .where(col("batch_id") >= 0)
      .select("batch_id", "ppm", "retrain")
      .orderBy("batch_id").collect()
    assert(mon.length == 2)
    assert(!mon(0).getBoolean(2),
      s"bootstrap-like batch must not flag retrain: shift ${mon(0).getLong(1)} ppm")
    assert(mon(1).getBoolean(2),
      s"collapsed batch must flag retrain: shift ${mon(1).getLong(1)} ppm")

    // RETRAIN answers the flag: generation 2 trains over the INDEXED
    // universe into a fresh store; generation 1 keeps serving untouched
    val gen1Cents = spark.read.parquet(store.centroidsDir).collect().toSeq
    val gen1Ids = spark.read.parquet(store.assignDir)
      .where(col("crank") === 1).select("vec_id")
      .as[Long].collect().toSeq.sorted
    val corpus = (all ++ (0L until 80L by 2).map(i => vec(i).copy(vec_id = i + 1000)) ++
      (200L until 240L).map(i => vec(0).copy(vec_id = i + 2000)) ++
      Seq(vec(7).copy(vec_id = 9999L))).toDF() // 9999 is NOT indexed
    val gen2 = StreamAnnIndex.retrain(spark, corpus, store, newStore("gen2"))
    // the old generation is untouched — readers cut over when told to
    assert(spark.read.parquet(store.centroidsDir).collect().toSeq == gen1Cents)
    // gen2 indexes exactly the gen1 universe (9999 was never indexed),
    // each vector once at crank 1
    val gen2Ids = spark.read.parquet(gen2.assignDir)
      .where(col("crank") === 1).select("vec_id")
      .as[Long].collect().toSeq.sorted
    assert(gen2Ids == gen1Ids)
    // and it really retrained: seeded with √n of the CURRENT universe
    // (160 vectors → 13 seeds, vs the bootstrap's 80 → 9; Lloyd drops
    // empty cells, so the survivor count is BOUNDED by the seed count,
    // not equal to it — here the skewed dup-heavy corpus collapses to
    // 9) and the centroid table differs from generation 1's, with a
    // fresh monitor baseline over the new generation's own profile
    val gen2Cents = spark.read.parquet(gen2.centroidsDir).collect().toSeq
    assert(gen2Cents.size <= VectorOps.scaledKCent(gen1Ids.size))
    assert(gen2Cents.map(_.getLong(0)).toSet != gen1Cents.map(_.getLong(0)).toSet ||
      gen2Cents.toSet != gen1Cents.toSet,
      "retrain must produce a new centroid generation, not reuse gen1's")
    val base = spark.read.parquet(gen2.monitorDir).where(col("batch_id") === -1L)
    assert(base.agg(sum("n_cell")).head.getLong(0) == gen1Ids.size)
  }

  test("retraction: tombstones hide, redelivery stays dead, compaction drops, retrain excludes") {
    implicit val sqlCtx = spark.sqlContext
    val store = newStore("del")
    StreamAnnIndex.bootstrap(spark, all.take(40).toDF(), store)

    val stream = MemoryStream[AnnVec]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ann-ckpt3").toString
    val q = StreamAnnIndex.run(spark, stream.toDF(), store, ckpt)
    try {
      stream.addData(all.slice(40, 60): _*)
      q.processAllAvailable()
      // DELETE ids 10, 45 (one bootstrap-indexed, one stream-indexed)
      // while the query runs — an O(deleted) append, no rewrite
      StreamAnnIndex.deleteVecs(spark,
        Seq(10L, 45L).toDF("vec_id"), store)
      // redelivery of a deleted id + the rest: 45 must stay dead
      stream.addData(all.slice(60, 80) :+ all(45): _*)
      q.processAllAvailable()
    } finally q.stop()

    def liveIds() = StreamAnnIndex
      .liveAssign(spark.read.parquet(store.assignDir))
      .where(col("crank") === 1).select("vec_id")
      .as[Long].collect().toSeq.sorted
    val expected = (0L until 80L).filterNot(Set(10L, 45L))
    assert(liveIds() == expected, "tombstoned ids must not serve")

    // the live view equals a one-pass assignment of the SURVIVORS
    // against the frozen centroids (churn-maintained ≡ batch)
    val onePass = VectorOps.assignToCells(
        spark.read.parquet(store.centroidsDir),
        VectorOps.withQuantized(
          graft.ext.SimilarityOps.withNorm(
            all.filterNot(v => v.vec_id == 10L || v.vec_id == 45L).toDF()))
          .select(col("vec_id"), col("embedding"), col("norm"), col("q")),
        StreamAnnIndex.StoreNProbe)
      .select("vec_id", "crank", "cent_id")
      .orderBy("vec_id", "crank").collect().toSeq
    val liveView = StreamAnnIndex
      .liveAssign(spark.read.parquet(store.assignDir))
      .select("vec_id", "crank", "cent_id")
      .orderBy("vec_id", "crank").collect().toSeq
    assert(liveView == onePass)

    // retrain over the live universe: deleted ids must not resurrect
    val gen2 = StreamAnnIndex.retrain(spark, all.toDF(), store, newStore("del2"))
    val gen2Ids = spark.read.parquet(gen2.assignDir)
      .where(col("crank") === 1).select("vec_id")
      .as[Long].collect().toSeq.sorted
    assert(gen2Ids == expected, "retrain must exclude tombstoned ids")

    // compaction drops tombstones AND dead rows physically; the live
    // view is unchanged and the ids become re-indexable
    StreamAnnIndex.compactStore(spark, store)
    val after = spark.read.parquet(store.assignDir)
    assert(after.where(col("crank") === StreamAnnIndex.TombstoneCrank).isEmpty)
    assert(after.where(col("vec_id").isin(10L, 45L)).isEmpty)
    assert(liveIds() == expected)
  }
}
