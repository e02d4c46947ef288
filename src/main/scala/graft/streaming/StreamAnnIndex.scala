package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ext.{SimilarityOps, VectorOps}

/** Incremental ANN index maintenance over a VECTOR STREAM — the dense
  * twin of [[StreamBm25]]: the lexical index has a streaming
  * maintenance story; this gives the trained-cell vector index one,
  * closing the round-8 asymmetry (new vectors previously required
  * re-running the k-means setup artifacts from scratch).
  *
  * Lifecycle (the production IVF discipline):
  *
  *  1. **Bootstrap** — train the √n-cell router ONCE on the vectors
  *     present at bootstrap time ([[VectorOps.kmeansCentroidsOf]], 2
  *     Lloyd iterations over the int8-quantized codes — the engine's
  *     cross-engine-exact k-means), persist the centroids, assign the
  *     bootstrap vectors, persist the assignment.
  *  2. **Per micro-batch** (foreachBatch) — in-batch first-wins dedup
  *     by vec_id, anti-join against the stored assignment registry
  *     (re-delivery is a no-op — foreachBatch is at-least-once), rank
  *     novel vectors against the FROZEN centroids
  *     ([[VectorOps.assignToCells]]: one broadcast join + bounded
  *     top-nProbe per vector — batch-sized work, never corpus-sized),
  *     append (vec_id, crank, cent_id) rows.
  *  3. **Retrain trigger** — per batch, the batch's cell-share profile
  *     is compared against the BOOTSTRAP profile in exact integer ppm
  *     (the [[VectorOps.embedDrift]] readout applied at the batch
  *     boundary): a drifted corpus piles into few cells, recall decays,
  *     and the monitor row (batch size, max ppm shift, retrain flag)
  *     is appended for the deployment's retraining job to act on —
  *     retraining itself is a deliberate offline pass (new centroids =
  *     new index generation), not something a micro-batch may do
  *     behind its readers' backs.
  *
  * Serving reads the stored assignment exactly as [[VectorOps]]'
  * mining/IVF paths read the session-cached one (crank = 1 is the
  * cell, crank ≤ nProbe the probe list).
  *
  * The oracle gate is EQUIVALENCE: `stream_ann_index` replays the
  * embeddings table in [[ReplayBatches]] vec-id-range batches through
  * the SAME per-batch kernel ([[incrementalAnnBatch]]) and registers
  * against a DuckDB twin that trains on the bootstrap range and
  * assigns the full corpus — incremental ≡ batch assignment, the
  * [[StreamBm25]] gate shape.
  */
object StreamAnnIndex {

  /** Storage layout: centroids (cent_id, cv — frozen at bootstrap),
    * assignments (vec_id, crank, cent_id), monitor (batch_id, n_batch,
    * max_shift_ppm, retrain). */
  final case class AnnStore(centroidsDir: String, assignDir: String,
    monitorDir: String)

  /** Probe width persisted per vector — the calibrated mining width
    * ([[VectorOps.MiningNProbe]]), so the stored index serves the same
    * retrieval pool the session-cached router does. */
  val StoreNProbe: Int = VectorOps.MiningNProbe

  /** Retrain threshold: flag when any cell's batch share departs from
    * its bootstrap share by more than 25 % absolute (250 000 ppm) —
    * far above sampling noise at test batch sizes, far below the
    * total-collapse regime where recall is already lost. */
  val RetrainShiftPpm: Long = 250000L

  private def quantized(vecs: DataFrame): DataFrame = {
    // the norm expression uses the codegen'd array_dot — register it
    // here because this path may see frames that never went through
    // SimilarityOps.embeddings (the streaming source, spec frames)
    graft.functions.ArrayDotProduct.register(vecs.sparkSession)
    VectorOps.withQuantized(SimilarityOps.withNorm(vecs))
      .select(col("vec_id"), col("embedding"), col("norm"), col("q"))
  }

  /** One-time bootstrap: train √n cells on `vecs`, freeze centroids,
    * assign the bootstrap vectors, record the bootstrap cell-share
    * profile as monitor batch −1. */
  def bootstrap(spark: SparkSession, vecs: DataFrame, store: AnnStore): Unit = {
    val q = quantized(vecs)
    val kCent = VectorOps.scaledKCent(q.count())
    val cents = VectorOps.kmeansCentroidsOf(q.select("vec_id", "q"), kCent, iters = 2)
      .select("cent_id", "cv")
    cents.write.mode("overwrite").parquet(store.centroidsDir)
    val assign = VectorOps.assignToCells(
      spark.read.parquet(store.centroidsDir), q, StoreNProbe)
    assign.write.mode("overwrite").parquet(store.assignDir)
    monitorRow(spark, store, -1L, assign.where(col("crank") === 1))
      .write.mode("overwrite").parquet(store.monitorDir)
  }

  /** The cell-share drift readout for one batch's crank-1 assignment,
    * exact integer ppm. Monitor batch −1 carries the BOOTSTRAP
    * profile itself (one row per cell); each later batch appends ONE
    * summary row whose `ppm` is the max absolute cell-share shift vs
    * bootstrap (a full-outer comparison, so a cell empty on either
    * side counts its whole share — the collapse signal) and whose
    * `retrain` flag fires past [[RetrainShiftPpm]]. */
  private def monitorRow(spark: SparkSession, store: AnnStore,
      batchId: Long, cells: DataFrame): DataFrame = {
    val n = cells.count()
    val shares = cells.groupBy("cent_id")
      .agg(count(lit(1)).as("n_cell"))
      .withColumn("ppm", expr(s"(1000000 * n_cell) DIV ${math.max(n, 1L)}L"))
    if (batchId < 0)
      shares.withColumn("batch_id", lit(batchId))
        .withColumn("n_batch", lit(n))
        .withColumn("retrain", lit(false))
        .select("batch_id", "cent_id", "n_cell", "ppm", "n_batch", "retrain")
    else {
      val boot = spark.read.parquet(store.monitorDir)
        .where(col("batch_id") === -1L)
        .select(col("cent_id"), col("ppm").as("boot_ppm"))
      shares.join(boot, Seq("cent_id"), "full_outer")
        .withColumn("shift",
          abs(coalesce(col("ppm"), lit(0L)) - coalesce(col("boot_ppm"), lit(0L))))
        .agg(max("shift").as("max_shift_ppm"))
        .select(
          lit(batchId).as("batch_id"), lit(-1L).as("cent_id"),
          lit(n).as("n_cell"), col("max_shift_ppm").as("ppm"),
          lit(n).as("n_batch"),
          (col("max_shift_ppm") > RetrainShiftPpm).as("retrain"))
    }
  }

  /** The per-batch kernel shared by the streaming sink and the
    * oracle-checked replay: first-wins in-batch dedup by vec_id,
    * anti-join against the registry, rank novel vectors against the
    * frozen centroids. The registry must contain EVERY vec_id the
    * index has ever seen — live assignments AND tombstones — so an
    * at-least-once redelivery of a DELETED vector stays deleted
    * instead of resurrecting (`crank <= 1` reads both: tombstones are
    * [[TombstoneCrank]], live cells crank 1). */
  private[graft] def novelAssign(batch: DataFrame, registry: DataFrame,
      cents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val novel = batch
      .withColumn("rn",
        row_number().over(Window.partitionBy("vec_id").orderBy("vec_id")))
      .where(col("rn") === 1).drop("rn")
      .join(registry.select("vec_id"), Seq("vec_id"), "left_anti")
    VectorOps.assignToCells(cents, quantized(novel), StoreNProbe)
  }

  /** Tombstone marker: retraction rows are (vec_id, crank =
    * [[TombstoneCrank]], cent_id = −1) appended to the SAME assignment
    * store — the BM25 delta-log move ([[StreamBm25]]' df-delta
    * pattern) applied to the dense index. Real probe ranks start at
    * 1, so readers separate the two with one predicate. */
  val TombstoneCrank: Int = 0

  /** RETRACTION — delete vectors from the index as an O(deleted-ids)
    * APPEND: one tombstone row per id, no rewrite of the stored
    * assignment at any index size (the round-9 gap: a vector deleted
    * from the corpus stayed in the stored cell assignment until full
    * retrain). Search excludes tombstoned ids ([[liveAssign]]), a
    * redelivered tombstoned id is NOT re-indexed (the registry
    * anti-join sees tombstones), and [[compactStore]] later drops the
    * dead rows physically. Ids never indexed are tombstoned anyway —
    * a tombstone for an unseen id is a correct "never index this"
    * instruction (the decontamination shape). */
  def deleteVecs(spark: SparkSession, ids: DataFrame, store: AnnStore): Unit =
    tombstonesOf(ids).write.mode("append").parquet(store.assignDir)

  private[graft] def tombstonesOf(ids: DataFrame): DataFrame =
    ids.select(col("vec_id")).distinct()
      .withColumn("crank", lit(TombstoneCrank))
      .withColumn("cent_id", lit(-1L))

  /** The SERVING view of an assignment frame: probe rows (crank ≥ 1)
    * minus every tombstoned vec_id. One anti-join, probe-rows-sized. */
  private[graft] def liveAssign(assign: DataFrame): DataFrame =
    assign.where(col("crank") >= 1)
      .join(assign.where(col("crank") === TombstoneCrank).select("vec_id"),
        Seq("vec_id"), "left_anti")

  /** COMPACTION — materialize the tombstones: rewrite the assignment
    * store to its live view, dropping dead probe rows AND the
    * tombstone markers themselves. After compaction the deleted ids
    * are re-indexable (the registry forgets them) — run it when the
    * deletes are meant as erasure, keep tombstones when they are
    * decontamination denylists. The maintenance-window pass, same as
    * the sink's compact: never behind readers' backs. */
  def compactStore(spark: SparkSession, store: AnnStore): Unit = {
    val live = liveAssign(spark.read.parquet(store.assignDir))
      .localCheckpoint(eager = true)
    live.write.mode("overwrite").parquet(store.assignDir)
  }

  /** The streaming query: micro-batches assigned incrementally against
    * the frozen centroids; the monitor row appends last. */
  def run(spark: SparkSession, stream: DataFrame, store: AnnStore,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cents = spark.read.parquet(store.centroidsDir)
        val registry = spark.read.parquet(store.assignDir)
          .where(col("crank") <= 1) // live crank-1 rows AND tombstones
        val assign = novelAssign(batch, registry, cents)
          .localCheckpoint(eager = true)
        if (!assign.isEmpty) {
          assign.write.mode("append").parquet(store.assignDir)
          monitorRow(spark, store, batchId, assign.where(col("crank") === 1))
            .write.mode("append").parquet(store.monitorDir)
        }
        ()
      }
      .start()

  /** RETRAIN — the deliberate offline pass the monitor's flag calls
    * for: a NEW INDEX GENERATION trained over the currently-INDEXED
    * universe (the registry's vec ids joined back to their vectors —
    * you retrain over what the index holds, not over whatever the
    * source table has become), written to a FRESH store. The old
    * generation keeps serving untouched until the caller cuts readers
    * over — the same never-behind-readers'-backs discipline as the
    * sink's compaction: a retrain that overwrote the live store would
    * change every probe list mid-query. The new store's monitor
    * baseline (batch −1) is the new generation's own profile, so the
    * drift readout restarts relative to current data. */
  def retrain(spark: SparkSession, vecs: DataFrame,
      old: AnnStore, next: AnnStore): AnnStore = {
    // the LIVE indexed universe: a tombstoned vector must not sneak
    // back into the next generation through its stale crank-1 rows
    val indexed = liveAssign(spark.read.parquet(old.assignDir))
      .where(col("crank") === 1).select("vec_id")
    bootstrap(spark, vecs.join(indexed, "vec_id"), next)
    next
  }

  /** Oracle-checkable RETRAIN replay: the incremental accumulation
    * ([[incrementalAnnBatch]] — bootstrap + streamed batches) followed
    * by the generation-2 retrain over the indexed universe, serving
    * the NEW generation's assignment. Gated against the DuckDB twin
    * that trains the √n router on the FULL corpus in one pass — the
    * hash gate proves the retrain path reproduces a from-scratch batch
    * build exactly: nothing about incremental maintenance (bootstrap
    * carving, per-batch appends, registry anti-joins) poisons the next
    * generation, which is what licenses the monitor→retrain loop as
    * the index's long-term maintenance story. */
  def retrainReplay(spark: SparkSession, dir: String): DataFrame = {
    val gen1 = incrementalAnnBatch(spark, dir)
      .where(col("crank") === 1).select("vec_id")
    val vecs = SimilarityOps.embeddings(spark, dir)
      .select("vec_id", "embedding")
      .join(gen1, "vec_id")
    val q = quantized(vecs).localCheckpoint(eager = true)
    val kCent = VectorOps.scaledKCent(q.count())
    val cents = VectorOps.kmeansCentroidsOf(q.select("vec_id", "q"), kCent, iters = 2)
      .select("cent_id", "cv")
    VectorOps.assignToCells(cents, q, StoreNProbe)
      .orderBy("vec_id", "crank")
  }

  /** Batch carving for the oracle-checked replay. */
  val ReplayBatches: Int = 4

  /** Oracle-checkable REPLAY: the embeddings table carved into
    * [[ReplayBatches]] vec-id-range micro-batches; batch 0 bootstraps
    * (trains the √n router on ITS vectors only — `kCent =
    * scaledKCent(|batch 0|)` — and freezes), later batches assign
    * through the SAME kernel with the index accumulating in memory.
    * Output: the full accumulated assignment (vec_id, crank, cent_id),
    * gated against the DuckDB twin that trains on the bootstrap range
    * and assigns the whole corpus — incremental ≡ batch. Driver loop:
    * [[ReplayBatches]] sequential rounds, one bounded localCheckpoint
    * per round (the [[StreamBm25.incrementalBm25Batch]] discipline). */
  def incrementalAnnBatch(spark: SparkSession, dir: String,
      nBatches: Int = ReplayBatches): DataFrame = {
    val vecs = SimilarityOps.embeddings(spark, dir)
      .select("vec_id", "embedding")
    val batchSize = churnBatchSize(spark, dir, nBatches)
    val boot = vecs.where(col("vec_id") < batchSize)
    val q0 = quantized(boot)
    val kCent = VectorOps.scaledKCent(q0.count())
    val cents = VectorOps.kmeansCentroidsOf(q0.select("vec_id", "q"), kCent, iters = 2)
      .select("cent_id", "cv")
      .localCheckpoint(eager = true)
    var assign = VectorOps.assignToCells(cents, q0, StoreNProbe)
      .localCheckpoint(eager = true)
    for (b <- 1 until nBatches) {
      val batch = vecs.where(
        col("vec_id") >= b * batchSize && col("vec_id") < (b + 1) * batchSize)
      val inc = novelAssign(batch, assign.where(col("crank") === 1), cents)
      assign = assign.unionByName(inc).localCheckpoint(eager = true)
    }
    assign.orderBy("vec_id", "crank")
  }

  /** The deterministic churn delete set shared by the oracle-checked
    * delete/churn replays and their DuckDB twins: every 5th id among
    * the first two batch ranges (indexed by the time the delete
    * lands). */
  private[graft] def churnDeleteRule(batchSize: Long)
      : org.apache.spark.sql.Column =
    col("vec_id") % 5 === 3 && col("vec_id") < lit(2 * batchSize)

  /** The replay's batch width — ONE definition of the carving
    * arithmetic, so the dense and lexical churn legs (and their
    * oracles) can never silently retract different id sets. */
  private[graft] def churnBatchSize(spark: SparkSession, dir: String,
      nBatches: Int = ReplayBatches): Long = {
    val maxId = SimilarityOps.embeddings(spark, dir)
      .agg(max(col("vec_id"))).head.getLong(0)
    (maxId + nBatches) / nBatches
  }

  /** The churn replay's deleted ids as a frame — the shared delete
    * set [[graft.streaming.StreamHybrid.hybridChurnReplay]]'s lexical
    * leg retracts. */
  private[graft] def churnDeletedIds(spark: SparkSession, dir: String)
      : DataFrame =
    SimilarityOps.embeddings(spark, dir).select("vec_id")
      .where(churnDeleteRule(churnBatchSize(spark, dir)))

  /** Oracle-checkable CHURN REPLAY — [[incrementalAnnBatch]] with
    * retraction interleaved, the round-9 verdict's missing dense-index
    * story run end to end:
    *
    *  1. batch 0 bootstraps, batch 1 appends (as in the plain replay);
    *  2. a DELETE lands: every 5th vec_id among the two indexed ranges
    *     is tombstoned ([[tombstonesOf]] — an O(deleted) append);
    *  3. batch 2 is delivered together with a FULL REDELIVERY of
    *     batch 1 — the at-least-once failure mode — and the deleted
    *     ids must stay dead (the registry anti-join sees tombstones);
    *  4. batch 3 appends, then COMPACTION ([[liveAssign]]) drops the
    *     dead rows physically.
    *
    * Output: the live assignment — gated against the DuckDB twin that
    * assigns the whole corpus against the bootstrap-trained router and
    * excludes the delete set declaratively. Incremental-with-churn ≡
    * batch-on-the-survivors: the retraction tier provably changes
    * nothing else. */
  def incrementalAnnDeleteBatch(spark: SparkSession, dir: String,
      nBatches: Int = ReplayBatches): DataFrame = {
    val vecs = SimilarityOps.embeddings(spark, dir)
      .select("vec_id", "embedding")
    val batchSize = churnBatchSize(spark, dir, nBatches)
    def slice(b: Int) = vecs.where(
      col("vec_id") >= b * batchSize && col("vec_id") < (b + 1) * batchSize)
    val boot = vecs.where(col("vec_id") < batchSize)
    val q0 = quantized(boot)
    val kCent = VectorOps.scaledKCent(q0.count())
    val cents = VectorOps.kmeansCentroidsOf(q0.select("vec_id", "q"), kCent, iters = 2)
      .select("cent_id", "cv")
      .localCheckpoint(eager = true)
    var assign = VectorOps.assignToCells(cents, q0, StoreNProbe)
      .localCheckpoint(eager = true)
    def registry = assign.where(col("crank") <= 1)
    assign = assign
      .unionByName(novelAssign(slice(1), registry, cents))
      .localCheckpoint(eager = true)
    // the delete: tombstones for the churn rule's ids (an append)
    assign = assign.unionByName(
      tombstonesOf(vecs.where(churnDeleteRule(batchSize))))
      .localCheckpoint(eager = true)
    // batch 2 arrives WITH a full redelivery of batch 1: tombstoned
    // ids must not resurrect, already-live ids must not duplicate
    assign = assign
      .unionByName(novelAssign(slice(2).unionByName(slice(1)), registry, cents))
      .localCheckpoint(eager = true)
    for (b <- 3 until nBatches) {
      assign = assign
        .unionByName(novelAssign(slice(b), registry, cents))
        .localCheckpoint(eager = true)
    }
    // compaction: the live view, tombstones and dead rows dropped
    liveAssign(assign).orderBy("vec_id", "crank")
  }
}
