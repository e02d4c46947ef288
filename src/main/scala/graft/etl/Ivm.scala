package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental view maintenance — the delta-propagation algebra behind
  * every refresh-on-arrival materialized view (Gupta & Mumick's
  * classic survey; the reference refreshes by full reload,
  * `/root/reference/src/Main.java` re-running its whole ETL): a
  * SUM/COUNT view over a fact stream is maintained by aggregating ONLY
  * the delta batch and merging it into the stored view, never
  * re-touching history. The differential harness is the whole point
  * here: the registered query computes base-view ⊕ delta, the DuckDB
  * oracle recomputes the view over the full fact — their hash equality
  * IS the self-maintainability theorem for SUM/COUNT views, checked on
  * real data.
  */
object Ivm {

  /** The STORED daily revenue view over all days strictly before the
    * fact's last day — the materialized table a deployment would keep
    * on disk; session-cached like the other warehouse artifacts. The
    * final day plays the arriving delta batch. */
  def dailyMvBase(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionCache.getOrBuild(spark, s"ivm|$dir|daily_mv") {
      val f = Star.salesFact(spark, dir)
      val cut = f.agg(max("time_id").as("cut"))
      f.crossJoin(broadcast(cut))
        .where(col("time_id") < col("cut"))
        .groupBy("store_id", "time_id")
        .agg(sum((col("total_revenue") * 100).cast("long")).as("cents"),
          count(lit(1)).as("n_rows"))
    }

  /** Apply the last day's delta to the stored view: aggregate the
    * delta slice only (delta-sized, not history-sized), full-outer
    * merge on the group key with coalesce-to-zero sums — the
    * SUM/COUNT self-maintenance rule (inserts only here; deletes
    * would subtract, which the same merge expression handles with
    * negated deltas). Output is the refreshed view, which the oracle
    * recomputes from scratch — equality proves the algebra. */
  def ivmDailyRefresh(spark: SparkSession, dir: String): DataFrame = {
    val f = Star.salesFact(spark, dir)
    val cut = f.agg(max("time_id").as("cut"))
    val delta = f.crossJoin(broadcast(cut))
      .where(col("time_id") === col("cut"))
      .groupBy("store_id", "time_id")
      .agg(sum((col("total_revenue") * 100).cast("long")).as("d_cents"),
        count(lit(1)).as("d_rows"))
    dailyMvBase(spark, dir)
      .join(delta, Seq("store_id", "time_id"), "full_outer")
      .select(col("store_id"), col("time_id"),
        (coalesce(col("cents"), lit(0L)) +
          coalesce(col("d_cents"), lit(0L))).as("cents"),
        (coalesce(col("n_rows"), lit(0L)) +
          coalesce(col("d_rows"), lit(0L))).as("n_rows"))
      .orderBy("store_id", "time_id")
  }

  /** STREAMING maintenance of the same view, as a delta LOG: each
    * micro-batch appends its (store, day) aggregate atomically
    * ([[TxParquetSink.append]] — the crash-safe sink the fact merge
    * already uses), and the view is the additive fold of the log. The
    * append-deltas-fold-on-read split is how a sum-merge view scales:
    * writers never read-modify-write the whole view (no write
    * amplification, no lost-update races between concurrent batches),
    * and a periodic compaction — here [[readStreamedMv]] itself — is
    * the only consolidating reader. Used by the IvmAuditSpec streaming
    * parity test: stream-maintained ≡ batch recompute. */
  def maintainDailyMv(batch: DataFrame, sink: TxParquetSink): Unit =
    sink.append(
      batch.groupBy("store_id", "time_id")
        .agg(sum((col("total_revenue") * 100).cast("long")).as("cents"),
          count(lit(1)).as("n_rows")))

  /** The consolidated view over the streamed delta log. */
  def readStreamedMv(spark: SparkSession, sink: TxParquetSink): Option[DataFrame] =
    sink.readSnapshot(spark).map(
      _.groupBy("store_id", "time_id")
        .agg(sum("cents").as("cents"), sum("n_rows").as("n_rows")))

  // ---- MIN/MAX maintenance under deletes (the non-self-maintainable case)

  /** The daily (store, day, cents) rollup the min/max view summarizes. */
  private def dailyCents(spark: SparkSession, dir: String): DataFrame =
    Star.salesFact(spark, dir)
      .groupBy("store_id", "time_id")
      .agg(sum((col("total_revenue") * 100).cast("long")).as("cents"))

  /** MIN/MAX view refresh under a RETRACTION — the case that completes
    * the self-maintainability taxonomy (Gupta & Mumick): SUM/COUNT
    * absorb deletes algebraically ([[ivmDailyRefresh]]'s negated
    * deltas), joins follow the three-term rule ([[ivmJoinRefresh]]),
    * but MIN/MAX under deletes are NOT self-maintainable — deleting a
    * group's current extremum destroys information no view state can
    * restore. The production rule is GROUP-TARGETED recompute:
    *
    *   - a group the retracted day didn't touch keeps its row verbatim;
    *   - a group where the retracted value was strictly inside
    *     (min, max) keeps min/max and decrements its count
    *     (self-maintainable half);
    *   - ONLY groups whose retracted value WAS an extremum re-aggregate,
    *     and only over their own rows (semi-join pushdown — the
    *     recompute is affected-groups-sized, never table-sized);
    *   - a group whose last row was retracted disappears.
    *
    * Here the view is per-store (min, max, n_days) over daily revenue
    * and the retraction is the newest day. The oracle recomputes the
    * view over the remaining days from scratch — hash equality proves
    * the targeting rule loses nothing; [[ivmMinMaxAffected]] exposes
    * which groups the rule recomputed so the spec can pin that the
    * targeting is exact, not conservative. */
  def ivmMinMaxRefresh(spark: SparkSession, dir: String): DataFrame =
    ivmMinMaxOver(dailyCents(spark, dir))

  /** The refresh core over a prepared (store_id, time_id, cents)
    * frame — split out so the spec can construct a retraction that
    * hits every branch (extremum-on-cut, interior, untouched,
    * group-vanishes). */
  private[etl] def ivmMinMaxOver(daily0: DataFrame): DataFrame = {
    val daily = daily0.localCheckpoint(eager = true)
    val cut = daily.agg(max("time_id").as("cut"))
    val vOld = daily.groupBy("store_id")
      .agg(min("cents").as("mn"), max("cents").as("mx"),
        count(lit(1)).as("n_days"))
    val retract = daily.crossJoin(broadcast(cut))
      .where(col("time_id") === col("cut"))
      .select(col("store_id"), col("cents").as("rc"))
    val flagged = vOld.join(retract, Seq("store_id"), "left")
    val untouched = flagged.where(col("rc").isNull)
      .select(col("store_id"), col("mn"), col("mx"), col("n_days"))
    val interior = flagged
      .where(col("rc").isNotNull && col("rc") > col("mn") && col("rc") < col("mx"))
      .select(col("store_id"), col("mn"), col("mx"),
        (col("n_days") - 1).as("n_days"))
    val affectedKeys = flagged
      .where(col("rc").isNotNull &&
        (col("rc") === col("mn") || col("rc") === col("mx")))
      .select("store_id")
    val recomputed = daily.crossJoin(broadcast(cut))
      .where(col("time_id") < col("cut"))
      .join(broadcast(affectedKeys), Seq("store_id"), "left_semi")
      .groupBy("store_id")
      .agg(min("cents").as("mn"), max("cents").as("mx"),
        count(lit(1)).as("n_days"))
    untouched.unionByName(interior).unionByName(recomputed)
      .orderBy("store_id")
  }

  /** The groups [[ivmMinMaxRefresh]]'s targeting rule recomputes —
    * exactly those whose retracted value was an extremum. Exposed for
    * the spec's exactness pin. */
  private[etl] def ivmMinMaxAffected(spark: SparkSession, dir: String): DataFrame =
    ivmMinMaxAffectedOver(dailyCents(spark, dir))

  private[etl] def ivmMinMaxAffectedOver(daily0: DataFrame): DataFrame = {
    val daily = daily0.localCheckpoint(eager = true)
    val cut = daily.agg(max("time_id").as("cut"))
    val vOld = daily.groupBy("store_id")
      .agg(min("cents").as("mn"), max("cents").as("mx"))
    daily.crossJoin(broadcast(cut))
      .where(col("time_id") === col("cut"))
      .select(col("store_id"), col("cents").as("rc"))
      .join(vOld, "store_id")
      .where(col("rc") === col("mn") || col("rc") === col("mx"))
      .select("store_id")
  }

  // ---- DISTINCT-COUNT maintenance under deletes (counting algorithm) ----

  /** DISTINCT-COUNT view refresh under a retraction — the taxonomy's
    * fourth case and Gupta & Mumick's COUNTING ALGORITHM: like MIN/MAX,
    * a distinct count cannot absorb a delete from the view alone (was
    * the deleted occurrence the value's LAST?), but unlike MIN/MAX it
    * needs no base-table recompute at all — the right AUXILIARY makes
    * it fully incremental: store per-(group, value) MULTIPLICITIES,
    * decrement them by the delta's counts, and the view is the count
    * of values whose multiplicity stays positive. The refresh touches
    * the auxiliary (group×value-sized, the view's own support) with a
    * delta-sized join — never the fact history.
    *
    * Here: distinct products per store; the retraction is the newest
    * day's fact rows. The oracle recomputes the distinct count over
    * the surviving fact from scratch — hash equality proves the
    * multiplicity accounting, including the case the naive
    * "subtract the delta's distinct count" rule gets wrong (a product
    * also sold on earlier days must NOT leave the view; the spec pins
    * that control). */
  def ivmDistinctRefresh(spark: SparkSession, dir: String): DataFrame =
    ivmDistinctOver(Star.salesFact(spark, dir)
      .select("store_id", "product_id", "time_id"))

  /** The refresh core over (store_id, product_id, time_id) rows. */
  private[etl] def ivmDistinctOver(f0: DataFrame): DataFrame = {
    val f = f0.localCheckpoint(eager = true)
    val cut = f.agg(max("time_id").as("cut"))
    // the STORED auxiliary a deployment keeps next to the view
    val aux = f.groupBy("store_id", "product_id")
      .agg(count(lit(1)).as("m"))
    val delta = f.crossJoin(broadcast(cut))
      .where(col("time_id") === col("cut"))
      .groupBy("store_id", "product_id")
      .agg(count(lit(1)).as("dm"))
    aux.join(delta, Seq("store_id", "product_id"), "left")
      .select(col("store_id"), col("product_id"),
        (col("m") - coalesce(col("dm"), lit(0L))).as("m"))
      .where(col("m") > 0)
      .groupBy("store_id")
      .agg(count(lit(1)).as("n_products"))
      .orderBy("store_id")
  }

  // ---- join-view maintenance (the three-term delta rule) ----------------

  /** Exact line revenue in cents — the engine-shared integerization. */
  private val lineCents = expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")

  /** One aggregation term of the join view: revenue + row count by
    * (order priority, ship year-month) over `lf ⋈ of`. Shared with the
    * streaming replay ([[graft.streaming.StreamIvm]]). */
  private[graft] def joinTerm(lf: DataFrame, of: DataFrame): DataFrame =
    lf.join(of, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"),
        expr("CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INT)").as("ship_ym"))
      .agg(sum(lineCents).as("cents"), count(lit(1)).as("n_rows"))

  /** The delta carve: order headers and order lines arrive from TWO
    * independent upstream feeds, so a refresh batch holds new headers
    * whose lines partly arrived earlier, and new lines for headers
    * both old and new — every combination the delta rule must handle.
    * Key-residue carves keep all four old/new populations provably
    * nonempty at every SF (a time cut starves the Δ⋈Δ term here:
    * synthetic ship lag pushes a new order's lines months past the
    * order-date frontier). */
  private def carves(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val o = Star.table(spark, dir, "orders")
    val l = Star.table(spark, dir, "lineitem")
    (o.where("o_orderkey % 7 != 3"), o.where("o_orderkey % 7 = 3"),
      l.where("l_orderkey % 5 != 1"), l.where("l_orderkey % 5 = 1"))
  }

  /** The STORED join view over the old populations only — what a
    * deployment has on disk before the refresh batch lands. */
  def joinMvBase(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionCache.getOrBuild(spark, s"ivm|$dir|join_mv") {
      val (oldO, _, oldL, _) = carves(spark, dir)
      joinTerm(oldL, oldO)
    }

  /** Incremental JOIN-view maintenance — the THREE-TERM delta rule
    * (Gupta & Mumick): for V = γ(L ⋈ O), the refresh after deltas on
    * BOTH join sides is V_old ⊕ ΔV with
    *
    *   ΔV = γ(ΔL ⋈ O_old) ⊕ γ(L_old ⋈ ΔO) ⊕ γ(ΔL ⋈ ΔO),
    *
    * the inclusion–exclusion over which side of each matched pair is
    * new; dropping the cross term double-misses pairs where line AND
    * header arrive in the same batch, and using O_new in the first
    * term double-counts them. [[ivmDailyRefresh]] pins the aggregate
    * self-maintenance rule; this pins the join rule — together they
    * cover the two delta algebras every refresh-on-arrival pipeline
    * composes.
    *
    * The gate: the registered query computes V_old ⊕ the three delta
    * terms; the DuckDB twin recomputes γ(L ⋈ O) over the FULL tables.
    * Hash equality on real data IS the delta rule, per group, exactly.
    *
    * Scale: each delta term joins a delta-sized side (broadcast /
    * semi-join prunable against the stored keys); history is touched
    * only through the STORED view — never re-joined. The final merge
    * is a groupBy-sum over four already-aggregated frames, each
    * bounded by priority × calendar. */
  def ivmJoinRefresh(spark: SparkSession, dir: String): DataFrame = {
    val (oldO, dO, oldL, dL) = carves(spark, dir)
    Seq(joinMvBase(spark, dir),
        joinTerm(dL, oldO), joinTerm(oldL, dO), joinTerm(dL, dO))
      .reduce(_ unionByName _)
      .groupBy("o_orderpriority", "ship_ym")
      .agg(sum("cents").as("cents"), sum("n_rows").as("n_rows"))
      .orderBy("o_orderpriority", "ship_ym")
  }
}
