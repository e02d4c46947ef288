package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.{Ivm, Star}

/** CONTINUOUS join-view maintenance — [[graft.etl.Ivm.ivmJoinRefresh]]
  * run as a STREAM: order headers and order lines arrive as two
  * interleaved feeds, and every micro-batch applies the three-term
  * delta rule against the registries of everything seen so far,
  *
  *   ΔV_b = γ(ΔL_b ⋈ O_seen) ⊕ γ(L_seen ⋈ ΔO_b) ⊕ γ(ΔL_b ⋈ ΔO_b),
  *
  * then folds ΔV into the running view and appends the deltas to the
  * registries. The one-shot refresh proves the rule for a single
  * batch; this proves it COMPOSES — a line may arrive batches after
  * its header (or before it), and the accumulated view must still
  * equal the from-scratch aggregate over everything, which is the
  * oracle gate: `stream_ivm_join` registers with the SAME
  * full-recompute twin as `etl_ivm_join`.
  *
  * Scale: per batch, two delta-against-registry joins (key-prunable —
  * the registry side is only probed at the delta's join keys) and one
  * delta⋈delta join; the view fold is a groupBy over
  * priority × calendar. History is never re-aggregated — the
  * registries are appended, the view is merged. */
object StreamIvm {

  /** Batch carving for the oracle-checked replay. */
  val ReplayBatches: Int = 4

  /** Replay: headers carved by `o_orderkey mod B`, lines by
    * `(l_orderkey + l_linenumber) mod B` — decorrelated on purpose, so
    * a given order's lines scatter across batches and land before,
    * with, and after their header (every arrival order the rule must
    * survive; the spec pins each cross-direction is actually
    * exercised). */
  def incrementalJoinIvmBatch(spark: SparkSession, dir: String,
      nBatches: Int = ReplayBatches): DataFrame = {
    val o = Star.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        pmod(col("o_orderkey"), lit(nBatches.toLong)).cast("int").as("ob"))
    val l = Star.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"), col("l_extendedprice"),
        pmod(col("l_orderkey") + col("l_linenumber"), lit(nBatches.toLong))
          .cast("int").as("lb"))
    var oSeen = o.where(lit(false)).localCheckpoint(eager = true)
    var lSeen = l.where(lit(false)).localCheckpoint(eager = true)
    var view: DataFrame = null
    for (b <- 0 until nBatches) {
      val dO = o.where(col("ob") === b).localCheckpoint(eager = true)
      val dL = l.where(col("lb") === b).localCheckpoint(eager = true)
      val dv = Seq(Ivm.joinTerm(dL, oSeen), Ivm.joinTerm(lSeen, dO),
        Ivm.joinTerm(dL, dO)).reduce(_ unionByName _)
      view =
        (if (view == null) dv else view.unionByName(dv))
          .groupBy("o_orderpriority", "ship_ym")
          .agg(sum("cents").as("cents"), sum("n_rows").as("n_rows"))
          .localCheckpoint(eager = true)
      oSeen = oSeen.unionByName(dO).localCheckpoint(eager = true)
      lSeen = lSeen.unionByName(dL).localCheckpoint(eager = true)
    }
    view.orderBy("o_orderpriority", "ship_ym")
  }
}
