package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.GraphOps

/** Incremental connected components over an EDGE STREAM — the graph
  * tier's streaming member (the asymmetry closer: dedup, retrieval,
  * sketches and quantiles all maintain state incrementally; component
  * structure previously required a full re-run).
  *
  * State is the (node, root) mapping with root = the component's
  * minimum node id (the canonical label [[GraphOps.connectedComponents]]
  * emits). Per micro-batch:
  *
  *  1. unseen endpoints register as singleton roots (batch-sized
  *     anti-join);
  *  2. the batch's edges CONTRACT through the mapping — an edge
  *     becomes (root(a), root(b)) and drops if both ends share a root
  *     already — so the merge problem shrinks from the corpus to the
  *     AFFECTED COMPONENTS, usually a vanishing fraction;
  *  3. the contracted graph (roots as nodes) runs the engine's
  *     star-contraction CC — delta-sized work, never corpus-sized;
  *  4. the resulting root→newRoot relabel map (≤ affected roots,
  *     broadcastable) applies to the stored mapping with ONE
  *     broadcast join — the corpus-sized table is touched map-side
  *     only, no shuffle of the state, no history re-scan.
  *
  * Min-label induction: roots are component minima; a merge's new
  * root is the minimum of the merged minima = the merged component's
  * minimum — so after any batch sequence the mapping is EXACTLY what
  * a from-scratch CC over the union of all edges computes, which is
  * the oracle gate: `stream_graph_cc` replays the co-purchase edge
  * set in [[ReplayBatches]] carves through this kernel and registers
  * against a recursive-CTE CC twin over the full edge set —
  * incremental ≡ batch, bit-for-bit.
  */
object StreamGraph {

  /** Batch carving for the oracle-checked replay. */
  val ReplayBatches: Int = 4

  /** One merge step: the stored (node, root) mapping folded with a
    * batch of (a, b) edges. Shared by the replay and a `foreachBatch`
    * sink verbatim. */
  private[graft] def mergeStep(state: DataFrame, batch: DataFrame): DataFrame = {
    val nodes = batch.select(col("a").as("node"))
      .unionByName(batch.select(col("b").as("node"))).distinct()
    val st = state.unionByName(
        nodes.join(state.select("node"), Seq("node"), "left_anti")
          .select(col("node"), col("node").as("root")))
      .localCheckpoint(eager = true)
    val contracted = batch
      .join(st.select(col("node").as("a"), col("root").as("ra")), "a")
      .join(st.select(col("node").as("b"), col("root").as("rb")), "b")
      .select("ra", "rb").where(col("ra") =!= col("rb")).distinct()
      .localCheckpoint(eager = true)
    if (contracted.isEmpty) st
    else {
      val relabel = GraphOps.connectedComponents(contracted, "ra", "rb")
        .select(col("node").as("root"), col("component").as("new_root"))
      st.join(broadcast(relabel), Seq("root"), "left")
        .select(col("node"),
          coalesce(col("new_root"), col("root")).as("root"))
        .localCheckpoint(eager = true)
    }
  }

  /** Oracle-checkable REPLAY: the co-purchase edge set carved into
    * [[ReplayBatches]] deterministic hash slices (so merges CROSS
    * batches: a component's edges arrive scattered, exercising the
    * relabel path, not just fresh inserts), folded through
    * [[mergeStep]]; output is the final mapping, gated against the
    * from-scratch recursive CC twin. */
  def incrementalCcBatch(spark: SparkSession, dir: String,
      nBatches: Int = ReplayBatches): DataFrame = {
    val edges = GraphOps.coPurchaseEdges(spark, dir)
      .where(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))
      .withColumn("slice",
        pmod(graft.ext.TextOps.h32(
          concat(col("a").cast("string"), lit("-"), col("b").cast("string"))),
          lit(nBatches.toLong)).cast("int"))
      .localCheckpoint(eager = true)
    var state: DataFrame = edges.sparkSession.createDataFrame(
      edges.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("root",
          org.apache.spark.sql.types.LongType, nullable = false))))
    for (b <- 0 until nBatches)
      state = mergeStep(state, edges.where(col("slice") === b).select("a", "b"))
    state.select(col("node"), col("root").as("component")).orderBy("node")
  }
}
