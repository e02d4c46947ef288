package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating large-star /
  * small-star (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14 — public algorithm). Each round moves every node's
  * pointer toward the component minimum along MULTIPLE hops (pointer
  * doubling), so convergence is O(log d) rounds in the component diameter
  * d — unlike one-hop min-label propagation, whose round count equals d
  * and dies on long chains.
  *
  * Representation: an edge set canonicalized to (src > dst); at the fixed
  * point every component is a star — each non-minimum member holds exactly
  * the edge (member, component-min). Per round each star step is one
  * partial-aggregable groupBy (map-side combine) + one equi-join — no
  * windows (a window's whole-partition sort has no partial aggregation and
  * hot nodes would serialize); AQE handles skewed high-degree nodes.
  */
object GraphOps {

  /** Large-star: for every node u, hang u's LARGER neighbors off
    * m = min(N(u) ∪ {u}). Operates on the symmetrized graph. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.unionByName(
      edges.select(col("dst").as("src"), col("src").as("dst")))
    val mins = sym.groupBy("src").agg(min("dst").as("mn"))
    sym.join(mins, "src")
      .withColumn("m", least(col("mn"), col("src")))
      .where(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
    // no distinct here: duplicates are bounded (one per hanging node per
    // center) and the round's small-star ends in a distinct anyway —
    // saves one shuffle per round.
  }

  /** Small-star: for every node u, hang u and u's smaller neighbors
    * (except the minimum itself) off m = min(N⁻(u) ∪ {u}), where N⁻ are
    * the strictly-smaller neighbors — exactly the dst side of the
    * canonical (src > dst) edge form. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val mins = edges.groupBy("src").agg(min("dst").as("m"))
    val joined = edges.join(mins, "src")
    joined.select(col("src"), col("m").as("dst"))
      .unionByName(
        joined.where(col("dst") =!= col("m"))
          .select(col("dst").as("src"), col("m").as("dst")))
      .distinct()
  }

  /** Connected components of the undirected graph given by `edges`
    * (two id columns, any orderable numeric type). Returns
    * (node, component) for every node INCIDENT TO AN EDGE — singletons
    * are absent (callers left-join their full node set). `component` is
    * the minimum node id in the component (the canonical first-wins
    * keeper). Convergence is checked by edge-set fixed point — exact, not
    * a heuristic — and bounded by `maxRounds` (log-scale: 30 rounds cover
    * any component a physical graph can hold). */
  def connectedComponents(
      edges0: DataFrame, aCol: String, bCol: String, maxRounds: Int = 30): DataFrame = {
    var edges = edges0
      .select(col(aCol).as("a"), col(bCol).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .select(greatest(col("a"), col("b")).as("src"), least(col("a"), col("b")).as("dst"))
      .distinct()
      .localCheckpoint(eager = true)
    var converged = false
    var round = 0
    // edge count carried across rounds: each iteration's |next| is the
    // following iteration's |edges| — recounting it would add one full
    // job per round to an iterative loop whose cost IS fixed per-round
    // overhead (both frames are small checkpointed star edge sets).
    var edgeCount = edges.count()
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(edges)).localCheckpoint(eager = true)
      val nextCount = next.count()
      // multiset equality: equal cardinality + empty difference ⇒ equal.
      converged = nextCount == edgeCount && next.exceptAll(edges).isEmpty
      edges = next
      edgeCount = nextCount
      round += 1
    }
    require(converged,
      s"connectedComponents did not reach its star fixed point in $maxRounds " +
        "alternating rounds — raise maxRounds (each round squares reachable depth)")
    // Star fixed point: (member, min) edges, plus the roots themselves.
    edges.select(col("src").as("node"), col("dst").as("component"))
      .unionByName(
        edges.select(col("dst").as("node"), col("dst").as("component")).distinct())
  }
}
