package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Edge bound for [[connectedComponents]]' driver short-circuit:
    * under it the (deduplicated, counted) edge list fits the driver
    * trivially (≤ ~50 MB of rows) and union-find solves it in
    * milliseconds; above it the distributed star iteration runs. At
    * 100 TB a delta/contracted graph under the bound is the COMMON
    * case (incremental CC contracts to affected components); a hub
    * component over it still gets the O(log d) star path. */
  val DriverCcMaxEdges: Long = 500000L

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
      edges0: DataFrame, aCol: String, bCol: String, maxRounds: Int = 30,
      driverMaxEdges: Long = DriverCcMaxEdges): DataFrame = {
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
    // ADAPTIVE small-graph short-circuit (round-13 optimization, the
    // q29/q23 statistics-gate discipline): each star round costs 2–3
    // Spark jobs of fixed overhead REGARDLESS of size, so a small edge
    // set — the normal case for the incremental-CC delta graphs, whose
    // contracted input is the affected components only — pays several
    // rounds of scheduling for milliseconds of work. Under the bound
    // (already-counted, deduplicated edges; long ids) the component
    // minimum is computed exactly by driver union-find with min-root
    // union; above it, or for non-long ids, the distributed star
    // iteration below is unchanged. Answer-invariance is spec-pinned
    // (GraphOpsSpec: forced driver path ≡ forced distributed path).
    val longIds = edges.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (longIds && edgeCount <= driverMaxEdges) {
      val parent = new java.util.HashMap[Long, Long]()
      def find(x0: Long): Long = {
        var x = x0
        var p = parent.getOrDefault(x, x)
        while (p != x) { // path halving
          val gp = parent.getOrDefault(p, p)
          parent.put(x, gp); x = gp; p = parent.getOrDefault(x, x)
        }
        x
      }
      val collected = edges.collect()
      collected.foreach { r =>
        val (ra, rb) = (find(r.getLong(0)), find(r.getLong(1)))
        if (ra != rb) {
          if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
      val nodes = new java.util.TreeSet[java.lang.Long]()
      collected.foreach { r => nodes.add(r.getLong(0)); nodes.add(r.getLong(1)) }
      import scala.jdk.CollectionConverters._
      val spark = edges.sparkSession
      import spark.implicits._
      return nodes.asScala.iterator.map(n => (n.longValue, find(n))).toSeq
        .toDF("node", "component")
    }
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

  /** Fixed-point scale for [[pageRankOf]]: ranks are bigints in units of
    * 10⁻¹² of the total probability mass. Shared literal with the oracle. */
  val PageRankScale = 1000000000000L

  /** PageRank by power iteration over an edge frame — entirely in
    * FIXED-POINT INTEGER arithmetic (bigint ranks in units of
    * `PageRankScale`⁻¹, damping 0.85 as the integer expression
    * `(85 * x) div 100`). Floats are deliberately absent: float
    * summation order varies with partitioning, so a double-valued
    * PageRank is not reproducible run-to-run on a cluster, let alone
    * across engines — integer sums are associative-exact, making the
    * result bit-identical for ANY partitioning and for the DuckDB twin.
    * Floor losses (≤ 1 unit per edge per iteration) are deterministic
    * and identical in both engines (`div` and `//` both truncate).
    *
    * `edges` must be directed-symmetric if the graph is undirected
    * (both (u,v) and (v,u) present — [[coPurchaseEdges]] builds this
    * shape). Every node then has deg ≥ 1, so there are no dangling
    * nodes and the mass term needs no redistribution correction.
    *
    * Scale shape per iteration: one node-sized equi-join (ranks ⋈ deg on
    * the node id — both sides hash-partitioned on it from their own
    * aggregates), one edge-sized equi-join on src against the
    * src-partitioned edge set, and one partial-aggregable groupBy(dst).
    * Nothing is edge² and nothing collects; `iters` is a fixed small
    * constant (the classic 3–10), so the lineage stays bounded. */
  def pageRankOf(edges: DataFrame, nodeCount: Long, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters must be in [1, 20], got $iters")
    val base = PageRankScale / nodeCount
    val baseTerm = 15L * base / 100L
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    var ranks = deg.select(col("src").as("id"), lit(base).as("r"))
    for (_ <- 1 to iters) {
      val contrib = ranks.join(deg, col("id") === col("src"))
        .select(col("src"), expr("r div deg").as("c"))
      ranks = edges.join(contrib, "src")
        .groupBy("dst")
        .agg(sum("c").as("s"))
        .select(col("dst").as("id"),
          (lit(baseTerm) + expr("(85 * s) div 100")).as("r"))
    }
    ranks
  }

  /** Directed-symmetric co-purchase edges over the sales fact: products
    * sharing an order, both directions, deduplicated. Session-cached and
    * hash-partitioned on src with an EXPLICIT count (the iterating join
    * in [[pageRankOf]] then only ever shuffles the node-sized side; at
    * cluster scale this is the stored, bucketed edge list a graph
    * pipeline materializes once). The per-order pair fan-out is bounded
    * by order size (TPC-H ≤ 7 lines), so the self-join is |fact|·k, not
    * |fact|². */
  def coPurchaseEdges(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionCache.getOrBuild(spark, s"graph|$dir|copurchase_edges") {
      val fact = graft.etl.Star.salesFact(spark, dir)
        .select("order_id", "product_id")
      fact.as("a").join(fact.as("b"),
          col("a.order_id") === col("b.order_id") &&
            col("a.product_id") =!= col("b.product_id"))
        .select(col("a.product_id").as("src"), col("b.product_id").as("dst"))
        .distinct()
        .repartition(spark.sessionState.conf.numShufflePartitions, col("src"))
    }

  /** Triangle counting by DEGREE-ORDERED ORIENTATION (Suri &
    * Vassilvitskii, WWW'11 — "the curse of the last reducer"): orient
    * every undirected edge from its lower-(degree, id) endpoint to the
    * higher, enumerate wedges only at each edge's LOWER endpoint, and
    * close them against the canonical edge set. The orientation caps
    * every node's out-degree at O(√m) regardless of how hot the hub
    * is — the wedge fan-out is Σ out-deg² ≤ O(m^1.5), not the
    * unoriented hub-degree² that serializes on the skewed node. Three
    * equi-joins and one partial-aggregable count; nothing touches the
    * driver.
    *
    * The graph is the SUPPORTED co-purchase graph: an edge needs
    * `minSupport` distinct shared orders. Support 1 on basket data is
    * noise (any two items ever sharing one cart) and grows toward the
    * complete graph with scale; the support threshold is the domain
    * knob that keeps the graph sparse and the triangles meaningful
    * (pairs that RELIABLY sell together). Output: per-product triangle
    * participation, products in ≥ 1 triangle. */
  /** The SUPPORTED co-purchase edge set (canonical u < v, one row per
    * pair with ≥ `minSupport` distinct shared orders) — session-cached
    * like [[coPurchaseEdges]]: it is a stored graph artifact a pipeline
    * materializes once (the fact self-join + support aggregate runs
    * once per session, not once per reference — the triangle plan
    * alone reads it four times: two degree joins, the wedge self-join,
    * the closing join; uncached, each reference re-runs the fact
    * self-join). */
  /** Weighted co-purchase pair counts (canonical u < v, `n_ab` =
    * distinct shared orders, kept at ≥ `minSupport`) — the ONE stored
    * basket-pair artifact both the triangle graph and the
    * association-rule miner derive from (the fact self-join +
    * support aggregate is the expensive part; everything downstream is
    * pair-table-sized). */
  def coPurchasePairCounts(spark: SparkSession, dir: String,
      minSupport: Int = 2): DataFrame =
    graft.util.SessionCache.getOrBuild(spark,
      s"graph|$dir|pair_counts|$minSupport") {
      val basket = graft.etl.Star.salesFact(spark, dir)
        .select("order_id", "product_id").distinct()
      basket.as("a").join(basket.as("b"),
          col("a.order_id") === col("b.order_id") &&
            col("a.product_id") < col("b.product_id"))
        .groupBy(col("a.product_id").as("u"), col("b.product_id").as("v"))
        .agg(count(lit(1)).as("n_ab"))
        .where(col("n_ab") >= minSupport)
    }

  def supportedCoPurchaseEdges(spark: SparkSession, dir: String,
      minSupport: Int = 2): DataFrame =
    coPurchasePairCounts(spark, dir, minSupport).select("u", "v")

  /** The ORIENTED supported co-purchase edges — session-cached next to
    * [[supportedCoPurchaseEdges]]: degree-ordered orientation is the
    * paper's PREPROCESSING step (a stored property of the graph, not of
    * any query), and the triangle query referencing `oriented` twice
    * (the wedge self-join) would otherwise recompute the degree
    * aggregate and both broadcast joins per reference. */
  def orientedCoPurchaseEdges(spark: SparkSession, dir: String,
      minSupport: Int = 2): DataFrame =
    graft.util.SessionCache.getOrBuild(spark,
      s"graph|$dir|oriented_edges|$minSupport") {
      orientEdges(supportedCoPurchaseEdges(spark, dir, minSupport))
    }

  def triangleCounts(spark: SparkSession, dir: String,
      minSupport: Int = 2): DataFrame =
    trianglesFromOriented(
      orientedCoPurchaseEdges(spark, dir, minSupport),
      supportedCoPurchaseEdges(spark, dir, minSupport))
      .select(col("node").as("product_id"), col("triangles"))
      .orderBy(desc("triangles"), asc("product_id"))

  /** Degree-ordered orientation: every canonical (u < v) edge becomes
    * (s, t) directed from the lower-(degree, id) endpoint to the
    * higher. The degree table is catalog-sized (one row per product in
    * a supported pair) — broadcast back to the edge set. */
  def orientEdges(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("u").as("node"))
      .unionByName(edges.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    edges
      .join(broadcast(deg.select(col("node").as("u"), col("d").as("du"))), Seq("u"))
      .join(broadcast(deg.select(col("node").as("v"), col("d").as("dv"))), Seq("v"))
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          col("u")).otherwise(col("v")).as("s"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          col("v")).otherwise(col("u")).as("t"))
  }

  /** Wedge enumeration + closure over a pre-oriented edge frame:
    * wedges at each edge's lower endpoint, closed against the canonical
    * edge set, every triangle credited to its three corners. */
  def trianglesFromOriented(oriented: DataFrame, edges: DataFrame): DataFrame = {
    val tri = oriented.as("x").join(oriented.as("y"),
        col("x.s") === col("y.s") && col("x.t") < col("y.t"))
      // x.t < y.t by the join condition, so (x.t, y.t) is already the
      // canonical (u < v) form the edge set closes against
      .select(col("x.s").as("a"), col("x.t").as("u"), col("y.t").as("v"))
      .join(edges, Seq("u", "v"))
    tri.select(col("a").as("node"))
      .unionByName(tri.select(col("u").as("node")))
      .unionByName(tri.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }

  /** Core of [[triangleCounts]] over an arbitrary canonical (u < v,
    * distinct) undirected edge frame — per-node triangle participation,
    * nodes in ≥ 1 triangle. Uncached composition (the spec path). */
  def triangleCountsOf(edges: DataFrame): DataFrame =
    trianglesFromOriented(orientEdges(edges), edges)

  /** k for the [[kCore]] driver query — shared with the oracle twin. */
  val KCoreK = 3

  /** Synchronous peel rounds for [[kCore]] — the oracle unrolls exactly
    * this many, so both engines compute V_R by construction whether or
    * not the peel has converged (on the test corpora it converges well
    * inside the budget — spec-pinned; the engine side additionally
    * early-exits once a round removes nothing, which is value-identical
    * to running the remaining no-op rounds). */
  val KCoreRounds = 8

  /** The k-core node set of an undirected graph (canonical u < v edge
    * frame) by SYNCHRONOUS peeling: each round drops every node whose
    * degree in the currently-induced subgraph is < k, until stable (or
    * `rounds` is exhausted — see [[KCoreRounds]]). The k-core is the
    * classic cohesion screen (Seidman '83): the maximal subgraph where
    * everyone has ≥ k neighbors inside it, which hub-degree alone
    * cannot find (a high-degree node whose neighbors are all leaves
    * peels away in round 2).
    *
    * Scale shape per round: the symmetric edge frame is semi-joined
    * against the alive node set on BOTH endpoints (node-sized build
    * sides, edge-sized probe — no fan-out), then one partial-aggregable
    * degree groupBy; nothing is edge², nothing collects. Synchronous
    * peeling finishes in O(peel-depth) rounds — removing ALL sub-k
    * nodes per round, not one at a time like the sequential coreness
    * algorithm — and each round's frame is `localCheckpoint`ed to keep
    * the iterative lineage bounded (the [[connectedComponents]]
    * discipline). The early exit compares two bounded driver scalars
    * (alive counts), the same acceptable control-flow scalar as CC's
    * convergence check. */
  def kcoreOf(edges: DataFrame, k: Int, rounds: Int = KCoreRounds): DataFrame = {
    val sym = edges.select(col("u").as("a"), col("v").as("b"))
      .unionByName(edges.select(col("v").as("a"), col("u").as("b")))
    var alive = sym.select(col("a").as("node")).distinct()
      .localCheckpoint(true)
    var aliveCount = alive.count()
    var r = 0
    var stable = false
    while (r < rounds && !stable) {
      val next = sym
        .join(alive.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("node").as("b")), Seq("b"), "left_semi")
        .groupBy(col("a").as("node"))
        .agg(count(lit(1)).as("d"))
        .where(col("d") >= k)
        .select("node")
        .localCheckpoint(true)
      val nextCount = next.count()
      stable = nextCount == aliveCount
      alive = next
      aliveCount = nextCount
      r += 1
    }
    // final induced degree — the coreness evidence column
    sym
      .join(alive.select(col("node").as("a")), Seq("a"), "left_semi")
      .join(alive.select(col("node").as("b")), Seq("b"), "left_semi")
      .groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("core_degree"))
  }

  /** Driver-contract entry: the 3-core of the supported co-purchase
    * graph — products in the catalog's cohesive basket community, with
    * their within-core degree. */
  def kCore(spark: SparkSession, dir: String): DataFrame =
    kcoreOf(supportedCoPurchaseEdges(spark, dir), KCoreK)
      .select(col("node").as("product_id"), col("core_degree"))
      .orderBy(desc("core_degree"), asc("product_id"))

  /** Synchronous label-propagation rounds for [[labelCommunities]] —
    * unrolled verbatim by the oracle. Fixed (never until-convergence):
    * synchronous LPA can oscillate on bipartite structure, so
    * "convergence" is not well-defined — a fixed round count IS the
    * deterministic semantics (Raghavan et al. '07 note the oscillation;
    * their fix is async update order, which is exactly what a
    * distributed engine cannot reproduce deterministically). */
  val LpaRounds = 4

  /** Community detection by synchronous label propagation (Raghavan,
    * Albert & Kumara '07, deterministic variant): every node starts as
    * its own label; each round a node adopts the label most frequent
    * among its NEIGHBORS (ties → smallest label — the determinism the
    * paper's random tie-break forfeits). Complements the structural
    * families: CC finds reachability, k-core finds cohesion, triangles
    * find closure — LPA finds the basket communities marketing actually
    * asks for.
    *
    * Scale shape per round: one edge-sized equi-join against the
    * node-sized label table (labels hash-partitioned on node from
    * their own aggregate), one (node, label) count groupBy, one
    * struct-max argmax per node — all partial-aggregable, nothing
    * edge², no windows. Lineage bounded by `localCheckpoint` per round
    * (the [[connectedComponents]] discipline). */
  def labelPropagationOf(edges: DataFrame, rounds: Int = LpaRounds): DataFrame = {
    val sym = edges.select(col("u").as("a"), col("v").as("b"))
      .unionByName(edges.select(col("v").as("a"), col("u").as("b")))
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("lab", col("node"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      labels = sym
        .join(labels.select(col("node").as("b"), col("lab")), Seq("b"))
        .groupBy(col("a"), col("lab"))
        .agg(count(lit(1)).as("c"))
        // most frequent neighbor label, smallest label on ties
        .groupBy(col("a").as("node"))
        .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("best"))
        .select(col("node"), (-col("best.nl")).as("lab"))
        .localCheckpoint(true)
    }
    labels
  }

  /** The LPA label table of the supported co-purchase graph —
    * session-cached like the other stored graph artifacts (a community
    * assignment is computed once and then queried; both the community
    * listing and the modularity score read it). */
  def lpaLabels(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionCache.getOrBuild(spark, s"graph|$dir|lpa_labels") {
      labelPropagationOf(supportedCoPurchaseEdges(spark, dir))
    }

  /** Driver-contract entry: LPA communities of the supported
    * co-purchase graph with their sizes. */
  def labelCommunities(spark: SparkSession, dir: String): DataFrame = {
    val labels = lpaLabels(spark, dir)
    val sizes = labels.groupBy("lab").agg(count(lit(1)).as("community_size"))
    labels.join(sizes, Seq("lab"))
      .select(col("node").as("product_id"), col("lab").as("community"),
        col("community_size"))
      .orderBy(desc("community_size"), asc("community"), asc("product_id"))
  }

  /** Modularity of a partition over a canonical (u < v) edge frame —
    * Newman–Girvan Q = Σ_c (e_c/m − (d_c/2m)²), the standard "is this
    * community structure better than chance" score, emitted per
    * community so the weak communities are visible, not averaged away.
    * All margins (m, within-community edges e_c, community degree d_c)
    * are EXACT bigints from three partial-aggregable joins/aggregates;
    * the per-community term is two exact-input double divisions and one
    * multiply, spelled identically in the oracle. */
  def modularityOf(edges: DataFrame, labels: DataFrame): DataFrame = {
    val m = edges.agg(count(lit(1)).as("m"))
    val eIn = edges
      .join(labels.select(col("node").as("u"), col("lab").as("lu")), Seq("u"))
      .join(labels.select(col("node").as("v"), col("lab").as("lv")), Seq("v"))
      .where(col("lu") === col("lv"))
      .groupBy(col("lu").as("lab"))
      .agg(count(lit(1)).as("internal_edges"))
    val deg = edges.select(col("u").as("node"))
      .unionByName(edges.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val dTot = deg.join(labels, Seq("node"))
      .groupBy("lab")
      .agg(count(lit(1)).as("n_nodes"), sum("d").as("total_degree"))
    dTot.join(eIn, Seq("lab"), "left")
      .withColumn("internal_edges", coalesce(col("internal_edges"), lit(0L)))
      .crossJoin(broadcast(m))
      .withColumn("frac", col("total_degree").cast("double") / (col("m") * 2).cast("double"))
      .withColumn("q_term",
        col("internal_edges").cast("double") / col("m").cast("double")
          - col("frac") * col("frac"))
      .select(col("lab").as("community"), col("n_nodes"),
        col("internal_edges"), col("total_degree"), col("q_term"))
      .orderBy("community")
  }

  /** Driver-contract entry: per-community modularity of the LPA
    * partition — the quality score next to the assignment. */
  def lpaModularity(spark: SparkSession, dir: String): DataFrame =
    modularityOf(supportedCoPurchaseEdges(spark, dir), lpaLabels(spark, dir))

  /** Driver-contract entry: PageRank of the product co-purchase graph —
    * "centrality in the basket graph", the classic what-anchors-the-
    * catalog analysis. The node count is one scalar `count()` on the
    * degree table (same acceptable driver-side scalar as TF-IDF's corpus
    * N). Output ranks are fixed-point bigints (see [[pageRankOf]]). */
  def pageRank(spark: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    val edges = coPurchaseEdges(spark, dir)
    val n = edges.select("src").distinct().count()
    pageRankOf(edges, n, iters)
      .select(col("id").as("product_id"), col("r").as("rank_fp"))
      .orderBy(desc("rank_fp"), asc("product_id"))
  }

  /** Wedge-center degree cap for [[linkPredict]] — shared with the
    * oracle twin. A center of degree d contributes d² wedges but only
    * 10⁶/d ppm per wedge: past the cap the quadratic cost buys
    * near-zero score (the standard hub cut in RA/Adamic-Adar
    * implementations), and capping makes Σdeg² linear in edges. */
  val LinkPredHubCap = 64L

  /** Top-k for [[linkPredict]] — shared with the oracle twin. */
  val LinkPredK = 50

  /** LINK PREDICTION by the Resource-Allocation index (Zhou, Lü &
    * Zhang '09; the log-free sibling of Adamic–Adar from Liben-Nowell
    * & Kleinberg's survey): for non-adjacent products u, v score
    * RA(u,v) = Σ_{w ∈ N(u)∩N(v)} 1/deg(w) — which co-purchase edges
    * the basket graph is "missing" (assortment gaps: pairs connected
    * through many low-degree specialists but never yet bought
    * together). Per-wedge terms are the ppm-quantized integers
    * ⌊10⁶/deg(w)⌋ summed in BIGINT, so no float summation order can
    * drift cross-engine (the transcendental-free trade: ln-weighted
    * Adamic–Adar would break bit-parity; RA is ALREADY the stronger
    * hub discount).
    *
    * Shape: wedge enumeration at each center (one self-join of the
    * symmetrized edge list keyed on the center), capped at
    * [[LinkPredHubCap]] centers, an anti-join against the edge set
    * (only ABSENT pairs are predictions), one (u,v) aggregate, bounded
    * TakeOrdered top-[[LinkPredK]]. */
  def linkPredict(spark: SparkSession, dir: String): DataFrame =
    linkPredictOf(supportedCoPurchaseEdges(spark, dir))

  /** The kernel over an arbitrary undirected `(u, v)` edge frame —
    * the fixture path for the spec. */
  def linkPredictOf(edges: DataFrame, hubCap: Long = LinkPredHubCap,
      k: Int = LinkPredK): DataFrame = {
    val sym = edges.select(col("u").as("a"), col("v").as("b"))
      .unionByName(edges.select(col("v").as("a"), col("u").as("b")))
    val deg = sym.groupBy("a").agg(count(lit(1)).as("d"))
    val centers = sym.join(deg.where(col("d") <= hubCap), "a")
    val wedges = centers.as("x").join(centers.as("y"),
        col("x.a") === col("y.a") && col("x.b") < col("y.b"))
      .select(col("x.b").as("u"), col("y.b").as("v"), col("x.d").as("d"))
    wedges
      .join(edges.select(col("u"), col("v")).withColumn("adj", lit(1)),
        Seq("u", "v"), "left_anti")
      .groupBy("u", "v")
      .agg(count(lit(1)).as("n_common"),
        sum(expr(s"${graft.ext.TextOps.Ppm} div d")).as("ra_ppm"))
      .orderBy(col("ra_ppm").desc, col("u"), col("v"))
      .limit(k)
  }

  /** Hop bound for [[bfsHops]] — fixed, shared with the oracle twin
    * (the oracle unrolls exactly this many frontier expansions). */
  val BfsRounds = 4

  /** Bounded-round BREADTH-FIRST SEARCH from the graph's busiest hub:
    * minimum hop distance ≤ [[BfsRounds]] from the max-degree node of
    * the supported co-purchase graph (tie → smallest id) — the
    * "substitution neighborhood" / blast-radius query ("if the anchor
    * product stocks out, how far does the basket disruption reach").
    * Completes the graph family: CC answers reachability-ever, k-core
    * cohesion, LPA membership — BFS answers reachability-in-k.
    *
    * Scale shape per round: the frontier (node-sized, shrinking)
    * equi-joins the symmetrized edge list on the frontier key, one
    * DISTINCT, one anti-join against the visited set — no windows,
    * nothing edge². Rounds are FIXED (the [[labelPropagationOf]]
    * determinism discipline), lineage bounded per round by
    * `localCheckpoint`. The source pick is a 1-row struct-max
    * aggregate riding the plan, never `collect()`ed. */
  def bfsHops(spark: SparkSession, dir: String): DataFrame =
    bfsHopsOf(supportedCoPurchaseEdges(spark, dir))
      .select(col("node").as("product_id"), col("hops"))
      .orderBy("hops", "product_id")

  /** The BFS kernel over an arbitrary undirected `(u, v)` edge frame —
    * hub pick + [[BfsRounds]] expansions; the fixture path for the
    * spec. Returns (node, hops) for every node within reach. */
  def bfsHopsOf(edges: DataFrame, rounds: Int = BfsRounds): DataFrame = {
    val sym = edges.select(col("u").as("a"), col("v").as("b"))
      .unionByName(edges.select(col("v").as("a"), col("u").as("b")))
    val src = sym.groupBy("a").agg(count(lit(1)).as("d"))
      .agg(max(struct(col("d"), (-col("a")).as("na"))).as("best"))
      .select((-col("best.na")).as("node"))
    var dist = src.withColumn("hops", lit(0)).localCheckpoint(true)
    var frontier = dist
    for (r <- 1 to rounds) {
      val next = sym
        .join(frontier.select(col("node").as("a")), Seq("a"))
        .select(col("b").as("node")).distinct()
        .join(dist.select("node"), Seq("node"), "left_anti")
        .withColumn("hops", lit(r))
        .localCheckpoint(true)
      dist = dist.unionByName(next)
      frontier = next
    }
    dist
  }
}
