package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Count-min sketch term counting — the bounded-memory synopsis for
  * "how often does each term occur" at corpus scale, complementing the
  * KMV distinct-count sketch ([[graft.functions.KmvSketchAgg]]): KMV
  * answers cardinality, CMS answers frequency.
  *
  * The sketch is `Depth` hash rows × `Width` counters; an occurrence
  * of term t increments row r at column h_r(t); the estimate is the
  * MIN over rows — never an undercount, overcounts only on collision
  * (Cormode & Muthukrishnan '05). The state is 4×1024 longs
  * REGARDLESS of corpus size, counters are sums (mergeable map-side,
  * across partitions, across days), so the build is one shuffle of at
  * most depth×width×partitions partial rows — the whole point versus
  * the exact per-term table, whose key space grows with the corpus.
  *
  * Determinism: h_r(t) = H("cms" + r + ":" + t) mod Width on the
  * cross-engine md5 contract ([[TextOps.h32]]) and the counters are
  * integer sums — the sketch, and thus every estimate, is
  * bit-reproducible in DuckDB, so the operator is fully
  * oracle-checkable (not rows-only). */
object SketchOps {

  val Depth = 4
  val Width = 1024

  // ---- HyperLogLog distinct sketch --------------------------------------

  /** HLL geometry: p = 6 ⇒ m = 64 buckets over the 32-bit [[TextOps.h32]]
    * hash — top 6 bits pick the bucket, the low [[HllWBits]] = 26 bits
    * feed the leading-zero rank ρ ∈ [1, 27]. */
  val HllP = 6
  val HllM = 64
  val HllWBits = 26

  /** α_64 · m² for the raw HLL estimate, computed ONCE here and pasted
    * into both engines' SQL as the same double literal (the shared-
    * literal-generator convention) — two engines multiplying 0.709 by
    * 4096 independently is one more operation than needs trusting. */
  val HllAlphaM2: Double = 0.709 * HllM * HllM

  /** Small-range cutoff: below 2.5·m the raw estimator is biased high
    * and HLL switches to linear counting. */
  val HllSmallRange: Double = 2.5 * HllM

  /** Linear-counting correction m·ln(m/V) as a CASE chain over the 63
    * possible non-zero empty-bucket counts, every value computed ONCE
    * here and pasted into both engines as the same double literal —
    * ln() is the one float op engines don't evaluate bit-identically,
    * so neither engine ever calls it. */
  def hllLinearCountCase(v: String): String = {
    val branches = (1 until HllM).map { n =>
      s"WHEN $n THEN CAST(${HllM * math.log(HllM.toDouble / n)} AS DOUBLE)"
    }.mkString(" ")
    s"(CASE $v $branches END)"
  }

  /** ρ(w) = leading zeros of the 26-bit remainder + 1, as a branch-only
    * integer CASE chain (w ≥ 2^25 ⇒ ρ=1 … w=0 ⇒ 27) — generated once
    * and shared by both engines verbatim: no log2/floor float path,
    * whose rounding the engines would have to agree on. */
  def hllRhoCase(w: String): String = {
    val branches = (0 until HllWBits).map { lz =>
      s"WHEN $w >= ${1L << (HllWBits - 1 - lz)} THEN ${lz + 1}"
    }.mkString(" ")
    s"(CASE $branches ELSE ${HllWBits + 1} END)"
  }

  /** HyperLogLog distinct users per event_type, next to the exact count
    * (Flajolet et al. '07 — raw estimator; the small-range correction
    * needs ln(), which engines don't evaluate bit-identically, so the
    * raw estimate IS the contract and the empty-bucket count rides
    * along for the consumer to apply corrections). The sketch state is
    * 64 small integers per group REGARDLESS of cardinality, and the
    * per-bucket max-ρ is mergeable map-side / across micro-batches /
    * across days — at 100 TB this replaces the countDistinct shuffle
    * of every (group, user) pair with ≤ m rows per group. (The exact
    * count here is the oracle-visible yardstick, kept deliberately so
    * the estimate's error is in the output, not in a claim.)
    *
    * Determinism: bucket and ρ are integer arithmetic on the md5
    * contract; per-bucket MAX and the Σ 2^(27−ρ_b) indicator are
    * integer aggregates (order-independent); the one float op is the
    * final α·m²·2^27 / T division — exact-input, bit-identical. */
  /** The (event_type, bucket) → max-ρ sketch state from an arbitrary
    * events frame — ≤ [[HllM]] rows per group. This IS the mergeable
    * synopsis: sketch(A ∪ B) = bucket-wise MAX of sketch(A) and
    * sketch(B), exactly (a `foreachBatch` sink folds micro-batch
    * sketches into the stored one with a groupBy-max; parity with the
    * one-shot sketch is spec-pinned). */
  def hllPerBucket(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        TextOps.h32(col("user_id").cast("string")).as("h"))
      // integer DIV, not `/` (which is double division on longs)
      .withColumn("bucket", expr(s"CAST(h DIV ${1L << HllWBits} AS INT)"))
      .withColumn("w", col("h") % lit(1L << HllWBits))
      .withColumn("rho", expr(hllRhoCase("w")))
      .groupBy("event_type", "bucket")
      .agg(max("rho").as("mrho"))

  def hllDistinctUsers(spark: SparkSession, dir: String): DataFrame = {
    val twoPow27 = 1L << (HllWBits + 1)
    val perBucket = hllPerBucket(graft.etl.Star.events(spark, dir))
    val sketch = perBucket.groupBy("event_type")
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${HllWBits + 1} - mrho)")).as("t_present"),
        count(lit(1)).as("n_buckets"))
      .withColumn("n_empty_buckets", (lit(HllM) - col("n_buckets")).cast("int"))
      .withColumn("e_raw",
        lit(HllAlphaM2) * lit(twoPow27).cast("double") /
          (col("t_present") + col("n_empty_buckets") * lit(twoPow27)).cast("double"))
      // Flajolet small-range switch: comparisons on bit-identical doubles
      // and a literal lookup — still zero engine-evaluated transcendentals
      .withColumn("hll_estimate",
        when(col("e_raw") <= lit(HllSmallRange) && col("n_empty_buckets") > 0,
          expr(hllLinearCountCase("n_empty_buckets")))
          .otherwise(col("e_raw")))
    val exact = graft.etl.Star.events(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_exact"))
    sketch.join(exact, Seq("event_type"))
      .withColumn("rel_err",
        abs(col("hll_estimate") - col("n_exact").cast("double")) /
          col("n_exact").cast("double"))
      .select("event_type", "n_exact", "hll_estimate", "n_empty_buckets", "rel_err")
      .orderBy("event_type")
  }

  /** Trailing-window span in days for [[hllTrailingDistinct]] — shared
    * with the oracle twin. */
  val TrailingDays = 7

  /** Trailing 7-day distinct users per day from MERGED daily HLL
    * sketches — the sliding-window cardinality a dashboard calls "WAU",
    * computed the way a cluster actually computes it at 100 TB: a
    * nightly job persists one ≤ [[HllM]]-row sketch per day (the daily
    * state here), and the trailing-k estimate for ANY day is the
    * bucket-wise MAX of k stored sketches — raw events are scanned
    * ONCE ever, never once per window. The exact trailing distinct
    * ([[graft.etl.EtlQueries.rollingActive]]'s `wau_7`) rides along as
    * the oracle-visible yardstick, same convention as
    * [[hllDistinctUsers]].
    *
    * The trailing merge reuses the explode-to-covered-days trick the
    * exact side pioneered — but over SKETCH rows: each (day, bucket,
    * mrho) row contributes to cover days day..day+6, and
    * groupBy(cover_day, bucket).max(mrho) IS the window merge. The
    * blowup is 7 × ≤ 64 rows per day regardless of user volume —
    * against raw-user coverage (7 × |daily actives|) this is the whole
    * argument for sketch-state windows. Days are emitted only where
    * activity exists (the [[graft.etl.EtlQueries.rollingActive]]
    * contract), via a semi-join against the observed-day set.
    *
    * Determinism: identical integer path to [[hllDistinctUsers]] —
    * md5-contract bucket/ρ, max/shift-sum integer aggregates, shared
    * α·m² and linear-count double literals, one exact-input final
    * division. Fully hash-checkable cross-engine. */
  def hllTrailingDistinct(spark: SparkSession, dir: String): DataFrame = {
    val twoPow27 = 1L << (HllWBits + 1)
    val act = graft.etl.Star.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val days = act.select("day").distinct()
    val daily = act
      .select(col("day"), TextOps.h32(col("user_id").cast("string")).as("h"))
      .withColumn("bucket", expr(s"CAST(h DIV ${1L << HllWBits} AS INT)"))
      .withColumn("w", col("h") % lit(1L << HllWBits))
      .withColumn("rho", expr(hllRhoCase("w")))
      .groupBy("day", "bucket")
      .agg(max("rho").as("mrho"))
    val merged = daily
      .select(col("bucket"), col("mrho"),
        explode(expr(s"sequence(day, date_add(day, ${TrailingDays - 1}))")).as("day"))
      .groupBy("day", "bucket")
      .agg(max("mrho").as("mrho"))
    val sketch = merged.groupBy("day")
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${HllWBits + 1} - mrho)")).as("t_present"),
        count(lit(1)).as("n_buckets"))
      .withColumn("n_empty_buckets", (lit(HllM) - col("n_buckets")).cast("int"))
      .withColumn("e_raw",
        lit(HllAlphaM2) * lit(twoPow27).cast("double") /
          (col("t_present") + col("n_empty_buckets") * lit(twoPow27)).cast("double"))
      .withColumn("hll_estimate",
        when(col("e_raw") <= lit(HllSmallRange) && col("n_empty_buckets") > 0,
          expr(hllLinearCountCase("n_empty_buckets")))
          .otherwise(col("e_raw")))
    val exact = act.distinct()
      .select(col("user_id"),
        explode(expr(s"sequence(day, date_add(day, ${TrailingDays - 1}))")).as("day"))
      .groupBy("day")
      .agg(countDistinct("user_id").as("n_exact"))
    sketch.join(exact, Seq("day"))
      .join(days, Seq("day"), "left_semi")
      .withColumn("rel_err",
        abs(col("hll_estimate") - col("n_exact").cast("double")) /
          col("n_exact").cast("double"))
      .select(col("day").cast("timestamp").as("day"), col("n_exact"),
        col("hll_estimate"), col("n_empty_buckets"), col("rel_err"))
      .orderBy("day")
  }

  // ---- Count-min sketch --------------------------------------------------

  private def bucketCol(r: org.apache.spark.sql.Column,
      term: org.apache.spark.sql.Column) =
    TextOps.h32(concat(lit("cms"), r.cast("string"), lit(":"), term)) % Width

  /** Corpus token stream. Deliberately NOT pre-repartitioned (unlike
    * [[TextOps.shingleSet]]): the per-row work here is one md5 per
    * (token, sketch row) — measured BELOW the cost of exchanging the
    * full text at test SFs (1.5 s vs 2.4 s at sf0.1), whereas the
    * shingle build's array construction was 6× above it. At real
    * scale the input arrives as many splits and parallelizes at the
    * scan with no exchange at all. */
  private def tokens(spark: SparkSession, dir: String): DataFrame =
    TextOps.withWords(TextOps.docs(spark, dir))
      .select(explode(col("ws")).as("w"))

  /** The (row, bucket) → count sketch table over an arbitrary token
    * frame (one `w` column — the full corpus, or one micro-batch):
    * one row per occupied counter (≤ Depth×Width rows). */
  def cmsSketchOf(words: DataFrame): DataFrame =
    words
      .select(col("w"), explode(expr(s"sequence(0, ${Depth - 1})")).as("r"))
      .groupBy(col("r"), bucketCol(col("r"), col("w")).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Counter-wise sum of two sketch tables — the merge that makes CMS
    * a streaming/cross-day synopsis: sketch(A ∪ B) = sketch(A) ⊕
    * sketch(B), exactly (counters are sums). A `foreachBatch` sink
    * folds each micro-batch's sketch into the stored one with this;
    * parity with the one-shot batch sketch is pinned by spec. */
  def mergeSketches(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("r", "bucket")
      .agg(sum("cnt").as("cnt"))

  /** The corpus sketch. */
  def cmsSketch(spark: SparkSession, dir: String): DataFrame =
    cmsSketchOf(tokens(spark, dir))

  /** Batch carving for the oracle-checked sketch replay — same rule as
    * the stream-dedup replay (doc_id-range micro-batches), shared with
    * the DuckDB twin. */
  val ReplayBatches: Int = 4

  /** Oracle-checkable REPLAY of a streaming heavy-hitter sink over a
    * closed document log: the corpus is carved into [[ReplayBatches]]
    * doc_id-range micro-batches; each batch's sketch increment
    * ([[cmsSketchOf]] — the identical kernel a `foreachBatch` sink
    * runs) folds into the accumulated state via [[mergeSketches]] (the
    * identical merge), and after every batch the state is probed for
    * the corpus-wide top-`k` terms — one row per (batch, term) with
    * the estimate AND the exact prefix count beside it.
    *
    * What this pins that the one-shot `ext_sketch_cms` row cannot:
    * the state EVOLUTION — estimates are monotone in the batch axis,
    * the one-sided bound est ≥ exact holds at every prefix (not just
    * the final corpus), and a cell untouched by early batches probes
    * as 0, not as a missing row. Because CMS counters are order-
    * independent sums, the replayed state after batch b is bit-equal
    * to the sketch of the prefix corpus — which is exactly the
    * property that lets the DuckDB twin check a STREAM's state with a
    * grid + cumulative-sum formulation instead of a procedural loop.
    *
    * Scale shape: state is ≤ Depth×Width rows regardless of corpus or
    * batch count (the whole point of sketch-state streaming); the
    * B-round lazy merge tree re-reads each batch's tokens O(B − b)
    * times here, bounded and cheap at B = 4 (an eager per-round
    * checkpoint was measured SLOWER on the dedup replay — same call).
    * One bounded driver scalar (max doc_id) carves the batches. */
  def cmsStreamReplay(spark: SparkSession, dir: String,
      nBatches: Int = ReplayBatches, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = TextOps.docs(spark, dir)
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val batchSize = (maxId + nBatches) / nBatches // = ceil((max+1)/B)
    val wordsB = TextOps.withWords(docs)
      .select(expr(s"CAST(doc_id DIV $batchSize AS INT)").as("batch"),
        explode(col("ws")).as("w"))
    // fixed probe set: the corpus-wide exact top-k (ties → term asc)
    val probeTerms = wordsB.groupBy(col("w").as("term"))
      .agg(count(lit(1)).as("total_cnt"))
      .orderBy(col("total_cnt").desc, col("term"))
      .limit(k)
      .select("term")
    // exact prefix counts on a (term × batch) grid — k·B bounded rows
    val batchIds = spark.range(nBatches).select(col("id").cast("int").as("batch"))
    val exactPrefix = probeTerms.crossJoin(batchIds)
      .join(wordsB.groupBy(col("w").as("term"), col("batch"))
        .agg(count(lit(1)).as("c")), Seq("term", "batch"), "left")
      .withColumn("exact_prefix",
        sum(coalesce(col("c"), lit(0L)))
          .over(Window.partitionBy("term").orderBy("batch")))
      .select("term", "batch", "exact_prefix")
    val probeCells = probeTerms
      .select(col("term"), explode(expr(s"sequence(0, ${Depth - 1})")).as("r"))
      .withColumn("bucket", bucketCol(col("r"), col("term")))
    // the streaming fold: per batch, increment ⊕ state, then probe
    var state: DataFrame = null
    val emissions = (0 until nBatches).map { b =>
      val inc = cmsSketchOf(wordsB.where(col("batch") === b).select("w"))
      state = if (state == null) inc else mergeSketches(state, inc)
      probeCells
        .join(state, Seq("r", "bucket"), "left")
        .groupBy("term")
        .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
        .withColumn("batch", lit(b))
    }.reduce(_ unionByName _)
    emissions.join(exactPrefix, Seq("term", "batch"))
      .select(col("batch"), col("term"), col("exact_prefix"),
        col("est_cnt"), (col("est_cnt") - col("exact_prefix")).as("overcount"))
      .orderBy("batch", "term")
  }

  /** The top-`k` exact heavy hitters with their CMS estimates side by
    * side: (term, exact_cnt, est_cnt, overcount). exact_cnt ≤ est_cnt
    * always (the CMS one-sided error bound — pinned by spec and by the
    * oracle's identical integer arithmetic). The exact top-k is a
    * TakeOrdered over the aggregated term table (O(k) per partition);
    * the estimate lookup is a broadcast of k×Depth probe rows against
    * the ≤ Depth×Width sketch — both sides bounded. */
  def cmsHeavyHitters(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val exact = tokens(spark, dir)
      .select(col("w").as("term"))
      .groupBy("term").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("term"))
      .limit(k)
    val probes = exact
      .select(col("term"), col("exact_cnt"), explode(expr(s"sequence(0, ${Depth - 1})")).as("r"))
      .withColumn("bucket", bucketCol(col("r"), col("term")))
    probes.join(cmsSketch(spark, dir), Seq("r", "bucket"))
      .groupBy("term", "exact_cnt")
      .agg(min("cnt").as("est_cnt"))
      .withColumn("overcount", col("est_cnt") - col("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("term"))
  }

  // ---- KMV join-cardinality estimation -----------------------------------

  /** Sketch size for the join-cardinality estimator — shared with the
    * oracle twin's window spelling. */
  val JoinCardK = 64

  /** The star-schema FK relations the estimator profiles: child table /
    * child key, parent table / parent key. */
  val JoinCardPairs: Seq[(String, String, String, String)] = Seq(
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"))

  private def cardSide(df: DataFrame, key: String, sfx: String): DataFrame =
    df.select(col(key).cast("string").as("k"))
      .withColumn("h", TextOps.h32(col("k")))
      .agg(
        count(lit(1)).as(s"rows_$sfx"),
        countDistinct(col("k")).as(s"d_${sfx}_exact"),
        graft.functions.KmvSketchAgg.kmvSketch(col("h"), JoinCardK)
          .as(s"kmv_$sfx"))

  /** What a cost-based planner does before EVERY join at 100 TB:
    * estimate `|A ⋈ B|` from per-table synopses without touching either
    * table. KMV sketches of the two key-hash sets are UNIONED (k
    * smallest of the merged sets — the theta-sketch set algebra), the
    * matching-key count is estimated as `|U ∩ S_A ∩ S_B| / |U| · D̂(∪)`,
    * and the join size by the uniform-multiplicity planner rule
    * `m̂ · (rows_A / D̂_A) · (rows_B / D̂_B)`. Each estimate sits next to
    * the exact value it approximates plus the signed relative error —
    * the estimator is VERIFIED, not trusted, on every FK relation of
    * the star.
    *
    * Scale: the sketch pass per side is one O(k)-state aggregate (the
    * exact columns exist only to audit it; a production profile job
    * ships just the sketches — O(k) per table, mergeable across
    * partitions and days). Determinism: md5-contract hashes, integer
    * counts, and a fixed double expression tree — bit-identical in the
    * DuckDB twin. */
  def joinCardinality(spark: SparkSession, dir: String): DataFrame = {
    val perPair = JoinCardPairs.map { case (ta, ka, tb, kb) =>
      val a = graft.etl.Star.table(spark, dir, ta)
      val b = graft.etl.Star.table(spark, dir, tb)
      val ex = a.groupBy(col(ka).as("jk")).agg(count(lit(1)).as("ca"))
        .join(b.groupBy(col(kb).as("jk")).agg(count(lit(1)).as("cb")), "jk")
        .agg(count(lit(1)).as("n_match_exact"),
          sum(col("ca") * col("cb")).as("join_exact"))
      cardSide(a, ka, "a")
        .crossJoin(broadcast(cardSide(b, kb, "b")))
        .crossJoin(broadcast(ex))
        .withColumn("u",
          expr(s"slice(array_sort(array_union(kmv_a, kmv_b)), 1, $JoinCardK)"))
        .withColumn("d_a_kmv",
          expr(graft.functions.KmvSketchAgg.estimateExpr("kmv_a", JoinCardK)))
        .withColumn("d_b_kmv",
          expr(graft.functions.KmvSketchAgg.estimateExpr("kmv_b", JoinCardK)))
        .withColumn("u_est",
          expr(graft.functions.KmvSketchAgg.estimateExpr("u", JoinCardK)))
        .withColumn("m",
          expr("size(array_intersect(array_intersect(u, kmv_a), kmv_b))"))
        .withColumn("n_match_kmv",
          expr("(CAST(m AS DOUBLE) / CAST(size(u) AS DOUBLE)) * u_est"))
        .withColumn("join_kmv",
          expr("n_match_kmv * (CAST(rows_a AS DOUBLE) / d_a_kmv)" +
            " * (CAST(rows_b AS DOUBLE) / d_b_kmv)"))
        .withColumn("rel_err",
          expr("(join_kmv - CAST(join_exact AS DOUBLE))" +
            " / CAST(join_exact AS DOUBLE)"))
        .select(lit(s"$ta-$tb").as("rel"),
          col("rows_a"), col("rows_b"),
          col("d_a_exact"), col("d_b_exact"), col("d_a_kmv"), col("d_b_kmv"),
          col("n_match_exact"), col("n_match_kmv"),
          col("join_exact"), col("join_kmv"), col("rel_err"))
    }
    perPair.reduce(_ unionByName _).orderBy("rel")
  }

  /** Top-k size for [[decayedTopkReplay]] — shared with the oracle. */
  val DecayK = 10

  /** Exponentially-DECAYED heavy hitters over a replayed stream — the
    * "trending now" query, where a term that stopped occurring must
    * fall off the board instead of squatting on its lifetime count
    * (the failure mode of the plain CMS top-k): per batch the state
    * halves (s ← ⌊s/2⌋ + batch count — integer halving is the
    * transcendental-free exponential decay, and both engines truncate
    * identically) and the per-batch top-k is emitted. Terms decayed to
    * zero DROP from the state — the state table is bounded by the
    * recently-active vocabulary, not the corpus lifetime, which is the
    * operator's whole scale story.
    *
    * Shape per batch: one batch-sliced count aggregate, one
    * vocabulary-keyed full-outer merge (the token-bucket/CMS replay
    * discipline — the identical fold a `foreachBatch` sink would run),
    * state localCheckpoint-bounded, one bounded TakeOrdered emission. */
  /** One decay round: halve the carried state, add the batch counts,
    * drop the zero-decayed — the SHARED kernel the replay folds and a
    * real `foreachBatch` sink runs verbatim (the rateLimit/CMS twin
    * discipline: the oracle then checks the real streaming logic, not
    * a parallel reimplementation). `state` may be null (first batch);
    * `inc` is the batch's `(term, c)` counts. */
  def decayStep(state: DataFrame, inc: DataFrame): DataFrame = {
    val next =
      if (state == null) inc.select(col("term"), col("c").as("s"))
      else state.select(col("term"), expr("s div 2").as("sd"))
        .join(inc, Seq("term"), "full_outer")
        .select(col("term"),
          (coalesce(col("sd"), lit(0L)) + coalesce(col("c"), lit(0L))).as("s"))
    next.where(col("s") > 0)
  }

  def decayedTopkReplay(spark: SparkSession, dir: String,
      nBatches: Int = ReplayBatches, k: Int = DecayK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = TextOps.docs(spark, dir)
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val batchSize = (maxId + nBatches) / nBatches
    val wordsB = TextOps.withWords(docs)
      .select(expr(s"CAST(doc_id DIV $batchSize AS INT)").as("batch"),
        explode(col("ws")).as("term"))
    var state: DataFrame = null
    val emissions = (0 until nBatches).map { b =>
      val inc = wordsB.where(col("batch") === b)
        .groupBy("term").agg(count(lit(1)).as("c"))
      state = decayStep(state, inc).localCheckpoint(eager = true)
      state.orderBy(col("s").desc, col("term")).limit(k)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("s").desc, col("term"))))
        .withColumn("batch", lit(b))
    }
    emissions.reduce(_ unionByName _)
      .select("batch", "rank", "term", "s")
      .orderBy("batch", "rank")
  }

  // ---- bottom-k-by-hash quantile sketch ----------------------------------

  /** Sample bound per group for [[quantileSketch]]. The k rows with the
    * SMALLEST md5-contract hash of their unique key are a uniform
    * deterministic sample, so every quantile's rank error is
    * DKW-bounded by √(ln(2/δ)/2k) REGARDLESS of group size — at k=256,
    * ±7.5 % rank error at 95 % confidence. Shared with the oracle
    * twin's window spelling. */
  val QuantK = 256

  /** Reported quantiles (percent), shared with the twin. */
  val QuantQs: Seq[Int] = Seq(25, 50, 90, 99)

  /** The sketch input rows: one (source, doc_id, v, h) per document,
    * v = n_chars (the profiled value), h = md5-contract hash of the
    * unique key — the coin flip both engines toss identically. */
  private[graft] def quantRows(docs: DataFrame): DataFrame =
    docs.select(col("source"), col("doc_id"),
      col("n_chars").cast("long").as("v"),
      TextOps.h32(concat(lit("qsk:"), col("doc_id").cast("string"))).as("h"))

  /** Per-group sketch in CANONICAL form: the ≤ k sample tuples as an
    * ascending (h, d, v) struct array. Built with the bounded
    * [[graft.functions.TopK]] aggregate (O(k) heap state, map-side
    * partial merge — no per-group sort of the corpus anywhere); kept
    * smallest-(h, doc_id) via negated ordering fields, then re-negated
    * into the canonical ascending array. The canonical form is what
    * makes the sketch MERGEABLE by pure array algebra:
    * `slice(array_sort(flatten(...)), 1, k)` of any batch partition of
    * the corpus reproduces this exact array ([[graft.streaming.StreamQuantile]]'s
    * maintenance contract). */
  private[graft] def quantSketchOf(rows: DataFrame, k: Int = QuantK): DataFrame = {
    val tk = graft.functions.TopK.topKBy(
      struct((-col("h")).as("nh"), (-col("doc_id")).as("nd"), col("v")), k)
    rows.groupBy("source").agg(tk.as("tk"))
      .select(col("source"), expr(
        "array_sort(transform(tk, x -> named_struct('h', -x.nh, 'd', -x.nd, 'v', x.v)))")
        .as("sk"))
  }

  /** Quantile readout + self-audit over a canonical sketch: for each
    * group and each q ∈ [[QuantQs]], the nearest-rank estimate from
    * the sample (`element_at` of the sample's sorted values — pure
    * integer indexing, no interpolation doubles) sits next to the
    * estimate's EXACT rank in the full group (one conditional-count
    * aggregate — bounded, never a per-group sort or collect) and the
    * absolute rank error in ppm. The audit is how an approximate
    * operator earns a full hash gate: both engines derive estimate AND
    * error from the same integer algebra, so the error column is
    * VERIFIED, not trusted. */
  private[graft] def quantReadout(rows: DataFrame, sketch: DataFrame): DataFrame = {
    val n = rows.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val est = sketch
      .withColumn("m_sample", size(col("sk")).cast("long"))
      .withColumn("vs", expr("array_sort(transform(sk, x -> x.v))"))
      .withColumn("q", explode(typedLit(QuantQs)))
      .withColumn("est_len",
        expr("element_at(vs, CAST((q * m_sample + 99) DIV 100 AS INT))"))
      .select("source", "q", "m_sample", "est_len")
    rows.join(broadcast(est), Seq("source"))
      .groupBy("source", "q", "m_sample", "est_len")
      .agg(count(when(col("v") <= col("est_len"), 1)).as("cnt_le"))
      .join(broadcast(n), Seq("source"))
      .withColumn("rank_ppm", expr("(1000000 * cnt_le) DIV n_docs"))
      .withColumn("err_ppm", abs(col("rank_ppm") - col("q").cast("long") * 10000L))
      .select("source", "q", "n_docs", "m_sample", "est_len", "rank_ppm", "err_ppm")
      .orderBy("source", "q")
  }

  /** Per-source document-length quantiles from a BOTTOM-K-BY-HASH
    * sample — the third member of the engine's quantile family and the
    * one that scales without preconditions: [[graft.olap.Queries]]'
    * exact `percentile` needs bounded group cardinality,
    * [[TextOps.lengthHistQuantiles]]' fixed-bin histogram needs a
    * bounded VALUE DOMAIN (its state is max(v)/binWidth counters and
    * its error is the bin width); the bottom-k sample needs neither —
    * O(k) state per group, rank error DKW-bounded by the sample size
    * alone, any comparable value domain. It is also the only one of
    * the three whose state is a MERGEABLE synopsis (bottom-k-by-hash
    * is a semilattice: merge = union-then-truncate, exactly KMV's
    * algebra over rows instead of distinct values), so per-day
    * sketches roll up to per-month and a streaming sink maintains it
    * incrementally ([[graft.streaming.StreamQuantile]]) — the property neither the
    * exact sort nor the histogram offers.
    *
    * Determinism: the md5-contract hash is the sample's coin flip, so
    * the sample — and therefore estimate and audited error — is
    * bit-reproducible in the DuckDB twin (window spelling: the k
    * smallest (h, doc_id) per group). Scale: one bounded TopK
    * aggregate + one conditional-count aggregate over the corpus; the
    * shuffle carries O(groups × k) tuples. */
  def quantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val rows = quantRows(TextOps.docs(spark, dir))
    quantReadout(rows, quantSketchOf(rows))
  }
}
