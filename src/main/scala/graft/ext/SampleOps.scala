package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-split operators for the
  * training-data pipeline tier. A 100 TB corpus cannot use
  * `rand()`-based sampling for train/val/test assignment: resampling on
  * every run (and every retry of every task) makes experiments
  * unreproducible and leaks val/test rows into training across
  * pipeline versions. The standard fix is HASH-based assignment — a
  * pure function of a stable id — which this module implements on the
  * engine's cross-engine hash contract (`H(s) = int(md5(s)[0:8], 16)`,
  * [[TextOps.h32]]), so every sample is differentially testable in
  * DuckDB, row-for-row.
  *
  * Scale posture: split assignment is per-row expression work (fuses
  * into the scan — no shuffle, no state). Stratified sampling is ONE
  * bounded top-k aggregate per stratum — O(n) heap state, no
  * per-stratum sort of the corpus (the window form sorts every corpus
  * row within each map partition; see [[graft.functions.TopK]]).
  */
object SampleOps {

  /** Salted split hash: independent of every other use of the id hash
    * (the dedup fingerprints, media dims) because the salt changes the
    * md5 input. bucket ∈ [0, 100). */
  private val bucketExpr = "pmod(h32_split, 100)"

  /** Adds `bucket` and `split` columns to any frame with a `doc_id` —
    * shared by [[datasetSplit]] and the composed pipeline. */
  def withSplit(df: DataFrame): DataFrame =
    df
      .withColumn("h32_split",
        TextOps.h32(concat(lit("split:"), col("doc_id").cast("string"))))
      .withColumn("bucket", expr(bucketExpr).cast("int"))
      .withColumn("split", splitCase(col("bucket")))

  /** Reproducible 80/10/10 train/val/test assignment by salted id hash.
    * A document's split NEVER changes as the corpus grows — assignment
    * depends only on its own id — which is the property rand()-sampling
    * and modulo-on-row-number both lack. */
  def datasetSplit(spark: SparkSession, dir: String): DataFrame =
    withSplit(TextOps.docs(spark, dir))
      .select("doc_id", "bucket", "split")
      .orderBy("doc_id")

  /** The 80/10/10 bucket → split rule as a reusable Column. */
  private def splitCase(bucket: Column): Column =
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")

  /** LEAKAGE-SAFE split — the dedup-aware upgrade of [[datasetSplit]]:
    * hash the near-dup CLUSTER id, not the document id, so every member
    * of a near-duplicate cluster lands in the same split. Per-document
    * hashing leaks: two near-identical documents can straddle
    * train/test, and the model is then evaluated on (a paraphrase of)
    * its own training data. Cluster ids are the canonical min member
    * ([[DedupOps.clusters]]), so a singleton's leakproof split EQUALS
    * its naive split — adopting this operator only moves documents that
    * have near-duplicates. `cluster_leaky` reports, per cluster,
    * whether the naive per-doc assignment would in fact have straddled
    * splits — the audit column that justifies the migration.
    *
    * Shape: the cluster map (already an oracle-checked artifact) joined
    * to the per-row naive assignment on doc_id, one cluster-keyed
    * countDistinct, one join back — keyed shuffles only, no windows;
    * split assignment itself stays pure per-row expression work. */
  def leakproofSplit(spark: SparkSession, dir: String): DataFrame = {
    val members = DedupOps.clusters(spark, dir).select("doc_id", "cluster")
    val naive = withSplit(TextOps.docs(spark, dir).select("doc_id"))
      .select(col("doc_id"), col("split").as("naive_split"))
    val assigned = members
      .withColumn("h32_split",
        TextOps.h32(concat(lit("split:"), col("cluster").cast("string"))))
      .withColumn("split", splitCase(expr(bucketExpr)))
      .drop("h32_split")
    val leaky = assigned.join(naive, "doc_id")
      .groupBy("cluster")
      .agg((countDistinct("naive_split") > 1).as("cluster_leaky"))
    assigned.join(naive, "doc_id")
      .join(leaky, "cluster")
      .select(col("doc_id"), col("cluster"), col("split"),
        col("naive_split"), col("cluster_leaky"))
      .orderBy("doc_id")
  }

  /** Per-source sampling rate in parts-per-million, as a CASE shared
    * verbatim with the oracle SQL (identical syntax in both engines).
    * Integer ppm — never a float rate — so the keep decision is an
    * exact integer compare with no cross-engine rounding surface. */
  val RatePpmExpr: String =
    "CASE source WHEN 'src0' THEN 1000000 WHEN 'src1' THEN 750000 " +
      "WHEN 'src2' THEN 500000 WHEN 'src3' THEN 500000 " +
      "ELSE 250000 END"

  /** Mixture-weighted down-sampling: each source contributes at its own
    * configured rate (the standard lever for re-weighting a training
    * mix — cap the over-represented crawl, keep all of the curated
    * source). Keep iff `salted_hash % 1e6 < rate_ppm`: a pure per-row
    * function of (doc_id, source), so the kept set is reproducible
    * across runs, engines and corpus growth, and the filter fuses into
    * the scan — no shuffle, no state, unlike quota-by-rank schemes
    * which need a per-source top-k pass. */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame =
    TextOps.docs(spark, dir)
      .withColumn("rate_ppm", expr(RatePpmExpr))
      .withColumn("h32_mix",
        TextOps.h32(concat(lit("mix:"), col("doc_id").cast("string"))))
      .where(col("h32_mix") % 1000000 < col("rate_ppm"))
      .select("doc_id", "source", "rate_ppm")
      .orderBy("doc_id")

  /** Per-source quota capping: keep at most `quota` documents per
    * source, best-first by (quality_score desc, doc_id asc) — the
    * "cap the over-represented crawl by QUALITY, not by chance"
    * counterpart to [[mixtureSample]]'s rate-based thinning (quota
    * schemes guarantee an exact per-source ceiling; rate schemes only
    * an expected one). Implemented as ONE bounded top-k aggregate per
    * source ([[graft.functions.TopK]]): O(quota) heap state per group,
    * partial-combined map-side — no per-source sort of the corpus, no
    * global NTILE. Ranking on quality_score is safe cross-engine
    * because the score is a bit-identical double (see
    * [[TextOps.withTextSignals]]); ties break on doc_id inside the
    * ordering struct, so the kept set is total-order deterministic. */
  def sourceQuota(spark: SparkSession, dir: String, quota: Int = 30): DataFrame = {
    val scored = TextOps.withTextSignals(TextOps.withWords(TextOps.docs(spark, dir)))
      .select(col("doc_id"), col("source"), col("quality_score"))
    val tk = graft.functions.TopK.topKBy(
      struct(col("quality_score").as("qs"), (-col("doc_id")).as("nd")), quota)
    scored.groupBy("source")
      .agg(tk.as("tk"))
      .select(col("source"), posexplode(sort_array(col("tk"), asc = false)))
      .select(col("source"),
        (col("pos") + 1).cast("int").as("quota_rank"),
        (-col("col.nd")).as("doc_id"),
        col("col.qs").as("quality_score"))
      .orderBy("source", "quota_rank")
  }

  /** Deterministic stratified sample: the `n` lowest-salted-hash
    * documents per (lang, source) stratum — a uniform-without-
    * replacement sample under the md5 hash, reproducible across runs
    * and engines. Implemented as a bounded top-k aggregate
    * ([[graft.functions.TopK]], keeping the k LARGEST of (-h, -id) =
    * the k smallest (h, id)): per-stratum state is O(n) and combines
    * map-side with no candidate sort (the row_number-window
    * formulation — what the DuckDB oracle uses — fully sorts the
    * corpus rows within each partition before ranking). */
  def stratifiedSample(spark: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val hashed = TextOps.docs(spark, dir)
      .withColumn("h",
        TextOps.h32(concat(lit("sample:"), col("doc_id").cast("string"))))
    val tk = graft.functions.TopK.topKBy(
      struct((-col("h")).as("nh"), (-col("doc_id")).as("nd")), n)
    hashed.groupBy("lang", "source")
      .agg(tk.as("tk"))
      .select(col("lang"), col("source"),
        posexplode(sort_array(col("tk"), asc = false)))
      .select(col("lang"), col("source"),
        (col("pos") + 1).cast("int").as("sample_rank"),
        (-col("col.nd")).as("doc_id"), (-col("col.nh")).as("h"))
      .orderBy("lang", "source", "sample_rank")
  }

  /** Temperature-weighted source re-sampling (α = 1/2): keep-rates
    * DERIVED from source sizes — expected kept mass ∝ √n_s — instead
    * of [[mixtureSample]]'s hand-configured ppm table. The standard
    * "flatten the mix" lever for multi-source training sets: the
    * over-represented crawl thins toward its tempered share while
    * small curated sources keep (nearly) everything; rates adapt as
    * the corpus grows with no config change. The target keeps τ = ½
    * of the corpus in expectation (per-source capping at rate 1 can
    * only land it below τ — never renormalized upward, by design: a
    * source at rate 1 cannot donate its shortfall).
    *
    * Determinism: √n is IEEE-exact in both engines, but Σ√n as a
    * plain SUM would add doubles in partition order — so the
    * normalizer is a LEFT FOLD over the source-sorted (source, n)
    * list (sources are a handful; collect_list + array_sort +
    * aggregate is a few rows). Rates then floor to integer ppm and
    * the keep rule is the exact integer compare `h32 % 1e6 < ppm` —
    * per-row, fused into the scan, reproducible across engines and
    * corpus growth. */
  def temperatureSample(spark: SparkSession, dir: String): DataFrame = {
    val sizes = TextOps.docs(spark, dir).groupBy("source")
      .agg(count(lit(1)).as("n"))
    val tot = sizes.agg(
      sum("n").as("corpus_n"),
      expr("aggregate(array_sort(collect_list(struct(source, n))), " +
        "CAST(0 AS DOUBLE), (acc, x) -> acc + sqrt(CAST(x.n AS DOUBLE)))").as("sumw"))
    val rates = sizes.crossJoin(broadcast(tot))
      .withColumn("rate_ppm", expr(
        "CAST(floor(least(CAST(1 AS DOUBLE), " +
          "CAST(0.5 AS DOUBLE) * CAST(corpus_n AS DOUBLE) * sqrt(CAST(n AS DOUBLE)) " +
          "/ sumw / CAST(n AS DOUBLE)) * 1000000) AS BIGINT)"))
      .select("source", "rate_ppm")
    TextOps.docs(spark, dir)
      .join(broadcast(rates), Seq("source"))
      .withColumn("h32_temp",
        TextOps.h32(concat(lit("temp:"), col("doc_id").cast("string"))))
      .where(col("h32_temp") % 1000000 < col("rate_ppm"))
      .select("doc_id", "source", "rate_ppm")
      .orderBy("doc_id")
  }

  /** Deterministic WEIGHTED sampling without replacement — the lottery
    * scheme: every document holds `w` salted-hash tickets (w = its
    * integer weight, here a clamped token-count bucket — the "sample
    * long documents more" lever), a document's entry is its BEST
    * ticket, and the k highest entries win. Inclusion probability is
    * monotone in w, the draw is a pure function of (doc_id, weight) —
    * replayable across runs, engines and corpus growth — and there is
    * NO transcendental anywhere (the textbook Efraimidis–Spirakis keys
    * u^(1/w) need pow/log, which never reproduce across engines; the
    * ticket lottery trades their exact inclusion law for integer-exact
    * determinism, stated openly). Ticket fan-out is Σw ≤ `maxWeight`·n
    * — bounded, partial-aggregable max per doc, bounded TakeOrdered
    * top-k. */
  def weightedLottery(spark: SparkSession, dir: String, k: Int = 100,
      maxWeight: Int = 8): DataFrame = {
    val weighted = TextOps.withTextSignals(TextOps.withWords(
        TextOps.docs(spark, dir)))
      .select(col("doc_id"),
        least(lit(maxWeight),
          greatest(lit(1), expr("CAST(n_tokens div 64 AS INT)"))).as("w"))
    weighted
      .select(col("doc_id"), col("w"),
        explode(expr("sequence(1, w)")).as("ticket"))
      .select(col("doc_id"), col("w"),
        TextOps.h32(concat(lit("lottery:"), col("doc_id").cast("string"),
          lit(":"), col("ticket").cast("string"))).as("priority"))
      .groupBy("doc_id", "w")
      .agg(max("priority").as("best_ticket"))
      .orderBy(desc("best_ticket"), asc("doc_id"))
      .limit(k)
  }

  /** Rendezvous (highest-random-weight) sharding over an explicit shard
    * id set: each doc goes to the shard with the maximum salted hash
    * H("shard:" + doc_id + ":" + shard) — Thaler & Ravishankar's HRW,
    * the consistent-placement scheme behind cache rings and shard maps.
    * The property that matters operationally: REMOVING a shard remaps
    * ONLY that shard's documents (each survivor's per-shard weights are
    * unchanged, so its argmax moves only if the removed shard held it);
    * a mod-N assignment remaps (N−1)/N of the corpus on the same event.
    * Plan shape: the argmax is `greatest` over |shards| (weight, shard)
    * structs — ONE codegen'd per-row projection fused into the scan; no
    * explode, no shuffle, no state. Hash ties break to the higher shard
    * id (struct compare), mirrored in the oracle's ORDER BY. */
  def rendezvousOf(docs: DataFrame, shardIds: Seq[Int]): DataFrame = {
    require(shardIds.nonEmpty && shardIds.distinct == shardIds,
      s"shard ids must be non-empty and unique, got $shardIds")
    val candidates = shardIds.map { s =>
      struct(
        TextOps.h32(concat(lit("shard:"), col("doc_id").cast("string"),
          lit(":"), lit(s.toString))).as("w"),
        lit(s).as("shard"))
    }
    val best =
      if (candidates.size == 1) candidates.head else greatest(candidates: _*)
    docs.withColumn("best", best)
      .select(col("doc_id"), col("best.shard").as("shard"),
        col("best.w").as("weight"))
  }

  /** Driver-contract entry: rendezvous placement of the document corpus
    * onto 8 shards. */
  /** Expected split shares in ppm (train/val/test 80/10/10) — shared
    * with the oracle twin. */
  val SplitExpectedPpm: Seq[(String, Long)] =
    Seq("train" -> 800000L, "val" -> 100000L, "test" -> 100000L)

  /** SAMPLE-RATIO-MISMATCH audit — the first thing an experimentation
    * or data-split pipeline checks before trusting downstream metrics
    * (Fabijan et al.'s SRM test): do the observed split sizes match
    * the declared 80/10/10 design? Per split: observed count, expected
    * ppm, the exact cross-multiplied deviation n·10⁶ − p_ppm·N (BIGINT
    * — the termDrift discipline), and the χ² cell contribution
    * (o−e)²/e from exact-integer inputs. The grand χ² total is
    * deliberately absent (three cells; the cross-row double-sum rule).
    * Missing splits zero-fill from the declared design, so a split
    * that vanished entirely is a loud n = 0 row, not a missing row. */
  def splitBalanceAudit(spark: SparkSession, dir: String): DataFrame = {
    val observed = datasetSplit(spark, dir)
      .groupBy("split").agg(count(lit(1)).as("n"))
    val design = spark.createDataFrame(SplitExpectedPpm)
      .toDF("split", "expected_ppm")
    val total = observed.agg(sum("n").as("n_total"))
    design.join(observed, Seq("split"), "left")
      .crossJoin(broadcast(total))
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("delta_ppm_scaled",
        col("n") * lit(1000000L) - col("expected_ppm") * col("n_total"))
      .withColumn("contrib", expr(
        "(CAST(delta_ppm_scaled AS DOUBLE) * CAST(delta_ppm_scaled AS DOUBLE))" +
          " / ((CAST(1000000 AS DOUBLE) * CAST(expected_ppm AS DOUBLE))" +
          " * CAST(n_total AS DOUBLE))"))
      .select("split", "n", "expected_ppm", "delta_ppm_scaled", "contrib")
      .orderBy("split")
  }

  /** Replicate count for [[bootstrapMeans]] — shared with the oracle
    * twin. */
  val BootstrapB = 32

  /** Poisson(1) CDF thresholds in ppm, precomputed as literals (the
    * HLL linear-counting discipline: e^{-1} is a transcendental no two
    * engines evaluate identically, so the quantized CDF ships as
    * constants): P(X ≤ k) for k = 0..5; the tail collapses to w = 6. */
  val PoissonCdfPpm: Seq[Long] =
    Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999405L)

  /** POISSON BOOTSTRAP replicate means (Chamandy et al.'s
    * single-pass bootstrap — the distributed standard: true resampling
    * needs n dependent draws per replicate; independent Poisson(1)
    * weights per (row, replicate) approximate it with one scan): B
    * replicates of the mean document token count, each an EXACT
    * integer pair (Σw, Σw·x) with the one double division at the
    * surface — the sampling-error bars a corpus-metric dashboard
    * needs. Weights come from the salted md5 contract through the
    * literal CDF table, so every replicate is a pure function of
    * (doc_id, rep) in both engines.
    *
    * Shape: per-doc metric table × B bounded explode, one
    * partial-aggregable (rep) aggregate — B×metric-table-sized, never
    * corpus-text-sized. */
  def bootstrapMeans(spark: SparkSession, dir: String): DataFrame = {
    val cdf = PoissonCdfPpm.zipWithIndex
      .map { case (p, k) => s"WHEN u < $p THEN ${k}L" }
      .mkString("CASE ", " ", s" ELSE ${PoissonCdfPpm.size}L END")
    TextOps.withWords(TextOps.docs(spark, dir))
      .select(col("doc_id"), expr("size(ws)").cast("long").as("x"))
      .select(col("doc_id"), col("x"),
        explode(expr(s"sequence(0, ${BootstrapB - 1})")).as("rep"))
      .withColumn("u", TextOps.h32(
        concat(lit("boot:"), col("doc_id").cast("string"),
          lit(":"), col("rep").cast("string"))) % lit(1000000L))
      .withColumn("w", expr(cdf))
      .groupBy("rep")
      .agg(sum("w").as("n_eff"), sum(expr("w * x")).as("sum_wx"))
      .withColumn("mean_tokens",
        col("sum_wx").cast("double") / col("n_eff").cast("double"))
      .orderBy("rep")
  }

  def rendezvousShard(spark: SparkSession, dir: String,
      shards: Int = 8): DataFrame =
    rendezvousOf(TextOps.docs(spark, dir).select("doc_id"), 0 until shards)
      .orderBy("doc_id")

  /** Length-bucket rule for [[matchDistribution]], shared verbatim with
    * the oracle twin (exact integer edges — no float binning). */
  val MatchBucketExpr: String =
    "CASE WHEN n_chars <= 100 THEN '0-100' WHEN n_chars <= 200 THEN '101-200' " +
      "WHEN n_chars <= 300 THEN '201-300' WHEN n_chars <= 400 THEN '301-400' " +
      "ELSE '401+' END"

  /** Corpus split for [[matchDistribution]]: src0–src9 are the curated
    * REFERENCE mix, src10+ the new crawl being reshaped. Shared
    * verbatim with the oracle twin. */
  val MatchRefExpr: String = "length(source) <= 4"

  /** DISTRIBUTION-MATCHING RESAMPLE — reshape the new crawl so its
    * length profile matches the curated reference corpus: per length
    * bucket b, accept new-crawl documents at rate
    * min(1, share_ref(b) / share_new(b)) — rejection matching, the
    * standard move when a new source skews short (boilerplate) or long
    * (concatenation artifacts) relative to the mix the model was tuned
    * on. Down-sampling only (a rate is capped at 1): buckets the crawl
    * over-represents are thinned to the reference shape; buckets it
    * under-represents are kept whole — matching by deletion, never by
    * duplication. All shares and rates are exact integer ppm
    * (⌊10⁶·c/N⌋ twice, both floors stated identically in both
    * engines), and the accept decision is the salted-hash contract
    * (`h32("match:"+doc_id) % 10⁶ < rate_ppm`) — a pure function of
    * the document id, so the kept set is reproducible across runs,
    * engines, and corpus growth, exactly like [[mixtureSample]].
    * Headroom: the ppm share floor needs N ≤ 10⁶ per corpus side per
    * audit slice before a bucket share can round to 0; the
    * greatest(1,·) guard makes that degrade loud (rate pins to the
    * full share ratio), not divide-by-zero.
    *
    * Shape: one bucket-domain conditional aggregate over the corpus
    * (the only shuffle, bucket-domain-sized), a broadcast rate-table
    * join back, and a per-row hash filter that fuses into the scan —
    * no window, no per-bucket pass. */
  def matchDistribution(spark: SparkSession, dir: String): DataFrame =
    matchDistributionOf(TextOps.docs(spark, dir))

  /** Kernel of [[matchDistribution]] over any frame with
    * (doc_id, source, n_chars) — spec-testable on planted mixes. */
  private[graft] def matchDistributionOf(docs: DataFrame): DataFrame = {
    val d = docs
      .withColumn("bucket", expr(MatchBucketExpr))
      .withColumn("is_ref", expr(MatchRefExpr))
    val byBucket = d.groupBy("bucket").agg(
      sum(when(col("is_ref"), 1L).otherwise(0L)).as("c_a"),
      sum(when(!col("is_ref"), 1L).otherwise(0L)).as("c_b"))
    val tot = d.agg(
      sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_b"))
    val rates = byBucket.crossJoin(broadcast(tot))
      .where(col("c_b") > 0)
      .withColumn("share_a_ppm", expr("(1000000 * c_a) div n_a"))
      .withColumn("share_b_ppm", expr("(1000000 * c_b) div n_b"))
      .withColumn("rate_ppm", least(lit(1000000L),
        expr("(1000000 * share_a_ppm) div greatest(1, share_b_ppm)")))
      .select("bucket", "rate_ppm")
    d.where(!col("is_ref"))
      .join(broadcast(rates), "bucket")
      .withColumn("h32_match",
        TextOps.h32(concat(lit("match:"), col("doc_id").cast("string"))))
      .where(col("h32_match") % 1000000L < col("rate_ppm"))
      .select("doc_id", "source", "bucket", "rate_ppm")
      .orderBy("doc_id")
  }
}
