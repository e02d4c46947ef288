package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operator family for the training-data pipeline tier
  * (SURVEY.md §7.5): exact, n-gram Jaccard, MinHash+LSH, SimHash, and
  * embedding-cosine near-dup. Generalizes the reference's exact
  * seen-before dedup (`/root/reference/src/GenerateStream.java:38-43`,
  * O(n²) list scan) to content-based near-duplicate detection at scale.
  *
  * Scale architecture:
  *  - Exact dedup = hash-groupBy (one shuffle on the content hash).
  *  - Jaccard = inverted-index self-join on shingles (shuffle on shingle,
  *    AQE handles skew; a document-frequency cap bounds hot-shingle
  *    blowup — stop-shingles contribute nothing to high-Jaccard pairs).
  *  - MinHash+LSH: signatures in ONE aggregation pass (12 min-aggregates,
  *    map-side partial agg), then band-bucket equi-join ⇒ candidate pairs
  *    are O(near-dups), not O(n²); verification joins shingle sets of
  *    candidates only.
  *  - SimHash: 32 sum-aggregates (no bit-explosion), block-pigeonhole
  *    candidate join (hamming ≤ 3 ⇒ one of four 8-bit blocks equal).
  *  - Embedding near-dup: bit-identical left-fold cosine (see
  *    [[SimilarityOps]]); candidate pruning via sign-LSH buckets is the
  *    100 TB path, brute pairing is the small-side verifier.
  */
object DedupOps {

  /** MinHash universal-hash coefficients: minhash_i = min over shingles of
    * (a_i·H(sh) + b_i) mod p, p prime > 2^32. a_i < 2^21 keeps a_i·H < 2^53
    * (exact in BIGINT in both engines). 12 hashes = 4 bands × 3 rows:
    * P[candidate] = 1 − (1 − j³)⁴ ≈ 1 for j ≥ 0.8, ≈ .03 for j = 0.2. */
  val minhashCoeffs: Seq[(Long, Long)] = Seq(
    (1299709L, 12345L), (1999993L, 67891L), (1689287L, 11111L), (1948891L, 22222L),
    (1121231L, 33333L), (1982347L, 44444L), (1574051L, 55555L), (1300021L, 66666L),
    (1223543L, 77777L), (1997011L, 88888L), (1600033L, 99999L), (1777771L, 13579L))
  val minhashP = 4294967311L
  val bands = 4
  val rowsPerBand = 3

  /** Materializes the dedup-family INDEX artifacts for a (session, dir):
    * shingle inverted index + hashes, df-capped per-doc shingle arrays,
    * uncapped per-doc shingle arrays, MinHash band table, SimHash
    * signatures. These are exactly the tables a production deployment
    * builds once and stores (index build ≠ query); the per-query work —
    * candidate joins and verification — is NOT touched here. Used by
    * [[graft.Bench]]'s setup phase (timed separately as setup_sec, like
    * the star warehouse). */
  def buildIndexes(spark: SparkSession, dir: String, maxDf: Long = 10000L): Unit =
    indexArtifacts(spark, dir, maxDf).foreach(_._2())

  /** The same index builds as NAMED thunks, in dependency order (each
    * builds on the session-cached result of the previous), so
    * [[graft.Bench]] can time each artifact individually — a setup-time
    * inflation then names its culprit instead of hiding in one
    * aggregate number. */
  def indexArtifacts(spark: SparkSession, dir: String,
      maxDf: Long = 10000L): Seq[(String, () => Unit)] = Seq(
    "shingle_hashes" -> (() => TextOps.shingleHashes(spark, dir).count(): Unit),
    "shingle_bag" -> (() => TextOps.shingleBag(spark, dir).count(): Unit),
    "jaccard_doc_table" -> (() => jaccardDocTable(spark, dir, maxDf).count(): Unit),
    "shingle_arrays" -> (() => docShingleArrays(spark, dir).count(): Unit),
    "lsh_bands" -> (() => lshBands(spark, dir).count(): Unit),
    "simhash" -> (() => simhashSignatures(spark, dir).count(): Unit),
    "paragraphs" -> (() => ChunkOps.paragraphTable(spark, dir).count(): Unit))

  /** Exact dedup by content hash of the whitespace-normalized text: keeper
    * = min doc_id per group (the reference's first-wins rule F3,
    * `/root/reference/src/Meshjoin.java:108-117`, re-keyed by content). */
  def exact(spark: SparkSession, dir: String): DataFrame =
    TextOps.docs(spark, dir)
      .withColumn("text_hash",
        expr("md5(regexp_replace(trim(lower(text)), '\\\\s+', ' '))"))
      .groupBy("text_hash")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "text_hash", "n_copies")
      .orderBy("doc_id")

  /** One row per document: df-capped shingle-set size `n` and the shingle
    * array `ord`, globally ordered by (document frequency asc, shingle
    * value) — rarest first, a total order. The df cap drops shingles
    * appearing in > maxDf docs — a no-op on the testdata, a necessary
    * guard at 100 TB (a shingle in k docs produces k² candidate rows;
    * capped shingles cannot push a true near-dup pair below threshold
    * unless the pair was mostly stop-shingles anyway).
    *
    * This single session-cached table serves BOTH PPJoin stages:
    * `slice(ord, 1, prefixLen)` is the prefix index (no per-row window
    * sort — the ordering happens inside one hash-aggregate) and
    * `array_intersect(ord_a, ord_b)` is the exact verifier (a per-row set
    * op on two hash-joined arrays — replaces a candidates×shingles
    * expansion join that shuffled ~|cand|·|doc| rows). The whole build is
    * ONE df aggregate + ONE join + ONE doc aggregate over the inverted
    * index (df filter and ordering fused — no separate capped-index
    * materialization). Row width is bounded by document length, so the
    * array form is safe at 100 TB (documents are bounded; corpora are
    * not). */
  private[graft] def jaccardDocTable(spark: SparkSession, dir: String, maxDf: Long): DataFrame = {
    val sh = TextOps.shingleSet(spark, dir)
    graft.util.SessionCache.getOrBuild(spark, s"dedup|$dir|jacdoc|$maxDf") {
      val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .where(col("df") <= maxDf)
      sh.join(dfreq, "sh")
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("int").as("n"),
          expr("transform(array_sort(collect_list(struct(df, sh))), x -> x.sh)").as("ord"))
    }
  }

  /** Candidate pairs for [[jaccardPairs]] under PREFIX + LENGTH filtering
    * (the PPJoin family's pruning, Xiao et al., WWW'08 — public
    * algorithm). A pair with J(A,B) ≥ τ must share a shingle among the
    * first |A| − ⌈τ·|A|⌉ + 1 shingles of A AND the first |B| − ⌈τ·|B|⌉ + 1
    * of B under any single global order: the rank-minimal common element
    * cannot sit outside either prefix, else all ≥ ⌈τ·|size|⌉ common
    * elements would fit in a suffix of ⌈τ·|size|⌉ − 1 slots. So the
    * inverted-index self-join only indexes prefixes — at τ = 0.6 that is
    * ~40 % of the index rows and (rarest-first) far less of the
    * per-shingle candidate blowup — plus the length filter min ≥ τ·max
    * (J ≥ τ bounds the size ratio). The ε slack under the ceil/multiply
    * keeps float rounding strictly on the conservative (longer-prefix,
    * looser-length) side, so pruning can never drop a true pair. */
  def jaccardCandidates(spark: SparkSession, dir: String, threshold: Double = 0.6,
      maxDf: Long = 10000L): DataFrame = {
    val docs = jaccardDocTable(spark, dir, maxDf)
    val prefLen = (col("n") - ceil(col("n") * lit(threshold) - lit(1e-9)) + lit(1)).cast("int")
    val prefix = docs.select(col("doc_id"), col("n"),
      explode(slice(col("ord"), lit(1), prefLen)).as("sh"))
    prefix.as("x").join(prefix.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id") &&
          least(col("x.n"), col("y.n")).cast("double") >=
            greatest(col("x.n"), col("y.n")) * lit(threshold) - lit(1e-9))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** All-pairs word-3-gram Jaccard ≥ threshold: prefix-filtered candidate
    * generation ([[jaccardCandidates]]) + exact intersection counting
    * restricted to candidates — the same candidates-then-verify shape as
    * [[minhashLsh]], but with a deterministic (recall-lossless) filter.
    * Verification is per-pair `array_intersect` against the cached per-doc
    * arrays, not a shingle-expansion join. */
  def jaccardPairs(spark: SparkSession, dir: String, threshold: Double = 0.6,
      maxDf: Long = 10000L): DataFrame =
    // session-cached like the LSH verified pairs (same rationale: the
    // threshold curve sweeps this table through TWO aggregates and the
    // recall audit reads it as ground truth — uncached, each reference
    // re-runs candidates + verify; measured 13.7 s → ~4 s for the curve)
    graft.util.SessionCache.getOrBuild(spark,
      s"dedup|$dir|jaccard_pairs|$threshold|$maxDf") {
      jaccardPairsUncached(spark, dir, threshold, maxDf)
    }

  private def jaccardPairsUncached(spark: SparkSession, dir: String,
      threshold: Double, maxDf: Long): DataFrame = {
    val docs = jaccardDocTable(spark, dir, maxDf)
    jaccardCandidates(spark, dir, threshold, maxDf)
      .join(docs.select(col("doc_id"), col("n").as("na"), col("ord").as("oa")), col("doc_a") === col("doc_id"))
      .drop("doc_id")
      .join(docs.select(col("doc_id"), col("n").as("nb"), col("ord").as("ob")), col("doc_b") === col("doc_id"))
      .withColumn("shared", size(array_intersect(col("oa"), col("ob"))))
      .withColumn("jaccard", expr("CAST(shared AS DOUBLE) / (na + nb - shared)"))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** Ordered CONTAINMENT near-dup pairs: C(A→B) = |A∩B| / |A| ≥ τ over
    * the df-capped shingle sets — the asymmetric cousin of
    * [[jaccardPairs]]. Jaccard misses exactly the pairs containment
    * exists for: a short document quoted whole inside a long one scores
    * J ≈ |A|/|B| ≈ 0 but C(A→B) = 1. That is the subset-scrape /
    * quote-inflation shape a training-data dedup pass wants to catch
    * (keep the superset, drop the contained copy) — the same asymmetry
    * [[decontaminationScores]] uses against a fixed test split, here as
    * an all-pairs operator over one corpus.
    *
    * Pruning (prefix filter, containment form): if C(A→B) ≥ τ then at
    * most |A| − ⌈τ·|A|⌉ of A's shingles miss B, so among the FIRST
    * |A| − ⌈τ·|A|⌉ + 1 shingles of A under the global rarest-first
    * order at least one is in B — the same prefix length as Jaccard's,
    * but probed against the FULL inverted index (no UPPER length
    * filter: B may be arbitrarily larger, that is the point of the
    * operator). One length filter IS sound and fused into the join —
    * the |A| ≤ |B|/τ ORIENTATION cut: C(A→B) ≥ τ forces
    * |B| ≥ |A∩B| ≥ ⌈τ·|A|⌉, so index entries of documents SMALLER
    * than τ·|A| can never verify and are pruned inside the candidate
    * join (lossless by the same ⌈τ·n − ε⌉ arithmetic as the prefix
    * length; the round-7 super-linear constant came precisely from
    * big-A probes raining candidates onto small Bs that could never
    * contain them). Candidate volume is Σ_{sh ∈ prefixes} df(sh),
    * bounded by the df cap exactly like [[jaccardCandidates]];
    * rarest-first ordering keeps the probed shingles the low-df ones.
    * Verification is the per-pair `array_intersect` against the cached
    * doc arrays. Pairs are ORDERED (doc_a = the contained side,
    * doc_a ≠ doc_b): A⊂B and B⊂A are different facts and both are
    * reported when both hold (e.g. equal sets). */
  def containmentPairs(spark: SparkSession, dir: String, threshold: Double = 0.8,
      maxDf: Long = 10000L): DataFrame = {
    val docs = jaccardDocTable(spark, dir, maxDf)
    val prefLen = (col("n") - ceil(col("n") * lit(threshold) - lit(1e-9)) + lit(1)).cast("int")
    val minShared = ceil(col("na") * lit(threshold) - lit(1e-9))
    val probe = docs.select(col("doc_id").as("doc_a"), col("n").as("na"),
      explode(slice(col("ord"), lit(1), prefLen)).as("sh"))
    val index = docs.select(col("doc_id").as("doc_b"), col("n").as("nb"),
      explode(col("ord")).as("sh"))
    val cand = probe.join(index,
        probe("sh") === index("sh") && col("doc_a") =!= col("doc_b") &&
          col("nb") >= minShared)
      .select("doc_a", "doc_b")
      .distinct()
    cand
      .join(docs.select(col("doc_id"), col("n").as("na"), col("ord").as("oa")),
        col("doc_a") === col("doc_id"))
      .drop("doc_id")
      .join(docs.select(col("doc_id"), col("ord").as("ob")),
        col("doc_b") === col("doc_id"))
      .withColumn("n_shared", size(array_intersect(col("oa"), col("ob"))))
      .withColumn("containment", expr("CAST(n_shared AS DOUBLE) / na"))
      .where(col("containment") >= threshold)
      .select("doc_a", "doc_b", "n_shared", "containment")
      .orderBy("doc_a", "doc_b")
  }

  /** The APPLY half of containment dedup: per document, the keep/drop
    * verdict and the best superset it was dropped for. The keep rule is
    * pairwise dominance — B dominates A iff C(A→B) ≥ τ and EITHER the
    * containment is one-way (B is the strictly-larger superset) OR it
    * is mutual (near-identical sets) and B has the lower id — the
    * family's first-wins convention, which keeps exactly one member of
    * every mutually-contained group instead of dropping all of them.
    * Greedy pairwise semantics (standard for containment dedup): a
    * dropped doc's content is retained by its superset at ≥ τ per hop,
    * not transitively re-verified — the same documented trade as the
    * stream-dedup tier's greedy-sequential rule.
    *
    * Shape: ONE self-join of the (already thresholded, ordered) pair
    * table against itself on the reversed key to detect mutuality, a
    * per-doc `max(struct)` argmax (no window), and a left join onto the
    * corpus to restore never-contained docs. Nothing here outweighs
    * the pair generation it consumes. */
  def containmentKeepers(spark: SparkSession, dir: String, threshold: Double = 0.8,
      maxDf: Long = 10000L): DataFrame = {
    val pairs = containmentPairs(spark, dir, threshold, maxDf)
      .select("doc_a", "doc_b", "containment")
    val dom = pairs.as("x")
      .join(pairs.as("y"),
        col("y.doc_a") === col("x.doc_b") && col("y.doc_b") === col("x.doc_a"),
        "left")
      .where(col("y.doc_a").isNull || col("x.doc_b") < col("x.doc_a"))
      .select(col("x.doc_a").as("doc_id"), col("x.doc_b").as("sup"),
        col("x.containment").as("c"))
    val best = dom.groupBy("doc_id")
      .agg(max(struct(col("c"), (-col("sup")).as("ns"))).as("b"))
      .select(col("doc_id"), (-col("b.ns")).as("contained_in"),
        col("b.c").as("containment"))
    TextOps.docs(spark, dir).select("doc_id")
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("contained_in").isNull.as("keep"),
        col("contained_in"), col("containment"))
      .orderBy("doc_id")
  }

  /** MinHash signatures from an arbitrary (doc_id, h) shingle-hash frame
    * (batch index build or a streaming micro-batch): one hash-aggregate
    * pass producing all 12 minhash columns m0..m11 (partial aggregation
    * map-side; the only shuffle is the groupBy(doc_id)). */
  def minhashSignaturesOf(shingleHashes: DataFrame): DataFrame = {
    val aggs = minhashCoeffs.zipWithIndex.map { case ((a, b), i) =>
      min(expr(s"($a * h + $b) % $minhashP")).as(s"m$i")
    }
    shingleHashes.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    minhashSignaturesOf(TextOps.shingleHashes(spark, dir))

  /** LSH band table from an arbitrary signature frame: (doc_id, band,
    * key) with key = the band's rowsPerBand minhashes concatenated.
    * Documents sharing any (band, key) are candidate near-duplicates.
    * NOT cached — callers that reuse it go through [[lshBands]]. */
  def lshBandsOf(sig: DataFrame): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val key = (0 until rowsPerBand)
        .map(r => s"CAST(m${b * rowsPerBand + r} AS STRING)")
        .mkString("concat_ws('_', ", ", ", ")")
      s"struct(CAST($b AS INT) AS band, $key AS key)"
    }.mkString("array(", ", ", ")")
    sig.select(col("doc_id"), explode(expr(bandStructs)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Session-cached [[lshBandsOf]] for a (session, dir) — the LSH index
    * artifact a production deployment materializes to storage (the
    * candidate self-join otherwise recomputes the full
    * shingle→md5→signature pipeline on both sides). */
  def lshBands(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashSignatures(spark, dir)
    graft.util.SessionCache.getOrBuild(spark, s"dedup|$dir|lsh_bands") {
      lshBandsOf(sig)
    }
  }

  /** Per-doc sorted shingle arrays from an arbitrary shingle frame
    * (sorted for a deterministic layout). NOT cached — see
    * [[docShingleArrays]]. */
  def docShingleArraysOf(shingles: DataFrame): DataFrame =
    shingles.groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n"), array_sort(collect_list("sh")).as("arr"))

  /** Session-cached one-row-per-document UNCAPPED shingle array — the
    * exact-set verifier for [[minhashLsh]] (whose Jaccard semantics are
    * over the full shingle set, no df cap). */
  private def docShingleArrays(spark: SparkSession, dir: String): DataFrame = {
    val sh = TextOps.shingleSet(spark, dir)
    graft.util.SessionCache.getOrBuild(spark, s"dedup|$dir|sharr") {
      docShingleArraysOf(sh)
    }
  }

  /** MinHash+LSH near-dup detection: band-bucket join → distinct candidate
    * pairs → exact-Jaccard verification restricted to candidates — a
    * per-pair `array_intersect` against the cached per-doc shingle arrays
    * (two hash joins on doc_id + a set op per candidate row; never a
    * candidates×shingles expansion join). Candidates are O(near-dups),
    * which is what makes the operator sub-quadratic at scale. */
  def minhashLsh(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    // Index artifacts (bands, doc arrays) are cached at their definition
    // sites; the verified pair set is itself cached here because
    // clusters() consumes the same pairs — verification runs once.
    val bandsDf = lshBands(spark, dir)
    val docs = docShingleArrays(spark, dir)
    graft.util.SessionCache.getOrBuild(spark, s"dedup|$dir|lsh_pairs|$threshold") {
      val cand = bandsDf.as("x").join(bandsDf.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      cand
        .join(docs.select(col("doc_id"), col("n").as("na"), col("arr").as("oa")),
          col("doc_a") === col("doc_id"))
        .drop("doc_id")
        .join(docs.select(col("doc_id"), col("n").as("nb"), col("arr").as("ob")),
          col("doc_b") === col("doc_id"))
        .withColumn("shared", size(array_intersect(col("oa"), col("ob"))))
        .withColumn("jaccard", expr("CAST(shared AS DOUBLE) / (na + nb - shared)"))
        .where(col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    }
  }

  /** 32-bit SimHash over shingle hashes: bit b of the signature is the
    * sign of Σ_shingles (2·bit_b(H) − 1). Computed as 32 sum-aggregates in
    * ONE pass — no 32× row explosion; the only shuffle is groupBy(doc_id). */
  def simhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    // Session-cached index artifact: the block self-join otherwise
    // recomputes the full shingle→md5→32-aggregate pipeline per side.
    val sh = TextOps.shingleHashes(spark, dir)
    graft.util.SessionCache.getOrBuild(spark, s"dedup|$dir|simhash_sig") {
      val sums = (0 until 32).map { b =>
        sum(expr(s"2 * ((h >> $b) & 1) - 1")).as(s"s$b")
      }
      val assemble = (0 until 32)
        .map(b => s"CASE WHEN s$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END")
        .mkString(" + ")
      sh.groupBy("doc_id").agg(sums.head, sums.tail: _*)
        .select(col("doc_id"), expr(assemble).as("sh32"))
    }
  }

  /** SimHash near-dup pairs with hamming ≤ 3, found via the block
    * pigeonhole: split the 32-bit signature into four 8-bit blocks —
    * hamming ≤ 3 guarantees at least one block is identical, so an
    * equi-join on (block index, block value) yields all such pairs
    * without an O(n²) comparison. */
  def simhashPairs(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    // The 4-block pigeonhole is complete only for hamming ≤ 3 (4 blocks
    // guarantee a shared block for up to 3 differing bits). A larger
    // maxHamming would silently return an INCOMPLETE pair set.
    require(maxHamming >= 0 && maxHamming <= 3,
      s"simhashPairs' 4-block pigeonhole join is complete only for maxHamming <= 3, got $maxHamming")
    val sig = simhashSignatures(spark, dir)
    val blocks = sig.select(col("doc_id"), col("sh32"),
        explode(expr("sequence(0, 3)")).as("blk"))
      .withColumn("bval", expr("(sh32 >> (8 * blk)) & 255"))
    blocks.as("x").join(blocks.as("y"),
        col("x.blk") === col("y.blk") && col("x.bval") === col("y.bval") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("bit_count(x.sh32 ^ y.sh32)").as("hamming"))
      // filter BEFORE distinct: hamming > threshold pairs (the vast
      // majority) never enter the dedup shuffle.
      .where(col("hamming") <= maxHamming)
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** Connected components over the MinHash-LSH near-dup pairs — the
    * final stage of the dedup pipeline (pairs alone don't dedup: A≈B and
    * B≈C must collapse into ONE cluster to pick one keeper). Components
    * come from [[GraphOps.connectedComponents]] (alternating
    * large-star/small-star pointer doubling — O(log d) rounds in the
    * component diameter, so diameter-heavy near-dup chains converge
    * where one-hop min-label propagation would hit its round cap);
    * singleton documents are restored by a left join against the corpus.
    * Keeper = the canonical minimum doc_id per cluster (first-wins, the
    * reference's F3 rule applied content-wise). Oracle: WITH RECURSIVE
    * transitive closure reaching the same fixed point. */
  def clusters(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val pairs = minhashLsh(spark, dir, threshold).select("doc_a", "doc_b")
    val comp = GraphOps.connectedComponents(pairs, "doc_a", "doc_b")
    TextOps.docs(spark, dir).select("doc_id")
      .join(comp, col("doc_id") === col("node"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("cluster"))
      .withColumn("is_keeper", col("doc_id") === col("cluster"))
      .orderBy("doc_id")
  }

  /** Quality-aware canonical selection — the keeper policy a real
    * pipeline wants INSTEAD of min-id: per near-dup cluster, keep the
    * member with the highest [[TextOps.textStats]] quality score (tie →
    * lower doc_id). Min-id keepers ([[clusters]]' `is_keeper`) are the
    * deterministic default; this operator upgrades the choice to "keep
    * the best copy" — the difference matters exactly when near-dups are
    * unequal (a clean original vs a boilerplate-wrapped scrape).
    *
    * Shape: cluster table ⋈ quality table on doc_id (both
    * oracle-checked queries already), then ONE cluster-keyed aggregate
    * whose argmax is a `max(struct(quality, −doc_id))` — no window, no
    * per-cluster sort. */
  def qualityKeepers(spark: SparkSession, dir: String): DataFrame =
    clusters(spark, dir).select("doc_id", "cluster")
      .join(graft.ext.TextOps.textStats(spark, dir)
        .select("doc_id", "quality_score"), "doc_id")
      .groupBy("cluster")
      .agg(
        count(lit(1)).as("n_members"),
        max(struct(col("quality_score"), (-col("doc_id")).as("nd"))).as("best"))
      .select(col("cluster"), col("n_members"),
        (-col("best.nd")).as("keeper_doc_id"),
        col("best.quality_score").as("keeper_quality"))
      .orderBy("cluster")

  /** Embedding-cosine near-duplicate pairs (cosine ≥ threshold), pruned by
    * sign-LSH buckets: a pair is a candidate iff its two 8-bit buckets
    * ([[SimilarityOps.bucketExpr]]) differ in at most one bit (the
    * multi-probe flip-one-bit rule), then the exact bit-identical
    * left-fold cosine ([[SimilarityOps.cosExpr]]) verifies candidates.
    *
    * Scale: one explode (9 probes/vector) + an equi-join on the bucket —
    * never the O(n²) cross product the previous all-pairs version paid
    * (plan-confirmed: no BroadcastNestedLoopJoin). Probes are distinct,
    * so each hamming ≤ 1 pair matches exactly once — no dedup shuffle.
    *
    * Recall semantics (documented, mirrored by the oracle): a pair whose
    * buckets differ in ≥ 2 of the 8 projected signs is not reported. For
    * true near-duplicates (cosine → 1) the sign agreement probability per
    * hyperplane is 1 − θ/π → 1, so recall → 1; at threshold 0.5 this is an
    * ANN operator, not an exact one — use [[SimilarityOps.bruteForceTopK]]
    * as the exact small-scale verifier. */
  def embeddingNearDup(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val e = SimilarityOps.withNormAndBucket(SimilarityOps.embeddings(spark, dir))
    val probesExpr = (Seq("bucket") ++ (0 until 8).map(j => s"bucket ^ ${1 << j}"))
      .mkString("array(", ", ", ")")
    val probes = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
      col("norm").as("na"), explode(expr(probesExpr)).as("probe"))
    probes.join(e, col("probe") === col("bucket") && col("vec_a") < col("vec_id"))
      .withColumn("cos", expr(SimilarityOps.cosExpr("ea", "embedding", "na", "norm")))
      .where(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_id").as("vec_b"), col("cos").as("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  /** Train/test DECONTAMINATION screening — the leakage check every
    * training-data pipeline runs before a model sees the corpus: for
    * each TRAIN document, the fraction of its distinct shingles that
    * appear anywhere in the TEST split (containment, the asymmetric
    * cousin of Jaccard — a short test item quoted inside a long train
    * doc scores high here but near zero on Jaccard, which is why
    * symmetric near-dup passes miss exactly the leaks that inflate
    * evals). Splits come from [[SampleOps.withSplit]] — the same salted
    * hash that assigned them — so the screen and the split can never
    * disagree about membership.
    *
    * Scale shape: one equi-join of the train shingle index against the
    * DISTINCT test-shingle set on the shingle key. Here the test split
    * is 10 % of the corpus so the join shuffles; a real eval set is
    * tiny and broadcasts under AQE's threshold without code changes.
    * Short train docs (< 3 words, no shingles) carry NULL containment
    * rather than a fabricated 0 — same convention as novelty. */
  def decontaminationScores(spark: SparkSession, dir: String): DataFrame = {
    val sh = TextOps.shingleSet(spark, dir)
    val split = SampleOps.withSplit(TextOps.docs(spark, dir))
      .select("doc_id", "split")
    val trainSh = sh.join(split.where(col("split") === "train"), "doc_id")
    val testSh = sh.join(split.where(col("split") === "test"), "doc_id")
      .select("sh").distinct().withColumn("__hit", lit(1))
    val scored = trainSh.join(testSh, Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("int").as("n_shingles"),
        sum(when(col("__hit").isNotNull, 1).otherwise(0)).cast("int").as("n_matched"))
      .withColumn("containment",
        col("n_matched").cast("double") / col("n_shingles").cast("double"))
    split.where(col("split") === "train").select("doc_id")
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0)).as("n_shingles"),
        coalesce(col("n_matched"), lit(0)).as("n_matched"),
        col("containment"))
      .orderBy("doc_id")
  }

  /** Incremental dedup — the daily-ingest shape: a NEW batch of
    * documents is screened against the EXISTING corpus through the
    * stored LSH band index, without ever re-pairing the corpus against
    * itself. Per increment document the operator emits the ingest
    * decision: `is_new` (no corpus near-dup at the threshold), else the
    * best-matching corpus document (`dup_of`, highest verified Jaccard,
    * ties to the lowest doc_id) — what a dedup-at-ingest gate acts on.
    *
    * The increment is simulated as `doc_id % 10 == 0` (10 % of the
    * corpus); in production the increment's bands are computed fresh
    * from the new batch ([[lshBandsOf]] over [[minhashSignaturesOf]])
    * and the corpus side is the band table read back from storage —
    * both sides here filter the same session-cached index, which is the
    * identical dataflow from the probe join onward.
    *
    * Scale shape: the probe is an equi-join of increment bands against
    * corpus bands on (band, key) — candidate volume is O(near-dups of
    * the increment), NEVER corpus × corpus; verification is the same
    * per-candidate `array_intersect` as [[minhashLsh]]; the best-match
    * window partitions by increment doc (bounded groups). A daily
    * increment is small relative to the corpus, so its band side
    * broadcasts under AQE without code changes. */
  def incrementalDedup(spark: SparkSession, dir: String,
      threshold: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val isIncrement = col("doc_id") % 10 === 0
    val bandsAll = lshBands(spark, dir)
    val docs = docShingleArrays(spark, dir)
    val cand = bandsAll.where(isIncrement).as("x")
      .join(bandsAll.where(!isIncrement).as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key"))
      .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("dup_of"))
      .distinct()
    val verified = cand
      .join(docs.select(col("doc_id"), col("n").as("na"), col("arr").as("oa")),
        Seq("doc_id"))
      .join(docs.select(col("doc_id").as("dup_of"), col("n").as("nb"),
        col("arr").as("ob")), Seq("dup_of"))
      .withColumn("shared", size(array_intersect(col("oa"), col("ob"))))
      .withColumn("jaccard", expr("CAST(shared AS DOUBLE) / (na + nb - shared)"))
      .where(col("jaccard") >= threshold)
    val best = verified
      .withColumn("__rn", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("jaccard").desc, col("dup_of").asc)))
      .where(col("__rn") === 1)
      .select("doc_id", "dup_of", "jaccard")
    TextOps.docs(spark, dir).where(isIncrement).select("doc_id")
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of").isNull.as("is_new"),
        col("dup_of"), col("jaccard"))
      .orderBy("doc_id")
  }

  /** Cluster-size distribution — the one-page summary of a dedup run
    * ("how much duplication, in what shapes"): how many near-dup
    * clusters exist at each size. Size 1 = unique documents; the tail
    * is where template spam lives. Two tiny aggregates over the
    * already-computed cluster assignment (cluster count ≤ doc count,
    * size histogram ≤ max cluster size rows). */
  def clusterSizeHistogram(spark: SparkSession, dir: String): DataFrame =
    clusters(spark, dir)
      .groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      .orderBy("cluster_size")

  /** Threshold grid for [[thresholdCurve]] — spelled as SQL literal
    * text so both engines parse the identical doubles. */
  val CurveTaus: Seq[String] = Seq("0.6", "0.7", "0.8", "0.9")

  /** Dedup YIELD CURVE — the tuning dashboard for a threshold choice:
    * at each τ of [[CurveTaus]], how many verified near-dup pairs
    * survive and how many distinct documents they touch. Answers "what
    * does tightening τ cost in recall / buy in precision" from ONE
    * pass over the already-verified pair table (pairs below the base
    * τ = 0.6 were never near-dups under the operator's own
    * definition, so the curve's domain starts there). Zero-filled
    * against the τ spine so an empty tier is a visible 0, not a
    * missing row.
    *
    * Shape: verified pairs × 4 grid rows (bounded explode), two tiny
    * aggregates, a 4-row spine left join — everything after the
    * shared pair table is pair-count-sized. */
  def thresholdCurve(spark: SparkSession, dir: String): DataFrame = {
    val tauArr = s"array(${CurveTaus.map(t => s"CAST($t AS DOUBLE)").mkString(", ")})"
    val spine = spark.range(1).select(explode(expr(tauArr)).as("tau"))
    val hits = jaccardPairs(spark, dir)
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        explode(expr(tauArr)).as("tau"))
      .where(col("jaccard") >= col("tau"))
    val np = hits.groupBy("tau").agg(count(lit(1)).as("n_pairs"))
    val nd = hits
      .select(col("tau"), explode(array(col("doc_a"), col("doc_b"))).as("doc"))
      .groupBy("tau").agg(countDistinct("doc").as("n_docs"))
    spine.join(np, Seq("tau"), "left").join(nd, Seq("tau"), "left")
      .select(col("tau"), coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"))
      .orderBy("tau")
  }

  /** LEXICAL ↔ SEMANTIC dedup VENN — how much the two near-dup
    * families overlap on real data: lexical pairs (word-shingle
    * Jaccard ≥ 0.5, the lossless PPJoin set over documents) against
    * semantic pairs ([[graft.ext.VectorOps.semanticDedup]]'s
    * embedding-cosine set over the vector table) with both axes
    * counted: both / lexical-only / semantic-only. Paraphrases land
    * semantic-only, boilerplate-with-token-churn lexical-only — the
    * split that decides whether a pipeline needs both passes or one.
    * Doc and vector ids share the synthetic id space, so the
    * comparison joins on the pair key directly. One full-outer join of
    * two session-cached pair tables + one 3-row aggregate. */
  def dedupVenn(spark: SparkSession, dir: String): DataFrame = {
    val lex = jaccardPairs(spark, dir, threshold = 0.5)
      .select(col("doc_a"), col("doc_b")).withColumn("in_lex", lit(1))
    // the same cell-bounded cosine pairs semanticDedup aggregates into
    // its per-vector verdicts, kept at the PAIR grain and canonical
    val cells = VectorOps.kmeansAssign(spark, dir, nProbe = 2)
      .where(col("crank") === 1)
      .select(col("vec_id"), col("embedding"), col("norm"), col("cent_id").as("cell"))
    val sem = cells.as("a").join(cells.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .where(expr(SimilarityOps.cosExpr("a.embedding", "b.embedding",
        "a.norm", "b.norm")) >= lit(VectorOps.SemTau))
      .select(col("a.vec_id").as("doc_a"), col("b.vec_id").as("doc_b"))
      .withColumn("in_sem", lit(1))
    lex.join(sem, Seq("doc_a", "doc_b"), "full_outer")
      .select(
        when(col("in_lex").isNotNull && col("in_sem").isNotNull, "both")
          .when(col("in_lex").isNotNull, "lexical_only")
          .otherwise("semantic_only").as("family"))
      .groupBy("family").agg(count(lit(1)).as("n_pairs"))
      .orderBy("family")
  }

  /** LSH RECALL AUDIT — what the banding sketch actually catches, by
    * similarity band: ground truth is the LOSSLESS PPJoin pair set at
    * τ = 0.5 ([[jaccardPairs]] — prefix filtering provably drops no
    * true pair), found is the [[minhashLsh]] verified set (banding is
    * probabilistic: P[candidate] = 1 − (1 − j³)⁴, so misses
    * concentrate just above τ). Per 0.1-wide jaccard bucket: true
    * pairs, found pairs, ppm recall — the measured sketch-quality
    * curve next to the ANN recall calibrations, from one left join of
    * two already-computed pair tables (both session-cached; the audit
    * adds only pair-count-sized work). Bucketing floors the SAME
    * bit-identical double in both engines. */
  def lshRecallAudit(spark: SparkSession, dir: String): DataFrame = {
    val truth = jaccardPairs(spark, dir, threshold = 0.5)
    val found = minhashLsh(spark, dir)
      .select(col("doc_a"), col("doc_b")).withColumn("hit", lit(1))
    truth.join(found, Seq("doc_a", "doc_b"), "left")
      .withColumn("bucket", expr("CAST(floor(jaccard * 10) AS INT)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_true"),
        sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_found"))
      .withColumn("recall_ppm", expr("(1000000 * n_found) div n_true"))
      .orderBy("bucket")
  }

  /** Weighted-Jaccard ppm threshold (τ_w = 0.5) — shared with the
    * oracle twin. */
  val WJaccardPpm = 500000L

  /** WEIGHTED (multiset) Jaccard near-dup pairs:
    * J_w(A,B) = Σ_t min(tf_A, tf_B) / Σ_t max(tf_A, tf_B) over the
    * df-capped shingle BAGS — the repetition-aware cousin of
    * [[jaccardPairs]]. Set-Jaccard treats "spam spam spam …" and one
    * "spam" as the same set; the weighted form is what near-dup work
    * on templated/repetitive corpora actually wants (and what
    * consistent-weighted-sampling sketches approximate — this is the
    * exact verify those sketches would feed).
    *
    * Identity that keeps it one join: per term max + min = tf_A + tf_B
    * and unshared terms contribute their own tf to the max side, so
    * Σmax = T_A + T_B − Σmin with T the per-doc capped-bag totals —
    * the intersection join plus two doc-table lookups, never a union
    * materialization. The pair join is the inverted-index equi-join on
    * the shingle key (the [[containmentPairs]] shape), df-capped so a
    * hot shingle cannot quadratically explode candidates; the ratio is
    * ppm-QUANTIZED exact BIGINT (⌊10⁶·Σmin/Σmax⌋ — both engines floor
    * identically; no doubles anywhere). Totals are computed over the
    * SAME capped universe as the intersection, so the identity holds
    * exactly. */
  def weightedJaccardPairs(spark: SparkSession, dir: String,
      maxDf: Long = 10000L): DataFrame = {
    val tf = TextOps.shingleBag(spark, dir)
    val dfreq = tf.groupBy("sh").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
    val capped = tf.join(dfreq.select("sh"), "sh")
    val totals = capped.groupBy("doc_id").agg(sum("tf").as("total"))
    capped.as("x").join(capped.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(sum(least(col("x.tf"), col("y.tf"))).as("inter"))
      .join(totals.select(col("doc_id").as("doc_a"), col("total").as("ta")),
        "doc_a")
      .join(totals.select(col("doc_id").as("doc_b"), col("total").as("tb")),
        "doc_b")
      .withColumn("j_wppm",
        expr(s"(${TextOps.Ppm} * inter) div (ta + tb - inter)"))
      .where(col("j_wppm") >= WJaccardPpm)
      .select("doc_a", "doc_b", "inter", "j_wppm")
      .orderBy("doc_a", "doc_b")
  }

  /** SOURCE-OVERLAP MATRIX — near-dup provenance analysis: for every
    * (source, source) pair, how many verified Jaccard near-dup pairs
    * straddle it. This is the question a multi-crawl corpus asks
    * before budgeting dedup ("which feeds copy which?"): a hot
    * OFF-diagonal cell is a mirror/scraper relationship worth a
    * source-level rule; a hot DIAGONAL cell is internal churn
    * (re-crawls of one feed). Cells are CANONICAL (source_a ≤ source_b
    * lexicographically) so each undirected pair lands in one cell, and
    * the matrix is zero-filled over the full source×source upper
    * triangle — an absent relationship is a visible 0, not a missing
    * row. Shape: the session-cached verified pair table joined twice
    * to the doc→source map (doc-keyed broadcastable side), one
    * bounded aggregate (≤ |sources|² rows), a domain-grid left join. */
  def sourceOverlap(spark: SparkSession, dir: String,
      threshold: Double = 0.6): DataFrame = {
    val src = TextOps.docs(spark, dir).select("doc_id", "source")
    val pairs = jaccardPairs(spark, dir, threshold)
      .join(src.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("source", "sa"), "doc_a")
      .join(src.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("source", "sb"), "doc_b")
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"))
    val sources = src.select("source").distinct()
    val grid = sources.as("x").crossJoin(sources.as("y"))
      .where(col("x.source") <= col("y.source"))
      .select(col("x.source").as("source_a"), col("y.source").as("source_b"))
    grid.join(pairs, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
      .orderBy("source_a", "source_b")
  }
}
