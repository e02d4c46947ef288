package graft

/** Physical-plan shape pins — the properties that make operators viable
  * at 100 TB, asserted so a regression to an all-pairs or non-broadcast
  * plan fails CI, not a cluster. (The round-1 review caught exactly such
  * a regression: embeddingNearDup silently planning a
  * BroadcastNestedLoopJoin.) `ext_sim_topk` is exempt: the brute-force
  * baseline is DOCUMENTED as an exact all-pairs verifier. */
class PlanShapeSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfSmoke).queryExecution.executedPlan.toString

  test("dedup and ANN plans never degenerate to all-pairs joins") {
    // ext_sim_ivf_topk is exempt from the BNLJ ban ONLY: its centroid
    // assignment is a nested loop against the BROADCAST centroid set
    // (bounded at ~√n rows → n×√n work, sub-quadratic by construction —
    // the standard IVF assignment shape). The CartesianProduct ban still
    // applies to it. Asserted on a cold cache: SessionCache persistence
    // must not be what hides a bad join (pre-fix, suite ordering decided
    // whether this test saw the real plan or an InMemoryTableScan).
    graft.util.SessionCache.invalidate(spark)
    val bucketed = Seq(
      "ext_dedup_jaccard", "ext_dedup_minhash_lsh", "ext_dedup_simhash",
      "ext_dedup_embedding", "ext_sim_lsh_topk", "ext_sim_lsh_multiprobe",
      "ext_sim_ivf_topk")
    for (q <- bucketed) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plan contains a cartesian product")
      if (q != "ext_sim_ivf_topk")
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plan contains an all-pairs join")
    }
  }

  test("ANN top-k is a bounded aggregate, not a window sort over candidates") {
    // the row_number window plan fully sorts the candidate set in every
    // map partition (WindowGroupLimit bounds the shuffle, not the
    // sorts); the bounded collect_top_k aggregate keeps an O(k) heap
    // per group with no candidate sort anywhere.
    graft.util.SessionCache.invalidate(spark)
    for (q <- Seq("ext_sim_topk", "ext_sim_lsh_topk", "ext_sim_lsh_multiprobe",
        "ext_sim_ivf_topk")) {
      val p = planOf(q)
      assert(p.contains("collect_top_k"), s"$q plan lost the bounded top-k aggregate")
      assert(!p.contains("RunningWindowFunction") && !p.contains("Window "),
        s"$q plan sorts candidates through a window operator")
    }
  }

  test("round-4 additions keep their scale shapes") {
    graft.util.SessionCache.invalidate(spark)
    // pHash near-dup: pigeonhole block equi-join, never all-pairs
    val phash = planOf("ext_media_phash")
    assert(!phash.contains("CartesianProduct") &&
      !phash.contains("BroadcastNestedLoopJoin"),
      "ext_media_phash degenerated to an all-pairs join")
    // semantic dedup: the only nested loop allowed is the broadcast
    // centroid assignment (bounded side); the pair join must be an
    // equi-join on the cell
    val sem = planOf("ext_dedup_semantic")
    assert(!sem.contains("CartesianProduct"))
    assert(sem.contains("SortMergeJoin") || sem.contains("ShuffledHashJoin") ||
      sem.contains("BroadcastHashJoin"),
      "ext_dedup_semantic lost its equi-join on the cell")
    // cube: one Expand feeding a hash aggregate — not one scan per grouping
    val cube = planOf("q13_cube")
    assert("Expand".r.findAllIn(cube).size >= 1)
    assert("Scan parquet".r.findAllIn(cube).size <= 4, // fact lineage + dim_time
      s"q13_cube scans inputs per-grouping:\n$cube")
    // erasure audit: broadcast flag join, no shuffle of the fact side
    val forget = planOf("etl_forget_customer")
    assert(forget.contains("BroadcastHashJoin"),
      "etl_forget_customer lost the broadcast request-list join")
  }

  test("round-5 additions keep their scale shapes") {
    graft.util.SessionCache.invalidate(spark)
    // pivot: ONE aggregate pass over the joined fact (explicit values ⇒
    // no eager distinct-collect job at plan time), dims broadcast
    val pivot = planOf("q14_pivot")
    assert(pivot.contains("BroadcastHashJoin"),
      "q14_pivot lost its broadcast dimension joins")
    assert("Scan parquet".r.findAllIn(pivot).size <= 5, // fact lineage + 2 dims
      s"q14_pivot re-scans inputs per pivot column:\n$pivot")
    // point-in-time join: the fact side must reach the version join
    // WITHOUT a shuffle — broadcast history, single Exchange for the
    // final presentation sort only
    val pit = planOf("etl_scd2_pit")
    assert(pit.contains("BroadcastHashJoin"),
      "etl_scd2_pit lost the broadcast history join")
    assert(!pit.contains("SortMergeJoin"),
      s"etl_scd2_pit shuffles the fact side into a sort-merge join:\n$pit")
    // projected ANN: stage-1 candidates come from the broadcast query
    // side (corpus × 8 queries — linear), stage 2 re-ranks via
    // broadcast of the tiny candidate set; no cartesian anywhere
    val proj = planOf("ext_sim_projected")
    assert(!proj.contains("CartesianProduct"))
    assert(proj.contains("collect_top_k"),
      "ext_sim_projected lost the bounded top-k aggregate")
    // typed gaps: exactly one shuffle (the groupByKey exchange) before
    // the flatMapGroups — no window, no second aggregation pass
    val gaps = planOf("ext_user_gaps")
    assert(gaps.contains("FlatMapGroupsInR") || gaps.contains("MapGroups"),
      s"ext_user_gaps lost the typed flatMapGroups operator:\n$gaps")
  }

  test("third-leg additions keep their scale shapes") {
    graft.util.SessionCache.invalidate(spark)
    // grouping sets: ONE Expand over one fact scan — the 3-set lattice
    // must not become per-grouping scans (or CUBE's 8× fan-out)
    val gs = planOf("q20_grouping_sets")
    assert("Expand".r.findAllIn(gs).size == 1, s"q20 lost its single Expand:\n$gs")
    assert("Scan parquet".r.findAllIn(gs).size <= 4, // fact lineage + dim_time
      s"q20_grouping_sets scans inputs per-grouping:\n$gs")
    // incremental dedup: the probe is an equi-join on (band, key) —
    // never corpus×corpus, never a cartesian
    val inc = planOf("ext_dedup_incremental")
    assert(!inc.contains("CartesianProduct") &&
      !inc.contains("BroadcastNestedLoopJoin"),
      s"ext_dedup_incremental degenerated to an all-pairs join:\n$inc")
    // PQ search: bounded top-k aggregate, no window sort; the only
    // nested loop is corpus codes × the broadcast 8-query lut table
    // (linear in the corpus — the documented brute-force query shape)
    val pq = planOf("ext_sim_pq")
    assert(pq.contains("collect_top_k"), "ext_sim_pq lost the bounded top-k aggregate")
    assert(!pq.contains("CartesianProduct"))
    // HLL: two aggregates over the events scan; the final join joins
    // ≤ |event_type| rows — must be broadcast, not a shuffled join
    val hll = planOf("ext_sketch_hll")
    assert(hll.contains("BroadcastHashJoin"),
      s"ext_sketch_hll shuffles its tiny per-type join:\n$hll")
  }

  test("fourth-leg additions keep their scale shapes") {
    graft.util.SessionCache.invalidate(spark)
    // attribution: the trailing-window pairing is a bucket EQUI-join —
    // a plan with BNLJ/cartesian means the range predicate lost its
    // equi-component
    val at = planOf("etl_attribution")
    assert(!at.contains("CartesianProduct") &&
      !at.contains("BroadcastNestedLoopJoin"),
      s"etl_attribution degenerated to an inequality join:\n$at")
    // rendezvous sharding: per-row argmax fused into the scan — no
    // join, no aggregate, no shuffle anywhere before the final sort
    val hrw = planOf("ext_shard_rendezvous")
    assert(!hrw.contains("Join") && !hrw.contains("HashAggregate"),
      s"ext_shard_rendezvous is no longer a pure per-row projection:\n$hrw")
    // division: divisor cardinality rides in as a broadcast 1-row
    // cross, never a collected literal (same plan must run on a
    // cluster); dims broadcast
    val div = planOf("q24_division")
    assert(div.contains("BroadcastNestedLoopJoin") ||
      div.contains("BroadcastHashJoin"),
      s"q24_division lost its broadcast divisor/dim joins:\n$div")
    assert(!div.contains("CartesianProduct"))
    // entity match + jw match: candidates via equi-join on the block
    for (q <- Seq("etl_entity_match", "etl_jw_match")) {
      val p = planOf(q)
      assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
        s"$q lost its blocking equi-join:\n$p")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q verifies outside its blocks:\n$p")
    }
  }

  test("fifth-leg additions keep their scale shapes") {
    graft.util.SessionCache.invalidate(spark)
    // RFM: quartiles derive from the distributed bucketed rank — a plan
    // with `ntile` means the customer-wide unpartitioned window came
    // back (three serial single-partition sorts of the one "dimension"
    // that grows with the business). The only unpartitioned windows
    // allowed are the B-row bucket-offset passes inside the shared
    // prefix sum (same contract as packing/q23).
    val rfm = planOf("etl_rfm")
    assert(!rfm.contains("ntile(4)"),
      s"etl_rfm regressed to customer-wide ntile windows:\n$rfm")
    assert(!rfm.contains("CartesianProduct"),
      s"etl_rfm plan contains a cartesian product:\n$rfm")
    // Since round 6 the cut arrays are construction-time driver
    // literals (bounded pull, BPE-argmax pattern): the QUERY plan must
    // carry no percentile aggregate at all — its reappearance means the
    // nested 1-row-aggregate shape (AQE re-plans it in every offsets
    // branch; measured 10× slower) came back. Matches "ntile(" too, so
    // it subsumes the window pin above.
    assert(!rfm.toLowerCase.contains("percentile"),
      s"etl_rfm plan recomputes percentile cuts in-plan:\n$rfm")
    assert(!rfm.contains("BroadcastNestedLoopJoin"),
      s"etl_rfm plan re-grew broadcast-crossed 1-row aggregates:\n$rfm")
  }

  test("round-7 additions keep their scale shapes") {
    graft.util.SessionCache.invalidate(spark)
    // sweep-line interval merge: the day-grain explode must not come
    // back — its signature is a `sequence(d0, d1)` generator in the
    // plan (the sweep only ever sequences nothing; its fan-out is the
    // two boundary rows)
    val im = planOf("etl_interval_merge")
    assert(!im.contains("sequence("),
      s"etl_interval_merge regressed to the day-grain explode:\n$im")
    // two-level NDV: a countDistinct reintroduces the Expand over the
    // unpivoted rows (the 8.2 s vs 2.5 s spelling)
    val ndv = planOf("etl_ndv_profile")
    assert(!ndv.contains("Expand"),
      s"etl_ndv_profile regressed to the countDistinct Expand:\n$ndv")
    // the wedge/pair joins of the leg additions stay keyed.
    // ext_text_lm_score is exempt from the BNLJ ban ONLY: its one BNLJ
    // is the broadcast 1-ROW vocab scalar riding the plan (the
    // termDrift bounded-aggregate pattern) — the cartesian ban still
    // applies.
    for (q <- Seq("ext_graph_linkpred", "ext_graph_bfs",
        "ext_dedup_weighted_jaccard", "ext_media_clusters",
        "ext_text_lm_score", "q29_itemsets3")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian:\n$p")
      if (q != "ext_text_lm_score")
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$q plans an all-pairs join:\n$p")
    }
  }

  test("round-8 third-leg additions keep their scale shapes") {
    graft.util.SessionCache.invalidate(spark)
    // every join in the leg is keyed: the subsequence self-join rides
    // (user, session), the funnel stages ride user_id, the profilers
    // are pure aggregates
    for (q <- Seq("etl_seq_patterns", "etl_key_candidates", "etl_fd_audit",
        "etl_funnel_deadline")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q plans an all-pairs join:\n$p")
    }
    // the profilers' one-aggregate-per-candidate spelling must not
    // regress to a multi-countDistinct Expand over the full scan (the
    // ndv_profile lesson: 3.3× on the same data)
    for (q <- Seq("etl_key_candidates", "etl_fd_audit"))
      assert(!planOf(q).contains("Expand"),
        s"$q regressed to an Expand spelling")
    // matryoshka is a DOCUMENTED brute-force eval (bounded query panel
    // × corpus, the ext_sim_topk exemption) — only the cartesian ban
    // applies
    assert(!planOf("ext_embed_matryoshka").contains("CartesianProduct"))
    // the FIFO overlap join and drawdown windows ride keyed joins only
    for (q <- Seq("etl_fifo_allocation", "etl_max_drawdown")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q plans an all-pairs join:\n$p")
    }
    // cell-binned drift/diversity inherit kmeansAssign's broadcast
    // centroid NLJ (the documented IVF assignment shape) — cartesian
    // ban only
    for (q <- Seq("ext_embed_drift", "ext_sample_diversity"))
      assert(!planOf(q).contains("CartesianProduct"), s"$q plans a cartesian")
    // the KS CDF pass rides keyed joins + one window per store over
    // DISTINCT values — no pair join anywhere
    locally {
      val p = planOf("etl_ks_drift")
      assert(!p.contains("CartesianProduct"), s"etl_ks_drift cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"etl_ks_drift all-pairs join:\n$p")
    }
    // rrf's retrieval legs inherit the documented broadcast-panel NLJ
    // (the ext_sim_topk exemption); match-dist's 1-row totals ride the
    // scalar-subquery cross join — cartesian ban only for both, and the
    // match-dist rate table must come back as a broadcast equi-join
    for (q <- Seq("ext_sim_rrf", "ext_sample_match_dist"))
      assert(!planOf(q).contains("CartesianProduct"), s"$q plans a cartesian")
    assert(planOf("ext_sample_match_dist").contains("BroadcastHashJoin"),
      "ext_sample_match_dist rate table is not a broadcast equi-join")
    // BM25's candidate generation must stay a term-keyed posting probe —
    // never doc×doc (hybrid inherits the dense panel NLJ exemption, so
    // there only the cartesian ban applies)
    locally {
      val p = planOf("ext_text_bm25")
      assert(!p.contains("CartesianProduct"), s"ext_text_bm25 cartesian:\n$p")
    }
    assert(!planOf("ext_sim_hybrid").contains("CartesianProduct"),
      "ext_sim_hybrid plans a cartesian")
  }

  test("star-join OLAP queries broadcast their dimension sides") {
    for (q <- Seq("q01_weekend", "q04_seasonal", "q08_halfyear")) {
      val p = planOf(q)
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
        s"$q plan has no broadcast dimension join")
    }
  }

  test("top-k queries plan TakeOrderedAndProject, not a global sort") {
    assert(planOf("q01_weekend").contains("TakeOrderedAndProject"))
  }
}
