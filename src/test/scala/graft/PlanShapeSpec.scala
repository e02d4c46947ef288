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
    val bucketed = Seq(
      "ext_dedup_jaccard", "ext_dedup_minhash_lsh", "ext_dedup_simhash",
      "ext_dedup_embedding", "ext_sim_lsh_topk", "ext_sim_lsh_multiprobe",
      "ext_sim_ivf_topk")
    for (q <- bucketed) {
      val p = planOf(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q plan contains an all-pairs join")
    }
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
