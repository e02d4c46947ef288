package graft.etl

import graft.SparkSpec

/** The mask-depth maintenance-policy experiment behind
  * `etl_tx_merge_policy` and its paired bench twin: both arms of
  * [[TxFixtures.mergeChurnSink]] replay the SAME half-year merge
  * churn, so the pair is only a valid A/B if (1) the final states are
  * identical and (2) the arms actually differ in the one variable the
  * pair measures — effective-log mask depth. */
class MergeChurnSpec extends SparkSpec {

  private def maskedCount(t: TxParquetSink): Int =
    t.resolvedCommits().count { case (_, m) =>
      m.deletePred.nonEmpty || m.replaceCols.nonEmpty }

  test("maintained arm bounds mask depth at the budget; unmaintained arm carries one mask per merge") {
    val m = TxFixtures.mergeChurnSink(spark, sfSmoke, maintained = true)
    val u = TxFixtures.mergeChurnSink(spark, sfSmoke, maintained = false)
    val halves = TxFixtures.halfCents(spark, sfSmoke)
      .select("h").distinct().count()
    // every post-bootstrap merge touches existing keys → masks
    assert(maskedCount(u) === (halves - 1).toInt,
      "unmaintained arm must carry one masking commit per merge")
    assert(maskedCount(m) <= 4,
      "maintained arm's effective log must stay within the mask budget")
    // the policy must have actually fired: enough merges to exceed the
    // budget at least once, and the log resolves from a compacted base
    assert(halves - 1 > 4, "replay too short to exercise the policy")
    assert(m.resolvedCommits().size < u.resolvedCommits().size,
      "maintenance must shorten the effective log vs the unmaintained twin")
  }

  test("both arms land the identical final state (the pair times the read, not different answers)") {
    val m = TxFixtures.mergeChurnSink(spark, sfSmoke, maintained = true)
    val u = TxFixtures.mergeChurnSink(spark, sfSmoke, maintained = false)
    val a = m.readSnapshot(spark).get
      .select("store_id", "cents").orderBy("store_id").collect().toSeq
    val b = u.readSnapshot(spark).get
      .select("store_id", "cents").orderBy("store_id").collect().toSeq
    assert(a === b, "maintained and unmaintained arms diverged")
    assert(a.nonEmpty)
  }
}
