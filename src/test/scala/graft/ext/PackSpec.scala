package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Invariants of the distributed prefix-sum packing:
  * bucket-independence (values never depend on how the scan is split),
  * stream contiguity, and boundary spanning. */
class PackSpec extends SparkSpec {

  private lazy val packed =
    PackOps.packSequences(spark, sfSmoke).collect()

  test("token stream is contiguous: each start = previous start + tokens") {
    assert(packed.nonEmpty)
    assert(packed.head.getAs[Long]("global_start") === 0L)
    // filter(_.length == 2): Iterator.sliding emits one short window for
    // a single-row result, which would MatchError instead of passing
    packed.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("global_start") ===
        a.getAs[Long]("global_start") + a.getAs[Long]("n_tokens"))
    }
  }

  test("chunk ids follow from offsets; spans are consistent") {
    val budget = PackOps.DefaultBudget
    packed.foreach { r =>
      val start = r.getAs[Long]("global_start")
      val n = r.getAs[Long]("n_tokens")
      assert(n >= 1)
      assert(r.getAs[Long]("pack_first") === start / budget)
      assert(r.getAs[Long]("pack_last") === (start + n - 1) / budget)
      assert(r.getAs[Long]("packs_spanned") ===
        r.getAs[Long]("pack_last") - r.getAs[Long]("pack_first") + 1)
    }
    // the corpus is big enough that some document straddles a boundary
    assert(packed.exists(_.getAs[Long]("packs_spanned") > 1),
      "no document spans a chunk boundary — budget too large for the corpus?")
  }

  test("output is independent of the bucket count") {
    def rows(buckets: Int): Seq[Row] =
      PackOps.packSequences(spark, sfSmoke, buckets = buckets).collect().toSeq
    assert(rows(3) === rows(7))
  }

  test("one scan: the totals branch reuses the window's exchange") {
    val df = PackOps.packSequences(spark, sfSmoke)
    df.collect() // AQE finalizes the plan on execution
    // AQE's toString appends the pre-execution plan under "Initial Plan"
    // — audit only the final one
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "FileScan".r.findAllIn(plan).size
    assert(scans === 1, s"expected a single documents scan, got $scans:\n$plan")
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"totals branch does not reuse the shared bucket exchange:\n$plan")
  }
}
