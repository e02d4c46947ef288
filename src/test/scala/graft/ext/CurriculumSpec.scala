package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Invariants of the curriculum ordering: positions are a permutation,
  * phases are contiguous position ranges in band order, band membership
  * follows the deciles, and the bucketed prefix sum is bucket-count
  * independent (exact values are pinned by the DuckDB twin). */
class CurriculumSpec extends SparkSpec {

  private lazy val out = CurriculumOps.curriculumOrder(spark, sfSmoke).collect()

  test("global positions are a 1..N permutation in output order") {
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("global_pos")).toSeq ===
      (1L to out.length.toLong))
  }

  test("phases are contiguous and ordered best-first") {
    val byPhase = out.groupBy(_.getAs[Int]("phase")).toSeq.sortBy(_._1)
    assert(byPhase.map(_._1) === Seq(1, 2, 3))
    // every position in phase p precedes every position in phase p+1
    byPhase.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      assert(a.map(_.getAs[Long]("global_pos")).max <
        b.map(_.getAs[Long]("global_pos")).min)
    }
    // band membership follows the decile mapping
    out.foreach { r =>
      val d = r.getAs[Int]("decile")
      val expected = if (d >= 9) 1 else if (d >= 5) 2 else 3
      assert(r.getAs[Int]("phase") === expected)
    }
  }

  test("order within a phase is the salted hash order, not doc order") {
    val phase2 = out.filter(_.getAs[Int]("phase") == 2)
      .sortBy(_.getAs[Long]("global_pos")).map(_.getAs[Long]("doc_id"))
    assert(phase2.length > 10)
    assert(phase2.toSeq !== phase2.sorted.toSeq,
      "within-phase order equals doc_id order — the hash shuffle is not applied")
  }

  test("output is independent of the bucket count") {
    def rows(b: Int): Seq[Row] =
      CurriculumOps.curriculumOrder(spark, sfSmoke, bucketsPerPhase = b)
        .collect().toSeq
    assert(rows(2) === rows(5))
  }

  test("no single-partition window over the corpus in the plan") {
    val df = CurriculumOps.curriculumOrder(spark, sfSmoke)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // every Window node must be partitioned (the B-row offsets window
    // is the allowed exception: it windows over bucket totals, and its
    // input is the tiny aggregate, not the corpus)
    val unpartitioned = "Window \\[[^\\]]*\\]\\s*$".r // heuristic: no partition spec prints
    assert(!plan.contains("WindowExec: No Partition"), plan)
    assert(unpartitioned.findAllIn(plan).isEmpty)
  }
}
