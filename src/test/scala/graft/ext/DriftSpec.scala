package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The corpus drift audit: planted-shift detection, χ² reconstruction
  * from first principles, and the symmetric-swap invariance. Exact
  * end-to-end values on the real corpus are pinned by the DuckDB twin
  * (`ext_text_drift`). */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  /** 40 docs: ids 0–19 are half A, 20–39 half B ("> max_id div 2" with
    * max_id = 39) — equal halves so the swap test is exact. Every doc
    * shares filler vocabulary; "newterm" appears only in half B (a
    * template/topic influx), "oldterm" only in half A. */
  private def fixture = (0L to 39L).map { id =>
    val base = "alpha beta gamma"
    val drift =
      if (id >= 20 && id % 2 == 0) " newterm" // 10 docs of half B
      else if (id < 20 && id % 2 == 0) " oldterm" // 10 docs of half A
      else ""
    (id, base + drift)
  }.toDF("doc_id", "text")

  test("planted influx and loss dominate the ranking with correct directions") {
    val res = TextOps.termDriftOf(fixture).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))
    val byTerm = res.map(t => t._1 -> t).toMap
    // the two planted movers rank above the uniform filler terms
    assert(res.take(2).map(_._1).toSet == Set("newterm", "oldterm"))
    assert(byTerm("newterm")._5 == "rising" && byTerm("newterm")._2 == 0L
      && byTerm("newterm")._3 == 10L)
    assert(byTerm("oldterm")._5 == "falling" && byTerm("oldterm")._3 == 0L)
    // filler terms present in every doc are flat with chi2 == 0
    assert(byTerm("alpha")._5 == "flat" && byTerm("alpha")._4 == 0.0)
    // χ² from first principles for the influx term: a=0,b=10,n1=20,n2=20
    val (a, b, n1, n2) = (0.0, 10.0, 20.0, 20.0)
    val delta = a * (n2 - b) - b * (n1 - a)
    val expect = ((delta * delta) * (n1 + n2)) /
      ((((a + b) * ((n1 - a) + (n2 - b))) * n1) * n2)
    assert(byTerm("newterm")._4 == expect)
  }

  test("chi2 is swap-symmetric; directions flip; df floor filters the tail") {
    // renumber so the halves exactly swap (id -> 39 - id)
    val swapped = fixture.select((lit(39L) - col("doc_id")).as("doc_id"), col("text"))
    val orig = TextOps.termDriftOf(fixture).collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getString(4)))
    val swap = TextOps.termDriftOf(swapped).collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getString(4)))
    val sw = swap.map(t => t._1 -> t).toMap
    orig.foreach { case (term, chi2, dir) =>
      assert(sw(term)._2 == chi2, s"chi2 not swap-symmetric for $term")
      val flipped = dir match {
        case "rising" => "falling"; case "falling" => "rising"; case other => other
      }
      assert(sw(term)._3 == flipped, s"direction did not flip for $term")
    }
    // a term under the df floor never appears
    val rare = fixture.union(Seq((40L, "alpha beta gamma raretok")).toDF("doc_id", "text"))
    assert(TextOps.termDriftOf(rare).where(col("term") === "raretok").count() == 0)
  }

  test("corpus audit: bounded output, nonnegative chi2, direction matches the exact cross-product") {
    val res = TextOps.termDrift(spark, sfSmoke).cache()
    try {
      assert(res.count() <= 20 && res.count() > 0)
      assert(res.where(col("chi2") < 0).count() == 0)
      assert(res.where(col("df_a") + col("df_b") < TextOps.DriftMinDf).count() == 0)
    } finally res.unpersist()
  }
}
