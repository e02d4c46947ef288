package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gaps-and-islands streaks vs a driver-side brute force on the smoke
  * data (exact output is pinned by the DuckDB twin `etl_sales_streaks`). */
class StreaksSpec extends SparkSpec {
  import spark.implicits._

  private def bruteBest(days: Seq[Int]): (Int, Int) = {
    // longest run length, earliest start on ties
    val sorted = days.distinct.sorted
    var best = (1, sorted.head); var len = 1; var start = sorted.head
    for (Seq(a, b) <- sorted.sliding(2) if sorted.size > 1) {
      if (b == a + 1) len += 1 else { len = 1; start = b }
      if (len > best._1) best = (len, start)
    }
    best
  }

  test("every reported streak equals the brute-force longest run for that product") {
    val out = EtlQueries.salesStreaks(spark, sfSmoke, k = 20)
      .select(col("product_id"),
        col("streak_days"),
        expr("datediff(streak_start, DATE'1970-01-01')").cast("int"))
      .as[(Long, Int, Int)].collect().toSeq
    assert(out.nonEmpty)
    val byProduct = Star.salesFact(spark, sfSmoke)
      .select(col("product_id"),
        expr("datediff(time_id, DATE'1970-01-01')").cast("int").as("day"))
      .as[(Long, Int)].collect().toSeq
      .groupBy(_._1).map { case (p, rs) => p -> rs.map(_._2) }
    out.foreach { case (p, len, start) =>
      assert(bruteBest(byProduct(p)) == (len, start), s"product $p")
    }
  }

  test("output is sorted by streak length desc with product tie-break") {
    val out = EtlQueries.salesStreaks(spark, sfSmoke, k = 20)
      .select("product_id", "streak_days").as[(Long, Int)].collect().toSeq
    val resorted = out.sortBy { case (p, d) => (-d, p) }
    assert(out == resorted)
  }
}
