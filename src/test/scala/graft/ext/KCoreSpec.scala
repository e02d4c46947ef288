package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous k-core peeling on hand-built graphs plus a brute-force
  * fixpoint check on a hashed random graph. Exact end-to-end values on
  * the co-purchase graph are pinned by the DuckDB twin
  * (`ext_graph_kcore`). */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*): DataFrame =
    pairs.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .distinct.toDF("u", "v")

  private def core(e: DataFrame, k: Int): Map[Long, Long] =
    GraphOps.kcoreOf(e, k).as[(Long, Long)].collect().toMap

  /** Reference peel: iterate until fixpoint on plain Scala sets. */
  private def brutePeel(pairs: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    var alive = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    var changed = true
    while (changed) {
      val deg = pairs.filter(p => alive(p._1) && alive(p._2))
        .flatMap(p => Seq(p._1, p._2)).groupBy(identity).view.mapValues(_.size)
      val next = alive.filter(n => deg.getOrElse(n, 0) >= k)
      changed = next != alive
      alive = next
    }
    pairs.filter(p => alive(p._1) && alive(p._2))
      .flatMap(p => Seq(p._1, p._2)).groupBy(identity).view.mapValues(_.size).toMap
  }

  test("closed forms: K4 is its own 3-core, a pendant path peels away, C5 has no 3-core") {
    // K4 plus a pendant path 4-5-6: the path peels (round 1 drops 6,
    // round 2 drops 5), K4 survives with degree 3 each
    val g = edges((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),(4L,5L),(5L,6L))
    assert(core(g, 3) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // C5 is 2-regular: the whole cycle is the 2-core, 3-core is empty
    val c5 = edges((1L,2L),(2L,3L),(3L,4L),(4L,5L),(5L,1L))
    assert(core(c5, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 2L))
    assert(core(c5, 3).isEmpty)
  }

  test("high-degree hub with leaf neighbors is NOT in the 2-core (degree alone cannot find cores)") {
    // star: hub 1 with 6 leaves — degree 6, but every leaf has degree 1,
    // so round 1 drops all leaves and round 2 drops the hub
    val star = edges((1L,2L),(1L,3L),(1L,4L),(1L,5L),(1L,6L),(1L,7L))
    assert(core(star, 2).isEmpty)
  }

  test("equals the brute-force fixpoint peel on a hashed random graph") {
    val n = 40L
    val pairs = (for {
      i <- 1L to n; j <- (i + 1) to n
      if ((i * 2654435761L + j * 40503L) % 97) < 12
    } yield (i, j)).toSeq
    val expected = brutePeel(pairs, 3)
    val got = core(pairs.toDF("u", "v"), 3)
    assert(got == expected.map { case (k2, v) => (k2, v.toLong) })
    // fixpoint: every core member keeps >= k neighbors inside the core
    assert(got.values.forall(_ >= 3L))
  }

  test("co-purchase 3-core converges inside the unroll budget and is a fixpoint") {
    val res = GraphOps.kCore(spark, sfSmoke).cache()
    try {
      // the oracle unrolls KCoreRounds rounds; convergence inside the
      // budget is what makes "the k-core" (not "the R-round peel") the
      // honest name — pin it by checking the result is a fixpoint:
      // every member has >= k within-core neighbors
      assert(res.where(col("core_degree") < GraphOps.KCoreK).count() == 0)
      // and one more peel round over the survivors removes nothing
      val coreNodes = res.select(col("product_id").as("node"))
      val e = GraphOps.supportedCoPurchaseEdges(spark, sfSmoke)
      val sym = e.select(col("u").as("a"), col("v").as("b"))
        .unionByName(e.select(col("v").as("a"), col("u").as("b")))
      val again = sym
        .join(coreNodes.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(coreNodes.select(col("node").as("b")), Seq("b"), "left_semi")
        .groupBy("a").agg(count(lit(1)).as("d"))
        .where(col("d") >= GraphOps.KCoreK)
      assert(again.count() == res.count())
    } finally res.unpersist()
  }
}
