package graft.olap

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Q29 3-itemsets and the dedup threshold curve: brute-force support
  * recomputation, Apriori monotonicity, and curve monotonicity.
  * End-to-end values are pinned by the DuckDB twins. */
class Itemsets3Spec extends SparkSpec {

  test("q29: emitted supports match brute force and respect Apriori monotonicity") {
    val res = Queries.q29Itemsets3(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
    assert(res.nonEmpty)
    val baskets = graft.etl.Star.salesFact(spark, sfSmoke)
      .select("order_id", "product_id").distinct().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pairSupport = graft.ext.GraphOps.coPurchasePairCounts(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    res.foreach { case ((p1, p2, p3), sup) =>
      assert(p1 < p2 && p2 < p3)
      val brute = baskets.values.count(b =>
        b.contains(p1) && b.contains(p2) && b.contains(p3))
      assert(brute.toLong == sup, s"($p1,$p2,$p3)")
      // every sub-pair supports at least as many orders as the triple
      Seq((p1, p2), (p1, p3), (p2, p3)).foreach { pr =>
        assert(pairSupport.getOrElse(pr, 0L) >= sup)
      }
    }
  }

  test("q29: one hot basket cannot go cubic — Apriori + size guard bound the fan-out") {
    import spark.implicits._
    // 5 normal orders all selling the trio {1,2,3}; one 40-product
    // basket of singleton products (every pair support 1); one
    // 12-product basket ABOVE the size guard that contains the hot trio.
    val rows =
      (1 to 5).flatMap(o => Seq(1L, 2L, 3L).map(p => (o.toLong, p))) ++
        (1000L until 1040L).map(p => (99L, p)) ++
        (1 to 12).map(p => (100L, p.toLong))
    val basket = rows.toDF("order_id", "product_id")

    val cands = Queries.itemsets3Candidates(basket, minSupport = 2, maxBasket = 10)
    // Unpruned, order 99 alone would expand C(40,3) = 9880 candidate
    // triples and order 100 another C(12,3) = 220. Pruned: order 99's
    // pairs are all infrequent (cut 1 kills the expansion BEFORE the
    // third join), order 100 is over the size cap — only the 5 genuine
    // (1,2,3) occurrences remain.
    val c = cands.collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(c.length == 5, s"fan-out not bounded: ${c.length} candidates")
    assert(c.forall(_ == ((1L, 2L, 3L))))

    // with the guards effectively off, candidates == brute-force C(b,3)
    val all = Queries.itemsets3Candidates(basket, minSupport = 1, maxBasket = 1000)
    assert(all.count() == 5 * 1 + 9880 + 220)

    // the DIRECT path's candidate set IS brute-force C(b,3) under the
    // same size guard — the gate's fast spelling
    assert(Queries.itemsets3Direct(basket, maxBasket = 1000).count() ==
      5 * 1 + 9880 + 220)
    assert(Queries.itemsets3Direct(basket, maxBasket = 10).count() == 5L)
  }

  test("q29 adaptive gate: both paths answer identically; the probe predicts the blow-up") {
    // round-13: the always-pruned plan lost 3.4x to the direct
    // expansion at factor 10, so the pair-support pass now engages
    // only when the exact probe sum C(n,3) predicts a blow-up. The
    // gate must be answer-invariant: tripleGate = 0 forces the
    // Apriori path, MaxValue forces the direct path, and both must
    // equal the default's output row-for-row.
    val default = Queries.q29Itemsets3(spark, sfSmoke).collect().toSeq
    val pruned = Queries.q29Itemsets3(spark, sfSmoke, tripleGate = 0L)
      .collect().toSeq
    val direct = Queries.q29Itemsets3(spark, sfSmoke,
      tripleGate = Long.MaxValue).collect().toSeq
    assert(default == pruned, "gate changed the answer (pruned path)")
    assert(default == direct, "gate changed the answer (direct path)")
  }

  test("dedup curve: 4 zero-filled rows, monotone non-increasing, base tier exact") {
    val rows = graft.ext.DedupOps.thresholdCurve(spark, sfSmoke).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(0.6, 0.7, 0.8, 0.9))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2 && a._3 >= b._3)
    }
    val base = graft.ext.DedupOps.jaccardPairs(spark, sfSmoke).count()
    assert(rows.head._2 == base)
  }
}
