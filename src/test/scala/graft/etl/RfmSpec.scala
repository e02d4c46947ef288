package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RFM segmentation invariants on the sf0.001 smoke fact; exact values
  * pinned by the DuckDB twin (`etl_rfm`). */
class RfmSpec extends SparkSpec {

  test("quartiles balance, segment is the quartile concat, metrics reconcile") {
    val rfm = EtlQueries.rfmSegments(spark, sfSmoke).cache()
    try {
      val n = rfm.count()
      assert(n > 0)
      // ntile(4) balance: sizes differ by at most 1, all four occupied
      for (c <- Seq("r_quartile", "f_quartile", "m_quartile")) {
        val sizes = rfm.groupBy(c).count().collect().map(_.getLong(1))
        assert(sizes.length == 4, s"$c does not cover 4 quartiles")
        assert(sizes.max - sizes.min <= 1, s"$c unbalanced: ${sizes.toSeq}")
      }
      // segment is exactly the three digits
      assert(rfm.where(col("segment") =!=
        concat(col("r_quartile"), col("f_quartile"), col("m_quartile")))
        .count() == 0)
      // someone bought on the anchor day ⇒ a zero recency exists,
      // and it sits in quartile 1 (most recent = lowest days)
      val zero = rfm.where(col("recency_days") === 0)
      assert(zero.count() > 0)
      assert(zero.where(col("r_quartile") =!= 1).count() == 0)
      // quartile boundaries are monotone in the metric: the max of
      // quartile q never exceeds the min of quartile q+1
      val m = rfm.groupBy("m_quartile")
        .agg(min("monetary_cents").as("lo"), max("monetary_cents").as("hi"))
        .orderBy("m_quartile").collect()
      m.sliding(2).foreach { case Array(a, b) =>
        assert(a.getLong(2) <= b.getLong(1),
          "monetary quartiles overlap beyond the boundary")
      }
    } finally rfm.unpersist()
  }

  test("corpus-scoped literals: two corpora in one session stay independent") {
    // The nCust / cut / anchor literals are PLAN-CONSTRUCTION-scoped
    // (see the rfmSegments contract comment): every call re-pulls them
    // for its own dir. Interleave two corpora with different customer
    // counts and re-run the first — its results must be byte-identical,
    // and each corpus's quartiles must balance over ITS OWN count.
    val a1 = EtlQueries.rfmSegments(spark, sfSmoke).collect()
    val b1 = EtlQueries.rfmSegments(spark, "/root/testdata/sf0.01").collect()
    val a2 = EtlQueries.rfmSegments(spark, sfSmoke).collect()
    assert(a1.length != b1.length,
      "fixture corpora must differ in customer count to discriminate leakage")
    assert(a1.toSeq == a2.toSeq,
      "running a second corpus in the session changed the first's results")
    // the second corpus's quartiles balance over its own customer count
    val byQ = b1.groupBy(_.getAs[Int]("r_quartile")).view.mapValues(_.size)
    assert(byQ.keys.toSeq.sorted == Seq(1, 2, 3, 4))
    assert(byQ.values.max - byQ.values.min <= 1,
      s"r_quartile unbalanced on the second corpus: $byQ")
  }

  test("bucket count never changes values (prefix-sum rank == window ntile)") {
    // same contract as packing/q23: the range buckets of the
    // distributed rank affect parallelism only — a value drift here
    // means the bucket monotonicity (and therefore the global rank)
    // broke. 13 also exercises uneven bucket occupancy.
    val default = EtlQueries.rfmSegments(spark, sfSmoke).collect()
    val alt = EtlQueries.rfmSegments(spark, sfSmoke, buckets = 13).collect()
    assert(default.toSeq == alt.toSeq)
  }
}
