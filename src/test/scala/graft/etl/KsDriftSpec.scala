package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KS two-sample drift: the statistic's defining extremes (identical
  * samples → 0; disjoint supports → 1) and a planted median shift whose
  * max-gap location is known in advance. Exact end-to-end values on the
  * real fact are pinned by the DuckDB twin (`etl_ks_drift`). */
class KsDriftSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Int, Long, Long)]) =
    EtlQueries.ksDriftOf(rows.toDF("store_id", "v", "a"))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toMap

  test("identical samples score zero; disjoint supports score exactly one") {
    // store 1: A and B are the same multiset → every CDF gap is 0
    val same = (1L to 10L).flatMap(v => Seq((1, v, 1L), (1, v, 0L)))
    // store 2: A entirely below B → at the A/B boundary the gap is n1·n2
    val apart = (1L to 5L).map(v => (2, v, 1L)) ++
      (11L to 15L).map(v => (2, v, 0L))
    val res = run(same ++ apart)
    val (n1s, n2s, ksNumS, ksPpmS, _) = res(1)
    assert((n1s, n2s) == (10L, 10L) && ksNumS == 0L && ksPpmS == 0L)
    val (n1d, n2d, ksNumD, ksPpmD, ksAtD) = res(2)
    assert((n1d, n2d) == (5L, 5L))
    assert(ksNumD == 25L, "gap at the boundary is the full n1*n2")
    assert(ksPpmD == 1000000L)
    assert(ksAtD == 5L, "the divergence peaks at A's top value")
  }

  test("planted shift: max gap sits at the shared median crossing, smallest value on ties") {
    // A = {1..4}, B = {3..6}: F1-F2 gaps peak (2/4) after v=2, held
    // through v=3,4 by one-in-one-out — the reported ks_at is the
    // SMALLEST value attaining it
    val rows = (1L to 4L).map(v => (7, v, 1L)) ++ (3L to 6L).map(v => (7, v, 0L))
    val (n1, n2, ksNum, ksPpm, ksAt) = run(rows)(7)
    assert((n1, n2) == (4L, 4L))
    assert(ksNum == 8L, "max |cum1*n2 - cum2*n1| = |2*4 - 0*4|")
    assert(ksPpm == 500000L)
    assert(ksAt == 2L)
  }

  test("stores are independent: one store's drift never leaks into another") {
    val quiet = (1L to 6L).flatMap(v => Seq((3, v, 1L), (3, v, 0L)))
    val loud = (1L to 3L).map(v => (4, v, 1L)) ++ (7L to 9L).map(v => (4, v, 0L))
    val res = run(quiet ++ loud)
    assert(res(3)._4 == 0L)
    assert(res(4)._4 == 1000000L)
  }
}
