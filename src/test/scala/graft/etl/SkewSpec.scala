package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted join ≡ plain join, including on pathologically skewed keys. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted equi-join returns exactly the plain join result under heavy skew") {
    // 10k rows, 90% on one hot key.
    val left = (1 to 10000)
      .map(i => (if (i % 10 == 0) i.toLong % 50 else 7L, i))
      .toDF("k", "v")
    val right = (0L to 49L).map(k => (k, s"dim$k")).toDF("k", "name")

    val plain = left.join(right, Seq("k"))
      .select("k", "v", "name").orderBy("k", "v").collect().toSeq
    val salted = Skew.saltedEquiJoin(left, right, "k", factor = 8)
      .select("k", "v", "name").orderBy("k", "v").collect().toSeq
    assert(salted == plain)
  }

  test("salted join preserves multiplicity with duplicate right keys") {
    val left = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val right = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "w")
    val plain = left.join(right, Seq("k")).count()
    val salted = Skew.saltedEquiJoin(left, right, "k", factor = 4).count()
    assert(salted == plain) // 2 left ×2 right for k=1 (4) + 1 for k=2 = 5
  }
}
