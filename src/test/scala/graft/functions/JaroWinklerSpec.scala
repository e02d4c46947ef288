package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The native Jaro-Winkler expression: textbook pins, the DuckDB
  * contract's edge cases, algebraic properties, and codegen ≡
  * interpreted equivalence. The cross-engine bit-exactness itself is
  * pinned by the `etl_jw_match` oracle row. */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def sim(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook values and the DuckDB contract's edges") {
    // Winkler's classics (exact doubles, verified against DuckDB)
    assert(sim("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(sim("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(sim("JELLYFISH", "SMELLYFISH") == 0.8962962962962964)
    assert(sim("DWAYNE", "DUANE") == 0.8400000000000001)
    // contract edges: empty-vs-anything INCLUDING empty-vs-empty is 0;
    // boost applies only above jaro 0.7; window 0 for 2-char strings
    assert(sim("", "") == 0.0 && sim("", "ABC") == 0.0)
    assert(sim("ABXXXXX", "ABYYYYYYYYYYYY") == 0.4761904761904762) // no boost
    assert(sim("ab", "ba") == 0.0)
    assert(sim("ABCDEFGH", "ABCDEFZZ") == 0.9) // prefix capped at 4
  }

  test("identity, symmetry, range on hashed random strings") {
    val rnd = new scala.util.Random(42)
    val strs = Seq.fill(200)(
      (0 until rnd.nextInt(12)).map(_ => "AB#01"(rnd.nextInt(5))).mkString)
    for (a <- strs.take(40); b <- strs.take(40)) {
      val s = sim(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(s == sim(b, a), s"asymmetric for $a / $b")
      if (a == b && a.nonEmpty) assert(s == 1.0)
    }
  }

  test("codegen path equals the interpreted static method") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(500)((
      (0 until rnd.nextInt(14)).map(_ => "ABCDE#0123"(rnd.nextInt(10))).mkString,
      (0 until rnd.nextInt(14)).map(_ => "ABCDE#0123"(rnd.nextInt(10))).mkString))
    val df = pairs.toDF("a", "b")
      .withColumn("jw", JaroWinkler.jw(col("a"), col("b")))
    val got = df.select("a", "b", "jw").collect()
    got.foreach { r =>
      assert(r.getDouble(2) == sim(r.getString(0), r.getString(1)))
    }
    // and via the SQL registration
    JaroWinkler.register(spark)
    val sqlGot = pairs.toDF("a", "b")
      .selectExpr("jaro_winkler(a, b) AS jw").collect()
    sqlGot.zip(pairs).foreach { case (r, (a, b)) =>
      assert(r.getDouble(0) == sim(a, b))
    }
  }
}
