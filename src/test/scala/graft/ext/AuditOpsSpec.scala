package graft.ext

import graft.SparkSpec
import graft.etl.{EtlQueries, Star}
import org.apache.spark.sql.functions._

/** LSH recall audit, ABC migration, and Poisson bootstrap: exact-copy
  * recall, class-transition conservation identities, and replicate
  * sanity bands. End-to-end values are pinned by the DuckDB twins. */
class AuditOpsSpec extends SparkSpec {
  import spark.implicits._

  test("lsh recall: exact copies land in the top bucket and are always found") {
    val phrase = (1 to 30).map(i => s"tok$i").mkString(" ")
    val other = (1 to 30).map(i => s"alt$i").mkString(" ")
    val dir = tempDataDir("documents" -> Seq(
      (0L, phrase), (1L, phrase), // identical pair: j = 1.0, bucket 10
      (2L, other)).toDF("doc_id", "text"))
    val r = DedupOps.lshRecallAudit(spark, dir).collect()
      .map(row => row.getInt(0) -> (row.getLong(1), row.getLong(2), row.getLong(3)))
      .toMap
    // identical docs share every minhash → banding can never miss them
    assert(r == Map(10 -> ((1L, 1L, 1000000L))))
  }

  test("lsh recall corpus pass: found <= true per bucket, buckets within [5, 10]") {
    val r = DedupOps.lshRecallAudit(spark, sfSmoke).collect()
      .map(row => (row.getInt(0), row.getLong(1), row.getLong(2), row.getLong(3)))
    assert(r.nonEmpty)
    r.foreach { case (b, t, f, ppm) =>
      assert(b >= 5 && b <= 10)
      assert(f <= t && ppm == (1000000L * f) / t)
    }
  }

  test("abc migration: transition counts conserve each valid year's catalog") {
    val res = EtlQueries.abcMigration(spark, sfSmoke).cache()
    try {
      val py = Star.salesFact(spark, sfSmoke)
        .select(expr("CAST(year(time_id) AS INT)").as("year"), col("product_id"))
        .distinct()
      val counts = py.groupBy("year").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val years = counts.keySet
      val validFrom = years.filter(y => years.contains(y + 1))
      assert(validFrom.nonEmpty)
      // rows with class_from != none per year == that year's catalog;
      // rows with class_to != none == the NEXT year's catalog
      val from = res.where(col("class_from") =!= "none")
        .groupBy("year_from").agg(sum("n_products").as("n")).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val to = res.where(col("class_to") =!= "none")
        .groupBy("year_from").agg(sum("n_products").as("n")).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      validFrom.foreach { y =>
        assert(from(y) == counts(y), s"year $y from")
        assert(to(y) == counts(y + 1), s"year $y to")
      }
      // only valid (year, year+1) pairs appear
      assert(res.select("year_from").distinct().collect()
        .map(_.getInt(0)).toSet == validFrom)
    } finally res.unpersist()
  }

  test("bootstrap: B replicates, Poisson mass near n, means inside the data range") {
    val res = SampleOps.bootstrapMeans(spark, sfSmoke).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    assert(res.length == SampleOps.BootstrapB)
    val n = TextOps.docs(spark, sfSmoke).count()
    val toks = TextOps.withWords(TextOps.docs(spark, sfSmoke))
      .select(expr("CAST(size(ws) AS BIGINT)").as("x"))
      .agg(min("x"), max("x")).collect()(0)
    val (lo, hi) = (toks.getLong(0).toDouble, toks.getLong(1).toDouble)
    res.foreach { case (_, nEff, mean) =>
      assert(nEff > n / 2 && nEff < 2 * n)
      assert(mean >= lo && mean <= hi)
    }
    // replicates genuinely differ (the salt works)
    assert(res.map(_._3).distinct.length > 1)
  }
}
