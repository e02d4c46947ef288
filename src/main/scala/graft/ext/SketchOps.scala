package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Count-min sketch term counting — the bounded-memory synopsis for
  * "how often does each term occur" at corpus scale, complementing the
  * KMV distinct-count sketch ([[graft.functions.KmvSketchAgg]]): KMV
  * answers cardinality, CMS answers frequency.
  *
  * The sketch is `Depth` hash rows × `Width` counters; an occurrence
  * of term t increments row r at column h_r(t); the estimate is the
  * MIN over rows — never an undercount, overcounts only on collision
  * (Cormode & Muthukrishnan '05). The state is 4×1024 longs
  * REGARDLESS of corpus size, counters are sums (mergeable map-side,
  * across partitions, across days), so the build is one shuffle of at
  * most depth×width×partitions partial rows — the whole point versus
  * the exact per-term table, whose key space grows with the corpus.
  *
  * Determinism: h_r(t) = H("cms" + r + ":" + t) mod Width on the
  * cross-engine md5 contract ([[TextOps.h32]]) and the counters are
  * integer sums — the sketch, and thus every estimate, is
  * bit-reproducible in DuckDB, so the operator is fully
  * oracle-checkable (not rows-only). */
object SketchOps {

  val Depth = 4
  val Width = 1024

  private def bucketCol(r: org.apache.spark.sql.Column,
      term: org.apache.spark.sql.Column) =
    TextOps.h32(concat(lit("cms"), r.cast("string"), lit(":"), term)) % Width

  /** Corpus token stream. Deliberately NOT pre-repartitioned (unlike
    * [[TextOps.shingleSet]]): the per-row work here is one md5 per
    * (token, sketch row) — measured BELOW the cost of exchanging the
    * full text at test SFs (1.5 s vs 2.4 s at sf0.1), whereas the
    * shingle build's array construction was 6× above it. At real
    * scale the input arrives as many splits and parallelizes at the
    * scan with no exchange at all. */
  private def tokens(spark: SparkSession, dir: String): DataFrame =
    TextOps.withWords(TextOps.docs(spark, dir))
      .select(explode(col("ws")).as("w"))

  /** The (row, bucket) → count sketch table over an arbitrary token
    * frame (one `w` column — the full corpus, or one micro-batch):
    * one row per occupied counter (≤ Depth×Width rows). */
  def cmsSketchOf(words: DataFrame): DataFrame =
    words
      .select(col("w"), explode(expr(s"sequence(0, ${Depth - 1})")).as("r"))
      .groupBy(col("r"), bucketCol(col("r"), col("w")).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Counter-wise sum of two sketch tables — the merge that makes CMS
    * a streaming/cross-day synopsis: sketch(A ∪ B) = sketch(A) ⊕
    * sketch(B), exactly (counters are sums). A `foreachBatch` sink
    * folds each micro-batch's sketch into the stored one with this;
    * parity with the one-shot batch sketch is pinned by spec. */
  def mergeSketches(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("r", "bucket")
      .agg(sum("cnt").as("cnt"))

  /** The corpus sketch. */
  def cmsSketch(spark: SparkSession, dir: String): DataFrame =
    cmsSketchOf(tokens(spark, dir))

  /** The top-`k` exact heavy hitters with their CMS estimates side by
    * side: (term, exact_cnt, est_cnt, overcount). exact_cnt ≤ est_cnt
    * always (the CMS one-sided error bound — pinned by spec and by the
    * oracle's identical integer arithmetic). The exact top-k is a
    * TakeOrdered over the aggregated term table (O(k) per partition);
    * the estimate lookup is a broadcast of k×Depth probe rows against
    * the ≤ Depth×Width sketch — both sides bounded. */
  def cmsHeavyHitters(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val exact = tokens(spark, dir)
      .select(col("w").as("term"))
      .groupBy("term").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("term"))
      .limit(k)
    val probes = exact
      .select(col("term"), col("exact_cnt"), explode(expr(s"sequence(0, ${Depth - 1})")).as("r"))
      .withColumn("bucket", bucketCol(col("r"), col("term")))
    probes.join(cmsSketch(spark, dir), Seq("r", "bucket"))
      .groupBy("term", "exact_cnt")
      .agg(min("cnt").as("est_cnt"))
      .withColumn("overcount", col("est_cnt") - col("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("term"))
  }
}
