package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Adversarial skew fixtures for the dedup tier — the failure modes a
  * benign corpus never exercises:
  *
  *  1. A HOT SHINGLE shared by every document. Rarest-first prefix
  *     ordering pushes common shingles out of long documents' prefixes,
  *     but SHORT documents (prefix ≈ whole set) still index it — k docs
  *     sharing one indexed shingle is k² candidate rows, the quadratic
  *     cliff the `maxDf` cap exists for. The spec pins the bound: capped
  *     candidates stay O(true near-dups) while the uncapped run on the
  *     same corpus goes quadratic, and the cap drops NO true pair.
  *
  *  2. A 90 %-hot-key shuffle join. At 100 TB a skewed key turns one
  *     task into the stage's wall-clock; AQE's skew-join split is the
  *     designed mitigation, and the spec pins that it actually ACTIVATES
  *     under this engine's session settings (thresholds scaled down to
  *     fixture size — production sizes hit the same code path).
  */
class DedupSkewSpec extends SparkSpec {
  import spark.implicits._

  /** 200 SHORT docs: every one carries the same hot 5-word phrase (all
    * its word-3-shingles have df = 200) plus one unique tail word; two
    * extra docs are genuine near-dups of each other through RARE
    * content only. */
  private lazy val hotDir: String = {
    val hot = "alpha beta gamma delta epsilon"
    val docs = (0 until 200).map(i => (i.toLong, s"$hot unique$i", "en", "web", 0L)) ++ Seq(
      (900L, "rare shared content one two three four five six seven", "en", "web", 0L),
      (901L, "rare shared content one two three four five six eight", "en", "web", 0L))
    tempDataDir("documents" ->
      docs.toDF("doc_id", "text", "lang", "source", "n_chars"))
  }

  test("df cap bounds the hot-shingle candidate blowup and loses no true pair") {
    // UNCAPPED: the hot shingles sit in every short doc's prefix, so the
    // inverted index goes quadratic — the cliff, demonstrated.
    val uncapped = DedupOps.jaccardCandidates(spark, hotDir,
      threshold = 0.6, maxDf = 10000L).count()
    assert(uncapped > 150L * 200L / 2,
      s"fixture failed to trigger the quadratic cliff (got $uncapped candidates)")

    // CAPPED at maxDf 50 ≪ 200: hot shingles leave the index entirely;
    // candidates collapse to the docs related through RARE shingles.
    val capped = DedupOps.jaccardCandidates(spark, hotDir,
      threshold = 0.6, maxDf = 50L)
    val cappedN = capped.count()
    assert(cappedN <= 10L,
      s"df cap failed to bound candidates: $cappedN rows (uncapped: $uncapped)")

    // and the TRUE near-dup pair (rare-content docs 900/901) survives
    // the cap with its exact Jaccard intact
    val pairs = DedupOps.jaccardPairs(spark, hotDir, threshold = 0.6, maxDf = 50L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((900L, 901L)),
      "the df cap must never drop a pair related through RARE shingles")
    // hot-phrase-only "similarity" is mostly stop-shingles: those pairs
    // are exactly the ones the cap is licensed to forgo
    assert(!pairs.exists(p => p._1 < 200L && p._2 < 200L),
      "no unique-tail doc pair should verify at threshold 0.6 from the hot phrase alone")
  }

  test("AQE splits the 90%-hot-key shuffle join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> scala.util.Try(conf.get(k)).toOption.filter(_ != null)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      // force a sort-merge join (skew split only applies there) and
      // scale the skew thresholds down to fixture bytes — the SAME
      // mechanism production sizes trigger at the default thresholds
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // 90% of 200k left rows share key 0; right side is dense on all keys
      val left = spark.range(200000L)
        .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 1000L).as("k"),
          concat(lit("payload-payload-payload-"), col("id")).as("v"))
      val right = spark.range(1000L)
        .select(col("id").as("k"), concat(lit("dim-"), col("id")).as("d"))
      val joined = left.join(right, "k")
      // execute THIS DataFrame's own query execution: AQE finalizes the
      // adaptive plan only for the executed instance (count() would plan
      // and execute a separate aggregate query)
      assert(joined.collect().length === 200000)

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("isSkew=true")
          || plan.toLowerCase.contains("skewed"),
        s"AQE skew-join split did not activate on a 90%-hot-key join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
