package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic curriculum ordering — the epoch layout that presents
  * high-quality documents first: documents are banded into phases by
  * quality decile (top deciles → phase 1), shuffled WITHIN each phase by
  * a salted hash, and assigned their global training position.
  *
  * The position is exactly `row_number() OVER (ORDER BY phase, h,
  * doc_id)` — but that window is a single-partition sort of the corpus,
  * the same plan [[PackOps]] refuses. Instead the phase ordinal is
  * folded into the bucket id (`(phase-1)·B + ⌊h·B/2^32⌋` — phase-major,
  * so bucket ranges tile the (phase, h) order) and the position comes
  * from the shared two-pass distributed prefix sum
  * ([[PackOps.prefixSumOverBuckets]]) counting 1 per row. Bucket count
  * affects parallelism only, never values (pinned by spec, same
  * contract as packing).
  *
  * The salt (`curr:`) is independent of the split/sample/pack salts
  * ([[SampleOps]], [[PackOps]]) — each randomization is its own
  * reproducible stream; reusing a salt would correlate the curriculum
  * order with, e.g., the train/test split.
  *
  * The reference has no notion of training curricula; this belongs to
  * the training-data tier of SURVEY.md §7.5.
  */
object CurriculumOps {

  /** decile → phase band: 9-10 → 1 (best fifth first), 5-8 → 2, 1-4 → 3. */
  val phaseExpr: String =
    "CASE WHEN decile >= 9 THEN 1 WHEN decile >= 5 THEN 2 ELSE 3 END"

  /** One row per document: phase band, quality decile, and the 1-based
    * global training position. Total order by position (a permutation
    * of 1..N, contiguous phases — spec-pinned).
    *
    * @param bucketsPerPhase order-range buckets per phase for the
    *   distributed prefix sum; parallelism only, never values. */
  def curriculumOrder(spark: SparkSession, dir: String,
      bucketsPerPhase: Int = 0): DataFrame = {
    val perPhase =
      if (bucketsPerPhase > 0) bucketsPerPhase
      else math.max(1, spark.sparkContext.defaultParallelism / 3)
    val keyed = TextOps.qualityDecileOf(spark, dir)
      .withColumn("phase", expr(phaseExpr))
      .withColumn("h",
        TextOps.h32(concat(lit("curr:"), col("doc_id").cast("string"))))
      // same exact-double bucket arithmetic as PackOps.packSequences:
      // h·B < 2^47 fits the mantissa, /2^32 shifts the exponent, the
      // cast truncates the true quotient — monotone in (phase, h)
      .withColumn("bucket",
        (col("phase") - 1) * perPhase
          + ((col("h") * perPhase) / lit(1L << 32)).cast("int"))
      .withColumn("one", lit(1L))
    PackOps.prefixSumOverBuckets(keyed, 3 * perPhase, "one", Seq("h", "doc_id"))
      .withColumn("global_pos", col("global_before") + 1L)
      .select(col("doc_id"), col("phase").cast("int").as("phase"),
        col("decile").cast("int").as("decile"), col("global_pos"))
      .orderBy("global_pos")
  }
}
