package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training — the concat-and-chunk layout:
  * documents are concatenated in a deterministic shuffled order and the
  * token stream is cut every `budget` tokens; a document may span a
  * chunk boundary. Each document's placement is fully determined by its
  * starting offset in the concatenated stream, i.e. by the PREFIX SUM
  * of token counts over the global order — which is the interesting
  * part at scale.
  *
  * A naive prefix sum is `sum(n) OVER (ORDER BY key)` — a window with
  * no partitioning, which moves the entire corpus to ONE task (Spark
  * even warns "No Partition Defined for Window operation"). At 100 TB
  * that plan does not exist. This operator computes the identical
  * values with the classic two-pass distributed scan:
  *
  *   1. bucket rows by the HIGH bits of the order key — buckets are
  *      contiguous RANGES of the global order, so per-bucket local
  *      prefix sums (a partitioned window, fully parallel) are correct
  *      within each bucket;
  *   2. aggregate one total per bucket (B rows, B = parallelism),
  *      prefix-sum THOSE on a single task — trivially small — and
  *      broadcast the per-bucket offsets back;
  *   3. global offset = bucket offset + local prefix sum.
  *
  * The output is independent of the bucket count (pinned by PackSpec
  * with two different B values): bucketing affects only WHERE the
  * partial sums are computed, never their values — the order key is
  * uniform md5 bits, so buckets are balanced by construction and the
  * only serial step touches B rows, not the corpus.
  *
  * The shuffled order doubles as the training-order randomization:
  * position follows the salted id hash (`pack:` salt, independent of
  * the split/sample salts — [[SampleOps]]), so the epoch order is
  * reproducible across runs and engines without a `rand()` anywhere.
  *
  * The reference has no notion of this operator (its grain is one fact
  * row per order, `/root/reference/src/Meshjoin.java:283-320`); it
  * belongs to the training-data tier of SURVEY.md §6.
  */
object PackOps {

  /** Tokens per packed sequence — GPT-2-ish context length. */
  val DefaultBudget = 2048

  /** (doc_id, n_tokens, h) — the packing order key `h` is the salted
    * cross-engine hash; `n_tokens` is the whitespace token count
    * (identical definition to [[TextOps.withTextSignals]], so pack
    * budgets and quality stats count the same tokens). */
  def withPackKey(documents: DataFrame): DataFrame =
    TextOps.withWords(documents)
      .select(col("doc_id"), expr("size(ws)").cast("long").as("n_tokens"),
        TextOps.h32(concat(lit("pack:"), col("doc_id").cast("string"))).as("h"))

  /** Every document's placement in the packed token stream:
    * `global_start` (offset of its first token), the chunk ids its
    * tokens land in (`pack_first`..`pack_last`) and how many chunks it
    * spans. Total order by `global_start` (strictly increasing — every
    * document has ≥ 1 whitespace token, so offsets never tie).
    *
    * @param buckets number of order-range buckets for the distributed
    *   prefix sum; affects parallelism only, never values. */
  def packSequences(spark: SparkSession, dir: String,
      budget: Int = DefaultBudget, buckets: Int = 0): DataFrame = {
    val b = if (buckets > 0) buckets else spark.sparkContext.defaultParallelism
    // h is uniform in [0, 2^32); floor(h * B / 2^32) is monotone in h,
    // so bucket ranges tile the global (h, doc_id) order. The double
    // division is exact: h*B < 2^47 fits a double mantissa and /2^32
    // only shifts the exponent, so the cast truncates the true quotient.
    val keyed = withPackKey(TextOps.docs(spark, dir))
      .withColumn("bucket", ((col("h") * b) / lit(1L << 32)).cast("int"))

    prefixSumOverBuckets(keyed, b, "n_tokens", Seq("h", "doc_id"))
      .withColumn("global_start", col("global_before"))
      .withColumn("pack_first", expr(s"global_start div $budget"))
      .withColumn("pack_last", expr(s"(global_start + n_tokens - 1) div $budget"))
      .withColumn("packs_spanned", col("pack_last") - col("pack_first") + lit(1L))
      .select("doc_id", "n_tokens", "global_start",
        "pack_first", "pack_last", "packs_spanned")
      .orderBy("global_start")
  }

  /** The classic two-pass distributed prefix sum over a pre-bucketed
    * frame: adds `local_before` (running sum of `valueCol` within the
    * bucket, exclusive) and `global_before` (bucket offset + local) —
    * the exact values of `sum(valueCol) OVER (ORDER BY bucket,
    * orderCols)` exclusive, without the single-partition window that
    * formulation plans. Shared by [[packSequences]] (token offsets) and
    * [[CurriculumOps]] (ordinal positions).
    *
    * `keyed` must carry a non-null `bucket` column whose ranges TILE
    * the intended global order (bucket boundaries are order
    * boundaries); `orderCols` must totally order rows within a bucket.
    *
    * ONE shuffle feeds both passes (plan-pinned by PackSpec: the corpus
    * parquet is scanned ONCE). The shuffle carries only the skinny
    * keyed projection — never the text. RANGE partitioning, not hash:
    * murmur3(bucket) % b scatters b distinct bucket ids into b
    * partitions with balls-in-bins collisions (~1/e of tasks idle,
    * others owning 2-4 buckets), while ranges of the already-ordered
    * bucket id give the intended one-task-one-bucket layout. The count
    * stays explicit — an unspecified-count repartition of a small
    * shuffle gets coalesced back to one partition by AQE.
    *
    * The isNotNull is never false (buckets derive from non-null
    * hashes) — it exists so BOTH consumers of the exchange carry the
    * same null-filter the join would otherwise push down only into its
    * own branch, which would de-duplicate the subtrees and break
    * exchange reuse.
    *
    * Per-bucket totals come off the WINDOW OUTPUT, not a separate
    * aggregate over the input: the running sum through a bucket's last
    * row IS the bucket total (offsets are monotone within the bucket),
    * so `max(local_before + value)` reads it back without new
    * computation — and, decisively, it keeps this branch's plan
    * identical to the join side's below the exchange, so Catalyst's
    * exchange reuse collapses the two into one scan+shuffle. (A
    * groupBy on the pre-window frame computes the same numbers, but
    * column pruning then projects this branch down to (bucket, value),
    * the exchange subtrees stop matching, and the corpus gets scanned
    * and tokenized twice — measured, not hypothetical.)
    *
    * The unpartitioned window over the bucket totals is deliberate: it
    * sees B rows, not the corpus, and the result broadcasts back to
    * the big side. */
  def prefixSumOverBuckets(keyed: DataFrame, b: Int, valueCol: String,
      orderCols: Seq[String]): DataFrame = {
    val shuffled = keyed.where(col("bucket").isNotNull)
      .repartitionByRange(b, col("bucket"))

    val localWin = Window.partitionBy("bucket")
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = shuffled.withColumn("local_before",
      coalesce(sum(col(valueCol)).over(localWin), lit(0L)))

    val offsetWin = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local
      .groupBy("bucket")
      .agg(max(col("local_before") + col(valueCol)).as("bucket_total"))
      .withColumn("bucket_offset",
        coalesce(sum(col("bucket_total")).over(offsetWin), lit(0L)))
      .select("bucket", "bucket_offset")

    local.join(broadcast(offsets), "bucket")
      .withColumn("global_before", col("bucket_offset") + col("local_before"))
  }

  /** PACKING EFFICIENCY report — the one-row answer to "did the pack
    * pass work": pack count, exact utilization of the claimed packs in
    * ppm (total tokens over packs × budget — the tail pack's slack is
    * the only waste in contiguous packing), documents crossing a pack
    * boundary and total boundary crossings (what a
    * truncate-at-boundary trainer would cut). One aggregate over the
    * [[packSequences]] layout; all-integer except nothing — even the
    * utilization is a ppm integer. */
  def packStats(spark: SparkSession, dir: String,
      budget: Int = DefaultBudget): DataFrame =
    packSequences(spark, dir, budget)
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        (max("pack_last") + 1).as("n_packs"),
        sum(when(col("packs_spanned") > 1, 1L).otherwise(0L))
          .as("docs_crossing"),
        sum(col("packs_spanned") - 1).as("boundary_crossings"))
      .withColumn("utilization_ppm",
        expr(s"(1000000 * total_tokens) div (n_packs * $budget)"))
}
