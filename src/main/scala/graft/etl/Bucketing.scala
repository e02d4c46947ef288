package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed warehouse layout — the storage-side lever that removes the
  * shuffle from repeated large-table joins (SURVEY.md §7.5 "bucketing
  * for co-located joins"). Writing a table bucketed on its join key
  * pre-partitions it ON DISK by `hash(key) % numBuckets`; any
  * equi-join/aggregation on that key then reads co-located buckets and
  * plans NO Exchange on the bucketed side. At 100 TB the fact-table
  * shuffle IS the cost of self-join analytics (Q6 affinity reshuffles
  * the whole fact table on order_id every run); bucketing pays that
  * shuffle once at load time and amortizes it over every subsequent
  * query. Pinned by BucketingSpec: the bucketed self-join plan reads
  * `Bucketed: true` scans and contains NO exchange on the join key —
  * the only shuffle left is the final aggregation on the pair key,
  * which no storage layout can remove.
  *
  * Bucket-count sizing at scale: buckets ≈ table_bytes / target (e.g.
  * 256 MB) — a static layout decision, like the reference's fixed
  * 50-record partitions (`/root/reference/src/Meshjoin.java:30`), but
  * chosen per table rather than per JVM constant.
  */
object Bucketing {

  /** Writes `df` as a catalog table bucketed (and in-bucket sorted) on
    * `keys`. Sorting within buckets additionally enables merge-join
    * without a per-task sort when bucket files stay single. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      numBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** The Q6 affinity self-join shape over a BUCKETED fact table: both
    * sides read the same bucketed layout, so the equi-join on order_id
    * is co-located — no Exchange, no re-shuffle of the fact table. */
  def affinityPairsBucketed(spark: SparkSession, factTable: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val fact = spark.table(factTable).select("order_id", "product_id")
    fact.as("a").join(fact.as("b"),
        col("a.order_id") === col("b.order_id") &&
          col("a.product_id") < col("b.product_id"))
      .groupBy(col("a.product_id").as("product_1"), col("b.product_id").as("product_2"))
      .agg(count(lit(1)).as("frequency"))
  }
}
