package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC apply — materializing a change feed (op ∈ I/U/D with a per-key
  * sequence) into table state. Completes the warehouse's mutation
  * family: [[Upserts.insertIfAbsent]] is insert-only, [[Upserts.scdType2]]
  * versions updates, [[Retention]] erases — a replicated source emits
  * all three interleaved, and applying them is one operator, not three
  * passes.
  *
  * Semantics: last writer wins per key by the feed's sequence; a key
  * whose latest change is a delete has no row in the result. Applying
  * a feed is idempotent (replaying the same feed yields the same
  * state) and the operator is a pure function of the feed — the
  * standard snapshot-from-log contract.
  *
  * Scale shape: ONE shuffle on the key, a bounded per-key reduction
  * (max-sequence row via window over the key partition — Spark 4
  * plans a WindowGroupLimit partial rank so only candidate rows
  * shuffle), then a per-row filter. State size is the live table, not
  * the log; applying a day's feed to a 100 TB table shuffles the FEED,
  * and the merge with stored state is the same anti-join family as the
  * upsert sink. */
object Cdc {

  /** Collapse a change feed to table state. `feed` carries `keys`,
    * attribute columns, `op` ('I' | 'U' | 'D') and `seqCol` (total
    * order per key — a log offset / commit LSN). */
  def apply(feed: DataFrame, keys: Seq[String], seqCol: String): DataFrame = {
    require(!feed.columns.contains("__rn"),
      "Cdc.apply uses a temp column named __rn; input already has one")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol).desc)
    feed.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col("op") =!= "D")
      .drop("__rn", "op", seqCol)
  }

  /** CDC emit — the inverse of [[apply]]: derive the change feed that
    * transforms snapshot `before` into snapshot `after` (I for keys only
    * in `after`, D for keys only in `before`, U where any attribute
    * differs null-safely; unchanged keys emit nothing). Deletes carry
    * null attributes — a tombstone needs only its key. Closure with
    * [[apply]] is the contract (spec-pinned): applying `before`-as-
    * inserts at seq 0 plus `emit(before, after)` at seq 1 reproduces
    * `after` exactly. Same scale shape as [[Reconcile.snapshotDiff]],
    * which it builds on: ONE full outer join on the key. */
  def emit(before: DataFrame, after: DataFrame, keys: Seq[String],
      attrs: Seq[String]): DataFrame = {
    val diff = Reconcile.snapshotDiff(before, after, keys, attrs)
    diff.where(col("change_type") =!= "unchanged")
      .select(keys.map(col) ++ Seq(
        when(col("change_type") === "added", "I")
          .when(col("change_type") === "removed", "D")
          .otherwise("U").as("op")) ++
        attrs.map(c => when(col("change_type") === "removed", lit(null))
          .otherwise(col(s"__a_$c")).as(c)): _*)
  }

  /** Oracle-checked fixture: the change feed between [[Reconcile]]'s
    * restatement snapshots — exercises all three ops from real data
    * (late orders → I, erased customers → D, restated quantities → U). */
  def cdcEmitFact(spark: SparkSession, dir: String): DataFrame = {
    val (before, after, keys, attrs) = Reconcile.restatementSnapshots(spark, dir)
    graft.model.Schemas.outputDoubles(
      emit(before, after, keys, attrs))
      .orderBy(keys.map(col): _*)
  }

  /** Oracle-checked fixture: a deterministic three-epoch feed over the
    * customer dimension — every customer INSERTed at seq 1, every third
    * UPDATEd at seq 2, every seventh DELETEd at seq 3 — collapsed to
    * state. Exercises all three ops and their interleavings (a %21 key
    * is updated then deleted; the delete must win). */
  def cdcApplyCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Star.dimCustomer(spark, dir).select("customer_id", "customer_name")
    val inserts = cust
      .withColumn("op", lit("I")).withColumn("seq", lit(1L))
    val updates = cust.where(col("customer_id") % 3 === 0)
      .withColumn("customer_name", concat(col("customer_name"), lit(" v2")))
      .withColumn("op", lit("U")).withColumn("seq", lit(2L))
    val deletes = cust.where(col("customer_id") % 7 === 0)
      .withColumn("op", lit("D")).withColumn("seq", lit(3L))
    Cdc.apply(inserts.unionByName(updates).unionByName(deletes),
        keys = Seq("customer_id"), seqCol = "seq")
      .orderBy("customer_id")
  }
}
