package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's insert-if-not-exists / first-wins family (SURVEY.md
  * §2.4, D1–D7) as a set-at-a-time library. The reference issues one JDBC
  * existence probe per record (`/root/reference/src/Meshjoin.java:612-626`);
  * here each upsert is ONE left-anti join per batch — the probes collapse
  * into a single shuffle (or broadcast, when the incoming batch is small),
  * which is the only formulation that survives 100 TB.
  */
object Upserts {

  /** D1: rows of `incoming` whose key is absent from `existing` —
    * the set to append. Key-dedup of the incoming batch is included
    * (first occurrence wins per D2–D6 semantics, made deterministic by
    * `orderCols`). NULL-keyed rows are dropped up front — the reference
    * skips records with missing IDs (D3/D4,
    * `/root/reference/src/Meshjoin.java:513,537`), and a NULL key can
    * never match in the anti-join, so keeping such rows would append a
    * fresh copy on every batch and break insert-if-absent idempotence. */
  def insertIfAbsent(
      existing: DataFrame,
      incoming: DataFrame,
      keys: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    val keyed = incoming.where(keys.map(col(_).isNotNull).reduce(_ && _))
    firstWins(keyed, keys, orderCols)
      .join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti")
  }

  /** F3/D7: first occurrence per key wins, deterministically ordered by
    * `orderCols` (the reference's "first" is CSV file order; at scale an
    * explicit order is required — partition order is not stable). */
  def firstWins(df: DataFrame, keys: Seq[String], orderCols: Seq[String]): DataFrame = {
    require(!df.columns.contains("__rn"),
      "firstWins uses a temp column named __rn; input already has one")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** SCD Type 2 — versioned dimension history, the upsert family's
    * answer to "the reference OVERWRITES dim attributes" (its update
    * sink loses the old value forever; a warehouse that feeds
    * time-travel queries must keep it). `current` carries
    * (`valid_from`, `valid_to`, `is_current`) alongside `keys ++
    * attrs`; `updates` carries `keys ++ attrs` as of `effective`. Rows
    * whose attributes genuinely changed (null-safe compare — a value
    * appearing or disappearing is a change) get their open version
    * closed at `effective` and a new open version appended; no-op
    * updates produce NO new version (change detection is the point —
    * blind re-versioning would grow the dimension by the full update
    * batch every load). Brand-new keys open their first version at
    * `effective`.
    *
    * Scale shape: ONE equi-shuffle of the open slice against the
    * updates (closed history passes through untouched — at 100 TB
    * that's most of the table, and it moves zero bytes), plus a
    * key-set join back; both joins broadcast when the update batch is
    * small, which is the common case for dimension feeds. */
  def scdType2(
      current: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      attrs: Seq[String],
      effective: Column): DataFrame = {
    val outCols = (keys ++ attrs ++ Seq("valid_from", "valid_to", "is_current")).map(col)
    val open = current.where(col("is_current"))
    val closed = current.where(!col("is_current"))

    // One row per key per load: a CDC feed can re-deliver a key several
    // times in one batch, and versioning each copy would open multiple
    // simultaneous is_current rows AND fan the closed-out old row into
    // duplicates through the superseded join. Deterministic first-wins
    // on the attribute values; a caller with an intra-batch sequence
    // column should pre-reduce on it instead.
    val oneUpdatePerKey = firstWins(updates, keys, attrs)

    // null-safe "any attribute differs"; a missing open row (left join
    // miss on a brand-new key) differs by definition
    val oldAttrs = attrs.map(a => col(a).as(s"__old_$a"))
    val withOld = oneUpdatePerKey.join(
      open.select((keys.map(col) ++ oldAttrs :+ lit(true).as("__seen")): _*),
      keys, "left")
    val changed = withOld.where(
      col("__seen").isNull ||
        attrs.map(a => !(col(a) <=> col(s"__old_$a"))).reduce(_ || _))

    val newVersions = changed
      .select((keys ++ attrs).map(col): _*)
      .withColumn("valid_from", effective)
      // a NULL with effective's own type (date or timestamp — the
      // operator doesn't choose the caller's time grain)
      .withColumn("valid_to", when(lit(false), effective))
      .withColumn("is_current", lit(true))

    val supersededKeys = changed.select(keys.map(col): _*).distinct()
      .withColumn("__superseded", lit(true))
    val openOut = open.join(supersededKeys, keys, "left")
      .withColumn("valid_to",
        when(col("__superseded"), effective).otherwise(col("valid_to")))
      .withColumn("is_current", col("__superseded").isNull)
      .drop("__superseded")

    closed.select(outCols: _*)
      .unionByName(openOut.select(outCols: _*))
      .unionByName(newVersions.select(outCols: _*))
  }
}
