package graft.etl

import org.apache.spark.sql.DataFrame
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
}
