package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.{TxCatalog, TxFixtures, TxParquetSink}

/** EXACTLY-ONCE STREAMING CROSS-TABLE TRANSACTIONS — the composition
  * the catalog tier exists for: an at-least-once micro-batch writer
  * (`foreachBatch` semantics) maintains a FACT table and its running
  * AGGREGATE table as one [[TxCatalog.transact]] per batch, idempotent
  * via the catalog-scope txn high-water mark (`txn = (app, batchId)`).
  *
  * The replay drives the failure taxonomy an at-least-once transport
  * actually produces:
  *
  *  - ordinary batches: fact append + RELATIVE aggregate merge
  *    (`t.cents + s.cents`) — the accumulation shape that is UNSAFE
  *    under redelivery at single-table scope, made safe here because
  *    the idempotence skip happens BEFORE the body, for the whole
  *    multi-table batch at once;
  *  - a batch REDELIVERED after its commit: the txn mark makes the
  *    re-apply a whole-transaction no-op (no double-counted cents, no
  *    duplicate fact rows);
  *  - a batch whose writer CRASHED mid-transaction (fact side
  *    committed, catalog publish never happened): catalog readers
  *    never see it, the mark is unset, and the redelivery applies the
  *    batch exactly once on top of the repaired pins.
  *
  * The final catalog read of the pair hash-gates against DuckDB
  * computing BOTH sides from the raw facts: per-store aggregate ≡
  * fact-side recount ≡ declarative totals — the pair is consistent
  * AND correct after redelivery and crash. */
object StreamTxMulti {

  def txMultiReplay(spark: SparkSession, dir: String): DataFrame = {
    // year-grain batches: the full failure taxonomy needs only a
    // handful of transacts — finer grain doubles replay cost for no
    // extra coverage
    val monthly = TxFixtures.monthlyCents(spark, dir)
    val years = TxFixtures.years(spark, dir)
    val base = java.nio.file.Files.createTempDirectory("graft-stxm").toString
    val fact = TxParquetSink(s"$base/fact")
    val agg = TxParquetSink(s"$base/agg")
    val cat = TxCatalog.create(s"$base/cat",
      Map("fact" -> fact, "agg" -> agg))
    def slice(y: String) = monthly
      .where(expr(s"substring(month, 1, 4) = '$y'"))
      .groupBy("store_id").agg(sum("cents").as("cents"))
    def apply(i: Int): Long = cat.transact(spark, Some(("replay", i.toLong))) { t =>
      val s = slice(years(i)).localCheckpoint(eager = true)
      t("fact").append(s)
      if (t("agg").version() == -1L)
        t("agg").append(s.select("store_id", "cents"))
      else {
        t("agg").mergeInto(spark, s.select("store_id", "cents"),
          Seq("store_id"), updateSet = Map("cents" -> "t.cents + s.cents"))
        ()
      }
    }
    years.indices.foreach { i =>
      apply(i)
      // batch 1 is REDELIVERED after its commit: the catalog txn mark
      // must make the whole multi-table re-apply a no-op — with a
      // RELATIVE merge, a single redelivered table-level apply would
      // double-count
      if (i == 1) apply(i)
      // the batch-2 writer "crashes" mid-transaction right after it:
      // the fact side of a REPEATED batch 2 lands, the catalog publish
      // never happens. The mark for (replay, 2) IS set (the clean
      // apply above), so this orphan is a half-applied DUPLICATE —
      // the next transaction's repair must remove it, and the skip
      // must NOT re-apply batch 2
      if (i == 2) fact.append(slice(years(i)))
    }
    val cv = cat.version()
    val aggSide = cat.readAt(spark, cv, "agg").get
      .select(col("store_id"), col("cents").as("agg_cents"))
    val factSide = cat.readAt(spark, cv, "fact").get
      .groupBy("store_id")
      .agg(sum("cents").as("fact_cents"),
        count(lit(1)).as("n_years"))
    aggSide.join(factSide, Seq("store_id"))
      .select("store_id", "agg_cents", "fact_cents", "n_years")
      .orderBy("store_id")
  }
}
