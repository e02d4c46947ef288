package graft.etl

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileAlreadyExistsException, Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CROSS-TABLE TRANSACTIONS — the multi-table atomicity tier on top of
  * [[TxParquetSink]], built the way catalog-governed lakehouses do it
  * (the Iceberg REST-catalog contract; Hive ACID's valid-write-id
  * lineage): a catalog is a tiny versioned log of PIN-SETS
  * `table → (dir, version)`, and a transaction is (1) apply each
  * table's writes through the sink's ordinary single-table commits,
  * then (2) advance the whole pin-set in ONE atomic catalog commit
  * (the same create-hard-link publish the sinks use). Readers who
  * resolve tables THROUGH the catalog ([[readAt]] = `readVersion` at
  * the pin of one CAPTURED catalog version) therefore see every
  * transaction's tables move TOGETHER or not at all — never a
  * half-transferred pair — and any two tables resolved under the same
  * captured version are mutually consistent snapshots ([[read]] is
  * the single-table convenience that re-captures per call).
  *
  * Crash atomicity comes from the pin indirection plus restore-based
  * repair: a writer that dies AFTER some table commits but BEFORE the
  * catalog publish leaves orphan commits above the pins — invisible to
  * every catalog-scoped reader (version-pinned reads never look past
  * the pin) — and the NEXT [[transact]] rolls each drifted table back
  * to its pin ([[TxParquetSink.restore]], itself a versioned commit,
  * so history and in-flight pinned readers are untouched) before
  * applying its own writes. Abort is the same path: a body that throws
  * publishes nothing, and its partial table commits are repaired away.
  *
  * Contract (the catalog OWNS the table pointer, exactly Iceberg's
  * rule): catalog-managed tables take writes only through [[transact]]
  * — a direct append to a managed table is indistinguishable from a
  * crashed transaction's orphan and will be rolled back at the next
  * transaction. One transactor at a time: a lost catalog-publish race
  * throws (the loser's table commits become orphans the winner's next
  * transaction repairs) rather than silently merging pin-sets. And
  * maintenance composes with the same caveat as time travel:
  * [[TxParquetSink.truncateHistory]] on a managed table must keep the
  * oldest pin a reader still uses.
  *
  * At 100 TB this is the missing piece single-table ACID can't give: a
  * fact+dimension pair republished together, a transfer that debits
  * one table and credits another, a GDPR erasure spanning every table
  * that mentions the subject — each one catalog commit, O(tables)
  * metadata, zero cross-table locks on the data path. */
final case class TxCatalog(dir: String) {

  private val root = Paths.get(dir)
  private val logDir = root.resolve("_catlog")

  /** Newest catalog version, −1 before [[TxCatalog.create]]. */
  def version(): Long = {
    if (!Files.isDirectory(logDir)) return -1L
    val s = Files.list(logDir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".cat"))
        .map(_.stripSuffix(".cat").toLong)
        .maxOption.getOrElse(-1L)
    } finally s.close()
  }

  /** The pin-set at catalog version `v`: name → (table dir, pinned
    * table version). Lines starting with `#` are metadata (the `#txn`
    * idempotence records), not tables. */
  def pinsAt(v: Long): Map[String, (String, Long)] = {
    val f = logDir.resolve(f"$v%020d.cat")
    new String(Files.readAllBytes(f), UTF_8).split("\n").iterator
      .filter(l => l.nonEmpty && !l.startsWith("#")).map { line =>
        val Array(n, d, pv) = line.split("\t", 3)
        n -> (d, pv.toLong)
      }.toMap
  }

  /** The highest committed application-transaction version for
    * `appId` across the catalog history, −1 if none — the
    * [[TxParquetSink.lastTxnVersion]] contract lifted to CROSS-TABLE
    * transactions: each [[transact]] invoked with a `txn` records a
    * `#txn` line in its catalog manifest, and a redelivered
    * transaction at or below this high-water mark is skipped WHOLE
    * (no table is touched), which is what makes an at-least-once
    * streaming writer's multi-table batch exactly-once. O(catalog
    * commits) driver metadata. */
  def lastTxn(appId: String): Long = {
    val v = version()
    (0L to v).iterator.flatMap { cv =>
      val f = logDir.resolve(f"$cv%020d.cat")
      new String(Files.readAllBytes(f), UTF_8).split("\n").iterator
        .filter(_.startsWith("#txn\t")).flatMap { line =>
          val Array(_, app, ver) = line.split("\t", 3)
          if (app == appId) Some(ver.toLong) else None
        }
    }.maxOption.getOrElse(-1L)
  }

  /** The current pin-set. */
  def pins(): Map[String, (String, Long)] = pinsAt(version())

  /** Catalog-scoped read AT A CAPTURED CATALOG VERSION: table `name`
    * at the pin catalog version `catVersion` recorded — THE read-set
    * primitive. A multi-table read that must be mutually consistent
    * captures `version()` ONCE and resolves every table through the
    * same `catVersion`; pins are immutable once published, so the set
    * can never straddle a concurrent transaction's publish. None
    * while the pin is −1 (registered empty, not yet written) or the
    * pinned table version reads empty. */
  def readAt(spark: SparkSession, catVersion: Long,
      name: String): Option[DataFrame] = {
    val (d, pv) = pinsAt(catVersion).getOrElse(name,
      throw new NoSuchElementException(
        s"catalog $dir@$catVersion has no table '$name'"))
    if (pv < 0) None else TxParquetSink(d).readVersion(spark, pv)
  }

  /** Single-table convenience read at the CURRENT catalog version.
    * Each call resolves the head pin-set independently — two `read`
    * calls can land on different catalog versions if a transaction
    * publishes in between, so a cross-table read set uses
    * [[readAt]] with one captured `version()` instead. */
  def read(spark: SparkSession, name: String): Option[DataFrame] =
    readAt(spark, version(), name)

  private def render(ps: Map[String, (String, Long)]): String =
    ps.toSeq.sortBy(_._1)
      .map { case (n, (d, v)) => s"$n\t$d\t$v" }.mkString("", "\n", "\n")

  private def tryPublish(v: Long, content: String): Boolean = {
    Files.createDirectories(logDir)
    val tmp = Files.createTempFile(logDir, ".stage-", ".cat.tmp")
    try {
      Files.write(tmp, content.getBytes(UTF_8))
      try { Files.createLink(logDir.resolve(f"$v%020d.cat"), tmp); true }
      catch { case _: FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }

  /** ONE cross-table transaction. Repairs any table whose head drifted
    * past its pin (a previous transactor's crash — rolled back to the
    * pinned state), hands the managed sinks to `body`, and publishes
    * the post-body heads as catalog version+1 in one atomic commit.
    * Throws without publishing if the body throws (its partial commits
    * become orphans the next transaction repairs) or if the catalog
    * moved underneath (one transactor at a time — the documented
    * contract).
    *
    * `txn = Some((appId, ver))` makes the transaction IDEMPOTENT
    * end-to-end (the Delta `txnAppId`/`txnVersion` writer contract at
    * catalog scope): if `ver` is at or below the appId's committed
    * high-water mark ([[lastTxn]]) the call returns the current
    * version WITHOUT touching any table — so an at-least-once
    * streaming writer (foreachBatch retries, crash-restarted
    * backfills) re-delivering a multi-table batch converges even when
    * the body uses RELATIVE updates (`t.cents + s.cents`): the skip
    * happens before the body, not per table. A crash BEFORE the
    * catalog publish leaves the mark unset, so the redelivery
    * (post-repair) applies exactly once. Returns the new catalog
    * version (or the current one on a skip). */
  def transact(spark: SparkSession, txn: Option[(String, Long)] = None)(
      body: Map[String, TxParquetSink] => Unit): Long = {
    val v = version()
    require(v >= 0, s"transact: catalog $dir was never created")
    val alreadyCommitted = txn.exists { case (app, ver) =>
      require(!app.contains("\t") && !app.contains("\n"),
        s"bad txn appId '$app'")
      lastTxn(app) >= ver
    }
    if (alreadyCommitted) return v
    val p = pinsAt(v)
    val sinks = p.map { case (n, (d, _)) => n -> TxParquetSink(d) }
    p.foreach { case (n, (_, pv)) =>
      if (sinks(n).version() != pv) {
        // a previous transactor's crash (or a rogue direct write):
        // roll the table back to its pin — restore(-1) lands the
        // pre-history empty state for a table orphaned above an
        // empty pin
        sinks(n).restore(spark, pv)
        ()
      }
    }
    body(sinks)
    val newPins = p.map { case (n, (d, _)) => n -> (d, sinks(n).version()) }
    val content = render(newPins) +
      txn.map { case (app, ver) => s"#txn\t$app\t$ver\n" }.getOrElse("")
    if (!tryPublish(v + 1, content))
      throw new java.util.ConcurrentModificationException(
        s"catalog $dir moved past version $v during the transaction — " +
          "one transactor at a time; this transaction's table commits " +
          "are orphans the winner's next transaction will repair")
    v + 1
  }
}

object TxCatalog {

  /** Creates the catalog at `dir`, pinning each table's CURRENT
    * version (−1 for a still-empty sink) as catalog version 0. */
  def create(dir: String, tables: Map[String, TxParquetSink]): TxCatalog = {
    require(tables.nonEmpty, "a catalog needs at least one table")
    tables.keys.foreach(n => require(
      !n.contains("\t") && !n.contains("\n") && n.nonEmpty &&
        !n.startsWith("#"),
      s"bad table name '$n' (no tabs/newlines, no leading '#')"))
    // dirs share the tab-separated line format: a tab or newline in a
    // sink path would make pinsAt's split mis-parse every later read
    tables.values.foreach(s => require(
      !s.dir.contains("\t") && !s.dir.contains("\n"),
      s"bad table dir '${s.dir}' (no tabs/newlines)"))
    val c = TxCatalog(dir)
    require(c.version() == -1L, s"catalog $dir already exists")
    val pins = tables.map { case (n, s) => n -> (s.dir, s.version()) }
    require(c.tryPublish(0L, c.render(pins)),
      s"catalog $dir: lost the creation race")
    c
  }
}
