package graft.etl

import graft.SparkSpec

/** [[TxCatalog]]'s atomicity contract, pinned shape by shape: a
  * transaction's tables move together or not at all; a crashed or
  * aborted transaction is invisible to catalog-scoped readers and
  * repaired away by the next one; concurrent transactors lose loudly. */
class TxCatalogSpec extends SparkSpec {

  import spark.implicits._

  private def fixture(): (TxCatalog, TxParquetSink, TxParquetSink) = {
    val base = java.nio.file.Files.createTempDirectory("graft-catspec").toString
    val a = TxParquetSink(s"$base/a")
    val b = TxParquetSink(s"$base/b")
    a.append((1 to 20).map(i => (i, i.toLong)).toDF("k", "v"))
    val cat = TxCatalog.create(s"$base/cat", Map("a" -> a, "b" -> b))
    (cat, a, b)
  }

  private def rows(df: Option[org.apache.spark.sql.DataFrame]): Set[(Int, Long)] =
    df.map(_.collect().map(r => (r.getInt(0), r.getLong(1))).toSet)
      .getOrElse(Set.empty)

  test("a transfer moves both tables in one catalog commit; pins stay mutually consistent") {
    val (cat, _, _) = fixture()
    assert(rows(cat.read(spark, "b")) === Set.empty, "empty pin reads as None")
    cat.transact(spark) { t =>
      val moving = t("a").readSnapshot(spark).get
        .where("k % 2 = 0").localCheckpoint(true)
      t("b").append(moving)
      t("a").deleteWhere(spark, "k % 2 = 0")
      ()
    }
    val a1 = rows(cat.read(spark, "a")); val b1 = rows(cat.read(spark, "b"))
    assert(a1 === (1 to 20).filter(_ % 2 == 1).map(i => (i, i.toLong)).toSet)
    assert(b1 === (1 to 20).filter(_ % 2 == 0).map(i => (i, i.toLong)).toSet)
    assert((a1 ++ b1).size === 20, "no row lost or duplicated across the pair")
  }

  test("a crashed half-transaction is invisible to catalog readers and repaired by the next transact") {
    val (cat, a, _) = fixture()
    val before = rows(cat.read(spark, "a"))
    // table-level commit without a catalog publish = the crash shape
    a.deleteWhere(spark, "k <= 10")
    assert(rows(cat.read(spark, "a")) === before,
      "catalog-scoped read must not see past the pin")
    // the next transaction repairs the orphan, then applies its own write
    cat.transact(spark) { t =>
      t("a").deleteWhere(spark, "k = 1"); ()
    }
    assert(rows(cat.read(spark, "a")) ===
      (2 to 20).map(i => (i, i.toLong)).toSet,
      "repair must roll back the orphan delete; only k=1 is gone")
  }

  test("an aborted body publishes nothing and its partial commits are repaired") {
    val (cat, a, b) = fixture()
    val v0 = cat.version()
    intercept[RuntimeException] {
      cat.transact(spark) { t =>
        t("b").append(t("a").readSnapshot(spark).get
          .where("k <= 5").localCheckpoint(true))
        sys.error("mid-transaction failure AFTER the b-side commit")
      }
    }
    assert(cat.version() === v0, "no catalog commit on abort")
    assert(rows(cat.read(spark, "b")) === Set.empty)
    assert(b.version() >= 0, "the partial table commit exists as an orphan")
    cat.transact(spark) { _ => () } // empty repair transaction
    assert(rows(cat.read(spark, "b")) === Set.empty,
      "repair keeps the catalog state; the orphan stays unreachable")
  }

  test("a lost catalog-publish race throws instead of merging pin-sets") {
    val (cat, _, _) = fixture()
    val racer = TxCatalog(cat.dir)
    intercept[java.util.ConcurrentModificationException] {
      cat.transact(spark) { t =>
        t("a").deleteWhere(spark, "k = 2")
        // a second transactor lands first
        racer.transact(spark) { _ => () }
        ()
      }
    }
    // the winner's pin-set rules; the loser's delete is an orphan the
    // next transaction rolls back
    cat.transact(spark) { _ => () }
    assert(rows(cat.read(spark, "a")) ===
      (1 to 20).map(i => (i, i.toLong)).toSet)
  }

  test("readAt a captured version is stable across later transactions (the read-set primitive)") {
    val (cat, _, _) = fixture()
    val cv = cat.version()
    val before = rows(cat.readAt(spark, cv, "a"))
    cat.transact(spark) { t =>
      val moving = t("a").readSnapshot(spark).get
        .where("k <= 10").localCheckpoint(true)
      t("b").append(moving)
      t("a").deleteWhere(spark, "k <= 10")
      ()
    }
    // the captured read set still resolves the OLD pins — a reader
    // mid-flight can never see the half-transferred pair
    assert(rows(cat.readAt(spark, cv, "a")) === before)
    assert(rows(cat.readAt(spark, cv, "b")) === Set.empty)
    // while the head version shows the transferred state
    val cv2 = cat.version()
    assert(rows(cat.readAt(spark, cv2, "a")).size === 10)
    assert(rows(cat.readAt(spark, cv2, "b")).size === 10)
  }

  test("txn-marked transactions are idempotent: a redelivery skips whole, before any table is touched") {
    val (cat, a, _) = fixture()
    var applies = 0
    def once(ver: Long): Unit = {
      cat.transact(spark, Some(("app", ver))) { t =>
        applies += 1
        t("a").deleteWhere(spark, s"k = $ver"); ()
      }
      ()
    }
    once(1); once(1) // redelivery: body must not run again
    assert(applies === 1, "the redelivered transaction must skip whole")
    assert(rows(cat.read(spark, "a")).size === 19)
    once(2)
    assert(applies === 2, "a NEW version still applies")
    // the high-water mark survives later unmarked transactions
    cat.transact(spark) { _ => () }
    once(2)
    assert(applies === 2, "the mark is a history-scanned high water, not last-commit-only")
    assert(cat.lastTxn("app") === 2L)
    assert(cat.lastTxn("other") === -1L)
  }

  test("a crashed duplicate AFTER a committed txn is repaired, not re-applied") {
    val (cat, a, _) = fixture()
    cat.transact(spark, Some(("app", 7L))) { t =>
      t("a").deleteWhere(spark, "k > 15"); ()
    }
    val committed = rows(cat.read(spark, "a"))
    // the crash shape: a duplicate delivery got HALFWAY (table commit,
    // no catalog publish) — its txn mark is already set from the clean
    // apply, so the redelivered transact must skip AND the repair must
    // remove the orphan
    a.deleteWhere(spark, "k > 15") // no-op content-wise, but an orphan commit
    a.append(Seq((99, 99L)).toDF("k", "v")) // a real divergence
    cat.transact(spark, Some(("app", 7L))) { t =>
      fail("a committed txn must never re-apply")
    }
    assert(rows(cat.read(spark, "a")) === committed,
      "skip path must not publish or repair — pins unchanged")
    cat.transact(spark) { _ => () } // an unmarked transaction repairs
    assert(rows(cat.read(spark, "a")) === committed)
    assert(a.readSnapshot(spark).get.count() === committed.size.toLong,
      "the orphan rows are rolled back at the table head too")
  }

  test("orphans above an EMPTY pin repair to the pre-history empty state") {
    val (cat, _, b) = fixture()
    b.append(Seq((99, 99L)).toDF("k", "v")) // direct write to an empty-pinned table
    assert(rows(cat.read(spark, "b")) === Set.empty,
      "the rogue write is invisible through the catalog")
    cat.transact(spark) { _ => () } // repair = restore(-1): empty base commit
    assert(rows(cat.read(spark, "b")) === Set.empty)
    assert(b.readSnapshot(spark).isEmpty,
      "the table head itself is rolled back to empty")
    // and the table remains writable through a later transaction
    cat.transact(spark) { t =>
      t("b").append(Seq((1, 1L)).toDF("k", "v")); ()
    }
    assert(rows(cat.read(spark, "b")) === Set((1, 1L)))
  }

  test("transactions over DISJOINT scopes commit concurrently; overlapping scopes fail fast") {
    val (cat, _, _) = fixture()
    val v0 = cat.version()
    // two writers, each scoped to its own table, forced to overlap in
    // time: both must publish (neither sees a conflict)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = Seq(
      ("a", "k = 3"), ("b", "k = 999" /* no-op delete on empty */)).map {
      case (name, pred) => new Thread(() => {
        try {
          cat.transact(spark, scope = Set(name)) { t =>
            barrier.await(30, java.util.concurrent.TimeUnit.SECONDS)
            // both bodies are now inside their transactions at once
            if (name == "a") { t("a").deleteWhere(spark, pred); () }
            else { t("b").append(Seq((50, 50L)).toDF("k", "v")); () }
            barrier.await(30, java.util.concurrent.TimeUnit.SECONDS)
          }
          ()
        } catch { case e: Throwable => errs.add(e); () }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"disjoint scopes must not conflict: ${errs}")
    assert(cat.version() === v0 + 2, "both transactions published")
    assert(rows(cat.read(spark, "a")) ===
      (1 to 20).filter(_ != 3).map(i => (i, i.toLong)).toSet)
    assert(rows(cat.read(spark, "b")) === Set((50, 50L)))
    // overlapping scope while a lock is held: fail fast, loudly
    cat.transact(spark, scope = Set("a")) { _ =>
      intercept[java.util.ConcurrentModificationException] {
        TxCatalog(cat.dir).transact(spark, scope = Set("a")) { _ => () }
      }
      ()
    }
    ()
  }

  test("a scoped transaction repairs only ITS tables; a stale lock is stolen after the lease") {
    val (cat, a, b) = fixture()
    // orphans on both tables (a crashed all-scope transactor)
    a.deleteWhere(spark, "k <= 5")
    b.append(Seq((77, 77L)).toDF("k", "v"))
    val aOrphanHead = a.version()
    cat.transact(spark, scope = Set("b")) { t =>
      assert(!t.contains("a"), "body must see only the scoped tables")
      t("b").append(Seq((1, 1L)).toDF("k", "v")); ()
    }
    // b's orphan was repaired (rolled back) before the append; a's is
    // untouched — out of scope — but still invisible through the pins
    assert(rows(cat.read(spark, "b")) === Set((1, 1L)))
    assert(a.version() === aOrphanHead, "out-of-scope orphan not repaired")
    assert(rows(cat.read(spark, "a")) ===
      (1 to 20).map(i => (i, i.toLong)).toSet)
    cat.transact(spark, scope = Set("a")) { _ => () }
    assert(a.readSnapshot(spark).get.count() === 20L,
      "the covering transaction repairs a's orphan")
    // stale-lock steal: a dead transactor's lock blocks only until the
    // lease expires
    val lockDir = java.nio.file.Paths.get(cat.dir, "_catlog", "locks")
    java.nio.file.Files.createDirectories(lockDir)
    java.nio.file.Files.write(lockDir.resolve("a.lock"),
      s"${System.currentTimeMillis() - 60000}\n".getBytes) // held 60 s ago
    intercept[java.util.ConcurrentModificationException] {
      cat.transact(spark, scope = Set("a")) { _ => () } // default lease: blocked
    }
    val shortLease = TxCatalog(cat.dir, lockLeaseMs = 1000L)
    shortLease.transact(spark, scope = Set("a")) { t =>
      t("a").deleteWhere(spark, "k = 20"); ()
    }
    assert(rows(cat.read(spark, "a")).size === 19,
      "the stolen lock's transaction applied")
  }

  test("pins are captured UNDER the locks: a publish in the pre-lock window is not rolled back") {
    // review finding: transact used to read version/pins BEFORE
    // acquiring the scope's locks, so a transactor publishing inside
    // that window had its committed write treated as drift and
    // restored away
    val (cat, _, _) = fixture()
    val before = rows(cat.read(spark, "a"))
    var innerDone = false
    cat.transact(spark, scope = Set("a"), beforeLock = () => {
      // a full same-scope transaction lands INSIDE the window between
      // the outer's name read and its lock acquisition
      TxCatalog(cat.dir).transact(spark, scope = Set("a")) { t =>
        t("a").deleteWhere(spark, "k = 9"); ()
      }
      innerDone = true
    }) { t =>
      t("a").deleteWhere(spark, "k = 10"); ()
    }
    assert(innerDone)
    assert(rows(cat.read(spark, "a")) === before -- Set((9, 9L), (10, 10L)),
      "both deletes must survive — the second transactor must re-read " +
        "pins under its locks instead of restoring past the first's commit")
  }

  test("release is token-guarded: an expired holder cannot free the thief's lock") {
    val base = java.nio.file.Files.createTempDirectory("graft-cattok").toString
    val c = TxCatalog(base, lockLeaseMs = 100L)
    assert(c.tryAcquire("a", "tok1"))
    Thread.sleep(150) // tok1's lease expires
    assert(c.tryAcquire("a", "tok2"), "the stale lock must be stealable")
    // the expired original holder finishing late must NOT free tok2's lock
    c.release(Seq("a"), "tok1")
    assert(!c.tryAcquire("a", "tok3"),
      "tok2's fresh lock must survive tok1's late release")
    c.release(Seq("a"), "tok2")
    assert(c.tryAcquire("a", "tok3"), "a real release frees the lock")
    c.release(Seq("a"), "tok3")
  }

  test("two racing stealers can never both hold the lock") {
    // round-11 finding: a stealer that read a stale lock used to
    // delete-then-relink unconditionally, so a second stealer whose
    // read predated the first's completed steal would delete the
    // first's LIVE lock and relink — two concurrent holders. The claim
    // protocol + content re-verify closes it: interleave B so that A
    // completes a FULL steal inside B's classified-stale window.
    val base = java.nio.file.Files.createTempDirectory("graft-catsteal").toString
    val c = TxCatalog(base, lockLeaseMs = 100L)
    assert(c.tryAcquire("t", "dead"))
    Thread.sleep(150) // the holder is presumed dead
    var aResult = false
    val b = c.tryAcquire("t", "tokB", beforeSteal = () => {
      aResult = c.tryAcquire("t", "tokA") // A's complete steal, inside B's window
    })
    assert(aResult, "A's steal of the expired lock must succeed")
    assert(!b, "B classified the OLD content as stale; finding A's fresh " +
      "lock under the claim it must stand down, never delete it")
    // exactly one holder: A's lock survives and carries A's token
    val lockFile = java.nio.file.Paths.get(base, "_catlog", "locks", "t.lock")
    val content = new String(java.nio.file.Files.readAllBytes(lockFile))
    assert(content.contains("tokA"), s"A's live lock must survive B: $content")
    assert(!c.tryAcquire("t", "tokC"), "the stolen lock is held, not free")
  }

  test("a live foreign claim blocks a steal; an expired claim is cleared") {
    val base = java.nio.file.Files.createTempDirectory("graft-catclaim").toString
    val c = TxCatalog(base, lockLeaseMs = 100L)
    assert(c.tryAcquire("t", "dead"))
    Thread.sleep(150)
    val locks = java.nio.file.Paths.get(base, "_catlog", "locks")
    val claim = locks.resolve("t.lock.steal")
    // a YOUNG claim = another stealer mid-steal: stand down, touch nothing
    java.nio.file.Files.write(claim,
      s"${System.currentTimeMillis()}\tother\n".getBytes)
    assert(!c.tryAcquire("t", "tokB"))
    assert(java.nio.file.Files.exists(claim), "a live claim is never cleared")
    val lockContent = new String(java.nio.file.Files.readAllBytes(
      locks.resolve("t.lock")))
    assert(lockContent.contains("dead"), "the stale lock itself is untouched")
    // an EXPIRED claim = a stealer that died mid-steal: cleared, so the
    // NEXT acquisition proceeds instead of the table wedging forever
    java.nio.file.Files.write(claim,
      s"${System.currentTimeMillis() - 60000}\tcrashed\n".getBytes)
    assert(!c.tryAcquire("t", "tokB"), "the clearing attempt stands down")
    assert(!java.nio.file.Files.exists(claim), "the dead claim is cleared")
    assert(c.tryAcquire("t", "tokB"), "the retry then steals normally")
  }

  test("a slow body outlives its lease: the renewal heartbeat keeps the lock unstealable") {
    // ADVICE round-11: without mid-body renewal a merely-slow
    // transaction past the lease looks dead and its lock is stolen —
    // two live transactors on one table. The heartbeat re-stamps held
    // locks, so stealers fire only when the heartbeat actually STOPPED.
    val base = java.nio.file.Files.createTempDirectory("graft-catrenew").toString
    val a = TxParquetSink(s"$base/a")
    a.append(Seq((1, 1L)).toDF("k", "v"))
    val cat = TxCatalog.create(s"$base/cat", Map("a" -> a))
    val shortLease = TxCatalog(cat.dir, lockLeaseMs = 300L)
    val rival = TxCatalog(cat.dir, lockLeaseMs = 300L)
    val rivalResults = scala.collection.mutable.ListBuffer.empty[Boolean]
    shortLease.transact(spark, scope = Set("a")) { t =>
      // the body runs 4x the lease; a rival probes repeatedly
      (1 to 4).foreach { _ =>
        Thread.sleep(300)
        rivalResults += (try {
          rival.transact(spark, scope = Set("a")) { _ => () }; true
        } catch { case _: java.util.ConcurrentModificationException => false })
      }
      t("a").deleteWhere(spark, "k = 1"); ()
    }
    assert(rivalResults.toSeq === Seq(false, false, false, false),
      "the renewed lock must never be stolen while the body is alive")
    assert(cat.read(spark, "a").map(_.count()).getOrElse(0L) === 0L,
      "the slow transaction still publishes")
    // a DEAD holder (no heartbeat) is still stolen after the lease
    val locks = java.nio.file.Paths.get(cat.dir, "_catlog", "locks")
    java.nio.file.Files.write(locks.resolve("a.lock"),
      s"${System.currentTimeMillis() - 60000}\tdead\n".getBytes)
    rival.transact(spark, scope = Set("a")) { _ => () }
    ()
  }

  test("a persistently unreadable expired claim is cleared, not wedged forever") {
    // second-review finding: asymmetric exception mapping between the
    // two claim reads made an unreadable-but-present claim never
    // compare equal, so it was never deleted and the table wedged. A
    // directory at the claim path is a deterministic unreadable file.
    val base = java.nio.file.Files.createTempDirectory("graft-catwedge").toString
    val c = TxCatalog(base, lockLeaseMs = 100L)
    assert(c.tryAcquire("t", "dead"))
    Thread.sleep(150)
    val locks = java.nio.file.Paths.get(base, "_catlog", "locks")
    val claim = locks.resolve("t.lock.steal")
    java.nio.file.Files.createDirectory(claim) // readAllBytes throws (not NoSuchFile)
    assert(!c.tryAcquire("t", "tokB"), "the clearing attempt stands down")
    assert(!java.nio.file.Files.exists(claim),
      "the unreadable claim must be cleared, or the table wedges forever")
    assert(c.tryAcquire("t", "tokB"), "the retry then steals normally")
  }

  test("a read landing in the release gap relinks instead of classifying stale") {
    // ADVICE round-11 (medium): NoSuchFileException on the lock read
    // used to parse as age = MaxValue -> stale -> delete + relink,
    // which could delete the NEXT acquirer's brand-new lock. A missing
    // file is a FREE lock: retry the link; a foreign lock that won the
    // gap makes the relink fail instead of being deleted.
    val base = java.nio.file.Files.createTempDirectory("graft-catgap").toString
    val c = TxCatalog(base, lockLeaseMs = 100L)
    assert(c.tryAcquire("t", "tok1"))
    // gap shape 1: released before our read, nobody else — legit acquire
    val got = c.tryAcquire("t", "tok2", beforeRead = () => {
      c.release(Seq("t"), "tok1") // the legitimate release lands mid-call
    })
    assert(got, "a free lock observed through the gap is acquired")
    // gap shape 2: released AND re-acquired before our read — the fresh
    // foreign lock must survive us
    var tok3got = false
    val lost = c.tryAcquire("t", "tok4", beforeRead = () => {
      c.release(Seq("t"), "tok2")
      tok3got = c.tryAcquire("t", "tok3")
    })
    assert(tok3got && !lost, "the fresh foreign lock wins the gap")
    val content = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(base, "_catlog", "locks", "t.lock")))
    assert(content.contains("tok3"), "tok3's live lock must survive tok4")
  }

  test("a lower txn mark published after a higher one never regresses the high-water") {
    // review finding: the publish loop merged marks with ++, so a
    // disjoint-scope transaction carrying a LOWER version for the same
    // app could overwrite a concurrently-committed higher mark and
    // re-admit an already-committed redelivery
    val (cat, _, _) = fixture()
    cat.transact(spark, Some(("app", 5L)), scope = Set("a")) { _ =>
      // the same app commits version 7 through a DISJOINT scope while
      // our (app, 5) transaction is still in flight
      TxCatalog(cat.dir).transact(spark, Some(("app", 7L)),
        scope = Set("b")) { _ => () }
      ()
    }
    assert(cat.lastTxn("app") === 7L,
      "the mark must merge with max, never regress to the later-published 5")
    var applied = false
    cat.transact(spark, Some(("app", 7L))) { _ => applied = true }
    assert(!applied, "a redelivery of the higher version must still skip")
  }

  test("txn marks carry forward: the NEWEST manifest alone answers lastTxn for every app") {
    val (cat, _, _) = fixture()
    cat.transact(spark, Some(("app1", 3L))) { _ => () }
    cat.transact(spark, Some(("app2", 9L))) { _ => () }
    cat.transact(spark) { _ => () } // unmarked
    cat.transact(spark, Some(("app1", 5L))) { _ => () }
    assert(cat.lastTxn("app1") === 5L && cat.lastTxn("app2") === 9L)
    // the O(1) proof: delete every manifest EXCEPT the newest — the
    // carried-forward marks still answer (a scan-the-history
    // implementation would die or forget app2)
    val logDir = java.nio.file.Paths.get(cat.dir, "_catlog")
    val head = cat.version()
    (0L until head).foreach { v =>
      java.nio.file.Files.delete(logDir.resolve(f"$v%020d.cat"))
    }
    assert(cat.lastTxn("app1") === 5L, "app1 mark must live in the head manifest")
    assert(cat.lastTxn("app2") === 9L, "app2 mark must be carried forward")
    assert(cat.lastTxn("nobody") === -1L)
  }

  test("fencing token: a stolen-from holder's late data publish is rejected at the sink") {
    // round-12 verdict item 6: the residual lease-steal window. A
    // holder that slept past its lease and was stolen from used to be
    // caught only at catalog-publish time (pin verification); the
    // fencing token carried into each scoped sink now rejects the
    // late DATA publish itself — no manifest ever appears.
    val (cat, a, _) = fixture()
    val v0 = a.version()
    val ex = intercept[IllegalStateException] {
      cat.transact(spark, scope = Set("a")) { t =>
        // simulate a completed steal mid-body: the lock now carries a
        // rival's token (the default lease keeps the heartbeat from
        // re-stamping it during the test)
        val lock = java.nio.file.Paths.get(
          cat.dir, "_catlog", "locks", "a.lock")
        java.nio.file.Files.write(lock,
          s"${System.currentTimeMillis()}\trival-token\n".getBytes)
        t("a").append(Seq((99, 99L)).toDF("k", "v"))
        ()
      }
    }
    assert(ex.getMessage.contains("fenced"),
      s"expected the fence rejection, got: ${ex.getMessage}")
    assert(a.version() === v0,
      "the fenced writer must not have published a manifest")
    // the rival's lock is left alone on the way out (token-guarded
    // release), and a covering transaction after ITS lease expiry
    // repairs nothing (no orphan was ever committed)
    val shortLease = TxCatalog(cat.dir, lockLeaseMs = 1L)
    Thread.sleep(5)
    shortLease.transact(spark, scope = Set("a")) { t =>
      assert(t("a").version() === v0); ()
    }
  }
}
