package graft.etl

import graft.SparkSpec
import java.nio.file.Files

/** MERGE INTO on the transactional sink: the full conditional merge
  * (matched-delete / matched-update / not-matched-insert) as ONE
  * atomic key-grain replace commit. Pins Delta's clause semantics —
  * delete before update, untouched matched rows survive unrewritten,
  * NULL conditions keep the row, duplicate source keys refused — plus
  * the protocol properties: single-version atomicity, time travel
  * reading the pre-merge state, the change feed carrying exactly the
  * touched keys, and version-relative concurrency. */
class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private def table() = TxParquetSink(
    Files.createTempDirectory("txmerge").toString + "/t")

  private def base(t: TxParquetSink): Unit =
    t.append(Seq(("A", 10L), ("B", 20L), ("C", 30L), ("D", 40L))
      .toDF("k", "cents"))

  private def state(t: TxParquetSink): Seq[(String, Long)] =
    t.readSnapshot(spark).get.select("k", "cents")
      .as[(String, Long)].collect().toSeq.sorted

  test("all four behaviors in one atomic commit") {
    val t = table()
    base(t)
    val v0 = t.version()
    // source: A matched+update (+5), B matched+delete, C matched but no
    // clause fires (untouched), E unmatched (insert)
    val src = Seq(("A", 5L, "upd"), ("B", 0L, "del"),
      ("C", 99L, "none"), ("E", 50L, "ins"))
      .toDF("k", "cents", "action")
    val st = t.mergeInto(spark, src, Seq("k"),
      updateSet = Map("cents" -> "t.cents + s.cents"),
      updateCond = Some("s.action = 'upd'"),
      deleteCond = Some("s.action = 'del'"))
    assert(st == TxParquetSink.MergeStats(inserted = 1, updated = 1, deleted = 1))
    assert(t.version() == v0 + 1, "one merge = one version")
    assert(state(t) == Seq(("A", 15L), ("C", 30L), ("D", 40L), ("E", 50L)))
    // time travel: the pre-merge snapshot is intact
    assert(t.readVersion(spark, v0).get.select("k", "cents")
      .as[(String, Long)].collect().toSeq.sorted ==
      Seq(("A", 10L), ("B", 20L), ("C", 30L), ("D", 40L)))
    // the change feed carries EXACTLY the touched keys: D(old A), D(B),
    // I(new A), I(E) — C and D were never rewritten
    val feed = t.changesBetween(spark, v0, t.version()).get
      .select($"_change_type", $"k", $"cents").as[(String, String, Long)]
      .collect().toSeq.sorted
    assert(feed == Seq(("D", "A", 10L), ("D", "B", 20L),
      ("I", "A", 15L), ("I", "E", 50L)))
  }

  test("delete clause evaluates before update (Delta's clause order)") {
    val t = table()
    base(t)
    val src = Seq(("A", 1L)).toDF("k", "cents")
    val st = t.mergeInto(spark, src, Seq("k"),
      updateSet = Map("cents" -> "s.cents"),
      updateCond = Some("true"),
      deleteCond = Some("t.cents = 10")) // A matches BOTH → deleted
    assert(st.deleted == 1 && st.updated == 0)
    assert(state(t).map(_._1) == Seq("B", "C", "D"))
  }

  test("pure-delete merge commits a files-empty manifest") {
    val t = table()
    base(t)
    val v0 = t.version()
    val st = t.mergeInto(spark, Seq(("B", 0L)).toDF("k", "cents"), Seq("k"),
      deleteCond = Some("true"), insertUnmatched = false)
    assert(st == TxParquetSink.MergeStats(0, 0, 1))
    assert(t.version() == v0 + 1)
    assert(state(t).map(_._1) == Seq("A", "C", "D"))
  }

  test("insert-only merge leaves no replace mask (metadata reads stay servable)") {
    val t = table()
    base(t)
    val st = t.mergeInto(spark, Seq(("X", 1L), ("Y", 2L)).toDF("k", "cents"),
      Seq("k"), updateSet = Map("cents" -> "s.cents"),
      updateCond = Some("false"))
    assert(st == TxParquetSink.MergeStats(2, 0, 0))
    val feed = t.changesBetween(spark, -1L, t.version()).get
    assert(feed.where($"_change_type" === "D").count() == 0,
      "an insert-only merge must not publish a replace mask")
    assert(state(t).size == 6)
  }

  test("NULL conditions keep the row; NULL source keys never match") {
    val t = table()
    base(t)
    val src = Seq((Some("A"), 5L), (None: Option[String], 7L))
      .toDF("k", "cents")
    val st = t.mergeInto(spark, src, Seq("k"),
      updateSet = Map("cents" -> "s.cents"),
      updateCond = Some("CAST(NULL AS BOOLEAN)")) // NULL → no update
    assert(st.updated == 0 && st.inserted == 1, "null key row inserts")
    assert(t.readSnapshot(spark).get.where($"k" === "A")
      .select("cents").as[Long].collect().toSeq == Seq(10L))
    assert(t.readSnapshot(spark).get.where($"k".isNull).count() == 1)
  }

  test("duplicate source keys and key-rewriting updateSet are refused") {
    val t = table()
    base(t)
    val dup = Seq(("A", 1L), ("A", 2L)).toDF("k", "cents")
    assertThrows[IllegalArgumentException] {
      t.mergeInto(spark, dup, Seq("k"), updateSet = Map("cents" -> "s.cents"))
    }
    assertThrows[IllegalArgumentException] {
      t.mergeInto(spark, Seq(("A", 1L)).toDF("k", "cents"), Seq("k"),
        updateSet = Map("k" -> "s.k"))
    }
  }

  test("multi-column keys merge (no bloom path)") {
    val t = table()
    t.append(Seq(("2024-01", 1L, 10L), ("2024-01", 2L, 20L),
      ("2024-02", 1L, 30L)).toDF("month", "store", "cents"))
    val src = Seq(("2024-01", 1L, 5L), ("2024-02", 2L, 9L))
      .toDF("month", "store", "cents")
    val st = t.mergeInto(spark, src, Seq("month", "store"),
      updateSet = Map("cents" -> "t.cents + s.cents"))
    assert(st == TxParquetSink.MergeStats(1, 1, 0))
    val got = t.readSnapshot(spark).get.select("month", "store", "cents")
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(got == Seq(("2024-01", 1L, 15L), ("2024-01", 2L, 20L),
      ("2024-02", 1L, 30L), ("2024-02", 2L, 9L)))
  }

  test("single-column key merges through bloom-pruned target reads") {
    val t = table()
    // stats+bloom commits so the merge's point-pruned read exercises
    // pointKeeps; correctness must be unchanged (superset contract)
    t.appendWithStats(Seq(("A", 10L), ("B", 20L)).toDF("k", "cents"),
      Seq("k", "cents"), bloomCols = Seq("k"))
    t.appendWithStats(Seq(("C", 30L), ("D", 40L)).toDF("k", "cents"),
      Seq("k", "cents"), bloomCols = Seq("k"))
    val st = t.mergeInto(spark, Seq(("C", 2L), ("Z", 1L)).toDF("k", "cents"),
      Seq("k"), updateSet = Map("cents" -> "t.cents + s.cents"))
    assert(st == TxParquetSink.MergeStats(1, 1, 0))
    assert(state(t) == Seq(("A", 10L), ("B", 20L), ("C", 32L),
      ("D", 40L), ("Z", 1L)))
  }

  test("interleaved commit: merge retries version-relative, last writer wins its keys") {
    val t = table()
    base(t)
    var fired = false
    val interleave: () => Unit = () => if (!fired) {
      fired = true
      // lands BETWEEN the merge's stage and publish: a disjoint key and
      // a key the merge also touches
      t.append(Seq(("Z", 1L), ("A", 777L)).toDF("k", "cents"))
    }
    val st = t.mergeInto(spark, Seq(("A", 5L)).toDF("k", "cents"), Seq("k"),
      updateSet = Map("cents" -> "t.cents + s.cents"),
      beforePublish = interleave)
    assert(st.updated == 1)
    // replace semantics are version-relative: the merge's key-grain
    // mask supersedes the interleaved A row (documented last-writer-
    // wins); the disjoint Z row survives untouched
    assert(state(t) == Seq(("A", 15L), ("B", 20L), ("C", 30L),
      ("D", 40L), ("Z", 1L)))
  }

  test("compact materializes the merge; snapshot unchanged") {
    val t = table()
    base(t)
    t.mergeInto(spark, Seq(("A", 5L), ("B", 0L), ("E", 50L))
      .toDF("k", "cents"), Seq("k"),
      updateSet = Map("cents" -> "t.cents + s.cents"),
      updateCond = Some("s.k = 'A'"),
      deleteCond = Some("s.k = 'B'"))
    val before = state(t)
    t.compact(spark)
    assert(state(t) == before)
  }

  test("updateWhere: atomic UPDATE, time travel, and the D/I change pair") {
    val t = table()
    base(t)
    val v0 = t.version()
    val n = t.updateWhere(spark, "cents <= 20", Map("cents" -> "cents + 1"))
    assert(n == 2 && t.version() == v0 + 1, "one UPDATE = one version")
    assert(state(t) == Seq(("A", 11L), ("B", 21L), ("C", 30L), ("D", 40L)))
    // old rows at the pre-update version
    assert(t.readVersion(spark, v0).get.where($"k" === "A")
      .select("cents").as[Long].head() == 10L)
    // the change feed shows UPDATE's textbook pair: D(old), I(new)
    val feed = t.changesBetween(spark, v0, t.version()).get
      .select($"_change_type", $"k", $"cents").as[(String, String, Long)]
      .collect().toSeq.sorted
    assert(feed == Seq(("D", "A", 10L), ("D", "B", 20L),
      ("I", "A", 11L), ("I", "B", 21L)))
    // SET reads the OLD row; post-update appends matching the predicate
    // are untouched (the mask only covers earlier commits)
    t.append(Seq(("E", 5L)).toDF("k", "cents"))
    assert(state(t).contains(("E", 5L)))
    // no matching rows → no commit
    assert(t.updateWhere(spark, "cents > 999", Map("cents" -> "0")) == 0L)
    assert(t.version() == v0 + 2)
    // compaction materializes the update; snapshot unchanged
    val before = state(t)
    t.compact(spark)
    assert(state(t) == before)
    // guards: non-boolean predicate, unknown SET column
    assertThrows[IllegalArgumentException](
      t.updateWhere(spark, "k", Map("cents" -> "0")))
    assertThrows[IllegalArgumentException](
      t.updateWhere(spark, "cents > 0", Map("nope" -> "0")))
  }

  test("updateWhere recomputes when a matching row lands in its commit window") {
    val t = table()
    base(t)
    var fired = false
    // a concurrent append inside the UPDATE's stage→publish window,
    // containing a row the predicate MATCHES: a blind republish at a
    // higher version would mask it with no rewritten counterpart —
    // silent data loss. The publish must fail at snapV+1 and the
    // UPDATE recompute from the new snapshot instead.
    val interleaved: () => Unit = () => if (!fired) {
      fired = true
      t.append(Seq(("E", 15L), ("F", 99L)).toDF("k", "cents"))
    }
    val n = t.updateWhere(spark, "cents <= 20", Map("cents" -> "cents + 1"),
      beforePublish = interleaved)
    assert(fired)
    // the UPDATE serialized AFTER the append: E(15) matched and updated
    assert(n == 3, s"recomputed UPDATE must cover the interleaved row, got $n")
    assert(state(t) == Seq(("A", 11L), ("B", 21L), ("C", 30L),
      ("D", 40L), ("E", 16L), ("F", 99L)))
  }

  test("merge into an empty table is a plain insert") {
    val t = table()
    val st = t.mergeInto(spark, Seq(("A", 1L)).toDF("k", "cents"), Seq("k"),
      updateSet = Map("cents" -> "s.cents"))
    assert(st == TxParquetSink.MergeStats(1, 0, 0))
    assert(state(t) == Seq(("A", 1L)))
  }
}
