package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class Doc(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

/** Incremental stream-dedup semantics: duplicates of the BOOTSTRAP
  * corpus are dropped, duplicates of EARLIER MICRO-BATCHES' novel docs
  * are dropped (live index), in-batch id repeats collapse, and novel
  * docs grow corpus + index. Duplicate cases use exact text copies
  * (Jaccard 1 ⇒ every band matches — deterministic detection; a 0.8-
  * Jaccard near-dup has P[band hit] ≈ 0.96, fine in production, not in
  * a test assertion). */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String) =
    Doc(id, text, "en", "web", text.length.toLong)

  test("stream near-dups are filtered against bootstrap corpus and live index") {
    implicit val sqlCtx = spark.sqlContext
    val baseText = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val corpusDir = tempDataDir(
      "documents" -> Seq(doc(1, baseText)).toDF())
    val storeRoot = java.nio.file.Files.createTempDirectory("graft-dedup-store").toString
    val store = StreamDedup.CorpusStore(
      s"$storeRoot/docs", s"$storeRoot/bands", s"$storeRoot/arrays")
    StreamDedup.bootstrap(spark, corpusDir, store)

    val novelText = "completely different words compose this sentence about spark engines and testing pipelines in production clusters"
    val lateDupOfNovel = doc(30, novelText) // dup of batch-1 novel doc
    val stream = MemoryStream[Doc]
    val q = StreamDedup.run(spark, stream.toDF(), store,
      java.nio.file.Files.createTempDirectory("graft-dedup-ckpt").toString)
    try {
      // batch 1: corpus dup (same text, new id), a novel doc, an
      // in-batch id repeat of the novel doc, and an in-batch CONTENT
      // repeat under a fresh id (nothing in any index can catch that
      // pair — the in-batch first-wins must)
      stream.addData(doc(10, baseText), doc(20, novelText), doc(20, novelText),
        doc(21, novelText))
      q.processAllAvailable()
      // batch 2: dup of batch-1's novel doc + one more novel doc
      stream.addData(lateDupOfNovel,
        doc(40, "yet another entirely unrelated document discussing databases and distributed storage systems with many unique terms"))
      q.processAllAvailable()
    } finally q.stop()

    val stored = spark.read.parquet(store.docsDir)
      .select("doc_id").as[Long].collect().toSet
    assert(stored == Set(1L, 20L, 40L),
      s"expected bootstrap + the two novel docs, got $stored")
    // index grew with the novel docs (so doc 30 was checked against 20)
    val indexed = spark.read.parquet(store.bandsDir)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(indexed == Set(1L, 20L, 40L))
  }

  test("novelDocs is idempotent: refiltering an admitted batch drops everything") {
    val baseText = "one two three four five six seven eight nine ten eleven twelve"
    val corpusDir = tempDataDir("documents" -> Seq(doc(1, baseText)).toDF())
    val storeRoot = java.nio.file.Files.createTempDirectory("graft-dedup-store2").toString
    val store = StreamDedup.CorpusStore(
      s"$storeRoot/docs", s"$storeRoot/bands", s"$storeRoot/arrays")
    StreamDedup.bootstrap(spark, corpusDir, store)
    val batch = Seq(doc(5, "fresh content with plenty of distinct words to form several shingles easily")).toDF()
    val first = StreamDedup.novelDocs(spark, batch, store)
    assert(first.count() == 1)
    // admit it (what the sink does), then re-deliver the same batch
    first.write.mode("append").parquet(store.docsDir)
    val sh = graft.ext.TextOps.shingleSetOf(first)
    graft.ext.DedupOps.lshBandsOf(
        graft.ext.DedupOps.minhashSignaturesOf(graft.ext.TextOps.shingleHashesOf(sh)))
      .write.mode("append").parquet(store.bandsDir)
    graft.ext.DedupOps.docShingleArraysOf(sh)
      .write.mode("append").parquet(store.arraysDir)
    assert(StreamDedup.novelDocs(spark, batch, store).count() == 0)
  }

  test("short docs are exact-dup-protected by content hash despite having no shingles") {
    import spark.implicits._
    val corpusDir = tempDataDir("documents" -> Seq(doc(1, "hello world")).toDF())
    val storeRoot = java.nio.file.Files.createTempDirectory("graft-dedup-store3").toString
    val store = StreamDedup.CorpusStore(
      s"$storeRoot/docs", s"$storeRoot/bands", s"$storeRoot/arrays")
    StreamDedup.bootstrap(spark, corpusDir, store)
    // a 2-word doc has zero 3-gram shingles ⇒ no LSH presence; the
    // text_hash anti-join must still drop its exact copy
    val out = StreamDedup.novelDocs(spark, Seq(doc(9, "hello world")).toDF(), store)
    assert(out.count() == 0)
  }

  test("batch replay twin matches the streaming sink over the same batch carving") {
    implicit val sqlCtx = spark.sqlContext
    // the replay's carve at max doc_id 30, 4 batches: size 8 →
    // ids {0} | {10, 11} | {20, 21} | {30}
    val tA = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    val tB = "alpha bravo charlie delta echo foxtrot golf hotel india juliet zulu york"
    val tC = "quebec romeo sierra tango uniform victor whiskey xray yankee papa oscar november"
    val docs = Seq(
      doc(0, tA),   // batch 0: seeds the corpus
      doc(10, tA),  // batch 1: exact dup of admitted 0 → dropped
      doc(11, tB),  // batch 1: near-dup of admitted 0 (tail edit)
      doc(20, tC),  // batch 2: novel
      doc(21, tC),  // batch 2: in-batch content dup of 20 → dropped
      doc(30, tC))  // batch 3: exact dup of ADMITTED 20 (live index) → dropped
    val dir = tempDataDir("documents" -> docs.toDF())

    val replay = StreamDedup.incrementalStreamDedupBatch(spark, dir)
      .where($"is_novel").select("doc_id").as[Long].collect().toSet

    // the real streaming sink over the SAME batch schedule, empty store
    val emptyDir = tempDataDir("documents" -> Seq.empty[Doc].toDF())
    val storeRoot = java.nio.file.Files.createTempDirectory("graft-dedup-par").toString
    val store = StreamDedup.CorpusStore(
      s"$storeRoot/docs", s"$storeRoot/bands", s"$storeRoot/arrays")
    StreamDedup.bootstrap(spark, emptyDir, store)
    val stream = MemoryStream[Doc]
    val q = StreamDedup.run(spark, stream.toDF(), store,
      java.nio.file.Files.createTempDirectory("graft-dedup-par-ckpt").toString)
    try {
      for (batch <- Seq(Seq(0L), Seq(10L, 11L), Seq(20L, 21L), Seq(30L))) {
        stream.addData(docs.filter(d => batch.contains(d.doc_id)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.read.parquet(store.docsDir)
      .select("doc_id").as[Long].collect().toSet

    assert(streamed === replay,
      "the oracle-checked replay must admit exactly the streaming sink's corpus")
    // the fixture's deterministic core: exact dups drop against corpus,
    // in-batch, and live index; the novel doc survives
    assert(replay.contains(0L) && replay.contains(20L))
    assert(!replay.contains(10L) && !replay.contains(21L) && !replay.contains(30L))
  }

  test("repairIndex re-derives index rows for corpus docs that lost them") {
    import spark.implicits._
    val corpusDir = tempDataDir("documents" ->
      Seq(doc(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")).toDF())
    val storeRoot = java.nio.file.Files.createTempDirectory("graft-dedup-store4").toString
    val store = StreamDedup.CorpusStore(
      s"$storeRoot/docs", s"$storeRoot/bands", s"$storeRoot/arrays")
    StreamDedup.bootstrap(spark, corpusDir, store)
    // simulate the crash window: docs append landed, index appends lost
    val orphanText = "lost index rows for this document must be rebuilt by the repair pass"
    Seq(doc(2, orphanText)).toDF()
      .withColumn("text_hash",
        org.apache.spark.sql.functions.expr(
          "md5(regexp_replace(trim(lower(text)), '\\\\s+', ' '))"))
      .write.mode("append").parquet(store.docsDir)
    StreamDedup.repairIndex(spark, store)
    val indexed = spark.read.parquet(store.bandsDir)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(indexed == Set(1L, 2L))
    // and the repaired index now catches a same-content newcomer by LSH
    assert(StreamDedup.novelDocs(spark,
      Seq(doc(3, orphanText + " x")).toDF(), store).count() == 0)
  }
}
