package graft.ext

import graft.SparkSpec

/** Text-analysis and dedup-family behavior on hand-crafted documents
  * (near-dup pair, exact-dup pair, CJK doc, distinct doc). */
class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  // doc 1/2: near-duplicates (one word changed); doc 3: exact dup of 1
  // (modulo whitespace); doc 4: unrelated; doc 5: CJK.
  private lazy val dir = tempDataDir(
    "documents" -> Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away", "en", "web", 61L),
      (2L, "the quick brown fox jumps over the lazy cat and runs far away", "en", "web", 61L),
      (3L, "the quick  brown fox jumps over the lazy dog and runs far away", "en", "web", 62L),
      (4L, "completely different content about spark query engines, nothing shared here at all", "en", "web", 83L),
      (5L, "这是 一个 中文 文档 测试", "zh", "web", 13L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))

  test("exact dedup groups whitespace-normalized duplicates, min doc_id wins") {
    val out = DedupOps.exact(spark, dir).collect()
    assert(out.length == 4) // 1 and 3 collapse
    val kept = out.map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L, 5L))
    assert(out.find(_.getLong(0) == 1L).get.getLong(2) == 2L) // n_copies
  }

  test("jaccard pairs find the near-dup and not the unrelated doc") {
    val pairs = DedupOps.jaccardPairs(spark, dir, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 3L))) // identical shingle sets
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("prefix filter is recall-lossless and prunes the candidate join") {
    // completeness: every pair jaccardPairs emits must appear among the
    // prefix-filtered candidates (it does — pairs are computed FROM the
    // candidates — so assert against an independently-computed truth set:
    // the sf0.001 corpus full inverted-index join).
    val corpus = "/root/testdata/sf0.001"
    val t = 0.4
    val sh = TextOps.shingleSet(spark, corpus)
    import org.apache.spark.sql.functions._
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val truth = sh.as("x").join(sh.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.as("za"), col("doc_a") === col("za.doc_id"))
      .join(sizes.as("zb"), col("doc_b") === col("zb.doc_id"))
      .where(expr(s"CAST(shared AS DOUBLE) / (za.n + zb.n - shared) >= $t"))
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaPrefix = DedupOps.jaccardPairs(spark, corpus, threshold = t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaPrefix == truth)
    // pruning: the prefix index feeds strictly fewer candidate pairs than
    // the full inverted-index join generates distinct colliding pairs.
    val fullCand = sh.as("x").join(sh.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id")).distinct().count()
    val prefCand = DedupOps.jaccardCandidates(spark, corpus, threshold = t).count()
    assert(truth.size <= prefCand && prefCand < fullCand,
      s"expected truth ${truth.size} <= prefix candidates $prefCand < full $fullCand")
  }

  test("minhash-LSH candidates are a subset of exact jaccard and catch true dups") {
    val exact = DedupOps.jaccardPairs(spark, dir, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupOps.minhashLsh(spark, dir, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact)) // verification step ⇒ no false positives
    // j = 1.0 pairs band-match with probability 1 — always recovered.
    assert(lsh.contains((1L, 3L)))
  }

  test("incremental dedup agrees with the full LSH pass on cross-set pairs") {
    import org.apache.spark.sql.functions.col
    val inc = DedupOps.incrementalDedup(spark, sfSmoke, threshold = 0.5).cache()
    try {
      // universe: exactly the simulated increment, one decision per doc
      val incIds = TextOps.docs(spark, sfSmoke)
        .where(col("doc_id") % 10 === 0).count()
      assert(inc.count() == incIds)
      assert(inc.select("doc_id").distinct().count() == incIds)
      // a matched row's (doc, dup_of, jaccard) must be a verified pair of
      // the full symmetric pass, with the corpus doc outside the increment
      val full = DedupOps.minhashLsh(spark, sfSmoke, threshold = 0.5)
        .collect().map(r => (Set(r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      inc.where(!col("is_new")).collect().foreach { r =>
        val (d, dup, j) = (r.getLong(0), r.getLong(2), r.getDouble(3))
        assert(dup % 10 != 0, s"dup_of $dup is itself an increment doc")
        assert(full.get(Set(d, dup)).contains(j),
          s"($d, $dup, $j) is not a verified pair of the full pass")
      }
      // an is_new doc has NO cross-set pair in the full pass at all
      val newIds = inc.where(col("is_new")).collect().map(_.getLong(0)).toSet
      full.keys.foreach { pair =>
        val crossInc = pair.filter(_ % 10 == 0)
        if (crossInc.size == 1) // one increment, one corpus side
          assert(!newIds.contains(crossInc.head),
            s"doc ${crossInc.head} marked new but pairs in the full pass")
      }
    } finally inc.unpersist()
  }

  // containment fixture: doc 2 is a verbatim prefix quote of doc 1 —
  // the shape Jaccard structurally misses (J = |A|/|B| when A ⊂ B).
  private lazy val cdir = tempDataDir(
    "documents" -> Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away", "en", "web", 61L),
      (2L, "the quick brown fox jumps over", "en", "web", 30L),
      (3L, "completely different content about spark query engines, nothing shared here at all", "en", "web", 83L),
      // doc 4: identical shingle set to doc 1 — MUTUAL containment
      (4L, "the quick brown fox jumps over the lazy dog and runs far away", "en", "web", 61L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))

  test("containment catches the quoted-subset pair jaccard misses") {
    val c = DedupOps.containmentPairs(spark, cdir, threshold = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // doc 2's 4 shingles all sit inside doc 1's 11 → C(2→1) = 1.0,
    // ordered: the reverse direction (11 shingles, 4 shared) is 4/11.
    assert(c.get((2L, 1L)).contains(1.0))
    assert(!c.contains((1L, 2L)))
    assert(!c.keys.exists(p => p._1 == 3L || p._2 == 3L))
    // the same pair is invisible to Jaccard at its threshold:
    // J(1,2) = 4 / (11 + 4 − 4) = 0.36.
    val j = DedupOps.jaccardPairs(spark, cdir, threshold = 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!j.contains((1L, 2L)) && !j.contains((2L, 1L)))
  }

  test("containment keepers: supersets survive, mutual groups keep the lowest id") {
    val out = DedupOps.containmentKeepers(spark, cdir, threshold = 0.8).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    // doc 2 (the quote) drops for its superset; which of the two equal
    // supersets wins the argmax is the lower id at equal containment
    assert(out(2L) == (false, Some(1L)))
    // docs 1 and 4 are mutually contained: first-wins keeps 1, drops 4
    assert(out(1L)._1 && out(4L) == (false, Some(1L)))
    // the unrelated doc is untouched
    assert(out(3L) == (true, None))
    assert(out.size == 4)
  }

  test("containment prefix filter is recall-lossless vs the full inverted-index join") {
    import org.apache.spark.sql.functions._
    val corpus = "/root/testdata/sf0.001"
    val t = 0.7
    val sh = TextOps.shingleSet(spark, corpus)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val truth = sh.as("x").join(sh.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") =!= col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.as("za"), col("doc_a") === col("za.doc_id"))
      .where(expr(s"CAST(shared AS DOUBLE) / za.n >= $t"))
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaPrefix = DedupOps.containmentPairs(spark, corpus, threshold = t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaPrefix == truth)
  }

  test("simhash: identical shingle sets get identical signatures (hamming 0)") {
    val pairs = DedupOps.simhashPairs(spark, dir, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number]("hamming").intValue))
    val h13 = pairs.find(p => p._1 == 1L && p._2 == 3L)
    assert(h13.nonEmpty && h13.get._3 == 0)
  }

  test("clustering is transitive: A≈B and B≈C collapse into one cluster") {
    // docs 1,2,3 are pairwise near-dups (1-3 identical, 2 one word off):
    // whatever pairs LSH emits, the component must unify under min id 1.
    val out = DedupOps.clusters(spark, dir, threshold = 0.5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == (1L, true))
    assert(out(3L)._1 == 1L && !out(3L)._2) // clustered under 1, not a keeper
    assert(out(4L) == (4L, true)) // singleton keeps itself
    assert(out(5L) == (5L, true))
  }

  test("language-ID: CJK routes to zh, English stopwords to en") {
    val out = TextOps.langId(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(5L) == "zh")
    assert(out(1L) == "en")
  }

  test("token counts and quality signals") {
    val r = TextOps.textStats(spark, dir).where($"doc_id" === 1L).head()
    assert(r.getInt(1) == 13) // n_tokens
    assert(r.getInt(4) == 0)  // no punctuation
    assert(r.getDouble(5) > 0.2) // 'the' ×2 + 'and' of 13 tokens
  }

  test("tf-idf surfaces document-specific terms over corpus-common ones") {
    val top = TextOps.tfidfTopTerms(spark, dir, k = 2).collect()
      .groupBy(_.getLong(0)).map { case (d, rs) => d -> rs.map(_.getString(2)).toSet }
    // 'dog' appears in docs 1,3 (df=2); 'the' is in 4 of 5 docs (df=4):
    // doc 1's top terms must prefer rarer terms over 'the' at equal tf…
    // and 'cat' (df=1) must be a top term of doc 2.
    assert(top(2L).contains("cat"))
    // CJK doc: its terms are unique to it (df=1) → all score highest.
    assert(top(5L).nonEmpty)
  }

  test("length stats: exact quartiles and mean per (lang, source)") {
    val r = TextOps.lengthStats(spark, dir).where($"lang" === "en").head()
    // en docs in the fixture: n_chars 61, 62, 83 (docs 1,3,4... doc2 also en: 61)
    assert(r.getLong(2) == 4L) // n_docs
    val med = r.getDouble(6)
    assert(med >= 61.0 && med <= 83.0)
    assert(r.getDouble(8) > 0) // mean
  }

  test("token commonness: shared-vocabulary docs score higher than unique-vocabulary docs") {
    val c = TextOps.tokenCommonness(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    // docs 1/3 are exact duplicates: identical profiles
    assert(c(1L) == c(3L))
    // the CJK doc shares no tokens with anything → every token df 1
    assert(c(5L)._1 == 1.0 && c(5L)._2 == 1.0)
    // near-dup docs (1,2) read more like the corpus than the CJK outlier
    assert(c(1L)._1 > c(5L)._1)
    // oov_frac is a fraction; mean df is bounded by the corpus size
    c.values.foreach { case (m, o) =>
      assert(m >= 1.0 && m <= 5.0 && o >= 0.0 && o <= 1.0)
    }
  }

  test("corpus profile: margins reaggregate consistently across the cube") {
    val prof = TextOps.corpusProfile(spark, dir).collect()
    val grand = prof.filter(_.getAs[Int]("gid") == 3)
    assert(grand.length == 1 && grand.head.getAs[Long]("n_docs") == 5L)
    // per-lang margin sums to the grand total
    val perLang = prof.filter(_.getAs[Int]("gid") == 1)
    assert(perLang.map(_.getAs[Long]("n_docs")).sum == 5L)
    assert(perLang.map(_.getAs[Long]("total_tokens")).sum ==
      grand.head.getAs[Long]("total_tokens"))
    // finest grain: en/web holds 4 docs, zh/web 1
    val fine = prof.filter(_.getAs[Int]("gid") == 0)
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_docs")).toMap
    assert(fine(("en", "web")) == 4L && fine(("zh", "web")) == 1L)
  }

  test("fingerprint is deterministic and text-sensitive") {
    val fp = TextOps.fingerprint(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // Unrelated content → disjoint gram sets → different min-hashes.
    // (A one-word edit may legitimately keep the same min — that
    // robustness is the point of min-hash fingerprints.)
    assert(fp(1L) != fp(4L))
    val again = TextOps.fingerprint(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(fp == again)
  }

  test("cluster-size histogram conserves documents and matches the assignment") {
    import org.apache.spark.sql.functions.{col, lit, sum}
    val hist = DedupOps.clusterSizeHistogram(spark, sfSmoke)
    val docs = TextOps.docs(spark, sfSmoke).count()
    // sum of size × count over the histogram = every document once
    val covered = hist.agg(sum(col("cluster_size") * col("n_clusters")))
      .collect().head.getLong(0)
    assert(covered == docs)
    // cluster count in the histogram equals distinct clusters assigned
    val nClusters = hist.agg(sum("n_clusters")).collect().head.getLong(0)
    assert(nClusters ==
      DedupOps.clusters(spark, sfSmoke).select("cluster").distinct().count())
  }
}
