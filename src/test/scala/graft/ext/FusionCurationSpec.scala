package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The round-8 curation trio: Cohen's kappa on planted confusion
  * matrices, RRF fusion re-derived from its two input rankings, and
  * distribution-matching rates on a planted two-corpus mix. Exact
  * end-to-end values on the real corpus are pinned by the DuckDB twins
  * (`ext_label_agreement`, `ext_sim_rrf`, `ext_sample_match_dist`). */
class FusionCurationSpec extends SparkSpec {
  import spark.implicits._

  test("kappa: perfect agreement scores exactly 10^6") {
    val preds = Seq.fill(30)(("en", "en")) ++ Seq.fill(10)(("de", "de"))
    val r = TextOps.labelAgreementOf(preds.toDF("lang", "pred_lang")).collect()(0)
    assert(r.getLong(0) == 40L && r.getLong(1) == 40L)
    assert(r.getLong(4) == 1000000L)
  }

  test("kappa: hand-computed 2x2 case, chance-corrected below raw accuracy") {
    // 40 en->en, 10 de->de, 10 de->en: po=50/60, pe=(40*50+20*10)/3600
    val preds = Seq.fill(40)(("en", "en")) ++ Seq.fill(10)(("de", "de")) ++
      Seq.fill(10)(("de", "en"))
    val r = TextOps.labelAgreementOf(preds.toDF("lang", "pred_lang")).collect()(0)
    assert(r.getLong(0) == 60L && r.getLong(1) == 50L)
    assert(r.getLong(2) == 833333L, "po_ppm = floor(1e6*50/60)")
    assert(r.getLong(3) == 611111L, "pe_ppm = floor(1e6*2200/3600)")
    assert(r.getLong(4) == 571428L, "kappa_ppm = floor(1e6*800/1400)")
    assert(r.getLong(4) < r.getLong(2), "kappa sits below raw agreement")
  }

  test("krippendorff alpha: perfect panels score 10^6, textbook zero case reads zero") {
    // three raters, full agreement on every unit
    val perfect = (0L until 20L).flatMap(u =>
      Seq.fill(3)((u, (u % 3).toInt))).toDF("doc_id", "cat")
    val p = TextOps.alphaOf(perfect).collect()(0)
    assert(p.getLong(0) == 20L && p.getLong(1) == 60L)
    assert(p.getLong(2) == 0L, "Do = 0 under perfect agreement")
    assert(p.getLong(4) == 1000000L)
    // textbook zero: u1 {0,0}, u2 {0,1} -> W=4, n=4, E=6, alpha = 0/12
    val zero = Seq((1L, 0), (1L, 0), (2L, 0), (2L, 1)).toDF("doc_id", "cat")
    val z = TextOps.alphaOf(zero).collect()(0)
    assert(z.getLong(0) == 2L && z.getLong(1) == 4L)
    assert(z.getLong(2) == 500000L && z.getLong(3) == 500000L)
    assert(z.getLong(4) == 0L)
  }

  test("krippendorff alpha: missing ratings — singleton units carry no pair") {
    // u1 rated by all 3 (agreeing), u2 by 2 (agreeing), u3 by ONE rater
    // (must drop: a lone rating has no coincidence) — and a disagreeing
    // mixed-size pair to keep alpha strictly inside (0, 1)
    val ratings = (Seq.fill(3)((1L, 0)) ++ Seq.fill(2)((2L, 1)) ++
      Seq((3L, 2)) ++ Seq((4L, 0), (4L, 1), (4L, 1))).toDF("doc_id", "cat")
    val r = TextOps.alphaOf(ratings).collect()(0)
    // units kept: 1 (m=3), 2 (m=2), 4 (m=3); unit 3 dropped
    assert(r.getLong(0) == 3L && r.getLong(1) == 8L)
    // W = 2*0/2 + 2*0/1 + 2*(9-5)/2 = 4; E = 64 - (16+16+0) = 32
    // alpha = (64 - 7*4)/64 = 36/64
    assert(r.getLong(4) == 562500L)
    assert(r.getLong(4) > 0L && r.getLong(4) < 1000000L)
  }

  test("calibration: perfect scores read zero ECE, inverted scores read the full gap") {
    // perfectly calibrated: in each decile bin, accuracy == confidence
    // (conf 250000 -> 1 of 4 correct; conf 750000 -> 3 of 4)
    val calibrated =
      (Seq.fill(1)((250000L, true)) ++ Seq.fill(3)((250000L, false)) ++
        Seq.fill(3)((750000L, true)) ++ Seq.fill(1)((750000L, false)))
        .toDF("conf_ppm", "correct")
    val good = TextOps.calibrationOf(calibrated).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(good(2) == ((4L, 250000L, 250000L, 0L, 0L)))
    assert(good(7) == ((4L, 750000L, 750000L, 0L, 0L)))
    // anti-calibrated: fully confident and always wrong
    val bad = TextOps.calibrationOf(
        Seq.fill(5)((1000000L, false)).toDF("conf_ppm", "correct"))
      .collect()
    assert(bad.length == 1)
    // conf 1e6 folds into bin 9 (least(9, .)), gap and ECE read the
    // full 1e6 miscalibration
    assert(bad(0).getInt(0) == 9 && bad(0).getLong(4) == 1000000L &&
      bad(0).getLong(5) == 1000000L)
  }

  test("rrf fusion equals the fold of its two input rankings") {
    val pool = SimilarityOps.RrfPool
    val exact = SimilarityOps.bruteForceTopK(spark, sfSmoke, pool, 8)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("re"))
    val proj = VectorOps.projectedRanking(spark, sfSmoke, pool, 8)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("rp"))
    val expected = exact.join(proj, Seq("query_id", "neighbor_id"), "full_outer")
      .withColumn("score",
        coalesce(expr("1000000000 div (60 + re)"), lit(0L)) +
          coalesce(expr("1000000000 div (60 + rp)"), lit(0L)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("score"))
      .toMap
    val fused = SimilarityOps.rrfFusion(spark, sfSmoke).collect()
    assert(fused.length == 8 * SimilarityOps.RrfTopK)
    fused.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(expected(key) == r.getLong(3),
        s"fused score mismatch at $key")
    }
    // within each query the emitted ranks follow (score desc, id asc)
    fused.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getInt(1))
      val resorted = rows.sortBy(r => (-r.getLong(3), r.getLong(2)))
      assert(ordered.map(_.getLong(2)).toSeq == resorted.map(_.getLong(2)).toSeq)
    }
    // and the fused top set is drawn only from the two pools
    val poolSet = (exact.collect().map(r => (r.getLong(0), r.getLong(1))) ++
      proj.collect().map(r => (r.getLong(0), r.getLong(1)))).toSet
    fused.foreach(r => assert(poolSet.contains((r.getLong(0), r.getLong(2)))))
  }

  test("bm25: rare-term match outranks common-term match; repetition saturates; length penalizes") {
    // query doc 0 carries both terms; docs 10/11 are the SAME length
    // with one hit each — only idf separates them (df(rare)=2 <
    // df(common)=4); doc 12 repeats "common" 20x; doc 13 has 11's tf
    // in 4x the length
    val corpus = Seq(
      (0L, "rare common filler"),
      (10L, "rare pad1 pad2 pad3"),
      (11L, "common pd1 pd2 pd3"),
      (12L, (1 to 20).map(_ => "common").mkString(" ")),
      (13L, "common " + (1 to 15).map(i => s"q$i").mkString(" ")))
    val res = TextOps.bm25TopKOf(corpus.toDF("doc_id", "text"), 10, 1)
      .collect().map(r => r.getLong(2) -> (r.getInt(1), r.getLong(3))).toMap
    // idf ordering at equal tf and length: the rarer term's hit wins
    assert(res(10L)._2 > res(11L)._2, s"idf must order equal-length hits: $res")
    // 20 repetitions beat one hit but saturate far below 20x
    assert(res(12L)._2 > res(11L)._2)
    assert(res(12L)._2 < 3L * res(11L)._2,
      s"tf must saturate: ${res(12L)._2} vs ${res(11L)._2}")
    // same tf in a 4x longer document scores lower
    assert(res(13L)._2 < res(11L)._2, s"length must penalize: $res")
  }

  test("bm25 df-cap: a hot term never nominates candidates but still scores them") {
    // planted stopword "the" (hot — df·4 > n); query doc 0 has four
    // matchable (df ≥ 2) terms q1..q4 all rarer than the stopword, so
    // the essential-list floor covers exactly them and NOT "the".
    // doc 20 shares ONLY the stopword with the query → unretrievable
    // by construction; docs 10/11 share cold q1 at identical tf and
    // length, but 10 also shares the stopword — its score must be
    // STRICTLY higher, proving the hot term still contributes to
    // nominated pairs.
    val corpus = Seq(
      (0L, "q1 q2 q3 q4 the"),
      (10L, "q1 the x1 x2"),
      (11L, "q1 y1 y2 y3"),
      (12L, "q2 a1 a2 a3"),
      (13L, "q3 b1 b2 b3"),
      (14L, "q4 c1 c2 c3"),
      (20L, "the z1 z2 z3")) ++
      (100L until 139L).map(i => (i, s"the u${i}a u${i}b u${i}c"))
    val res = TextOps.bm25TopKOf(corpus.toDF("doc_id", "text"), 50, 1)
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(!res.contains(20L),
      s"stopword-only match must not be nominated: $res")
    assert(!(100L until 139L).exists(res.contains),
      "filler docs share only the stopword and must not appear")
    assert(res.contains(10L) && res.contains(11L))
    assert(res(10L) > res(11L),
      s"the hot term must still score nominated pairs: $res")
  }

  test("bm25: hand-computed contribution on a two-doc corpus") {
    // corpus: query "a", candidate "a b" — N=2, df(a)=2, tf=1, dl=2,
    // avgdl=1.5 (dl: query 1, cand 2)
    val corpus = Seq((0L, "a"), (1L, "a b"))
    val r = TextOps.bm25TopKOf(corpus.toDF("doc_id", "text"), 10, 1).collect()
    assert(r.length == 1)
    val idf = (2.0 - 2.0 + 0.5) / (2.0 + 0.5) + 1.0
    val sat = (1.0 * 2.2) / (1.0 + 1.2 * (0.25 + 0.75 * (2.0 / 1.5)))
    assert(r(0).getLong(3) == math.floor(1000000 * (idf * sat)).toLong)
  }

  test("hybrid fusion equals rrf of its two legs over the document-backed universe") {
    val pool = SimilarityOps.RrfPool
    val hybrid = SimilarityOps.hybridFusion(spark, sfSmoke).collect()
    assert(hybrid.nonEmpty)
    val docIds = TextOps.docs(spark, sfSmoke)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    hybrid.foreach(r => assert(docIds.contains(r.getLong(2)),
      "hybrid neighbor outside the document-backed universe"))
    // every fused score is the fold of the two leg ranks it reports
    hybrid.foreach { r =>
      val rd = Option(r.get(4)).map(_ => 1000000000L / (60 + r.getInt(4))).getOrElse(0L)
      val rl = Option(r.get(5)).map(_ => 1000000000L / (60 + r.getInt(5))).getOrElse(0L)
      assert(r.getLong(3) == rd + rl)
    }
    // the lexical leg really contributes: at least one fused row carries
    // a BM25 rank (the legs are not accidentally identical)
    assert(hybrid.exists(r => !r.isNullAt(5)))
    assert(hybrid.exists(r => !r.isNullAt(4)))
  }

  test("distribution matching: cap at 1, planted thinning rate, A-absent bucket dropped") {
    // ref (src0, len 4): 4 docs of 50 chars + 4 of 150; new crawl
    // (src10): 2 of 50, 6 of 150, 2 of 450 (a bucket the reference lacks)
    val docs =
      (0L to 3L).map(id => (id, "src0", 50L)) ++
        (4L to 7L).map(id => (id, "src0", 150L)) ++
        (10L to 11L).map(id => (id, "src10", 50L)) ++
        (12L to 17L).map(id => (id, "src10", 150L)) ++
        (18L to 19L).map(id => (id, "src10", 450L))
    val res = SampleOps.matchDistributionOf(
        docs.toDF("doc_id", "source", "n_chars"))
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getLong(3)))
      .toMap
    // under-represented bucket: rate capped at 1e6, every doc kept
    assert(Seq(10L, 11L).forall(id => res.get(id).contains(("0-100", 1000000L))))
    // bucket absent from the reference: rate 0, nothing kept
    assert(Seq(18L, 19L).forall(id => !res.contains(id)))
    // over-represented bucket: rate floor(1e6*500000/600000), kept set
    // is exactly the salted-hash rule replayed
    val kept150 = res.collect { case (id, ("101-200", r)) => assert(r == 833333L); id }.toSet
    val byHash = (12L to 17L).toDF("doc_id")
      .withColumn("h", TextOps.h32(concat(lit("match:"), col("doc_id").cast("string"))))
      .where(col("h") % 1000000L < 833333L)
      .collect().map(_.getLong(0)).toSet
    assert(kept150 == byHash)
  }
}
