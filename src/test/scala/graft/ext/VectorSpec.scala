package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quantization and k-means invariants; exact values are pinned by the
  * DuckDB oracle twins (`ext_embed_quantize`, `ext_kmeans_refine`). */
class VectorSpec extends SparkSpec {

  test("int8 quantization stays in range and reconstructs within scale/2") {
    val qs = VectorOps.quantizeSummary(spark, sfSmoke).cache()
    try {
      assert(qs.count() == SimilarityOps.embeddings(spark, sfSmoke).count())
      assert(qs.where(col("q_max") > VectorOps.QMax ||
        col("q_min") < -VectorOps.QMax).count() == 0)
      // symmetric rounding: |q_i*scale - x_i| <= scale/2 (+ float slack)
      assert(qs.where(col("max_abs_err") >
        col("scale") / 2 + lit(1e-12)).count() == 0)
      // a vector achieving max|x| quantizes that slot to exactly +/-127
      assert(qs.where(col("q_max") === VectorOps.QMax ||
        col("q_min") === -VectorOps.QMax).count() == qs.count())
    } finally qs.unpersist()
  }

  test("matryoshka eval: full-dim control reads exactly 1.0, truncation is lossy, bounds hold") {
    val m = VectorOps.matryoshkaEval(spark, sfSmoke).cache()
    try {
      val rows = m.collect().map(r =>
        r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(rows.keySet == VectorOps.MatryoshkaDims.toSet)
      // the ground-truth leg compared against itself must be perfect —
      // anything else means the harness measures its own noise
      assert(rows(VectorOps.MatryoshkaDims.max)._2 == 1.0)
      // isotropic corpus: an 8/64 prefix cannot preserve the ranking
      assert(rows(VectorOps.MatryoshkaDims.min)._2 < 1.0)
      val denom = math.min(
        SimilarityOps.embeddings(spark, sfSmoke).count(),
        VectorOps.MatryoshkaQueries.toLong) * VectorOps.MatryoshkaK
      assert(rows.values.forall { case (h, r) =>
        h >= 0 && h <= denom && r >= 0.0 && r <= 1.0 })
    } finally m.unpersist()
  }

  test("diversity sample: quotas proportional and filled, no duplicates, big cells never starve") {
    val s = VectorOps.diversitySample(spark, sfSmoke).cache()
    try {
      val n = SimilarityOps.embeddings(spark, sfSmoke).count()
      val k = VectorOps.DiversityK
      // every emitted quota is the floor-proportional one and is FILLED
      val perCell = s.groupBy("cent_id", "n_cell", "quota")
        .agg(count(lit(1)).as("picks"), max("pick_rank").as("maxr")).collect()
      for (r <- perCell) {
        val (nc, q, picks, maxr) =
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4).toLong)
        assert(q == k * nc / n && picks == q && maxr == q)
      }
      // floor allocation: total ≤ k, one pick per vector, non-empty
      assert(s.count() <= k && s.count() > 0)
      assert(s.select("vec_id").distinct().count() == s.count())
    } finally s.unpersist()
  }

  test("embed drift: halves conserve the corpus, ppm bounded, shift is the absolute gap") {
    val d = VectorOps.embedDrift(spark, sfSmoke).cache()
    try {
      val n = SimilarityOps.embeddings(spark, sfSmoke).count()
      val sums = d.agg(sum("n_ref"), sum("n_cur")).head()
      assert(sums.getLong(0) == n / 2 && sums.getLong(1) == n - n / 2)
      assert(d.where(col("ppm_ref") < 0 || col("ppm_ref") > 1000000 ||
        col("ppm_cur") < 0 || col("ppm_cur") > 1000000).count() == 0)
      assert(d.where(col("ppm_shift") =!=
        abs(col("ppm_ref") - col("ppm_cur"))).count() == 0)
      // the trained router has more than one populated cell — a
      // single-cell binning would make the monitor blind
      assert(d.count() > 1)
    } finally d.unpersist()
  }

  test("Lloyd refinement conserves members and emits full centroid vectors") {
    val cents = VectorOps.kmeansRefine(spark, sfSmoke).cache()
    try {
      val n = SimilarityOps.embeddings(spark, sfSmoke).count()
      // per coordinate slice, membership sums to the corpus size
      val perPos = cents.groupBy("pos").agg(sum("n_members").as("m"))
        .select("m").distinct().collect().map(_.getLong(0)).toSet
      assert(perPos == Set(n))
      // every surviving centroid is a full dim-64 vector
      val dims = cents.groupBy("cent_id").agg(count(lit(1)).as("d"),
        min("pos").as("lo"), max("pos").as("hi"))
      assert(dims.where(col("d") =!= 64 || col("lo") =!= 1 || col("hi") =!= 64).count() == 0)
      // centroid coordinates are means of int8 codes: inside [-127, 127]
      assert(cents.where(abs(col("c_val")) > VectorOps.QMax).count() == 0)
      // determinism: recomputation is row-identical (argmin ties broken)
      assert(cents.collect().toSeq ===
        VectorOps.kmeansRefine(spark, sfSmoke).collect().toSeq)
    } finally cents.unpersist()
  }

  test("IVF over trained centroids returns well-formed per-query top-k with real recall") {
    val ann = VectorOps.ivfKmeansTopK(spark, sfSmoke).cache()
    try {
      // contiguous ranks from 1, no self-matches, scores non-increasing
      val shape = ann.groupBy("query_id").agg(
        min("rank").as("lo"), max("rank").as("hi"), count(lit(1)).as("c"))
      assert(shape.where(col("lo") =!= 1 || col("hi") =!= col("c")).count() == 0)
      assert(ann.where(col("query_id") === col("neighbor_id")).count() == 0)
      val misordered = ann.as("a").join(ann.as("b"),
          col("a.query_id") === col("b.query_id") &&
            col("a.rank") < col("b.rank") && col("a.score") < col("b.score"))
        .count()
      assert(misordered == 0)
      // recall sanity vs the exact baseline: the trained coarse
      // quantizer must find a decent share of true rank-1 neighbors
      val truth = SimilarityOps.bruteForceTopK(spark, sfSmoke, k = 1, nQueries = 8)
        .select(col("query_id"), col("neighbor_id").as("true_nn"))
      val hits = truth.join(ann, Seq("query_id"))
        .where(col("neighbor_id") === col("true_nn"))
        .select("query_id").distinct().count()
      assert(hits >= 4, s"recall@3 of true NN for the 8 probe queries: $hits/8")
    } finally ann.unpersist()
  }

  test("quantized-scoring ANN tracks the exact cosine within the int8 error budget") {
    val ann = VectorOps.quantizedLshTopK(spark, sfSmoke).cache()
    try {
      // ranks contiguous, ordered by the quantized score
      val shape = ann.groupBy("query_id").agg(
        min("rank").as("lo"), max("rank").as("hi"), count(lit(1)).as("c"))
      assert(shape.where(col("lo") =!= 1 || col("hi") =!= col("c")).count() == 0)
      val misordered = ann.as("a").join(ann.as("b"),
          col("a.query_id") === col("b.query_id") &&
            col("a.rank") < col("b.rank") && col("a.qscore") < col("b.qscore"))
        .count()
      assert(misordered == 0)
      // int8 scoring stays close to the float cosine it approximates
      // (measured max ~3.5e-3 on the testdata; budget 10x)
      assert(ann.where(abs(col("qscore") - col("cos")) > 0.01).count() == 0)
    } finally ann.unpersist()
  }

  test("hard negatives sit below the dup threshold yet above the pool floor") {
    val hn = VectorOps.hardNegatives(spark, sfSmoke).cache()
    try {
      val rows = hn.collect()
      assert(rows.nonEmpty)
      // every negative is sub-threshold (not a near-dup) and self-free
      rows.foreach { r =>
        assert(r.getDouble(3) < VectorOps.SemTau)
        assert(r.getLong(2) != r.getLong(0))
        assert(r.getInt(1) >= 1 && r.getInt(1) <= 3)
      }
      // "hard": each negative must come from the query's top-10 pool —
      // its score is >= the pool's 10th-best score
      val pool = SimilarityOps.bruteForceTopK(spark, sfSmoke, k = 10)
        .collect().groupBy(_.getLong(0))
      rows.groupBy(_.getLong(0)).foreach { case (q, negs) =>
        val poolScores = pool(q).map(r => r.getLong(2) -> r.getDouble(3)).toMap
        negs.foreach { n =>
          assert(poolScores.contains(n.getLong(2)),
            s"negative ${n.getLong(2)} for query $q is not in the candidate pool")
        }
      }
    } finally hn.unpersist()
  }

  test("kNN eval: every vector classified once, votes reconcile, domain closed") {
    val out = VectorOps.knnEval(spark, sfSmoke).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val labels = SimilarityOps.embeddings(spark, sfSmoke)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    // confusion matrix covers the whole corpus exactly once
    assert(out.map(_._3).sum == labels.length.toLong)
    // row sums equal the true per-label counts
    val byLabel = labels.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    out.groupBy(_._1).foreach { case (l, cells) =>
      assert(cells.map(_._3).sum == byLabel(l), s"label $l row sum")
    }
    // predictions stay inside the label domain
    val domain = byLabel.keySet
    assert(out.forall(c => domain.contains(c._2)))
    // deterministic: a second run is identical (tie-breaks are total)
    val again = VectorOps.knnEval(spark, sfSmoke).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq == again.toSeq)
  }

  test("PQ: valid PqM-byte codes, ADC distances rebuild from the codebook exactly") {
    val cb = VectorOps.pqCodebooks(spark, sfSmoke)
      .collect()
      .map(r => ((r.getInt(0), r.getLong(1).toInt),
        r.getSeq[Double](r.fieldIndex("cv")).toArray))
      .toMap
    // every vector carries exactly PqM codes, each naming a live centroid
    val codes = VectorOps.pqCodes(spark, sfSmoke).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).map(_.toInt)).toMap
    assert(codes.nonEmpty)
    codes.values.foreach { cs =>
      assert(cs.length == VectorOps.PqM)
      cs.zipWithIndex.foreach { case (c, sub) =>
        assert(cb.contains((sub, c)), s"code ($sub, $c) names no trained centroid")
      }
    }
    // ADC output: ranks 1..k, and the distance reassembles bit-exactly from
    // the stored artifacts (quantized query subvectors vs coded centroids)
    val quant = VectorOps.withQuantized(SimilarityOps.embeddings(spark, sfSmoke))
      .select(col("vec_id"), col("q")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    val top = VectorOps.pqTopK(spark, sfSmoke).collect()
    assert(top.nonEmpty)
    top.foreach { r =>
      val (qid, rank, nid, d2) =
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))
      assert(rank >= 1 && rank <= 3 && nid != qid && d2 >= 0.0)
      val rebuilt = (0 until VectorOps.PqM).foldLeft(0.0) { (acc, sub) =>
        val cv = cb((sub, codes(nid)(sub)))
        val qs = quant(qid).slice(sub * VectorOps.PqSubDim, (sub + 1) * VectorOps.PqSubDim)
        acc + qs.zip(cv).foldLeft(0.0) { case (a, (x, y)) =>
          a + (x.toDouble - y) * (x.toDouble - y)
        }
      }
      assert(rebuilt == d2, s"ADC distance for ($qid, $nid) drifted: $rebuilt vs $d2")
    }
  }

  test("IVF+PQ: candidates come only from probed cells, final cosines are exact") {
    val out = VectorOps.ivfPqTopK(spark, sfSmoke).collect()
    assert(out.nonEmpty)
    // coarse routing: every neighbor's cell must be among its query's
    // probed cells (the IVF contract — ADC never sees other cells)
    // the same √n-cell router + probe width ivfPqTopK now defaults to
    val kc = VectorOps.scaledKCent(
      SimilarityOps.embeddings(spark, sfSmoke).count())
    val assign = VectorOps.kmeansAssign(spark, sfSmoke,
        nProbe = VectorOps.IvfPqNProbe, kCent = kc)
      .select("vec_id", "crank", "cent_id").collect()
      .map(r => (r.getLong(0), r.getAs[Number]("crank").intValue) ->
        r.getAs[Number]("cent_id").longValue).toMap
    val cellOf = assign.collect { case ((v, 1), c) => v -> c }
    val probesOf = assign.keys.map(_._1).toSet.map { (v: Long) =>
      v -> assign.collect { case ((`v`, _), c) => c }.toSet
    }.toMap
    // exact re-rank: the emitted cosine equals the float-exact left-fold
    // cosine of the original embeddings (approximate ADC arithmetic must
    // not leak into the output scores)
    val emb = SimilarityOps.embeddings(spark, sfSmoke)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dotd(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    val byQuery = out.groupBy(_.getLong(0))
    byQuery.foreach { case (qid, rows) =>
      val ranks = rows.map(_.getInt(1)).sorted
      assert(ranks.toSeq == (1 to rows.length), s"ranks not contiguous for $qid")
      var prev = Double.MaxValue
      rows.sortBy(_.getInt(1)).foreach { r =>
        val (nid, cos) = (r.getLong(2), r.getDouble(3))
        assert(nid != qid)
        assert(probesOf(qid).contains(cellOf(nid)),
          s"neighbor $nid of query $qid sits in an unprobed cell")
        val exact = dotd(emb(qid), emb(nid)) /
          (math.sqrt(dotd(emb(qid), emb(qid))) * math.sqrt(dotd(emb(nid), emb(nid))))
        assert(cos == exact, s"cos for ($qid, $nid) is not the exact cosine")
        assert(cos <= prev, s"cosines not descending for $qid")
        prev = cos
      }
    }
  }

  test("semantic dedup keeps the canonical copy and only drops true near-dups") {
    val out = VectorOps.semanticDedup(spark, sfSmoke).cache()
    try {
      val n = SimilarityOps.embeddings(spark, sfSmoke).count()
      assert(out.count() == n) // one verdict per vector
      // keep <=> no dominating pair; max_cos present exactly when dominated
      assert(out.where(col("keep") && col("n_sem_dups") =!= 0).count() == 0)
      assert(out.where(!col("keep") && (col("max_cos").isNull ||
        col("max_cos") < VectorOps.SemTau)).count() == 0)
      // every cell retains its lowest surviving id: the minimum vec_id
      // of a cell can never be dominated (no lower id exists)
      val minPerCell = out.groupBy("cell").agg(min("vec_id").as("lo"))
      assert(out.join(minPerCell, out("vec_id") === minPerCell("lo"))
        .where(!col("keep")).count() == 0)
      // drops are a subset of GLOBAL threshold pairs: any dominated
      // vector really has a lower-id near-dup at >= tau (cluster
      // bounding may miss pairs, never invent them)
      val e = SimilarityOps.withNorm(SimilarityOps.embeddings(spark, sfSmoke))
      val global = e.as("a").join(e.as("b"), col("b.vec_id") < col("a.vec_id"))
        .withColumn("cos", expr(
          SimilarityOps.cosExpr("a.embedding", "b.embedding", "a.norm", "b.norm")))
        .where(col("cos") >= VectorOps.SemTau)
        .select(col("a.vec_id").as("vec_id")).distinct()
      val phantom = out.where(!col("keep"))
        .join(global, Seq("vec_id"), "left_anti").count()
      assert(phantom == 0)
    } finally out.unpersist()
  }

  test("semantic dedup drops a planted exact duplicate vector") {
    import spark.implicits._
    // an exact copy ties every centroid distance, so both land in the
    // same cell deterministically — the planted dup MUST be dropped
    val e = SimilarityOps.embeddings(spark, sfSmoke)
    val dupOf = e.orderBy("vec_id").limit(1)
      .select(lit(100000L).as("vec_id"), col("embedding"), lit(99).as("label"))
    val dir = tempDataDir("embeddings" -> e.unionByName(dupOf))
    val out = VectorOps.semanticDedup(spark, dir)
    val planted = out.where(col("vec_id") === 100000L).collect()
    assert(planted.length == 1 && !planted(0).getAs[Boolean]("keep"))
    assert(planted(0).getAs[Double]("max_cos") > 0.999999)
  }

  test("refined centroids reduce within-cluster distance vs the seed assignment") {
    // the Lloyd property that makes the refinement worth running:
    // total within-cluster squared distance does not increase
    import org.apache.spark.sql.DataFrame
    def totalD2(cents: DataFrame): Double = {
      val q = VectorOps.withQuantized(SimilarityOps.embeddings(spark, sfSmoke))
        .select(col("vec_id"), col("q"))
      q.join(broadcast(cents))
        .withColumn("d2", expr(
          "aggregate(zip_with(q, cv, (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), " +
            "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"))
        .groupBy("vec_id").agg(min("d2").as("best"))
        .agg(sum("best")).collect()(0).getDouble(0)
    }
    val seed = VectorOps.withQuantized(SimilarityOps.embeddings(spark, sfSmoke))
      .where(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"),
        expr("transform(q, x -> CAST(x AS DOUBLE))").as("cv"))
    val refined = VectorOps.kmeansRefine(spark, sfSmoke)
      .groupBy("cent_id")
      .agg(expr("transform(array_sort(collect_list(struct(pos, c_val))), s -> s.c_val)").as("cv"))
    assert(totalD2(refined) <= totalD2(seed))
  }

  test("sign projection: exact alternating sums, full coverage, fixed matrix") {
    val pc = VectorOps.projectedCoords(spark, sfSmoke).cache()
    try {
      val n = SimilarityOps.embeddings(spark, sfSmoke).count()
      // every vector gets all RpDim coordinates
      assert(pc.count() == n * VectorOps.RpDim)
      assert(pc.groupBy("vec_id").count()
        .where(col("count") =!= VectorOps.RpDim).count() == 0)
      // coordinate 0 of one vector equals the manual alternating sum
      val row0 = SimilarityOps.embeddings(spark, sfSmoke)
        .where(col("vec_id") === 0)
        .select("embedding").collect().head.getSeq[Float](0)
      val expect = row0.zipWithIndex.foldLeft(0.0) { case (acc, (x, i)) =>
        acc + x.toDouble * VectorOps.rpSign(0, i)
      }
      val got = pc.where(col("vec_id") === 0 && col("pos") === 0)
        .collect().head.getDouble(2)
      assert(got == expect, s"proj(0)[0]: got $got expected $expect")
      // the matrix is genuinely mixed-sign (a degenerate all-+1 matrix
      // would make every coordinate the same sum)
      val signs = (0 until VectorOps.RpDim).flatMap(VectorOps.rpRow(_)).toSet
      assert(signs == Set(1, -1))
    } finally pc.unpersist()
  }

  test("projected two-stage ANN: exact scores, bounded recall loss vs brute force") {
    val proj = VectorOps.projectedTopK(spark, sfSmoke, k = 3)
      .select(col("query_id"), col("neighbor_id"), col("score")).cache()
    val brute = SimilarityOps.bruteForceTopK(spark, sfSmoke, k = 3)
      .select(col("query_id"), col("neighbor_id"),
        col("score").as("true_score")).cache()
    try {
      // surviving pairs carry the EXACT cosine (stage 2 re-ranks with
      // full precision — bit-identical to the brute-force score)
      val joined = proj.join(brute, Seq("query_id", "neighbor_id"))
      assert(joined.where(col("score") =!= col("true_score")).count() == 0)
      // recall on the smoke corpus at the default m (isotropic random
      // embeddings — the adversarial case; measured 0.875, pinned with
      // margin)
      val recall = joined.count().toDouble / brute.count()
      assert(recall >= 0.8, s"recall collapsed: $recall")
      // every query answers with exactly k rows
      assert(proj.groupBy("query_id").count().where(col("count") =!= 3).count() == 0)
    } finally { proj.unpersist(); brute.unpersist() }
  }

  test("kmeans quality: distortion matches brute-force sum of squared residuals per cell") {
    val q = VectorOps.kmeansQuality(spark, sfSmoke).cache()
    try {
      assert(q.count() > 0)
      assert(q.where(col("distortion") < 0 || col("separation_d2") <= 0).count() == 0)
      // member conservation against the corpus
      val total = graft.ext.SimilarityOps.embeddings(spark, sfSmoke).count()
      assert(q.agg(sum("n_members")).collect().head.getLong(0) == total)
      // brute force: collect codes + assignment + centroids, sum (x-c)^2
      // directly (accumulation-order rounding only, hence the relative
      // tolerance — the oracle twin pins bit-exactness of the registered
      // sufficient-statistics spelling)
      val cents = VectorOps.kmeansRefine(spark, sfSmoke).collect()
        .groupBy(_.getLong(0))
        .map { case (id, rows) => id -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)) }
      val assign = VectorOps.kmeansAssign(spark, sfSmoke)
        .where(col("crank") === 1)
        .select("vec_id", "cent_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val codes = VectorOps.withQuantized(
          graft.ext.SimilarityOps.embeddings(spark, sfSmoke))
        .select("vec_id", "q").collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      val brute = codes.toSeq.groupBy(t => assign(t._1)).view.mapValues { vs =>
        vs.map { case (vid, xs) =>
          xs.zip(cents(assign(vid))).map { case (x, c) => (x - c) * (x - c) }.sum
        }.sum
      }.toMap
      q.collect().foreach { r =>
        val (cell, d) = (r.getLong(0), r.getDouble(2))
        val b = brute(cell)
        assert(math.abs(d - b) <= 1e-9 * math.max(1.0, math.abs(b)),
          s"distortion mismatch for cell $cell: $d vs $b")
      }
      // a meaningful index separates: every cell's centroid gap exceeds
      // its MEAN per-member distortion on this corpus
      q.collect().foreach { r =>
        assert(r.getDouble(4) > 0)
      }
    } finally q.unpersist()
  }
}
