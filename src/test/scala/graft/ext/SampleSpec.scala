package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the sampling operators' engine-level properties; exact
  * row-level values are pinned by the DuckDB oracle twins. */
class SampleSpec extends SparkSpec {

  test("dataset split covers every document exactly once with sane fractions") {
    val split = SampleOps.datasetSplit(spark, sfSmoke).cache()
    try {
      val total = split.count()
      assert(total == TextOps.docs(spark, sfSmoke).count())
      val byCount = split.groupBy("split").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // hash uniformity sanity: 500 docs, binomial 4σ ≈ ±7 pp on train
      val trainShare = byCount("train") / total.toDouble
      assert(math.abs(trainShare - 0.8) < 0.08, s"train share $trainShare")
      // partition: the three splits' counts sum exactly (long arithmetic)
      assert(byCount.values.sum == total)
    } finally split.unpersist()
  }

  test("leakproof split keeps clusters whole, matches naive on singletons, and audits straddles") {
    val lp = SampleOps.leakproofSplit(spark, sfSmoke).cache()
    try {
      assert(lp.count() == TextOps.docs(spark, sfSmoke).count())
      // the whole point: one split per cluster, no exceptions
      assert(lp.groupBy("cluster")
        .agg(countDistinct("split").as("ns"))
        .where(col("ns") > 1).count() == 0)
      // singleton clusters (cluster == doc_id, size 1) keep the naive split
      val sizes = lp.groupBy("cluster").count()
      val singles = lp.join(sizes.where(col("count") === 1), "cluster")
      assert(singles.where(col("split") =!= col("naive_split")).count() == 0)
      assert(singles.where(col("cluster_leaky")).count() == 0)
      // cluster_leaky is exactly "naive assignment straddles splits"
      val straddle = lp.groupBy("cluster")
        .agg(countDistinct("naive_split").as("nn"), first("cluster_leaky").as("fl"))
      assert(straddle.where((col("nn") > 1) =!= col("fl")).count() == 0)
      // the fixture actually exercises the audit: some cluster leaks naively
      assert(lp.where(col("cluster_leaky")).count() > 0,
        "no naive-leaky cluster in fixture — audit untested")
    } finally lp.unpersist()
  }

  test("mixture sample keeps all of a ppm=1e6 source and rates are wired per source") {
    val docs = TextOps.docs(spark, sfSmoke)
    val kept = SampleOps.mixtureSample(spark, sfSmoke).cache()
    try {
      // rate 1_000_000 keeps EVERY row (h % 1e6 < 1e6 always)
      val src0All = docs.where("source = 'src0'").count()
      assert(kept.where("source = 'src0'").count() === src0All)
      // every kept row carries its source's configured rate
      assert(kept.where(s"rate_ppm != (${SampleOps.RatePpmExpr})").count() === 0)
      // down-weighted sources genuinely lose rows
      val src9All = docs.where("source = 'src9'").count()
      assert(kept.where("source = 'src9'").count() < src9All)
      // determinism: a second evaluation is row-identical
      assert(kept.collect().toSeq ===
        SampleOps.mixtureSample(spark, sfSmoke).collect().toSeq)
    } finally kept.unpersist()
  }

  test("stratified sample takes the n lowest-hash docs per stratum") {
    val n = 3
    val sample = SampleOps.stratifiedSample(spark, sfSmoke, n).cache()
    try {
      // never more than n per stratum, ranks contiguous from 1
      val bad = sample.groupBy("lang", "source")
        .agg(count(lit(1)).as("c"), min("sample_rank").as("lo"), max("sample_rank").as("hi"))
        .where(col("c") > n || col("lo") =!= 1 || col("hi") =!= col("c"))
        .count()
      assert(bad == 0)
      // rank order IS hash order within each stratum
      val misordered = sample.as("a").join(sample.as("b"),
          col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
            col("a.sample_rank") < col("b.sample_rank") && col("a.h") > col("b.h"))
        .count()
      assert(misordered == 0)
    } finally sample.unpersist()
  }

  test("source quota keeps at most N per source, best quality first") {
    val quota = 7
    val kept = SampleOps.sourceQuota(spark, sfSmoke, quota).cache()
    try {
      // hard per-source ceiling with contiguous ranks
      val bad = kept.groupBy("source")
        .agg(count(lit(1)).as("c"), min("quota_rank").as("lo"), max("quota_rank").as("hi"))
        .where(col("c") > quota || col("lo") =!= 1 || col("hi") =!= col("c"))
        .count()
      assert(bad == 0)
      // rank order IS quality order (desc) within each source
      val misordered = kept.as("a").join(kept.as("b"),
          col("a.source") === col("b.source") &&
            col("a.quota_rank") < col("b.quota_rank") &&
            col("a.quality_score") < col("b.quality_score"))
        .count()
      assert(misordered == 0)
      // nothing OUTSIDE the kept set beats the worst kept doc per source
      val worstKept = kept.groupBy("source").agg(
        min(struct(col("quality_score"), (-col("doc_id")).as("nd"))).as("w"))
      val all = TextOps.withTextSignals(TextOps.withWords(TextOps.docs(spark, sfSmoke)))
        .select(col("doc_id"), col("source"), col("quality_score"))
      val beaten = all.join(kept.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .join(worstKept, "source")
        .where(struct(col("quality_score"), (-col("doc_id")).as("nd")) > col("w"))
        .count()
      assert(beaten == 0)
    } finally kept.unpersist()
  }

  test("temperature sampling: rates derive from sizes, larger sources thin harder") {
    val kept = SampleOps.temperatureSample(spark, sfSmoke).cache()
    try {
      val sizes = TextOps.docs(spark, sfSmoke)
        .groupBy("source").agg(count(lit(1)).as("n"))
      val rates = kept.select("source", "rate_ppm").distinct()
        .join(sizes, "source")
        .collect().map(r => (r.getAs[String]("source"),
          r.getAs[Long]("rate_ppm"), r.getAs[Long]("n"))).toSeq
      // one rate per source, all within (0, 1e6]
      assert(rates.map(_._1).distinct.size == rates.size)
      assert(rates.forall { case (_, ppm, _) => ppm > 0 && ppm <= 1000000 })
      // monotone: a strictly larger source never gets a higher rate
      for ((_, pa, na) <- rates; (_, pb, nb) <- rates if na < nb)
        assert(pa >= pb, s"larger source kept at higher rate: ($na,$pa) vs ($nb,$pb)")
      // kept fraction lands near the tempered expectation per source
      // (salted-hash thinning is binomial; the corpus is small, so only
      // sanity-bound it: no source empties out, none exceeds its rate
      // by more than the binomial spread)
      val frac = kept.groupBy("source").agg(count(lit(1)).as("k"))
        .join(sizes, "source")
        .withColumn("f", col("k").cast("double") / col("n"))
      assert(frac.where(col("f") <= 0).count() == 0)
    } finally kept.unpersist()
  }

  test("weighted lottery: entries grow with weight, winners hold their true best ticket") {
    val all = SampleOps.weightedLottery(spark, sfSmoke, k = 1000000).cache()
    try {
      assert(all.where(col("w") < 1 || col("w") > 8).count() == 0)
      // more tickets can only raise a doc's entry: the maxWeight=1 draw
      // (every doc's single ticket-1 hash) is a lower bound everywhere
      val single = SampleOps.weightedLottery(spark, sfSmoke,
        k = 1000000, maxWeight = 1)
        .select(col("doc_id"), col("best_ticket").as("t1"))
      assert(all.join(single, Seq("doc_id"))
        .where(col("best_ticket") < col("t1")).count() == 0,
        "a weighted entry fell below its own ticket-1 hash")
      // winners' entries ARE the max over their w ticket hashes
      all.orderBy(desc("best_ticket")).limit(10).collect().foreach { r =>
        val (id, w) = (r.get(0), r.getInt(1))
        val expect = (1 to w).map { t =>
          TextOps.docs(spark, sfSmoke).sparkSession.range(1).select(
            TextOps.h32(concat(lit(s"lottery:$id:$t"))).as("h"))
            .first().getLong(0)
        }.max
        assert(r.getLong(2) == expect, s"doc $id entry is not its best ticket")
      }
    } finally all.unpersist()
  }

  test("rendezvous sharding: removing a shard remaps ONLY that shard's documents") {
    val docs = TextOps.docs(spark, sfSmoke).select("doc_id")
    val full = SampleOps.rendezvousOf(docs, 0 until 8)
      .select(col("doc_id"), col("shard").as("s8")).cache()
    try {
      // every shard owns something (500 docs over 8 shards)
      assert(full.select("s8").distinct().count() == 8)
      // drop shard 3: survivors' argmax over the remaining weights is
      // unchanged unless shard 3 held it — the HRW minimal-disruption
      // guarantee a mod-N scheme does not have
      val without = SampleOps.rendezvousOf(docs, Seq(0, 1, 2, 4, 5, 6, 7))
        .select(col("doc_id"), col("shard").as("s7"))
      val j = full.join(without, Seq("doc_id")).cache()
      try {
        assert(j.where(col("s8") =!= 3 && col("s7") =!= col("s8")).count() == 0,
          "a document not on the removed shard moved")
        assert(j.where(col("s8") === 3 && col("s7") === 3).count() == 0,
          "a document still assigned to the removed shard")
        assert(j.where(col("s8") === 3).count() > 0,
          "shard 3 owned nothing — the stability check is vacuous")
      } finally j.unpersist()
    } finally full.unpersist()
  }
}
