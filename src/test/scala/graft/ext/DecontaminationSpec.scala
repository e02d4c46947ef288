package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Decontamination semantics: a planted test→train leak scores high
  * containment even when symmetric Jaccard would wave it through, and
  * the screening frame holds exactly the train split. */
class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  test("a train doc quoting a test doc scores containment ≈ 1 for the quoted part") {
    // Phase 1: dummy corpus just to learn the hash-split assignment
    val ids = (0L until 60L)
    val probe = ids.map(i => (i, "x")).toDF("doc_id", "text")
    val assigned = SampleOps.withSplit(probe).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val trainId = ids.find(assigned(_) == "train").get
    val testId = ids.find(assigned(_) == "test").get

    // Phase 2: the real corpus — the test doc's text appears VERBATIM
    // inside one train doc; everything else is distinct filler
    val quoted = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = ids.map { i =>
      val text =
        if (i == trainId) s"$quoted"
        else if (i == testId) quoted
        else s"filler${i}a filler${i}b filler${i}c filler${i}d filler${i}e"
      (i, text)
    }.toDF("doc_id", "text")
    val dir = tempDataDir("documents" -> docs)

    val out = DedupOps.decontaminationScores(spark, dir).cache()
    try {
      // exactly the train docs, one row each
      val trainIds = ids.filter(assigned(_) == "train").toSet
      assert(out.select("doc_id").as[Long].collect().toSet === trainIds)
      // the leaking train doc: every one of its shingles is in the test set
      val leak = out.where(col("doc_id") === trainId)
        .select("containment").as[Double].head()
      assert(leak === 1.0)
      // non-leaking train docs share nothing with the test split
      assert(out.where(col("doc_id") =!= trainId)
        .where(col("containment") =!= 0.0).count() === 0)
    } finally out.unpersist()
  }

  test("structural invariants on the corpus: bounds, null-iff-short") {
    val out = DedupOps.decontaminationScores(spark, sfSmoke).cache()
    try {
      assert(out.where("n_matched > n_shingles").count() === 0)
      assert(out.where("containment < 0 OR containment > 1").count() === 0)
      assert(out.where("(containment IS NULL) != (n_shingles = 0)").count() === 0)
      val nTrain = SampleOps.datasetSplit(spark, sfSmoke)
        .where("split = 'train'").count()
      assert(out.count() === nTrain)
    } finally out.unpersist()
  }
}
