package graft.ext

import graft.SparkSpec

/** Duplicated-passage extraction: exact span bounds on a controlled
  * corpus. The 12-word boilerplate shared by docs 1 and 2 yields five
  * overlapping duplicated 8-grams that must merge into ONE maximal
  * span per doc, positioned wherever the passage sits in that doc;
  * wholly unique documents yield nothing. */
class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  private val boiler =
    "please read these terms and conditions very carefully before using the site"  // 12 words

  private lazy val dir = tempDataDir(
    "documents" -> Seq(
      // doc 1: boilerplate at positions 1..13
      (1L, s"$boiler unique tail one", "en", "web", 0L),
      // doc 2: three lead-in words push the passage to positions 4..15
      (2L, s"alpha beta gamma $boiler and some closing words", "en", "web", 0L),
      (3L, "entirely unrelated content with no shared runs of words at all in this document",
        "en", "web", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))

  test("shared passage merges to one maximal span per doc; unique docs emit none") {
    val spans = TextOps.dupSpans(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // 12 shared words ⇒ 8-gram hit positions i..i+4 (5 grams), all
    // overlapping ⇒ exactly one span covering the passage
    assert(spans.toSeq == Seq(
      (1L, 1, 12, 5L),   // words 1..12 of doc 1
      (2L, 4, 15, 5L)),  // shifted by the 3 lead-in words in doc 2
      s"got ${spans.toSeq}")
  }

  test("strip removes the passage everywhere except the first document") {
    val out = TextOps.stripDupSpans(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    // doc 1 is the keeper: nothing removed
    assert(out(1L) == ((15L, 0L, s"$boiler unique tail one")))
    // doc 2 loses exactly the 12 passage words, keeps its own content
    assert(out(2L) == ((19L, 12L, "alpha beta gamma and some closing words")))
    // doc 3 shares nothing and is untouched
    assert(out(3L)._2 == 0L)
  }
}
