package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payload round-trip, typed metadata, and
  * the mapPartitions decode stage's byte-level kernel. */
class MediaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = tempDataDir(
    "documents" -> Seq(
      (0L, "abc", "en", "web", 3L),
      (1L, "中文", "zh", "web", 2L),
      (2L, "hello world", "en", "web", 11L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))

  test("media table has binary payloads with UTF-8 byte lengths") {
    val meta = MediaOps.mediaMeta(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getAs[Number]("n_bytes").intValue)).toMap
    assert(meta(0L) == ("image", 3)) // doc_id % 3
    assert(meta(1L) == ("audio", 6)) // 2 CJK chars = 6 UTF-8 bytes
    assert(meta(2L) == ("video", 11))
  }

  test("metadata is deterministic and within declared bounds") {
    val rows = MediaOps.mediaMeta(spark, dir).collect()
    rows.foreach { r =>
      val (w, h, d) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(w >= 64 && w < 1920 && h >= 64 && h < 1080 && d >= 0 && d < 600000)
    }
    assert(MediaOps.mediaMeta(spark, dir).collect().toSeq == rows.toSeq)
  }

  test("decode stage computes real byte checksums over the payload") {
    val feats = MediaOps.decodeFeatures(spark, dir).collect()
      .map(f => f.doc_id -> f).toMap
    // "abc" = 97+98+99 = 294
    assert(feats(0L).checksum == 294L && feats(0L).n_bytes == 3)
    // UTF-8 of 中文: e4 b8 ad e6 96 87 → (228+184+173+230+150+135) % 997 = 103
    assert(feats(1L).checksum == 1100L % 997)
    assert(feats(1L).feature(0) == 6f)
  }

  test("identical payloads collide on phash and pair at hamming 0") {
    import spark.implicits._
    val dup = tempDataDir("documents" -> Seq(
      (0L, "abc", "en", "web", 3L),
      (3L, "abc", "en", "web", 3L), // same bytes, same doc_id % 3 class
      (7L, "completely different payload text", "en", "web", 33L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val pairs = MediaOps.phashPairs(spark, dup).collect()
    val zero = pairs.filter(r => r.getLong(0) == 0L && r.getLong(1) == 3L)
    assert(zero.length == 1 && zero(0).getAs[Int]("hamming") == 0)
  }

  test("pigeonhole block join finds exactly the brute-force hamming<=1 pairs") {
    val sig = MediaOps.phashSignatures(spark, sfSmoke)
    val brute = sig.as("a").join(sig.as("b"),
        col("a.doc_id") < col("b.doc_id") &&
          expr("bit_count(a.phash ^ b.phash)") <= 1)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = MediaOps.phashPairs(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute)
    assert(brute.nonEmpty, "no hamming<=1 pairs in the corpus — stub too sparse")
    // signatures stay in the 16-bit range
    assert(sig.where(col("phash") < 0 || col("phash") >= 65536).count() == 0)
  }
}
