package graft.ext

import graft.SparkSpec

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
}
