package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §7.5): image/audio/video payloads
  * as opaque `binary` columns with typed metadata, plus a batched
  * decode/feature-extract stage. The container has no image/audio codecs,
  * so the decode kernel is a clearly-marked deterministic STUB — but the
  * Spark-side plumbing (schema, binary column, partition-preserving
  * `mapPartitions` batch shape, feature schema) is real and tested.
  *
  * At 100 TB the payloads live in parquet binary columns (or object-store
  * pointers); decode is a `mapPartitions` over batches so codec init cost
  * amortizes per-partition, exactly as a Pandas-UDF/`mapInPandas` stage
  * would in PySpark. Metadata prunes early: filters on width/duration
  * push down to the scan without touching payload bytes.
  */
object MediaOps {

  case class MediaRecord(
      doc_id: Long, media_type: String, payload: Array[Byte],
      width: Long, height: Long, duration_ms: Long)

  case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Int,
      checksum: Long, feature: Array[Float])

  /** Derives the media table from `documents`: the UTF-8 text bytes stand
    * in for an encoded frame/sample payload; metadata is derived from the
    * cross-engine hash of the doc id so it is oracle-checkable. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    TextOps.docs(spark, dir)
      .withColumn("media_type", expr(
        "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"))
      .withColumn("payload", expr("encode(text, 'UTF-8')"))
      .withColumn("h", TextOps.h32(col("doc_id").cast("string")))
      .withColumn("width", expr("64 + h % 1856"))
      .withColumn("height", expr("64 + (h >> 8) % 1016"))
      .withColumn("duration_ms", expr("(h >> 4) % 600000"))
      .select("doc_id", "media_type", "payload", "width", "height", "duration_ms")

  /** Metadata/plumbing view — fully oracle-checkable (no payload decode):
    * byte length of the binary column + typed metadata. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"), col("media_type"),
        expr("octet_length(payload)").as("n_bytes"),
        col("width"), col("height"), col("duration_ms"))
      .orderBy("doc_id")

  /** Batched decode / feature-extraction over the binary payloads via
    * `mapPartitions`: one iterator per partition (codec state would be
    * initialized here once per partition, not per row).
    *
    * STUB: a real deployment would decode the payload with an image/audio
    * library here. This container has none, so the "decode" is a
    * deterministic byte-level kernel: checksum = Σ bytes mod 997 and a
    * 4-dim "feature" from byte statistics. The iteration over payload
    * bytes is real — the stage exercises exactly the data path a codec
    * would. */
  def decodeFeatures(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val bytes = r.payload
        var sum = 0L
        var i = 0
        while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
        val checksum = sum % 997
        val feature = Array(
          bytes.length.toFloat,
          checksum.toFloat,
          if (bytes.isEmpty) 0f else (bytes(0) & 0xff).toFloat,
          if (bytes.isEmpty) 0f else (bytes(bytes.length - 1) & 0xff).toFloat)
        MediaFeatures(r.doc_id, r.media_type, bytes.length, checksum, feature)
      }
    }
  }

  /** Driver-contract wrapper: decode features as an ordered DataFrame
    * (array feature dropped: the scalar columns are the checkable
    * surface). Fully oracle-checked since round 3: the checksum is
    * Σ bytes mod 997 over UTF-8 text bytes, which the DuckDB twin
    * reproduces exactly from codepoint arithmetic
    * ([[ExtOracleSql.mediaDecode]]). */
  def decodeQuery(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(spark, dir)
      .select("doc_id", "media_type", "n_bytes", "checksum")
      .orderBy("doc_id")

  /** Resize stage (STUB kernel, real plumbing): recomputes the payload
    * for a target resolution. A real deployment calls the image codec
    * per batch here; the stub scales the byte budget proportionally
    * (truncation) and rewrites the metadata, preserving the
    * partition-preserving `mapPartitions` batch shape. */
  def resize(spark: SparkSession, dir: String, targetW: Int, targetH: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val scale = (targetW.toLong * targetH).toDouble /
          math.max(1L, r.width * r.height).toDouble
        // empty payloads stay empty — fabricating a byte would corrupt
        // downstream byte accounting (checksum/octet_length vs mediaMeta)
        val newLen =
          if (r.payload.isEmpty) 0
          else math.max(1, math.min(r.payload.length,
            math.ceil(r.payload.length * scale).toInt))
        r.copy(
          payload = java.util.Arrays.copyOf(r.payload, newLen),
          width = targetW, height = targetH)
      }
    }
  }

  case class Frame(doc_id: Long, frame_idx: Int, offset_ms: Long, frame: Array[Byte])

  /** Frame-sampling stage for video rows (STUB kernel, real plumbing):
    * emits one row per sampled frame every `everyMs` milliseconds. A real
    * deployment would seek+decode; the stub slices the payload
    * deterministically per frame index. The 1→N `flatMap` inside
    * `mapPartitions` is exactly the batch shape a decoder needs — codec
    * opened once per partition, rows streamed out. */
  def sampleFrames(spark: SparkSession, dir: String, everyMs: Long = 60000L): Dataset[Frame] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRecord].mapPartitions { it =>
      it.filter(_.media_type == "video").flatMap { r =>
        val n = math.max(1L, r.duration_ms / math.max(1L, everyMs)).toInt
        (0 until n).iterator.map { i =>
          val off = i.toLong * everyMs
          val sliceStart = if (r.payload.isEmpty) 0 else (i * 7) % r.payload.length
          val sliceLen = math.min(16, r.payload.length - sliceStart)
          Frame(r.doc_id, i, off,
            java.util.Arrays.copyOfRange(r.payload, sliceStart, sliceStart + sliceLen))
        }
      }
    }
  }

  /** Frame-sample summary as a driver-contract query (oracle-checkable:
    * the frame COUNT per video is pure metadata arithmetic —
    * `max(1, duration_ms / 60000)` — even though frame bytes are not). */
  def frameSummary(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(spark, dir)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("long").as("n_frames"),
        max("offset_ms").as("last_offset_ms"))
      .orderBy("doc_id")

  /** Perceptual-hash signatures over the decoded payloads (16 bits).
    *
    * STUB kernel, real plumbing — same contract as the rest of the
    * module: a real deployment computes a DCT/average-hash from the
    * decoded PIXELS inside [[decodeFeatures]]'s `mapPartitions` stage
    * (where the pixel buffer is in scope); this container has no
    * codecs, so the stub derives the 16 signature bits from the
    * kernel's decoded BYTE statistics (checksum, byte length) via the
    * cross-engine hash — which is exactly what keeps the downstream
    * near-dup join oracle-checkable. */
  def phashSignatures(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(spark, dir).toDF()
      .withColumn("phash",
        TextOps.h32(concat(col("checksum"), lit(":"), col("n_bytes"))) % 65536)
      .select("doc_id", "media_type", "phash")

  /** Near-duplicate media detection by perceptual-hash Hamming
    * distance — the media twin of [[graft.ext.DedupOps.simhashPairs]]:
    * re-encodes, resizes and minor edits move few signature bits, so
    * near-identical assets sit within a small Hamming radius.
    *
    * Same banded pigeonhole join as SimHash: the 16-bit signature
    * splits into 2 contiguous 8-bit blocks; at Hamming ≤ 1 at most one
    * block differs, so every qualifying pair shares ≥ 1 block
    * VERBATIM. Candidates come from an equi-join on (block id, block
    * value) — never an all-pairs scan — then the exact popcount
    * verifies. DISTINCT collapses pairs that match on both blocks.
    * At 100 TB the block join shuffles on a 2×256-ary key; radius > 1
    * needs maxHamming+1 blocks (the require documents the guarantee,
    * like SimHash's). */
  def phashPairs(spark: SparkSession, dir: String, maxHamming: Int = 1): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 1,
      s"phashPairs' 2-block pigeonhole join is complete only for maxHamming <= 1, got $maxHamming")
    val sig = phashSignatures(spark, dir)
    val blocks = sig.select(col("doc_id"), col("phash"),
      posexplode(expr("array(phash % 256, phash DIV 256)")))
      .select(col("doc_id"), col("phash"),
        col("pos").as("blk"), col("col").as("blk_val"))
    blocks.as("a").join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.blk_val") === col("b.blk_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.phash").as("phash_a"), col("b.phash").as("phash_b"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(phash_a ^ phash_b) AS INT)"))
      .where(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }
}
