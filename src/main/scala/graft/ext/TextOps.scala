package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the large-scale training-data pipeline tier
  * (SURVEY.md §7.5): tokenization, quality scoring, language-ID, document
  * fingerprinting. The reference has no text layer (its strings are IDs and
  * names, `/root/reference/SQL/Star_Schema_Metro.sql:17-35`); these extend
  * the engine over the driver's `documents` table.
  *
  * Design rules (100 TB posture):
  *  - Everything is built-in column expressions / higher-order functions —
  *    whole-stage codegen, zero UDFs, zero shuffles for per-document ops
  *    (they fuse into the parquet scan stage).
  *  - The cross-engine hash contract is `H(s) = int(md5(s)[0:8], 16)`:
  *    both Spark (`conv(substring(md5(s),1,8),16,10)`) and the DuckDB
  *    oracle (hex-digit fold) compute the identical 32-bit value, so every
  *    hash-derived result is differentially testable.
  */
object TextOps {

  def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** The cross-engine 32-bit hash: first 8 hex digits of md5 as a long. */
  def h32(c: Column): Column = conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Same contract as a SQL-expression string, for use inside HOF lambdas. */
  def h32Sql(e: String): String = s"CAST(conv(substring(md5($e), 1, 8), 16, 10) AS BIGINT)"

  /** Whitespace tokens of the lower-cased document, as an array column. */
  val wordsExpr = "split(trim(lower(text)), '\\\\s+')"

  /** Adds `ws` (token array) to the documents frame. */
  def withWords(df: DataFrame): DataFrame = df.withColumn("ws", expr(wordsExpr))

  /** Word 3-gram shingles as an array, built with `transform(sequence(...))`
    * over the token array — per-row work only; no self-join, no shuffle.
    * (The O(n)-joins formulation the DuckDB oracle uses is equivalent but
    * would shuffle three times at scale.) */
  val shinglesExpr: String =
    "CASE WHEN size(ws) >= 3 THEN " +
      "transform(sequence(1, size(ws) - 2), i -> " +
      "concat_ws(' ', element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2))) " +
      "ELSE array() END"

  /** Index materialization for the dedup family: the shingle inverted
    * index is shared by the Jaccard, MinHash and SimHash operators, so it
    * is built once per (session, dir) and persisted — same pattern as
    * `Star.warehouse` (a deployment would write it to storage once). */
  private def index(spark: SparkSession, dir: String, name: String)(
      build: => DataFrame): DataFrame =
    graft.util.SessionCache.getOrBuild(spark, s"text|$dir|$name")(build)

  /** (doc_id, sh) — distinct word 3-gram shingles per document.
    * Distinctness is PER DOCUMENT, so `array_distinct` before the explode
    * delivers it with zero shuffle — a `.distinct()` after the explode
    * would shuffle the full (doc, shingle) inverted index for nothing. */
  def shingleSet(spark: SparkSession, dir: String): DataFrame =
    index(spark, dir, "shingles") {
      withWords(docs(spark, dir))
        .select(col("doc_id"), explode(expr(s"array_distinct($shinglesExpr)")).as("sh"))
    }

  /** (doc_id, sh, h) with the cross-engine shingle hash. The dependency
    * is materialized BEFORE entering this key's build — computeIfAbsent
    * must not re-enter the same per-session map (SessionCache contract). */
  def shingleHashes(spark: SparkSession, dir: String): DataFrame = {
    val base = shingleSet(spark, dir)
    index(spark, dir, "shingle_hashes") {
      base.withColumn("h", h32(col("sh")))
    }
  }

  /** Stopword vote lists — public and referenced by [[ExtOracleSql]] so
    * the engine and its oracle can never drift apart on a list edit. */
  val stopEn = "'the','a','of','and','to','in','is','it'"
  val stopDe = "'der','die','und','das','nicht','ist','ein','mit'"
  val stopFr = "'le','la','les','et','est','un','une','dans'"
  val stopEs = "'el','los','las','es','y','si','una','como'"

  /** Token counts + quality signals + a composite quality score, one row
    * per document. Pure per-row expressions (fuse into the scan). */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    withWords(docs(spark, dir))
      .withColumn("n_tokens", expr("size(ws)"))
      .withColumn("n_bpe_tokens",
        expr("size(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\\\s]', 0))"))
      .withColumn("n_alpha",
        expr("length(lower(text)) - length(regexp_replace(lower(text), '[a-z]', ''))"))
      .withColumn("n_punct",
        expr("length(text) - length(regexp_replace(text, '[.,;:!?]', ''))"))
      .withColumn("stop_ratio",
        expr(s"CAST(size(filter(ws, w -> w IN ($stopEn))) AS DOUBLE) / size(ws)"))
      .withColumn("mean_token_len",
        expr("CAST(length(regexp_replace(text, '\\\\s+', '')) AS DOUBLE) / size(ws)"))
      .withColumn("quality_score",
        expr("round(0.3 * (CAST(n_alpha AS DOUBLE) / n_chars) + 0.3 * stop_ratio " +
          "+ 0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 200.0) " +
          "- 0.2 * (CAST(n_punct AS DOUBLE) / n_chars), 4)"))
      .select("doc_id", "n_tokens", "n_bpe_tokens", "n_alpha", "n_punct",
        "stop_ratio", "mean_token_len", "quality_score")
      .orderBy("doc_id")

  /** Language-ID by n-gram heuristic: CJK codepoints ⇒ zh, else stopword
    * votes per language with a fixed deterministic tie-break (de > en >
    * es > fr on equal votes, 'unknown' when no list matches). Votes are
    * `size(filter(ws, ...))` HOFs — per-row, no explode, no shuffle. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    withWords(docs(spark, dir))
      .withColumn("cjk",
        expr("length(text) - length(regexp_replace(text, '[一-鿿]', ''))"))
      .withColumn("v_en", expr(s"size(filter(ws, w -> w IN ($stopEn)))"))
      .withColumn("v_de", expr(s"size(filter(ws, w -> w IN ($stopDe)))"))
      .withColumn("v_fr", expr(s"size(filter(ws, w -> w IN ($stopFr)))"))
      .withColumn("v_es", expr(s"size(filter(ws, w -> w IN ($stopEs)))"))
      .withColumn("pred_lang", expr(
        """CASE WHEN cjk > 0 THEN 'zh'
          |     WHEN greatest(v_de, v_en, v_es, v_fr) = 0 THEN 'unknown'
          |     WHEN v_de >= v_en AND v_de >= v_es AND v_de >= v_fr THEN 'de'
          |     WHEN v_en >= v_es AND v_en >= v_fr THEN 'en'
          |     WHEN v_es >= v_fr THEN 'es'
          |     ELSE 'fr' END""".stripMargin))
      .select("doc_id", "lang", "pred_lang")
      .orderBy("doc_id")

  /** Document fingerprint via rolling character 8-grams: min cross-engine
    * hash (primary fingerprint), a second independent min-hash
    * (rotation-permuted), and the distinct-gram cardinality. The whole
    * computation is `transform` + `array_min` over one row — no explode,
    * so at 100 TB it remains a map-only stage fused into the scan. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("t", expr("lower(text)"))
      .withColumn("grams",
        expr("transform(sequence(1, greatest(length(t) - 7, 1)), i -> substring(t, i, 8))"))
      .withColumn("hs", expr(s"transform(grams, g -> ${h32Sql("g")})"))
      .withColumn("fp_min", expr("array_min(hs)"))
      .withColumn("fp_rot",
        expr("array_min(transform(hs, h -> (1299709 * h + 12345) % 4294967311))"))
      .withColumn("n_grams", expr("size(array_distinct(grams))"))
      .select("doc_id", "n_grams", "fp_min", "fp_rot")
      .orderBy("doc_id")
}
