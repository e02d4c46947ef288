package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII scrubbing for the training-data pipeline: regex redaction of
  * email addresses, URLs and IPv4 literals, with per-document match
  * counts (the audit trail a compliance pass needs). Pure per-row
  * expression work — the redaction fuses into the scan, no shuffle, no
  * state; at 100 TB this runs at I/O speed like every other per-row
  * text operator here.
  *
  * Pattern dialect: the patterns use only the regex subset with
  * identical semantics in Java regex (Spark) and RE2 (the DuckDB
  * oracle) — character classes, bounded/unbounded quantifiers,
  * alternation and ASCII word boundaries; no backreferences or
  * lookaround (RE2 has neither). Replacement order is URL → email →
  * IP so the URL pattern (which would swallow an embedded '@' or
  * dotted quad in a path) is resolved before the narrower patterns
  * run.
  *
  * The synthetic `documents` table contains no PII-shaped spans at
  * all (verified: zero matches for '@', 'https?://' or 3+ digit runs),
  * so redacting the raw text would be an unobservable no-op and the
  * oracle would only pin the no-match case. The driver query therefore
  * INJECTS one deterministic email/URL/IP per document — derived from
  * `doc_id`/`lang`, identically on both engines — then scrubs; the
  * comparison covers real match+replace semantics on every row. A
  * production caller just passes their frame to [[redact]] directly.
  */
object ScrubOps {

  // Kept as RAW regex text (single escapes). The Spark side feeds them
  // through the Column API — never through expr() — because Spark SQL
  // string literals process backslash escapes ('\s' parses as 's') while
  // DuckDB's do not; the raw text embeds verbatim in the oracle SQL.
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^\\s]+"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Adds `n_email`/`n_url`/`n_ip` counts and the `redacted` text to any
    * frame with a `text` column. Counts are taken BEFORE replacement
    * (URL-embedded emails/IPs count as URL only, matching the
    * replacement order). */
  def redact(df: DataFrame): DataFrame =
    df
      .withColumn("n_url", regexp_count(col("text"), lit(UrlPattern)))
      .withColumn("no_url", regexp_replace(col("text"), UrlPattern, "[URL]"))
      .withColumn("n_email", regexp_count(col("no_url"), lit(EmailPattern)))
      .withColumn("no_email", regexp_replace(col("no_url"), EmailPattern, "[EMAIL]"))
      .withColumn("n_ip", regexp_count(col("no_email"), lit(Ipv4Pattern)))
      .withColumn("redacted", regexp_replace(col("no_email"), Ipv4Pattern, "[IP]"))
      .drop("no_url", "no_email")

  /** The injected-span construction, shared verbatim with the oracle SQL
    * (backslash-free, and `STRING` is a valid cast target in both
    * engines): one email, one URL and one IPv4 per document, all pure
    * functions of (doc_id, lang). */
  val InjectExpr: String =
    "text || ' contact user' || CAST(doc_id AS STRING) || " +
      "'@metro-' || lang || '.example.com see " +
      "https://docs.example.org/d/' || CAST(doc_id AS STRING) || " +
      "' node 10.0.' || CAST(doc_id % 256 AS STRING) || '.' || " +
      "CAST(doc_id % 97 AS STRING) || ' end'"

  /** Driver query: inject deterministic PII spans, scrub them, report
    * counts + the scrubbed text. Every row must show n_email = n_url =
    * n_ip = 1 and a redacted tail differing from the original. */
  def redactDocs(spark: SparkSession, dir: String): DataFrame =
    redact(TextOps.docs(spark, dir).withColumn("text", expr(InjectExpr)))
      .select("doc_id", "n_email", "n_url", "n_ip", "redacted")
      .orderBy("doc_id")
}
