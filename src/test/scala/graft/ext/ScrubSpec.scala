package graft.ext

import graft.SparkSpec

/** Redaction semantics on constructed strings (the corpus has no natural
  * PII-shaped spans — the driver query injects them; here we pin the
  * operator itself on hand-built cases, including the overlap rules). */
class ScrubSpec extends SparkSpec {

  private def redactOne(text: String): (Int, Int, Int, String) = {
    import spark.implicits._
    val row = ScrubOps.redact(Seq((1L, text)).toDF("doc_id", "text"))
      .select("n_email", "n_url", "n_ip", "redacted").head()
    (row.getInt(0), row.getInt(1), row.getInt(2), row.getString(3))
  }

  test("redacts each kind and counts them") {
    val (e, u, i, t) = redactOne(
      "mail a@b.com and c.d+x@e.org, see https://x.y/z?q=1 from 10.0.0.1")
    assert((e, u, i) === (2, 1, 1))
    assert(t === "mail [EMAIL] and [EMAIL], see [URL] from [IP]")
  }

  test("URL swallows embedded email and dotted quad (counted as URL only)") {
    val (e, u, i, t) = redactOne("ftp via https://u@h.com/10.0.0.1/p done")
    assert((e, u, i) === (0, 1, 0))
    assert(t === "ftp via [URL] done")
  }

  test("no matches → identity, zero counts") {
    val (e, u, i, t) = redactOne("plain words only")
    assert((e, u, i) === (0, 0, 0))
    assert(t === "plain words only")
  }

  test("ip boundaries: no match inside longer digit runs") {
    val (_, _, i, t) = redactOne("v 1.2.3.4 ok but 1234.5.6.7890 stays")
    assert(i === 1)
    assert(t.contains("[IP] ok"))
    assert(t.contains("1234.5.6.7890"))
  }

  test("driver query injects exactly one of each per document") {
    val df = ScrubOps.redactDocs(spark, sfSmoke)
    assert(df.where("n_email != 1 OR n_url != 1 OR n_ip != 1").count() === 0)
    assert(df.where("redacted NOT LIKE '%[EMAIL]%' OR redacted NOT LIKE '%[URL]%'" +
      " OR redacted NOT LIKE '%[IP]%'").count() === 0)
  }
}
