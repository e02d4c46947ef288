package graft.sources

import graft.SparkSpec

/** Round-trip fidelity of the alternate formats against the parquet
  * source of truth: same row multiset back, timestamps intact. */
class AltFormatsSpec extends SparkSpec {

  private def roundTrips(write: (String) => Unit, read: (String) => org.apache.spark.sql.DataFrame,
      label: String): Unit = {
    val out = java.nio.file.Files.createTempDirectory("graft-alt").toString + s"/$label"
    write(out)
    val back = read(out)
    val src = graft.etl.Star.events(spark, sfSmoke)
    assert(back.schema == AltFormats.eventsSchema, s"$label schema drifted")
    assert(back.count() == src.count())
    assert(src.exceptAll(back).count() == 0 && back.exceptAll(src).count() == 0,
      s"$label round-trip lost or altered rows")
  }

  test("events survive a JSON-lines round trip, schema declared not inferred") {
    roundTrips(
      AltFormats.writeEventsJsonl(spark, sfSmoke, _),
      AltFormats.eventsJsonl(spark, _), "jsonl")
  }

  test("events survive an ORC round trip") {
    roundTrips(
      AltFormats.writeEventsOrc(spark, sfSmoke, _),
      AltFormats.eventsOrc(spark, _), "orc")
  }
}
