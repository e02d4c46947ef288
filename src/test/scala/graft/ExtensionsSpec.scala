package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Deployment-path check: a session configured ONLY via
  * `spark.sql.extensions=graft.GraftExtensions` (no programmatic
  * register calls) must resolve BOTH custom expressions — round 1
  * shipped the hook with `array_dot` only, silently breaking every
  * text/dedup oracle contract for cluster-wide deployments. */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions resolves all custom functions") {
    // getOrCreate returns any active session unchanged (extensions would
    // be silently ignored) — clear first so a NEW session is built with
    // the extensions hook applied.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("ExtensionsSpec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val d = s.sql(
        "SELECT array_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), " +
          "array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d").head().getDouble(0)
      assert(d == 11.0)
      // H('abc'): md5('abc') = 900150983cd24fb0... → prefix32 = 0x90015098
      val h = s.sql("SELECT md5_prefix32('abc') AS h").head().getLong(0)
      assert(h == java.lang.Long.parseLong("90015098", 16))
      // kmv_sketch via SQL: 2 smallest distinct of {5, 3, 3, 9} = [3, 5]
      val kmv = s.sql(
        "SELECT kmv_sketch(v, 2) AS s FROM VALUES (CAST(5 AS BIGINT)), (3), (3), (9) AS t(v)")
        .head().getSeq[Long](0)
      assert(kmv == Seq(3L, 5L))
    } finally {
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
