package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-SparkSession materialization cache for derived tables (star-schema
  * tables, dedup indexes): build once per (session, key), persist, reuse.
  *
  * Keyed on the session OBJECT via a WeakHashMap — not a hash of it —
  * so (a) a stopped session's entries become unreachable and are GC'd
  * together with the session instead of leaking cached plans, and (b) an
  * identity-hash collision from a recycled address can never resurface a
  * DataFrame bound to a dead session. */
object SessionCache {

  private val bySession =
    new java.util.WeakHashMap[SparkSession, java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  def getOrBuild(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val m = bySession.synchronized {
      var inner = bySession.get(spark)
      if (inner == null) {
        inner = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        bySession.put(spark, inner)
      }
      inner
    }
    m.computeIfAbsent(key, _ => build.persist())
  }
}
