package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-SparkSession materialization cache for derived tables (star-schema
  * tables, dedup indexes): build once per (session, key), persist, reuse.
  *
  * Lifecycle: entries are held strongly while their session lives (a
  * cached DataFrame references its session, so weak-keying could never
  * collect them anyway); entries whose session has been stopped are
  * purged lazily on the next `getOrBuild` from any session. A driver
  * that stops a session and never calls in again keeps at most that one
  * dead session's entries until the next access or JVM exit.
  *
  * Contract for builders: the `build` thunk MUST NOT call back into
  * `getOrBuild` for the same session (ConcurrentHashMap.computeIfAbsent
  * forbids re-entry); compose cached pieces by materializing the
  * dependency BEFORE entering the dependent key's build (see
  * `TextOps.shingleHashes`).
  */
object SessionCache {

  private val bySession =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  private def purgeStopped(): Unit = {
    val it = bySession.keySet().iterator()
    while (it.hasNext) {
      if (it.next().sparkContext.isStopped) it.remove()
    }
  }

  def getOrBuild(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    purgeStopped()
    bySession
      .computeIfAbsent(spark, _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
      .computeIfAbsent(key, _ => build.persist())
  }
}
