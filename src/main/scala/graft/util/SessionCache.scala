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
  * Re-entrancy: `build` thunks MAY call back into `getOrBuild` (dedup
  * indexes compose: lsh_bands → minhash_sig → shingle_hashes). The build
  * runs OUTSIDE the map's lock — compute-then-`putIfAbsent` — because
  * `ConcurrentHashMap.computeIfAbsent` forbids nested updates of the same
  * map ("Recursive update", a hash-collision-dependent crash). The cost is
  * that two racing threads can both build the same frame; the loser's copy
  * is unpersisted and discarded.
  *
  * Input immutability: keys embed only (session, caller-chosen key, which
  * by convention includes the dir string). If the parquet under a dir is
  * rewritten within a session's lifetime, or the same dir is spelled two
  * ways (`/a/b` vs `/a/./b`), the cache serves stale or duplicate frames.
  * Callers own path canonicalization; sessions over mutable dirs must
  * `invalidate(spark)` after a rewrite.
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
    val perSession = bySession
      .computeIfAbsent(spark, _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
    val cached = perSession.get(key)
    if (cached != null) cached
    else {
      val built = build.persist()
      val winner = perSession.putIfAbsent(key, built)
      if (winner == null) built
      else { built.unpersist(); winner }
    }
  }

  /** Drop (and unpersist) every cached frame for `spark` — required after
    * rewriting parquet under a dir the session already read. */
  def invalidate(spark: SparkSession): Unit = {
    val m = bySession.remove(spark)
    if (m != null) m.values().forEach(df => df.unpersist())
  }
}
