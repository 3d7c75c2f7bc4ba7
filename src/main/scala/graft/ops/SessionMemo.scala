package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo of persisted DataFrames: one persist per
  * (session, key) instead of one per call — re-persisting an identical
  * plan leaks storage handles and spams "already cached" warnings.
  *
  * Bounded: at most `maxEntries` live entries (LRU by access). The
  * evicted DataFrame is unpersisted, so a long-lived interactive session
  * that dedups/overlaps many distinct inputs cycles executor storage
  * instead of pinning every plan it ever touched. Entries of STOPPED
  * sessions are evicted on every access too (their cached blocks died
  * with the session's executors; no unpersist needed or possible).
  *
  * Staleness semantics are exactly `persist()`'s: if the files under a
  * memoized plan are overwritten mid-session, the memo — like any
  * persisted DataFrame in that session — keeps serving the materialized
  * snapshot until the session ends, the entry ages out of the LRU, or the
  * caller [[invalidate]]s it. Callers that mutate source files
  * mid-session should invalidate (or not memoize at all).
  */
final class SessionMemo[K](maxEntries: Int = 64) {
  require(maxEntries > 0, "maxEntries must be positive")

  private val m =
    new java.util.LinkedHashMap[(SparkSession, K), DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, K), DataFrame]): Boolean =
        if (this.size() > maxEntries) { unpersistQuietly(e.getKey._1, e.getValue); true }
        else false
    }

  private def unpersistQuietly(s: SparkSession, df: DataFrame): Unit =
    try if (!s.sparkContext.isStopped) df.unpersist(blocking = false)
    catch { case _: Throwable => () }

  def getOrElseUpdate(s: SparkSession, k: K)(build: => DataFrame): DataFrame =
    m.synchronized {
      val it = m.entrySet().iterator()
      while (it.hasNext)
        if (it.next().getKey._1.sparkContext.isStopped) it.remove()
      val key = (s, k)
      val existing = m.get(key)
      if (existing != null) existing
      else { val df = build; m.put(key, df); df }
    }

  /** Drop (and unpersist) one entry — the explicit refresh hook for
    * callers whose underlying files changed mid-session.
    */
  def invalidate(s: SparkSession, k: K): Unit = m.synchronized {
    val df = m.remove((s, k))
    if (df != null) unpersistQuietly(s, df)
  }

  /** Live entry count (stopped-session entries may still be counted until
    * the next access sweeps them).
    */
  def size: Int = m.synchronized(m.size())
}
