package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped LRU memo with per-key build locking.
  *
  * Bounded: at most `maxEntries` live entries (LRU by access); the
  * `onEvict` hook runs for completed entries as they age out, and entries
  * of STOPPED sessions are dropped on every access (their cached blocks
  * died with the session's executors — no cleanup needed or possible).
  *
  * Locking: the memo-wide monitor guards only the map itself; a caller's
  * `build` runs under a PER-KEY cell lock, so a slow plan construction
  * never blocks other keys, and two memos nested in opposite order can
  * only contend when they nest the very same keys (the memo-wide-monitor
  * deadlock of the previous shape is gone). Concurrent requests for one
  * key serialize on its cell: exactly one builder runs, the others
  * receive its value.
  *
  * Staleness semantics for cached-plan values are exactly `persist()`'s:
  * if the files under a memoized plan are overwritten mid-session, the
  * memo keeps serving the materialized snapshot until the entry ages out
  * or the caller [[invalidate]]s it. Callers that mutate source files
  * mid-session should invalidate (or not memoize at all).
  */
class SessionMemoOf[K, V](maxEntries: Int = 64,
                          onEvict: (SparkSession, V) => Unit = (_: SparkSession, _: V) => ()) {
  require(maxEntries > 0, "maxEntries must be positive")

  private final class Cell(val session: SparkSession) {
    var done = false
    var value: V = _
  }

  private val m =
    new java.util.LinkedHashMap[(SparkSession, K), Cell](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, K), Cell]): Boolean =
        // an in-flight (not-done) eldest cell is skipped this round: its
        // builder still holds the cell lock and will publish a value the
        // caller uses — evicting it would fire onEvict on nothing and
        // orphan the builder's side effects
        if (this.size() > maxEntries && e.getValue.done) {
          evictQuietly(e.getValue); true
        } else false
    }

  private def evictQuietly(c: Cell): Unit =
    try if (c.done && !c.session.sparkContext.isStopped)
      onEvict(c.session, c.value)
    catch { case _: Throwable => () }

  def getOrElseUpdate(s: SparkSession, k: K)(build: => V): V = {
    val cell = m.synchronized {
      val it = m.entrySet().iterator()
      while (it.hasNext)
        if (it.next().getKey._1.sparkContext.isStopped) it.remove()
      val key = (s, k)
      val existing = m.get(key)
      if (existing != null) existing
      else { val c = new Cell(s); m.put(key, c); c }
    }
    cell.synchronized {
      if (!cell.done) {
        // a failed build must not leave the not-done cell in the map:
        // removeEldestEntry skips not-done eldests, so one permanently
        // failing key would block ALL eviction (and pin every persisted
        // DataFrame behind it) forever
        try { cell.value = build; cell.done = true }
        catch {
          case t: Throwable =>
            m.synchronized(m.remove((s, k), cell))
            throw t
        }
      }
      cell.value
    }
  }

  /** Drop (and evict-hook) one entry — the explicit refresh hook for
    * callers whose underlying files changed mid-session.
    */
  def invalidate(s: SparkSession, k: K): Unit = {
    val c = m.synchronized(m.remove((s, k)))
    if (c != null) c.synchronized(evictQuietly(c))
  }

  /** Live entry count (stopped-session entries may still be counted until
    * the next access sweeps them).
    */
  def size: Int = m.synchronized(m.size())
}

/** The DataFrame specialization: one `persist()` per (session, key);
  * eviction unpersists, so a long-lived interactive session that
  * dedups/overlaps many distinct inputs cycles executor storage instead
  * of pinning every plan it ever touched.
  */
final class SessionMemo[K](maxEntries: Int = 64)
    extends SessionMemoOf[K, DataFrame](
      maxEntries,
      (s, df) => try if (!s.sparkContext.isStopped) df.unpersist(blocking = false)
                 catch { case _: Throwable => () })
