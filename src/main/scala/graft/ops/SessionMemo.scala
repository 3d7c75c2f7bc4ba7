package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo of persisted DataFrames: one persist per
  * (session, key) instead of one per call — re-persisting an identical
  * plan leaks storage handles and spams "already cached" warnings.
  *
  * Entries of STOPPED sessions are evicted on every access, so the memo
  * cannot grow across session lifetimes (test suites, repeated driver
  * mains); their cached blocks died with the session's executors anyway.
  *
  * Staleness semantics are exactly `persist()`'s: if the files under a
  * memoized plan are overwritten mid-session, the memo — like any
  * persisted DataFrame in that session — keeps serving the materialized
  * snapshot until the session ends (or the caller unpersists and
  * rebuilds). Callers that mutate source files mid-session must not use
  * a memo, with or without this class.
  */
final class SessionMemo[K] {
  private val m = new ConcurrentHashMap[(SparkSession, K), DataFrame]

  def getOrElseUpdate(s: SparkSession, k: K)(build: => DataFrame): DataFrame = {
    m.keySet.removeIf(e => e._1.sparkContext.isStopped)
    m.computeIfAbsent((s, k), _ => build)
  }
}
