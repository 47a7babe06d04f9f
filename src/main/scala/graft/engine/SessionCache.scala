package graft.engine

import org.apache.spark.sql.SparkSession

/** Per-session memoization, WEAK-keyed on the SparkSession itself:
  * when a session is GC'd its cached values (checkpointed frames,
  * layout paths, …) become collectable with it — no JVM-lifetime
  * growth across sessions, and no identity-hash-reuse hazard. Within
  * a session, entries are bounded by (sfDir × config) — a handful.
  *
  * CLUSTER CAVEAT for cached DataFrames: `localCheckpoint` blocks are
  * not fault-tolerant (lineage is truncated); at real scale the
  * durable form of a shared artifact is an explicit Sinks
  * materialization — these caches are the single-process
  * bench/pipeline convenience.
  */
final class SessionCache[V] {
  private val store =
    new java.util.WeakHashMap[SparkSession, java.util.concurrent.ConcurrentHashMap[String, V]]()

  def get(s: SparkSession, key: String)(build: => V): V = {
    val perSession = store.synchronized {
      var m = store.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, V]()
        store.put(s, m)
      }
      m
    }
    perSession.computeIfAbsent(key, _ => build)
  }
}
