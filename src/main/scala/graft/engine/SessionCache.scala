package graft.engine

import org.apache.spark.sql.SparkSession

/** Per-session memoization, WEAK-keyed on the SparkSession itself:
  * when a session is GC'd its cached values (checkpointed frames,
  * layout paths, …) become collectable with it — no JVM-lifetime
  * growth across sessions, and no identity-hash-reuse hazard. Within
  * a session, entries are bounded by (sfDir × config) — a handful —
  * because throwaway-epoch entries (see [[SessionCache.freshEpoch]])
  * are EVICTED when the epoch exits, so repeated cold re-timings
  * cannot pin checkpointed blocks for the session's lifetime.
  *
  * CLUSTER CAVEAT for cached DataFrames: `localCheckpoint` blocks are
  * not fault-tolerant (lineage is truncated); at real scale the
  * durable form of a shared artifact is an explicit Sinks
  * materialization — these caches are the single-process
  * bench/pipeline convenience.
  *
  * IMMUTABLE-FIXTURE ASSUMPTION: keys are (sfDir, config) strings,
  * never data fingerprints — a parquet table rewritten IN PLACE under
  * a cached sfDir within one session serves the stale artifact. For
  * most memos that only re-serves an identical recomputation or
  * affects timing, but for memos whose value gates ANOTHER query's
  * rows (the token bloom filters in Sketches/RelQueries: a stale
  * filter silently changes which rows a bloom-gated join emits) it is
  * a correctness assumption. The two bloom memos therefore fold a
  * [[SessionCache.dataFingerprint]] (file count + max mtime + bytes)
  * into their keys, so an in-place rewrite invalidates instead of
  * serving stale bits (pinned in SketchSpec); the remaining memos
  * keep the plain (sfDir, config) key under the driver's
  * written-once-per-scale-factor fixture discipline.
  */
final class SessionCache[V] {
  SessionCache.register(this)

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
    perSession.computeIfAbsent(SessionCache.epoch + key, _ => build)
  }

  /** Drop every entry whose key carries the given epoch prefix — the
    * artifacts a throwaway epoch built are never read again, and
    * keeping them referenced would pin their checkpointed RDD blocks
    * against the ContextCleaner. */
  private[engine] def evictEpoch(prefix: String): Unit = store.synchronized {
    store.values.forEach(m => m.keySet.removeIf(_.startsWith(prefix)))
  }
}

object SessionCache {
  /** Global memo EPOCH, folded into every cache key ("" in normal
    * operation). [[freshEpoch]] lets the bench time an honest COLD
    * execution of a query whose own work product is memoized (sweep
    * table, sink layouts, checkpointed ANN plans, sketches, resolved
    * dedup groups): under the normal epoch those queries would serve
    * their memo and bill a lookup as the query's time. The previous
    * epoch is restored afterward AND every entry built under the
    * temporary epoch is evicted from every live cache — without the
    * eviction each cold attempt permanently pinned its checkpointed
    * chain (near_dedup_groups orphans tokens+pairs+groups per
    * attempt) in the 8 g bench driver. Single-threaded use only (the
    * bench loop) — queries themselves never change the epoch. */
  @volatile private[graft] var epoch: String = ""

  /** All caches ever constructed, weakly held, so [[freshEpoch]] can
    * evict throwaway-epoch entries across the whole engine. */
  private val registry = new java.util.WeakHashMap[SessionCache[_], Unit]()
  private def register(c: SessionCache[_]): Unit =
    registry.synchronized { registry.put(c, ()) }

  def freshEpoch[T](tag: String)(f: => T): T = {
    val prev = epoch
    val e = s"~$tag~"
    epoch = e
    try f finally {
      epoch = prev
      registry.synchronized {
        registry.keySet.forEach(_.evictEpoch(e))
      }
    }
  }

  /** Cheap data fingerprint of a parquet table path (a single file in
    * the driver layout, or a part-file directory): file count + max
    * mtime + total bytes, one directory level deep. Fold it into a
    * memo key when the memo's VALUE gates another query's rows (the
    * token/urgent bloom filters) — it turns the documented
    * immutable-fixture ASSUMPTION into an invalidation: rewriting a
    * fixture in place within one session rotates the key and the memo
    * rebuilds, instead of silently serving the stale filter. Costs
    * one stat per call — nothing against the builds it guards. */
  def dataFingerprint(path: String): String = {
    val f = new java.io.File(path)
    if (!f.exists()) "absent"
    else if (f.isFile) s"1:${f.lastModified}:${f.length}"
    else {
      val kids = f.listFiles()
      if (kids == null || kids.isEmpty) "0:0:0"
      else s"${kids.length}:${kids.map(_.lastModified).max}:${kids.map(_.length).sum}"
    }
  }
}
