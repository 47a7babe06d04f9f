package graft.engine

/** Scratch directories for session-scoped intermediates (the skew-join
  * dim, sink round-trip layouts): created under the system temp root
  * and deleted at JVM exit, so repeated sessions stop accumulating
  * orphan directories (round-9 verdict #3 — every session used to
  * leak one `graft-skewdim*` dir). ONE shutdown hook drains a
  * concurrent queue of registered paths — bench fresh-epoch runs
  * create a scratch dir per cold attempt, so a hook-per-dir design
  * would grow the hook set unboundedly in a long bench session. */
object TempDirs {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var p = dirs.poll()
      while (p != null) {
        deleteRecursively(p.toFile)
        p = dirs.poll()
      }
    }))

  /** Orphan sweep, run once per JVM on first scratch(): the shutdown
    * hook cannot run when a JVM is SIGKILLed (driver timeouts leave
    * one orphan set per killed run — observed: a dozen graft_febs* /
    * graft-capspec* dirs from killed sessions on this host), so each
    * NEW session deletes stale graft scratch dirs. Age-gated at 24 h
    * (the gbin-manifest TTL discipline): a dir that old cannot belong
    * to a live bench/verify session, so a concurrent process is never
    * raced. Only OUR prefixes are touched. */
  private val sweepPrefixes =
    Seq("graft_", "graft-") // every scratch() caller uses one of these
  private[graft] def sweepOrphans(now: Long = System.currentTimeMillis(),
                                   ttlMs: Long = 24L * 3600 * 1000): Unit = {
    val root = new java.io.File(System.getProperty("java.io.tmpdir"))
    val kids = root.listFiles()
    if (kids != null) kids.foreach { f =>
      if (f.isDirectory && sweepPrefixes.exists(f.getName.startsWith)
          && now - f.lastModified() > ttlMs)
        deleteRecursively(f)
    }
  }
  private lazy val orphansSwept: Unit = sweepOrphans()

  def scratch(prefix: String): String = {
    hookInstalled
    orphansSwept
    val p = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete()
    ()
  }
}
