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
    * NEW session deletes stale graft scratch dirs. Ownership-gated
    * (round-13 ADVICE): every scratch dir carries a `.graft-owner`
    * marker holding the creating JVM's pid, and the sweep deletes ONLY
    * dirs whose marker names a pid that is no longer alive. A dir
    * without the marker is never touched — a live long-soak session
    * (whose mtime stops updating once it only reads) and any
    * third-party dir that happens to share the name prefix are both
    * safe. Pid reuse can only make a dead owner look alive, which
    * leaks the dir until the reused pid exits — the safe direction.
    *
    * MARKERLESS fallback (round-14 ADVICE): a dir with NO marker can
    * still be an orphan — pre-marker sessions left a dozen on this
    * host, and a SIGKILL landing between createTempDirectory and the
    * marker write strands one forever — so markerless graft-prefixed
    * dirs older than [[markerlessTtlMs]] (7 days by mtime, orders of
    * magnitude past any live session on this host) are reclaimed by
    * the old conservative-TTL rule. A LIVE session's dirs all carry
    * markers within microseconds of creation, so the TTL arm can
    * only ever see crash leftovers. */
  private val sweepPrefixes =
    Seq("graft_", "graft-") // every scratch() caller uses one of these
  private[graft] val ownerMarker = ".graft-owner"
  private[graft] val markerlessTtlMs = 7L * 24 * 3600 * 1000
  private[graft] def sweepOrphans(): Unit = {
    val root = new java.io.File(System.getProperty("java.io.tmpdir"))
    val kids = root.listFiles()
    val now = System.currentTimeMillis()
    if (kids != null) kids.foreach { f =>
      if (f.isDirectory && sweepPrefixes.exists(f.getName.startsWith)) {
        val marker = new java.io.File(f, ownerMarker)
        val ownerDead = marker.isFile && {
          val pid = try {
            new String(java.nio.file.Files.readAllBytes(marker.toPath),
                       java.nio.charset.StandardCharsets.UTF_8).trim.toLong
          } catch { case _: Exception => -1L }
          pid > 0 && !ProcessHandle.of(pid).map[Boolean](_.isAlive).orElse(false)
        }
        val markerlessStale =
          !marker.exists() && now - f.lastModified() > markerlessTtlMs
        if (ownerDead || markerlessStale) deleteRecursively(f)
      }
    }
  }
  private lazy val orphansSwept: Unit = sweepOrphans()

  def scratch(prefix: String): String = {
    hookInstalled
    orphansSwept
    val p = java.nio.file.Files.createTempDirectory(prefix)
    java.nio.file.Files.write(
      p.resolve(ownerMarker),
      ProcessHandle.current().pid().toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
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
