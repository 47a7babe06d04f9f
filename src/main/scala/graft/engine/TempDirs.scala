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

  def scratch(prefix: String): String = {
    hookInstalled
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
