package graft.engine

/** Scratch directories for session-scoped intermediates (the skew-join
  * dim, sink round-trip layouts): created under the system temp root
  * and deleted by a JVM shutdown hook, so repeated sessions stop
  * accumulating orphan directories (round-9 verdict #3 — every session
  * used to leak one `graft-skewdim*` dir). A hook per directory is
  * fine at this cardinality (a handful per JVM, memoized per session
  * by the callers' SessionCaches). */
object TempDirs {
  def scratch(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(p.toFile)))
    p.toString
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete()
    ()
  }
}
