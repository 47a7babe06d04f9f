ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "clusterindicesspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // UTF-8 JVM (file.encoding half): the harness host's default locale
  // is ASCII, under which a unicode partition value becomes an
  // unencodable filesystem path (InvalidPathException inside
  // partitioned writes); production Spark runs UTF-8. sun.jnu.encoding
  // is NOT settable via -D (the VM derives it natively from the
  // locale), so the envVars below carry the locale half.
  "-Dfile.encoding=UTF-8",
  // 24g default: the harness box has 128 GiB, and local[32] at sf0.1
  // in 8g was visibly GC-bound (bench total ~163 s at 8g vs ~159 s at
  // 32g, with far larger run-to-run variance at the small heap)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)

// the sun.jnu.encoding half of the UTF-8 contract (see javaOptions):
// forked run/test JVMs inherit a UTF-8 locale even on this ASCII host
run / envVars += ("LC_ALL" -> "C.utf8")
Test / envVars += ("LC_ALL" -> "C.utf8")

// Driver<->bench JSON contract (VERDICT r15 "what's wrong" #1): the
// driver invokes `sbt "runMain graft.Bench"` and tries to parse the
// one-line summary JSON from the process output, but sbt's logger
// wraps every forked-output line in "[info] "/"[error] " and prints
// its own "[success] Total time..." LAST — the parse failed every
// round ("parsed": null in BENCH_r14/r15, empty PERF per_query).
// Two measurement-interface fixes, no timing-protocol change:
//  1. forked run output passes through UNPREFIXED, so the bench's own
//     JSON lines (per-query + full summary + compact) arrive raw;
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
//  2. a shutdown hook in the sbt JVM re-emits bench_summary.json
//     (written by Bench during this invocation — mtime-guarded) to
//     raw stdout at process exit, AFTER sbt's "[success]" line, so
//     the full {"metric":"total",...,"queries":{all 184}} JSON is the
//     FINAL unprefixed stdout line of the bench invocation. compile /
//     test / Verify runs don't touch the file, so the hook is silent
//     for them. The system-property guard keeps `reload` from
//     stacking hooks.
val graftBenchTailHook: Unit =
  if (System.getProperty("graft.benchTailHook") == null) {
    System.setProperty("graft.benchTailHook", "1")
    val loadedAt = System.currentTimeMillis()
    java.lang.Runtime.getRuntime.addShutdownHook(new Thread(() => {
      val f = new java.io.File(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_summary.json"))
      if (f.isFile && f.lastModified() >= loadedAt) {
        val out = new java.io.FileOutputStream(java.io.FileDescriptor.out)
        out.write(java.nio.file.Files.readAllBytes(f.toPath))
        out.flush()
      }
    }))
  }
