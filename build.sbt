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
