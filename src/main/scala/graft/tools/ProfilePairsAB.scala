package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.SessionCache
import graft.engine.text.TextOps

/** Scratch A/B profiler for the minhash pair chain: N cold builds
  * (throwaway memo epoch each) of minhashPairs at the given SF,
  * printing per-iteration wall times and the min — tighter than the
  * bench's min-of-2 when host noise runs ±0.4 s. */
object ProfilePairsAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(6)
    // NOTE: heap is whatever the launching JVM started with (sbt's
    // -Xmx) — spark.driver.memory can't change a running JVM, so it
    // is deliberately NOT set here; record the launcher heap alongside
    // cross-round A/B numbers.
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val times = (1 to n).map { i =>
      val t0 = System.nanoTime()
      SessionCache.freshEpoch(s"ab$i|") {
        TextOps.minhashPairs(spark, sfDir).queryExecution.toRdd.count()
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"iter $i: $dt%.3f s")
      dt
    }
    println(f"min=${times.min}%.3f median=${times.sorted.apply((n - 1) / 2)}%.3f")
    spark.stop()
  }
}
