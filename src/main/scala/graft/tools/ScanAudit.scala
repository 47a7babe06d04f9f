package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Double-compute sweep: executes every declared query at the given SF
  * and reports how many parquet scans its FINAL plan contains — a
  * query whose shared subtree feeds k consumers without a checkpoint
  * shows up as k scans of the same table (the bigram_logppl /
  * simhash_dedup pattern: 3 and 5 scans for one logical read).
  * Queries reading ≥3 files legitimately exist (multi-table joins), so
  * the output is a review list, not an assertion.
  *
  * Usage: runMain graft.tools.ScanAudit [sfDir] [minScans]
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val minScans = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (k, f) =>
      try {
        val df = f(spark, sfDir)
        df.queryExecution.toRdd.foreach(_ => ())
        val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
        val scans = "Scan parquet".r.findAllIn(plan).size
        if (scans >= minScans) Some((k, scans)) else None
      } catch { case e: Throwable =>
        System.err.println(s"[scan-audit] $k failed: ${e.getMessage}"); None
      }
    }
    println(s"== queries with >= $minScans parquet scans in the final plan ==")
    results.sortBy(-_._2).foreach { case (k, n) => println(f"$n%3d  $k") }
    spark.stop()
  }
}
