package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Bulk formatted-plan dumper for the optimization rounds: executes
  * each declared query (so AQE finalizes) and writes its
  * `explain("formatted")` output to `<outDir>/<query>_<suffix>.txt`,
  * plus a one-line shape summary per query on stdout
  * (#Exchange / join strategies / #parquet scans) so a whole-surface
  * plan audit is one grep.
  *
  * Usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> [queryKey ...]
  * (no keys = every declared query).
  */
object ExplainDump {
  /** Checkpoint-hidden BUILDER plans (VERDICT r15 what's-wrong #3):
    * the declared ann_lsh_topk / ann_ivf_topk / ann_filtered_topk
    * after-plans show only `Scan ExistingRDD` because their heavy
    * subtree is a memoized localCheckpoint — these pseudo-queries dump
    * the builder plan itself so shape claims about the cold build are
    * committed evidence, not inference. Named with a `builder_` prefix
    * so they can never collide with (or be mistaken for) a declared
    * query; they are NOT part of the bench/oracle surface. */
  private val builders: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "builder_ann_lsh" -> ((s, d) => graft.engine.sim.Similarity.annLshPlan(s, d)),
    "builder_ann_ivf" -> ((s, d) => graft.engine.sim.Similarity.annIvfPlan(s, d)),
    "builder_cell_ranked" -> ((s, d) => graft.engine.sim.Similarity.cellRanked(s, d)))

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val keys = if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.queries.keys.toSeq.sorted ++ builders.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // a whole-surface plan audit with failing queries must not look
    // green: track failures and exit nonzero (ADVICE r15 #4 — the old
    // per-query catch printed FAILED but still exited 0)
    var failed = List.empty[String]
    keys.foreach { k =>
      try {
        spark.sparkContext.setJobDescription(s"explain:$k")
        val df = builders.getOrElse(k, SparkEntry.queries(k))(spark, sfDir)
        // materialize THIS queryExecution so AQE finalizes (the
        // Explain tool's discipline); no rows land on the driver
        df.queryExecution.toRdd.count()
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${k}_$suffix.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val ex = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(plan).size
        val smj = "SortMergeJoin".r.findAllIn(plan).size
        val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
        val shj = "ShuffledHashJoin".r.findAllIn(plan).size
        val bnl = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
        val scans = "Scan parquet".r.findAllIn(plan).size
        val sorts = "(?m)^\\(\\d+\\) Sort".r.findAllIn(plan).size
        println(s"SHAPE $k exchanges=$ex smj=$smj bhj=$bhj shj=$shj bnlj=$bnl scans=$scans sorts=$sorts")
      } catch {
        case e: Throwable =>
          failed ::= k
          println(s"SHAPE $k FAILED ${e.getMessage}")
      }
    }
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[explain-dump] ${failed.size} failed: ${failed.reverse.mkString(", ")}")
      sys.exit(1)
    }
  }
}
