package graft.tools
import org.apache.spark.sql.SparkSession

/** One-off plan printer for spec authoring: runMain graft.tools.PlanDump <query> [sfDir]. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(q)(spark, d)
    df.collect()
    println("==== executedPlan ====")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
