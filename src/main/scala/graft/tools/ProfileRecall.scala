package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for minhash_recall stage costs (builder-only). */
object ProfileRecall {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val truth = graft.engine.text.TextOps.minhashTruthPairs(spark, d)
    t("truth.count")(System.err.println("n_truth=" + truth.count()))
    t("truth.count again")(truth.count())
    val full = graft.SparkEntry.queries("minhash_recall")(spark, d)
    t("minhash_recall full")(full.collect().foreach(r => System.err.println(r)))
    spark.stop()
  }
}
