package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
    // mirror of minhashTruthPairs stages, timed one by one
    val tok = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .distinct()
    t("tok distinct+checkpoint")(tok.localCheckpoint(true).count())
    val tokC = tok.localCheckpoint(true)
    val dfreq = tokC.groupBy("token").agg(count(lit(1)).as("df"))
    val wOrd = Window.partitionBy("doc_id").orderBy("df", "token")
    val wDoc = Window.partitionBy("doc_id")
    val prefix = tokC.join(dfreq, "token")
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wDoc))
      .filter(col("rn") <= (col("n") / 10).cast("bigint") + 1)
      .select("doc_id", "token")
    t("prefix build")(prefix.count())
    val prefC = prefix.localCheckpoint(true)
    val flags = spark.read.parquet(s"$d/documents.parquet").select(col("doc_id"))
      .withColumn("samp", expr(
        """aggregate(transform(sequence(1, 8),
          |  i -> CAST(instr('0123456789abcdef',
          |         substring(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), i, 1)) - 1 AS BIGINT)),
          |  CAST(0 AS BIGINT), (acc, x) -> acc * 16 + x) % 20 = 0""".stripMargin))
    val cand = prefC.join(flags.filter(col("samp")).select("doc_id"), "doc_id")
      .select(col("doc_id").as("s"), col("token"))
      .join(prefC.select(col("doc_id").as("o"), col("token")), "token")
      .filter(col("s") =!= col("o"))
      .select(least(col("s"), col("o")).as("d1"), greatest(col("s"), col("o")).as("d2"))
      .distinct()
    t("cand join+distinct")(System.err.println("cand=" + cand.count()))
    val candC = cand.localCheckpoint(true)
    val docsArr = tokC.groupBy("doc_id")
      .agg(sort_array(collect_list("token")).as("arr"), count(lit(1)).as("sz"))
    t("docsArr")(docsArr.count())
    val truth = candC
      .join(docsArr.select(col("doc_id").as("d1"), col("arr").as("a1"), col("sz").as("s1")), "d1")
      .join(docsArr.select(col("doc_id").as("d2"), col("arr").as("a2"), col("sz").as("s2")), "d2")
      .withColumn("i", size(array_intersect(col("a1"), col("a2"))).cast("long"))
      .filter(col("i") / (col("s1") + col("s2") - col("i")) >= 0.9)
      .select("d1", "d2")
    t("verify array_intersect")(System.err.println("truth=" + truth.count()))
    spark.stop()
  }
}
