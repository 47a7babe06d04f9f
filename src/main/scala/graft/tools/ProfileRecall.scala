package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch profiler for minhash_recall stage costs (builder-only).
  *
  * Mirrors the CURRENT `TextOps.minhashTruthPairs` stages (it reuses
  * the package-private production inputs where they exist): map-side
  * `array_distinct(split)` token derivation — the explode+distinct
  * shuffle the old profiler still timed was removed from production
  * (~3 s at sf0.1) — the memoized per-doc array table for sizes and
  * verification arrays, and the exact-integer 10·min ≥ 9·max
  * size-ratio prefilter ahead of the wide `array_intersect` joins.
  * Each timed checkpoint is REUSED downstream (the old form rebuilt
  * every checkpointed stage untimed, doubling wall time and pinning
  * orphaned blocks). */
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
    import graft.engine.text.TextOps
    graft.engine.expr.GraftFunctions.register(spark)

    val tokC = t("tok distinct (map-side) ckpt")(
      TextOps.distinctTokens(spark, d).localCheckpoint(true))
    val docsArr = t("docTokenArrays ckpt")(TextOps.docTokenArrays(spark, d))
    val nTok = docsArr.select(col("doc_id"), size(col("arr")).cast("long").as("n"))
    val dfreq = tokC.groupBy("token").agg(count(lit(1)).as("df"))
    val wOrd = Window.partitionBy("doc_id").orderBy("df", "token")
    val prefC = t("prefix build ckpt")(
      tokC.join(dfreq, "token")
        .join(nTok, "doc_id")
        .withColumn("rn", row_number().over(wOrd))
        .filter(col("rn") <= (col("n") / 10).cast("bigint") + 1)
        .select("doc_id", "token")
        .localCheckpoint(true))
    // production sampFlags mirror: per-DOC fold_hex flag, equi-joined
    val w = spark.conf.get("graft.text.foldHexDigits", "8").toInt
    val flags = spark.read.parquet(s"$d/documents.parquet").select(col("doc_id"))
      .withColumn("samp",
        expr(s"fold_hex(md5(CAST(doc_id AS STRING)), $w) % 20 = 0"))
    val candC = t("cand join+distinct ckpt") {
      val c = prefC.join(flags.filter(col("samp")).select("doc_id"), "doc_id")
        .select(col("doc_id").as("s"), col("token"))
        .join(prefC.select(col("doc_id").as("o"), col("token")), "token")
        .filter(col("s") =!= col("o"))
        .select(least(col("s"), col("o")).as("d1"),
          greatest(col("s"), col("o")).as("d2"))
        .distinct()
        .localCheckpoint(true)
      System.err.println("cand=" + c.count()); c
    }
    val sz = docsArr.select(col("doc_id"), size(col("arr")).cast("long").as("sz"))
    val candSized = t("size-ratio prefilter")(
      candC
        .join(sz.select(col("doc_id").as("d1"), col("sz").as("s1")), "d1")
        .join(sz.select(col("doc_id").as("d2"), col("sz").as("s2")), "d2")
        .filter(least(col("s1"), col("s2")) * 10 >= greatest(col("s1"), col("s2")) * 9)
        .localCheckpoint(true))
    t("verify array_intersect") {
      val truth = candSized
        .join(docsArr.select(col("doc_id").as("d1"), col("arr").as("a1")), "d1")
        .join(docsArr.select(col("doc_id").as("d2"), col("arr").as("a2")), "d2")
        .withColumn("i", size(array_intersect(col("a1"), col("a2"))).cast("long"))
        .filter(col("i") / (col("s1") + col("s2") - col("i")) >= 0.9)
        .select("d1", "d2")
      System.err.println("truth=" + truth.count())
    }
    spark.stop()
  }
}
