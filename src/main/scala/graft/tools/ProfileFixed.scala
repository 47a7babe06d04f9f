package graft.tools

import org.apache.spark.sql.SparkSession

/** Builder-only: separates per-query FIXED cost (planning + codegen
  * compile + stage scheduling) from data cost by running each query
  * twice in one session — the second run reuses the janino cache, so
  * run1 − run2 ≈ compile cost. At sf0.1 (5k docs, 31-token vocab) the
  * data cost is near-zero, so run2 is the floor the bench could reach. */
object ProfileFixed {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val qs = Seq("simhash_dedup", "char_entropy", "bpe_merge_candidates",
      "bigram_logppl", "ngram_jaccard_dedup", "cooccurrence_pmi",
      "q_recursive_hierarchy", "mime_sniff_audit", "q_grouping_sets",
      "q_join_salted", "dedup_jaccard_histogram")
    // warm the engine once
    spark.range(1000).selectExpr("sum(id)").count()
    for (q <- qs) {
      val fn = graft.SparkEntry.queries(q)
      val t1 = time(fn(spark, d).count())
      val t2 = time(fn(spark, d).count())
      val t3 = time(fn(spark, d).count())
      System.err.println(f"[fixed] $q%-26s run1 $t1%6.2f  run2 $t2%6.2f  run3 $t3%6.2f")
    }
    spark.stop()
  }
}
