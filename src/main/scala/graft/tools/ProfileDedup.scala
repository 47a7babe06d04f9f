package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.text.TextOps

/** Scratch profiler for the dedup/text family's shared-cache tiers
  * (builder-only): times each memoized build cold, then the declared
  * consumers warm — the per-query bench numbers smear the shared
  * materializations onto whichever consumer runs first, so this is
  * the only view that shows where the family's seconds actually go. */
object ProfileDedup {
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
    // shared tiers, dependency order
    t("distinctTokens")(TextOps.distinctTokens(spark, d).count())
    t("pairs r4 (dup-free chain)")(TextOps.minhashPairs(spark, d).count())
    t("pairs r8")(TextOps.minhashPairs(spark, d, rowsPerBand = 8).count())
    t("truth")(TextOps.minhashTruthCached(spark, d).count())
    t("trigrams")(TextOps.ngramSetCached(spark, d, 3, Seq("doc_id")).count())
    t("8grams")(TextOps.ngramSetCached(spark, d, 8, Seq("doc_id", "source")).count())
    // declared consumers, warm caches
    for (q <- Seq("exact_dedup", "minhash_near_dedup", "near_dedup_groups",
      "dedup_survivors", "dedup_cluster_stats", "dedup_source_matrix",
      "dedup_edit_distance", "dedup_jaccard_histogram", "minhash_recall",
      "minhash_recall_b1r8", "incremental_dedup", "simhash_dedup",
      "ngram_jaccard_dedup", "winnow_fingerprint", "boilerplate_ngrams",
      "ngram_novelty", "decontaminate_ngram", "chunk_dedup",
      "stream_content_dedup", "bpe_merge_candidates", "cooccurrence_pmi",
      "bigram_logppl", "char_entropy"))
      t(s"warm $q")(graft.SparkEntry.queries(q)(spark, d).count())
    spark.stop()
  }
}
