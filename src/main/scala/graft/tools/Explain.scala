package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Plan auditor: prints the formatted physical plan for the given
  * query keys (or a default set of scale-critical ones) and greps for
  * the properties the 100 TB design demands — parquet filter pushdown,
  * broadcast joins for dimensions, whole-stage codegen coverage.
  *
  * Usage: runMain graft.tools.Explain <sfDir> [queryKey ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // NOTE: queries whose pipelines sit behind a memoized eager
    // checkpoint (minhash_near_dedup, near_dedup_groups, ann_lsh_topk,
    // ann_ivf_topk) are NOT audited here — their declared plan is a
    // LogicalRDD scan and the interesting subtree ran at build time;
    // a pushdown/broadcast audit of the checkpoint READ would print a
    // false regression signal. ScaleShapeSpec asserts those shapes on
    // the internal (pre-checkpoint) frames instead.
    val keys = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_filter_project", "q_join_5way", "q_agg_groupby", "wssse",
        "bd_silhouette", "cosine_topk", "exact_dedup", "q_join_range",
        "knn_per_vector", "semdedup_embedding", "q_join_salted",
        "decontaminate_ngram", "sink_partitioned_roundtrip",
        "event_funnel", "retention_cohort", "bigram_logppl",
        "kl_source_divergence", "q_histogram", "bpe_merge_candidates",
        "simhash_dedup", "exact_substring_dedup", "char_entropy",
        "rag_chunk", "embedding_quantize", "source_dsv2_roundtrip")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      println(s"\n========== $k ==========")
      // per-key guard (ScanAudit's discipline): one renamed/mistyped
      // key must not abort the audit of every later key
      try {
        val df = SparkEntry.queries(k)(spark, sfDir)
        // materialize THIS queryExecution so AQE finalizes (count()
        // would build a separate execution) — via the internal RDD, so
        // no result rows land on the driver even for corpus-sized output
        df.queryExecution.toRdd.count()
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        val plan = df.queryExecution.executedPlan.toString
        val pushed = plan.linesIterator.exists(l =>
          l.contains("PushedFilters: [") && !l.contains("PushedFilters: []"))
        val bcast = plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange")
        // executed plans mark whole-stage codegen spans as `*(n)`
        val codegen = plan.contains("WholeStageCodegen") || plan.linesIterator.exists(_.contains("*("))
        println(s"--- audit: pushedFilters=$pushed broadcast=$bcast wholeStageCodegen=$codegen")
      } catch {
        case e: Throwable => println(s"--- audit FAILED for $k: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
