package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Scale-shape proofs (SURVEY.md §7.7): the physical-plan properties
  * the 100 TB design depends on, asserted on real plans —
  * bucketing removes the join shuffle; partition layout prunes the
  * scan; dimension joins broadcast.
  */
class ScaleShapeSpec extends SparkSpec {

  test("bucketed tables join without shuffling the fact table") {
    val tmp = Files.createTempDirectory("bucketed").toString
    Tables.lineitem(spark, sf0001).write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$tmp/li").saveAsTable("li_bucketed")
    Tables.orders(spark, sf0001).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$tmp/ord").saveAsTable("ord_bucketed")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"fact side must read pre-bucketed, not shuffle:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"orders side must read pre-bucketed, not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("partitioned layout prunes the scan to the queried partition") {
    val tmp = Files.createTempDirectory("parted").toString
    Tables.orders(spark, sf0001)
      .withColumn("yr", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("yr").parquet(s"$tmp/orders")
    val q = spark.read.parquet(s"$tmp/orders").filter(col("yr") === 1996)
      .agg(count(lit(1)))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("(yr"),
      s"expected partition pruning on yr:\n$plan")
  }

  test("dimension joins broadcast (no shuffle of the small side)") {
    val j = graft.SparkEntry.queries("q_join_5way")(spark, sf0001)
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"region/nation should broadcast:\n$plan")
  }
}
