package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.SessionCache
import graft.engine.text.TextOps

/** Parity auditor for the hot-bucket SHARD (TextOps.minhashPairs):
  * builds the pair surface with the default shard size (1M — no
  * fixture bucket shards) and again with sharding FORCED ACTIVE
  * (shardSize small enough that every fixture bucket splits), and
  * diffs the two as sets. MinhashCapSpec pins this bit-identical at
  * sf0.001 and under scalacheck; this tool checks the same claim at
  * any SF on demand (too slow for the suite at sf0.1).
  *
  * Usage: runMain graft.tools.ShardParity [sfDir] [forcedShard]
  */
object ShardParity {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val forced = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def surface(tag: String): Set[(Long, Long)] =
      SessionCache.freshEpoch(s"shardparity-$tag|") {
        TextOps.minhashPairs(spark, sfDir).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }

    val base = surface("default")
    spark.conf.set("graft.neardedup.shardSize", forced.toString)
    val sharded =
      try surface(s"forced$forced")
      finally spark.conf.unset("graft.neardedup.shardSize")

    val onlyBase = base -- sharded
    val onlySharded = sharded -- base
    println(s"default: ${base.size} pairs; shard=$forced: ${sharded.size} pairs")
    if (onlyBase.isEmpty && onlySharded.isEmpty)
      println(s"MATCH: pair surface bit-identical under forced shard=$forced at $sfDir")
    else {
      println(s"MISMATCH: ${onlyBase.size} only-default, ${onlySharded.size} only-sharded")
      (onlyBase.take(5) ++ onlySharded.take(5)).foreach(println)
      sys.exit(1)
    }
    spark.stop()
  }
}
