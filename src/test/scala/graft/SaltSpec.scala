package graft

import org.apache.spark.sql.functions._
import graft.engine.rel.Salt

/** Salted-join semantics + scatter: results identical to the plain
  * equi-join, and a hot key's rows actually spread across salt values
  * (the whole point — one hot key no longer lands in one shuffle
  * partition).
  */
class SaltSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin ≡ plain join on a skewed key, and the hot key scatters") {
    // 10k rows of hot key 7, a few rows each of keys 0-9
    val skewed = spark.range(10000).select(lit(7L).as("k"), col("id").as("payload"))
      .union(spark.range(100).select((col("id") % 10).as("k"), (col("id") + 100000).as("payload")))
    val dim = (0L until 10L).map(k => (k, s"name$k")).toDF("k", "k_name")

    val plain = skewed.join(dim, "k")
      .select("k", "payload", "k_name").collect().toSet
    val salted = Salt.saltedJoin(skewed, dim, "k", salts = 8)
      .select("k", "payload", "k_name").collect().toSet
    assert(salted == plain, "salting must not change join semantics")

    val spread = skewed.filter(col("k") === 7)
      .withColumn("s", Salt.saltCol(8, col("k"), col("payload")))
      .select("s").distinct().count()
    assert(spread == 8, s"hot key should scatter across all 8 salts, got $spread")
  }

  test("salt is deterministic across evaluations (retry/reproducibility)") {
    val df = spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("v"))
    val a = df.withColumn("s", Salt.saltCol(16, col("k"), col("v"))).collect()
    val b = df.withColumn("s", Salt.saltCol(16, col("k"), col("v"))).collect()
    assert(a.toSeq == b.toSeq)
  }
}
