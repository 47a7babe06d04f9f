package graft.engine.rel

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Typed UDAF surface (SURVEY.md §2.3 #45): a Gini coefficient
  * `Aggregator` registered via `functions.udaf` — an aggregation Spark
  * has no built-in for, exercised per nation over order totals.
  *
  * Formula (sample Gini, values sorted ascending, 1-based rank i):
  *   G = (2·Σ i·xᵢ) / (n·Σ xᵢ) − (n+1)/n
  * Tie order doesn't affect Σ i·xᵢ (equal values commute), so the
  * result is deterministic and oracle-checkable.
  *
  * Scale note: the buffer collects the group's values — right for
  * bounded per-group cardinality (k nations). For unbounded groups at
  * 100 TB the same formula is computed with window `row_number` + two
  * `sum`s instead; that form is exactly what the DuckDB oracle runs,
  * proving the two formulations equivalent.
  */
case class GiniBuf(xs: Seq[Double])

object GiniAgg extends Aggregator[Double, GiniBuf, Double] {
  override def zero: GiniBuf = GiniBuf(Vector.empty)
  override def reduce(b: GiniBuf, a: Double): GiniBuf = GiniBuf(b.xs :+ a)
  override def merge(a: GiniBuf, b: GiniBuf): GiniBuf = GiniBuf(a.xs ++ b.xs)
  override def finish(b: GiniBuf): Double = {
    val sorted = b.xs.sorted
    val n = sorted.length.toDouble
    val total = sorted.sum
    if (n == 0 || total == 0.0) 0.0
    else {
      val weighted = sorted.iterator.zipWithIndex
        .map { case (x, i) => (i + 1) * x }.sum
      2.0 * weighted / (n * total) - (n + 1.0) / n
    }
  }
  override def bufferEncoder: Encoder[GiniBuf] = Encoders.product[GiniBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object Udafs {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_udaf_gini" -> ((s, d) => {
      val gini = udaf(GiniAgg)
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(round(gini(col("o_totalprice")), 6).as("gini"))
        .orderBy("n_name")
    }),
  )

  val oracles: Map[String, String] = Map(
    // window-rank formulation of the identical formula. The zero-mass
    // CASE states the DECLARED semantics (gini of a zero-sum group is
    // 0.0, GiniAgg.finish's own special case) — without it DuckDB's
    // x/0 DOUBLE yields NULL where the engine yields 0.0 (inert on
    // TPC-H's strictly positive totalprice; live on adversarial data)
    "q_udaf_gini" ->
      """WITH j AS (SELECT n_name, o_totalprice AS x, o_orderkey
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |r AS (SELECT n_name, x,
        |  ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY x, o_orderkey) AS i
        |  FROM j)
        |SELECT n_name,
        |  CASE WHEN SUM(x) = 0 THEN 0.0 ELSE
        |    ROUND(2.0 * SUM(i * x) / (COUNT(*) * SUM(x)) - (COUNT(*) + 1.0) / COUNT(*), 6)
        |  END AS gini
        |FROM r GROUP BY n_name ORDER BY n_name""".stripMargin,
  )
}
