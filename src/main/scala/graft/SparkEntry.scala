package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.engine.cluster.{ClusterQueries, KMeansSweep}
import graft.engine.multimodal.Multimodal
import graft.engine.rel.{RelQueries, Udafs}
import graft.engine.sim.Similarity
import graft.engine.sketch.Sketches
import graft.engine.stream.StreamQueries
import graft.engine.text.TextOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query packs live under `graft.engine.*`; each contributes a map of
  * named queries plus a map of DuckDB oracle SQL for the checkable
  * subset (SURVEY.md §2 legend).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ClusterQueries.queries("wssse")(spark, "/root/testdata/sf0.001")

  /** The individual packs, exposed so InvariantsSpec can assert
    * cross-pack key uniqueness: `++` is last-wins, so a query name
    * declared in two packs would silently shadow one implementation —
    * the shadowed one never benched or verified again while every
    * name-presence check still passes. */
  private[graft] val queryPacks: Seq[Map[String, (SparkSession, String) => DataFrame]] =
    Seq(ClusterQueries.queries, RelQueries.queries, Udafs.queries,
      StreamQueries.queries, TextOps.queries, Similarity.queries,
      KMeansSweep.queries, Multimodal.queries, Sketches.queries,
      graft.engine.sink.Sinks.queries)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queryPacks.reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ClusterQueries.oracles ++ RelQueries.oracles ++ Udafs.oracles ++
      StreamQueries.oracles ++ TextOps.oracles ++ Similarity.oracles ++
      KMeansSweep.oracles ++ Multimodal.oracles ++ Sketches.oracles ++
      graft.engine.sink.Sinks.oracles
}
