package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The SQL face of the engine (SURVEY.md §3.2 EP3): every testdata
  * table registered as a temp view, so any declared capability is also
  * reachable via `spark.sql(...)` — same Catalyst path from a parsed
  * plan. The reference has no SQL surface; this is part of the
  * "idiomatic Spark engine" contract.
  */
object SqlSurface {
  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register all tables for `sfDir` as temp views (events with the
    * ns→µs timestamp normalization applied). Also registers a `points`
    * view (vec_id, features, cluster). */
  def registerViews(s: SparkSession, sfDir: String): Unit = {
    tableNames.foreach {
      case "events" => Tables.events(s, sfDir).createOrReplaceTempView("events")
      case n => Tables.table(s, sfDir, n).createOrReplaceTempView(n)
    }
    Tables.points(s, sfDir).createOrReplaceTempView("points")
  }

  /** Last-registered sfDir per session (weak-keyed, like
    * [[SessionCache]]): re-reading ten parquet schemas and re-planning
    * the views was ~1–1.7 s per `sql()` call, paid by EVERY SQL-face
    * query. Tracking the LAST dir (not a per-dir memo) keeps a session
    * that alternates fixtures correct — the views are global names, so
    * only "already registered for exactly this dir" may skip. */
  private val lastRegistered =
    new java.util.WeakHashMap[SparkSession, String]()

  /** Run a SQL text against the registered views. */
  def sql(s: SparkSession, sfDir: String, query: String): DataFrame = {
    lastRegistered.synchronized {
      if (lastRegistered.get(s) != sfDir) {
        registerViews(s, sfDir)
        lastRegistered.put(s, sfDir)
      }
    }
    s.sql(query)
  }
}
