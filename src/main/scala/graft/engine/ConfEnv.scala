package graft.engine

import org.apache.spark.sql.SparkSession

/** Session-conf overrides from the `SPARK_GRAFT_CONF` env var
  * (`k=v,k=v`), applied to BOTH faces of the dual-engine contract from
  * ONE definition: [[apply]] sets them on the Spark session (the
  * engine face) and [[get]] serves the oracle-SQL builders that
  * interpolate the same knob into their DuckDB text (the oracle face).
  * Because both reads happen inside the same JVM from the same env
  * var, the two engines cannot desynchronize — which is the whole
  * point: the hot-bucket probe profile (tools/probe_all.sh) shrinks
  * `graft.neardedup.bucketCap`/`shardSize` so the oversize-bucket
  * shard engages on probe-scale DATA, and the pair-window oracles
  * must shrink with it. The driver never sets the env, so its runs
  * see the committed defaults byte-identically.
  *
  * Parsed once per JVM (env vars are immutable per process); values
  * must not contain ',' or '=' (no current knob does).
  */
object ConfEnv {
  val overrides: Map[String, String] =
    sys.env.get("SPARK_GRAFT_CONF").map(_.split(",").iterator
      .map(_.trim).filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"SPARK_GRAFT_CONF entry '$kv' is not k=v")
        (kv.substring(0, i).trim, kv.substring(i + 1).trim)
      }.toMap).getOrElse(Map.empty)

  /** Set every override on the session (the engine face). */
  def apply(spark: SparkSession): Unit =
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }

  /** One knob for an oracle-SQL builder (the DuckDB face). */
  def get(key: String, default: String): String =
    overrides.getOrElse(key, default)
}
