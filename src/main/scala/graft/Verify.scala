package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_CONF overrides (probe gate only — the driver never
    // sets it): applied to the session here, and read by the oracle
    // builders below via the same ConfEnv, so engine and oracle move
    // together (tools/probe_all.sh's hotbucket profile).
    graft.engine.ConfEnv(spark)
    // the TOK/MINHASH/minhash_recall oracle SQL hardcodes the default
    // 8-hex-digit md5 fold; a session running a different width would
    // silently desynchronize token ids / sample predicates from the
    // oracle. Fail BEFORE the dump loop — failing after it wasted the
    // whole multi-minute dump and left stale wrong-fold parquet in
    // outDir for the driver to compare.
    val fw = spark.conf.get("graft.text.foldHexDigits", "8")
    require(fw == "8",
      s"oracled runs require graft.text.foldHexDigits=8 (got $fw): the oracle SQL hardcodes the 8-digit fold")
    // same discipline for every ConfEnv-mirrored knob: a session-conf
    // value that disagrees with the env face would desynchronize the
    // oracle literals from the engine — fail before the dump loop
    graft.engine.ConfEnv.requireSynced(spark)
    new java.io.File(outDir).mkdirs()
    // iteration aid: SPARK_GRAFT_VERIFY_ONLY=q1,q2 dumps just those
    // queries (the driver never sets it — full surface by default)
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
