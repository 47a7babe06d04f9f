package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's parquet star schema + LLM-data tables.
  *
  * Tables (TESTDATA.md): region nation customer supplier part orders
  * lineitem events documents embeddings — one parquet file each under
  * an `sfDir` such as /root/testdata/sf0.01.
  *
  * Reference parity: josemarialuna/ClusterIndices reads delimited text
  * into RDD[mllib.linalg.Vector] (SURVEY.md §1.1 [REPO-RECON]); we read
  * columnar parquet into DataFrames so Catalyst can prune/push down,
  * and represent point sets as (id, features: array<double>) —
  * SQL-expressible and oracle-checkable (SURVEY.md §1.2).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String)    = table(s, d, "region")
  def nation(s: SparkSession, d: String)    = table(s, d, "nation")
  def customer(s: SparkSession, d: String)  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = table(s, d, "supplier")
  def part(s: SparkSession, d: String)      = table(s, d, "part")
  def orders(s: SparkSession, d: String)    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String)  = table(s, d, "lineitem")
  /** Earlier testdata generations shipped events.ts as parquet
    * TIMESTAMP(NANOS,false), which Spark 4 refuses to read as a
    * timestamp ([PARQUET_TYPE_ILLEGAL]) — the legacy conf reads it as a
    * ns-epoch long instead. Harmless when the column is already µs. */
  def ensureNanosAsLong(s: SparkSession): Unit =
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** The driver has shipped events.ts in two on-disk shapes across
    * testdata generations: TIMESTAMP(NANOS,false) — readable only as a
    * ns-epoch long (see [[ensureNanosAsLong]]) — and TIMESTAMP(MICROS,
    * false), which Spark 4 infers as TIMESTAMP_NTZ. Normalize either to
    * µs-precision session-TZ TimestampType: identical wall-clock
    * instants under the UTC session every entry point pins, and the
    * same values DuckDB's µs timestamp sees, so event queries and their
    * oracles agree regardless of which generation is on disk. */
  def eventTsExpr(schema: org.apache.spark.sql.types.StructType) =
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        col("ts").cast("timestamp")
      case _ => col("ts")
    }

  /** eventTsExpr's NTZ→TIMESTAMP branch is instant-preserving only
    * under a UTC session zone (the entry points pin it); a library
    * caller under a local TZ would get wall-clock-shifted instants
    * for the µs generation only — fail fast instead of drifting.
    * Shared by the batch loader below and every STREAMING query that
    * applies [[eventTsExpr]] to a readStream (which cannot go through
    * Tables.events). */
  def requireUtcForEventTs(s: SparkSession): Unit = {
    val tz = s.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC" || tz == "Etc/UTC" || tz == "Z",
      s"event timestamp normalization requires spark.sql.session.timeZone=UTC (got $tz): " +
        "the TIMESTAMP_NTZ cast is only instant-preserving under UTC")
  }

  def events(s: SparkSession, d: String): DataFrame = {
    ensureNanosAsLong(s)
    requireUtcForEventTs(s)
    val raw = table(s, d, "events")
    raw.withColumn("ts", eventTsExpr(raw.schema))
  }
  def documents(s: SparkSession, d: String) = {
    requirePk(s, d, "documents", "doc_id")
    table(s, d, "documents")
  }
  def embeddings(s: SparkSession, d: String) = {
    requirePk(s, d, "embeddings", "vec_id")
    table(s, d, "embeddings")
  }

  /** PRIMARY-KEY contract (round 15): `doc_id`/`vec_id` must be
    * non-NULL and unique — every keeper window, id-equi-join and
    * per-id aggregation in the engine assumes it, and under duplicates
    * the results are not merely wrong but UNDEFINED (Spark's own
    * id-ordered windows tie-break nondeterministically; probing two
    * duplicated ids through the gate produced 31 silent cross-engine
    * divergences across the ANN/cluster/dedup/text families). A
    * violating corpus is the replayed-ingest / at-least-once-sink
    * shape — corrupt INPUT, so the contract raises a designed error
    * naming the table, the key and an offending id at the table's
    * first load in a session, instead of letting 184 queries disagree
    * quietly.
    *
    * Cost: ONE map-side-combined count aggregation per (session,
    * table, data fingerprint) — memoized epoch-independently
    * (getStable) so bench cold epochs don't re-bill it, and keyed on
    * [[SessionCache.dataFingerprint]] so an in-place rewrite re-checks.
    * At 100 TB this is a single key-column scan+agg per session,
    * amortized across every query — vs the alternative of a
    * uniqueness window shuffled under EVERY id-keyed scan.
    *
    * Escape hatch: `graft.pk.check=skip` skips the scan for callers
    * who have ensured uniqueness out-of-band (or who explicitly accept
    * engine-defined behavior under duplicates — documented, loud,
    * opt-in). */
  private val pkProbe = new SessionCache[Unit]
  private[graft] def requirePk(s: SparkSession, d: String,
                               tableName: String, key: String): Unit =
    if (s.conf.get("graft.pk.check", "error") != "skip")
      pkProbe.getStable(s,
          s"$d|$tableName|$key|${SessionCache.dataFingerprint(s"$d/$tableName.parquet")}") {
        val bad = table(s, d, tableName)
          .groupBy(col(key)).agg(count(lit(1)).as("__n"))
          .filter(col(key).isNull || col("__n") > 1)
          .take(1)
        if (bad.nonEmpty) {
          val id = bad(0).get(0); val n = bad(0).getLong(1)
          throw new IllegalArgumentException(
            s"$tableName.$key violates the primary-key contract: " +
              (if (id == null) s"$n NULL ids present"
               else s"$key=$id occurs $n times") +
              ". Id-keyed semantics (keeper windows, id-equi-joins, per-id " +
              "aggregation) are undefined under duplicate or NULL ids — " +
              "dedupe the corpus upstream, or set graft.pk.check=skip to " +
              "accept engine-defined behavior.")
        }
      }

  /** Reference-parity ingestion: delimited text → point set, the
    * reference's `sc.textFile → split(sep) → Vectors.dense` path
    * (SURVEY.md §1.1) as a DataFrame reader. Columns: all-numeric
    * features; an optional leading id column; header optional.
    */
  def pointsFromCsv(s: SparkSession, path: String, sep: String = ",",
                    header: Boolean = false, idCol: Boolean = false): DataFrame = {
    val raw = s.read
      .option("sep", sep).option("header", header).option("inferSchema", "true")
      .csv(path)
    val cols = raw.columns
    val (idExpr, featCols) =
      if (idCol) (col(cols.head).cast("long"), cols.tail)
      else (monotonically_increasing_id(), cols)
    raw.select(
      idExpr.as("vec_id"),
      array(featCols.toIndexedSeq.map(c => col(c).cast("double")): _*).as("features"))
  }

  /** Vector-universe boundary (mirrors the null-text dedup contract):
    * a row whose embedding is NULL, or contains a NULL element, leaves
    * every vector computation — the array<double> kernels NULL-poison
    * on such rows and MLlib's dense-vector conversion cannot represent
    * them (a raw NULL array NPEs the Vectors.dense UDF: one corrupt
    * row would kill a 100 TB job). A NULL label is excluded by the
    * same boundary: the declared table carries the ground-truth
    * assignment in every row, and MLlib's evaluators reject a NULL
    * label row at runtime (ROW_VALUE_IS_NULL) — an unlabeled vector
    * is adversarial input, not a meaningful member of the validity
    * universe. Cheap: one codegen'd null-mask scan
    * (`vec_has_null_elem`) over an array the consumer reads anyway —
    * a native kernel, because the equivalent HOF lambda is
    * interpreted per row. Every embedding ORACLE gates
    * on the same predicate via [[gateEmbeddingsSql]], so both
    * engines see the identical universe. The driver fixtures contain
    * no such rows — this boundary is live only on adversarial corpora
    * (tools/AdversarialFixture). */
  /** The declared embedding dimensionality (conf `graft.vector.dim`,
    * default 64 — the driver tables' width). Part of the vector
    * UNIVERSE definition below: a row whose array length differs
    * exits the universe on BOTH engines, exactly like a NULL row. A
    * deployment with a different width sets the conf (oracled runs
    * via SPARK_GRAFT_CONF so the oracle gate moves with it). */
  def vectorDim(s: SparkSession): Int =
    s.conf.get("graft.vector.dim", "64").toInt

  def cleanVectors(df: DataFrame, embCol: String = "embedding",
                   labelCol: String = "label"): DataFrame = {
    // native kernel, not forall(x -> x IS NOT NULL): HOF lambdas are
    // interpreted per row and this predicate sits under EVERY vector
    // scan (and would break the no-lambda plan pins)
    graft.engine.expr.GraftFunctions.register(df.sparkSession)
    // size(emb) = declared dim (round-14): RAGGED dimensionality was
    // the one corrupt-row class the round-13 universe missed — probed
    // with 10% of vectors truncated to 32-d it produced 7 crashes
    // (MLlib "Dimensions mismatch", kernel AIOOBE) and 12 silently
    // oracle-divergent values (Spark kernels and DuckDB list ops
    // disagree on length-mismatched folds). One more codegen'd
    // predicate on the same scan; the oracle shadow CTE gates len()
    // identically.
    // finiteness (round 14): one NaN component turns ranking keys NaN
    // (engine-dependent ordering), aborts MLlib loudly, and an
    // Infinity dies inside DECIMAL rounds as NumberFormatException —
    // probed as 10 crashes/parity failures before the gate. Same
    // kernel discipline as the null mask.
    val dim = vectorDim(df.sparkSession)
    val gated = df.filter(col(embCol).isNotNull
      && !expr(s"vec_has_null_elem($embCol)")
      && !expr(s"vec_has_nonfinite_elem($embCol)")
      && size(col(embCol)) === lit(dim)
      && col(labelCol).isNotNull)
    // WRONG-DECLARED-DIM diagnostic (round-14 ADVICE, medium): a
    // uniform corpus of any width ≠ the declared dim would otherwise
    // be emptied by the size clause ALONE — every vector query
    // returning zero rows with no hint that the single conf knob is
    // the cause. Probe once per (session, source plan, dim): if the
    // gated universe is empty but rows survive every OTHER clause,
    // the size gate is the sole cause — raise the designed error
    // naming the knob and the observed widths. Happy-path cost is one
    // memoized limit-1 probe (first survivor short-circuits); the
    // attribution scan runs only on an already-empty universe.
    dimGateProbe.getStable(df.sparkSession,
        s"${df.queryExecution.analyzed.semanticHash()}|$embCol|$labelCol|$dim") {
      if (gated.isEmpty) {
        val surv = df.filter(col(embCol).isNotNull
          && !expr(s"vec_has_null_elem($embCol)")
          && !expr(s"vec_has_nonfinite_elem($embCol)")
          && col(labelCol).isNotNull)
        val r = surv.agg(count(lit(1)),
          min(size(col(embCol))), max(size(col(embCol)))).collect()(0)
        if (r.getLong(0) > 0) throw new IllegalArgumentException(
          s"vector universe emptied by the DIMENSION gate alone: " +
            s"graft.vector.dim=$dim, but all ${r.getLong(0)} rows passing the " +
            s"null/finiteness/label clauses have width in [${r.get(1)}, ${r.get(2)}]. " +
            "Set graft.vector.dim to the corpus width (via SPARK_GRAFT_CONF for " +
            "oracled runs, so the oracle's len() gate moves with it).")
      }
    }
    gated
  }

  private val dimGateProbe = new SessionCache[Unit]

  /** The DuckDB face of [[cleanVectors]]: wrap an oracle's SQL in a
    * table-shadowing CTE (CTE names resolve before base tables in
    * DuckDB) so every `embeddings` reference inside sees only the
    * clean vector universe — the one boundary definition, applied once
    * per engine side. Handles SQL that already opens with WITH by
    * splicing the gate in as the first CTE. */
  def gateEmbeddingsSql(sql: String): String =
    // main.embeddings: DuckDB rejects a CTE that references its own
    // name as a circular reference — the schema-qualified form reaches
    // the base table (the driver registers tables as main-schema views).
    // len(embedding) mirrors cleanVectors' dimension gate; the literal
    // interpolates from ConfEnv like the pair-window cap, so the probe
    // gate can move both engines together (driver default: 64).
    // NOT isfinite(x) is TRUE for NaN and ±Infinity, NULL for a NULL
    // element (filter keeps only TRUE — NULL elements stay the null
    // clause's job), mirroring vec_has_nonfinite_elem exactly
    spliceCte(sql, "embeddings AS (SELECT * FROM main.embeddings WHERE embedding IS NOT NULL" +
      " AND len(list_filter(embedding, x -> x IS NULL)) = 0" +
      " AND len(list_filter(embedding, x -> NOT isfinite(x))) = 0" +
      s" AND len(embedding) = ${ConfEnv.get("graft.vector.dim", "64")}" +
      " AND label IS NOT NULL)")

  /** Splice `cte` in as the FIRST CTE of `sql` (one shared
    * implementation for both table gates). Handled forms: a query
    * opening with `WITH ` in any case (splice after it) or anything
    * else (prepend a fresh WITH). `WITH RECURSIVE` is rejected
    * loudly — splicing a non-recursive CTE in front of it would emit
    * invalid SQL — and no gated oracle uses it (recursion lives in
    * ungated RelQueries). Built by substring concatenation, NOT
    * String.replaceFirst (round-13 ADVICE): the CTE text is data, and
    * a future gate containing `$` (a JSON path) or `\` (a regex)
    * would be corrupted by regex-replacement metacharacter handling. */
  private[graft] def spliceCte(sql: String, cte: String): String = {
    val lead = sql.stripLeading
    require(!lead.toUpperCase.startsWith("WITH RECURSIVE"),
      "spliceCte cannot gate a WITH RECURSIVE oracle")
    if (lead.length >= 5 && lead.substring(0, 5).equalsIgnoreCase("WITH ")) {
      val at = sql.length - lead.length // first char of WITH in the original
      sql.substring(0, at) + "WITH " + cte + ",\n" + lead.substring(5)
    } else s"WITH $cte\n$sql"
  }

  /** The documents twin of [[gateEmbeddingsSql]]: shadow `documents`
    * with the null-text boundary (Multimodal.payloads' filter — a
    * NULL text has no media payload). Applied MECHANICALLY over a
    * whole oracle map so no individual oracle can forget the gate. */
  def gateDocumentsSql(sql: String): String =
    spliceCte(sql, "documents AS (SELECT * FROM main.documents WHERE text IS NOT NULL)")

  /** The declared vector magnitude domain, |component| < 1e7, enforced
    * LOUDLY by the two queries with documented precision ceilings
    * (round-13 verdict item 2): `incremental_ann_upsert` (int64
    * micro-quantization headroom — floor(x·1e6) times realistic cell
    * counts must stay inside 2^63) and `silhouette_mllib` (the MLlib
    * closed form ‖x‖² − 2x·μ + avg‖y‖² cancels catastrophically once
    * ‖x‖²-scale terms dwarf the distances, drifting from the exact SQL
    * oracle below ROUND 6). Components past the bound raise a designed
    * error instead of a silent wrap / engine-dependent abort; both
    * gates are pinned in AdversarialBoundarySpec. Every fixture
    * stressor stays well inside (≤1e3 — tools/AdversarialFixture). */
  val maxAbsComponent: Double = 1e7

  /** The clustering-validity point set: embeddings with float64 features
    * and the ground-truth label used as the fixed cluster assignment for
    * all oracle-checked index queries (SURVEY.md §2.1).
    */
  def points(s: SparkSession, d: String): DataFrame =
    cleanVectors(embeddings(s, d)).select(
      col("vec_id"),
      // array-level Cast, not transform(x -> cast): Cast on ArrayType
      // is native codegen; the lambda form interpreted 64 casts/row
      // under every clustering query
      col("embedding").cast("array<double>").as("features"),
      col("label").as("cluster"))
}
