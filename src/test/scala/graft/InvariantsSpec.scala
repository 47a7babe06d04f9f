package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.engine.cluster.Indices

/** Property-based index invariants (SURVEY.md §5.2-3) using scalacheck
  * generators sampled on fixed seeds (no scalatest-plus bridge in the
  * offline cache; Spark jobs are expensive anyway, so a handful of
  * deterministic cases per property is the right trade).
  */
class InvariantsSpec extends SparkSpec {
  import spark.implicits._

  private val pointSetGen: Gen[Seq[(Long, Seq[Double], Int)]] = for {
    n <- Gen.choose(8, 40)
    d <- Gen.choose(2, 6)
    k <- Gen.choose(2, 4)
    cs <- Gen.listOfN(n, Gen.choose(0, k - 1))
    coords <- Gen.listOfN(n, Gen.listOfN(d, Gen.choose(-1.0, 1.0)))
  } yield cs.zip(coords).zipWithIndex.map { case ((c, xs), i) =>
    (i.toLong, xs.map(_ + c * 5.0): Seq[Double], c)
  }

  /** Sample the generator on deterministic seeds; keep cases with ≥2
    * non-empty clusters (indices undefined otherwise). */
  private def cases(count: Int): Seq[Seq[(Long, Seq[Double], Int)]] =
    (1 to count * 4).iterator
      .flatMap(i => pointSetGen.apply(Gen.Parameters.default, Seed(42L + i)))
      .filter(_.map(_._3).distinct.size >= 2)
      .take(count).toSeq

  private def df(pts: Seq[(Long, Seq[Double], Int)]) =
    pts.toDF("vec_id", "features", "cluster")

  test("driver contract: SparkEntry.entry returns rows on the smoke fixture") {
    // the driver smoke-checks rows > 0 on entry(spark) at sf0.001 —
    // guard the contract here so a refactor can't break it unnoticed
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("Bench.ownMemo names only declared queries (a rename can't silently drop the cold-re-run)") {
    val unknown = graft.Bench.ownMemo -- graft.SparkEntry.queries.keySet
    assert(unknown.isEmpty,
      s"ownMemo entries with no matching declared query: $unknown")
  }

  test("every oracle key is a declared query; every declared query is documented") {
    // an oracle for a renamed/removed query would make the driver's
    // DuckDB pass record a missing-parquet failure
    val orphanOracles = graft.SparkEntry.oracleSql.keySet -- graft.SparkEntry.queries.keySet
    assert(orphanOracles.isEmpty, s"oracles without a declared query: $orphanOracles")
    // SURVEY.md §2 is the judge's normative inventory and COVERAGE.md
    // its status ledger — both drifted silently before this pin
    // (COVERAGE held 48 of 179 keys by round 7)
    def read(p: String) = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
    val survey = read("SURVEY.md")
    val coverage = read("COVERAGE.md")
    val undocumented = graft.SparkEntry.queries.keySet.filterNot(k => survey.contains(s"`$k`"))
    assert(undocumented.isEmpty, s"queries missing from SURVEY.md: $undocumented")
    val uncovered = graft.SparkEntry.queries.keySet.filterNot(k => coverage.contains(s"`$k`"))
    assert(uncovered.isEmpty, s"queries missing from COVERAGE.md: $uncovered")
  }

  test("BD-Silhouette ∈ [-1, 1]; BD-Dunn ≥ 0; DB ≥ 0") {
    cases(3).foreach { pts =>
      val p = df(pts)
      val sil = Indices.bdSilhouette(p).head().getDouble(0)
      val dunn = Indices.bdDunn(p).head().getDouble(0)
      val db = Indices.daviesBouldin(p).head().getDouble(0)
      assert(sil >= -1.0 - 1e-9 && sil <= 1.0 + 1e-9, s"sil=$sil")
      assert(dunn >= 0.0, s"dunn=$dunn")
      assert(db >= 0.0, s"db=$db")
    }
  }

  test("indices are invariant under row permutation and cluster relabeling") {
    cases(3).foreach { pts =>
      val base = df(pts)
      val rnd = new scala.util.Random(7)
      val permuted = df(rnd.shuffle(pts))
      val relabeled = df(pts.map { case (i, xs, c) => (i, xs, 9 - c) })
      val w0 = Indices.wssse(base).head().getDouble(0)
      assert(math.abs(Indices.wssse(permuted).head().getDouble(0) - w0) < 1e-9)
      assert(math.abs(Indices.wssse(relabeled).head().getDouble(0) - w0) < 1e-9)
      val s0 = Indices.bdSilhouette(base).head().getDouble(0)
      assert(math.abs(Indices.bdSilhouette(relabeled).head().getDouble(0) - s0) < 1e-9)
    }
  }

  test("indices are invariant under translation") {
    cases(2).foreach { pts =>
      val base = df(pts)
      val shifted = df(pts.map { case (i, xs, c) => (i, xs.map(_ + 37.5), c) })
      assert(math.abs(
        Indices.wssse(base).head().getDouble(0)
          - Indices.wssse(shifted).head().getDouble(0)) < 1e-7)
      assert(math.abs(
        Indices.bdDunn(base).head().getDouble(0)
          - Indices.bdDunn(shifted).head().getDouble(0)) < 1e-7)
    }
  }

  test("exact dedup is idempotent (the PRODUCTION query, not an inline mirror)") {
    // the old form recomputed dedup with ad-hoc groupBy aggregations
    // written in the test itself — no production regression could
    // fail it. This one runs the declared query twice: once over a
    // corpus with PLANTED duplicates (adding the vacuity guard
    // revealed the sf0.001 fixture contains NO exact-duplicate texts
    // — the old test had nothing to collapse either), once over the
    // survivor corpus the first pass produced.
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
    val planted = base.filter(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val dir0 = graft.engine.TempDirs.scratch("dedup-idem-src")
    base.unionByName(planted).write.mode("overwrite")
      .parquet(s"$dir0/documents.parquet")
    val first = SparkEntry.queries("exact_dedup")(spark, dir0).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(first.exists(_._2 > 1),
      "planted duplicates missing — idempotence test would be vacuous")
    val keepers = first.map(_._1).toSet
    val dir = graft.engine.TempDirs.scratch("dedup-idem")
    spark.read.parquet(s"$dir0/documents.parquet")
      .filter(col("doc_id").isInCollection(keepers))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val second = SparkEntry.queries("exact_dedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(second.forall(_._2 == 1L),
      "survivor corpus must contain no remaining duplicates")
    assert(second.map(_._1).toSet == keepers,
      "second pass must keep exactly the first pass's keepers")
  }

  test("seeded k-sweep and optimal-k selection are run-to-run deterministic") {
    // `k_sweep`/`optimal_k_select` are no_oracle by design (seeded
    // iterative MLlib) — this contract converts their "deterministic
    // given the fixed seed" claim from comment to checked fact (the
    // cms_error_contract pattern): two INDEPENDENT sweep runs (the
    // memo is bypassed — sweepCached would return the first run) must
    // produce bit-identical index tables and the same argbest per
    // criterion. A nondeterministic init, a thread-order-dependent
    // reduction, or an unseeded sample in the fit would diverge here.
    import graft.engine.cluster.KMeansSweep
    val pts = graft.engine.Tables.points(spark, sf0001)
    def run() = KMeansSweep.sweep(pts, 2, 4, 10)
      .select("k", "wssse", "bd_silhouette", "bd_dunn", "davies_bouldin")
      .orderBy("k").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val a = run(); val b = run()
    assert(a.toSeq == b.toSeq,
      s"seeded sweep diverged between runs:\n${a.toSeq}\n${b.toSeq}")
    import spark.implicits._
    def pick(rows: Array[(Int, Double, Double, Double, Double)]) =
      KMeansSweep.optimalK(rows.toSeq.toDF("k", "wssse", "bd_silhouette", "bd_dunn", "davies_bouldin"))
        .select("criterion", "best_k").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(pick(a) == pick(b))
  }

  test("assign fails loudly on misnamed columns on EVERY path, including zero rows") {
    // Round-13 ADVICE: the zero-row branch used to build its schema by
    // filtering for literally-named fields, so a misnamed input frame
    // silently produced a filtered-down schema there while every other
    // branch threw. All paths now run the same select.
    import graft.engine.cluster.KMeansSweep
    import spark.implicits._
    val misnamed = Seq.empty[(Long, Seq[Double])].toDF("id", "feats")
    intercept[org.apache.spark.sql.AnalysisException] {
      KMeansSweep.assign(misnamed, k = 3).collect()
    }
    // and the well-named empty frame keeps the exact 3-column contract
    val empty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "features")
    val out = KMeansSweep.assign(empty, k = 3)
    assert(out.columns.toSeq == Seq("vec_id", "features", "cluster"))
    assert(out.count() == 0)
  }

  test("the committed oracle pair-window default is 4096 (ConfEnv-independent in this JVM)") {
    // The BETWEEN 1 AND <cap> literals are interpolated from ConfEnv
    // (SPARK_GRAFT_CONF) so the probe gate's hotbucket profile can
    // shrink engine cap and oracle window together. The DRIVER never
    // sets the env, so the shipped oracle bytes must carry the
    // committed 4096 — this pin fails if a session ever leaks an env
    // override into `sbt test`, or if the default drifts from the
    // engine's `graft.neardedup.bucketCap` default.
    assert(!sys.env.contains("SPARK_GRAFT_CONF"),
      "sbt test must not run under SPARK_GRAFT_CONF — the oracle pins below would test the wrong bytes")
    assert(graft.engine.ConfEnv.overrides.isEmpty)
    assert(graft.engine.text.TextOps.oracleBucketCap == "4096")
    Seq("minhash_near_dedup", "minhash_recall_b1r8").foreach { k =>
      assert(SparkEntry.oracleSql(k).contains("BETWEEN 1 AND 4096"),
        s"$k oracle lost the committed 4096 pair window")
    }
    assert(graft.engine.text.TextOps.bucketCap(spark) == 4096,
      "engine default bucketCap drifted from the oracle window")
  }

  test("no query name is declared by two packs (Map ++ is last-wins shadowing)") {
    val total = SparkEntry.queryPacks.map(_.size).sum
    assert(total == SparkEntry.queries.size, {
      val dups = SparkEntry.queryPacks.flatMap(_.keys)
        .groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
      s"${total - SparkEntry.queries.size} shadowed query key(s): ${dups.mkString(", ")}"
    })
  }

  test("sweep leaves a caller-persisted point set cached; releases one it persisted itself") {
    // the ownership contract the determinism contract's CONCURRENT
    // sweeps rely on: an unconditional unpersist inside sweep() would
    // yank the shared cache out from under the sibling sweep mid-fit
    import graft.engine.cluster.KMeansSweep
    import org.apache.spark.storage.StorageLevel
    val pts = graft.engine.Tables.points(spark, sf0001)
    val cached = pts.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      KMeansSweep.sweep(cached, 2, 3, 5).collect()
      assert(cached.storageLevel != StorageLevel.NONE,
        "sweep must not unpersist a caller-managed cache")
    } finally cached.unpersist()
    // self-persisted path: the input arrives uncached and must leave
    // uncached (sweep persists, fits, and releases its own cache)
    KMeansSweep.sweep(pts, 2, 3, 5).collect()
    assert(pts.storageLevel == StorageLevel.NONE,
      "sweep must release the cache it created itself")
  }
}
