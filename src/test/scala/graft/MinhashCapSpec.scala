package graft

import org.apache.spark.sql.functions._
import graft.engine.text.TextOps

/** Pins the hot-bucket cap in MinHash pair generation
  * (TextOps.minhashPairs, conf `graft.neardedup.bucketCap`):
  *
  *  1. EMISSION BOUND — a bucket of n docs emits exactly
  *     Σᵢ min(cap, n−1−i) pairs per band (≤ n·cap, linear in bucket
  *     size), pinned with exact counts on a synthetic corpus whose
  *     bucket structure is known by construction (identical texts ⇒
  *     identical signatures ⇒ one full bucket per band).
  *  2. GROUP INVARIANCE — connected components over the capped pair
  *     graph equal components over the full one for ANY cap ≥ 1,
  *     because the per-position successor window always keeps the
  *     consecutive pairs (rank distance 1) and a sorted bucket's
  *     consecutive chain spans it. Pinned by resolving groups on the
  *     sf0.001 fixture with the cap forced to 2 and comparing
  *     bit-for-bit against the uncapped resolution.
  *  3. DEFAULT INERTNESS — the default cap (4096) exceeds every
  *     fixture bucket, so the declared pair surface is unchanged from
  *     the uncapped semantics (and the DuckDB oracles, which mirror
  *     the same ROW_NUMBER window, agree with either reading).
  */
class MinhashCapSpec extends SparkSpec {

  /** Synthetic corpus: `nDup` docs sharing one text (one hot bucket
    * per band) + 3 docs with disjoint token sets (isolated). */
  private def writeHotBucketCorpus(nDup: Int): String = {
    import spark.implicits._
    val dir = graft.engine.TempDirs.scratch("graft-capspec")
    val dupText = "the quick brown fox jumps over the lazy dog again and again"
    val docs =
      (0L until nDup.toLong).map(i => (i, dupText, "en", "web", dupText.length.toLong)) ++
      Seq((nDup + 0L, "alpha bravo charlie delta echo", "en", "web", 30L),
          (nDup + 1L, "foxtrot golf hotel india juliett", "en", "web", 32L),
          (nDup + 2L, "kilo lima mike november oscar papa", "en", "web", 34L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Σᵢ₌₀ⁿ⁻¹ min(cap, n−1−i): capped suffix-pair count of one bucket. */
  private def cappedBucketPairs(n: Int, cap: Int): Long =
    (0 until n).map(i => math.min(cap, n - 1 - i).toLong).sum

  test("capped bucket emits exactly sum-of-min(cap, suffix) pairs per band, all adjacent ranks kept") {
    val dir = writeHotBucketCorpus(nDup = 30)
    val cap = 4
    withConf("graft.neardedup.bucketCap", cap.toString) {
      // DUP-FREE generation: both bands hold the SAME single hot
      // bucket (identical signatures, identical sorted order), so
      // band 1's emissions are entirely suppressed by the cross-band
      // filter and the list is exactly the one-band windowed count —
      // with all counts 1 (no band-dup rows exist anymore)
      val raw = TextOps.minhashPairs(spark, dir)
      assert(raw.count() === cappedBucketPairs(30, cap))
      val maxDup = raw.groupBy("d1", "d2").agg(count(lit(1)).as("n"))
        .agg(max("n")).head.getLong(0)
      assert(maxDup === 1L, s"dup-free generation emitted a pair twice")
      // emission bound per position: no doc pairs with more than cap
      // successors
      val maxFan = raw.groupBy("d1").agg(count(lit(1)).as("n"))
        .agg(max("n")).head.getLong(0)
      assert(maxFan <= cap.toLong)
      // connectivity invariant: every consecutive pair of the sorted
      // bucket survives the window ⇒ all 30 dup docs in ONE group
      val grp = TextOps.resolveGroups(spark, dir, maxEdges = 1000000L)
      val groups = grp.groupBy("group_id").agg(count(lit(1)).as("sz")).collect()
      assert(groups.length === 1 && groups.head.getLong(1) === 30L)
    }
  }

  test("uncapped count sanity on the same corpus: C(n,2) distinct pairs") {
    val dir = writeHotBucketCorpus(nDup = 30)
    withConf("graft.neardedup.bucketCap", "1000000") {
      assert(TextOps.minhashPairs(spark, dir).count() === 30L * 29 / 2)
    }
  }

  test("groups are invariant under a forced tiny cap on the sf0.001 fixture") {
    val base = TextOps.resolveGroups(spark, sf0001, maxEdges = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = withConf("graft.neardedup.bucketCap", "2") {
      TextOps.resolveGroups(spark, sf0001, maxEdges = 1000000L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(capped === base)
  }

  test("binding cap ≡ the oracle's ROW_NUMBER window form, pair-for-pair (sf0.001, cap=8)") {
    // The DuckDB oracles express the cap as a rank-distance window
    // (ROW_NUMBER per (band, bsig) bucket, b.rn - a.rn BETWEEN 1 AND
    // cap). The engine uses a capped suffix slice. This pins the two
    // DEFINITIONS against each other with the cap genuinely BINDING
    // (cap=8 < fixture bucket sizes) — the driver's oracle gate only
    // exercises the inert default, so without this the mirrored SQL
    // semantics would be tested nowhere.
    import org.apache.spark.sql.expressions.Window
    val cap = 8
    val engine = withConf("graft.neardedup.bucketCap", cap.toString) {
      TextOps.minhashPairs(spark, sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // independent reference: rebuild bands from the shared signature
    // table exactly as minhashPairs does, then apply the window JOIN
    val sig = TextOps.minhashSignatures(spark, sf0001)
    def chain(idxs: Range) =
      idxs.map(i => col(s"m$i")).reduceLeft((a, b) => a * 31 + b)
    val bands = (0 until 2).map { b =>
        sig.select(col("doc_id"), lit(b.toLong).as("band"),
          chain(b * 4 until (b + 1) * 4).as("bsig"))
      }.reduce(_ union _)
    val rb = bands.withColumn("rn", row_number().over(
      Window.partitionBy("band", "bsig").orderBy("doc_id")))
    val ref = rb.select(col("band"), col("bsig"), col("doc_id").as("d1"), col("rn").as("r1"))
      .join(rb.select(col("band"), col("bsig"), col("doc_id").as("d2"), col("rn").as("r2")),
        Seq("band", "bsig"))
      .filter(col("r2") - col("r1") >= 1 && col("r2") - col("r1") <= cap)
      .select("d1", "d2").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(engine === ref,
      s"suffix-slice cap diverges from the ROW_NUMBER window: " +
        s"only-engine=${(engine -- ref).take(5)} only-ref=${(ref -- engine).take(5)}")
    assert(engine.nonEmpty)
  }

  test("property: random corpora × random caps — window equivalence and group invariance hold") {
    // Generalizes the fixed pins: small-vocab random corpora (low
    // entropy forces real band collisions, the hot-bucket regime) and
    // caps drawn from 1..6, checking on every sample that
    //  (a) the suffix-slice pair set equals the rank-window reference
    //      derived independently from the signature table, and
    //  (b) connected components over capped pairs equal components
    //      over UNCAPPED pairs (the group-resolution invariance).
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import org.apache.spark.sql.expressions.Window
    val corpusGen = for {
      n <- Gen.choose(8, 40)
      cap <- Gen.choose(1, 6)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(1, 6)
        ws <- Gen.listOfN(k, Gen.oneOf("aa", "bb", "cc", "dd"))
      } yield ws.mkString(" "))
    } yield (cap, rows)
    val samples = (1 to 4).flatMap(i =>
      corpusGen.apply(Gen.Parameters.default, Seed(907L + i)))
    for (((cap, texts), si) <- samples.zipWithIndex) {
      import spark.implicits._
      val dir = graft.engine.TempDirs.scratch(s"capprop$si")
      texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, "en", "web", t.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val capped = withConf("graft.neardedup.bucketCap", cap.toString) {
        TextOps.minhashPairs(spark, dir)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      // (a) independent rank-window reference off the signature table
      val sig = TextOps.minhashSignatures(spark, dir)
      def chain(idxs: Range) =
        idxs.map(i => col(s"m$i")).reduceLeft((a, b) => a * 31 + b)
      val bands = (0 until 2).map { b =>
          sig.select(col("doc_id"), lit(b.toLong).as("band"),
            chain(b * 4 until (b + 1) * 4).as("bsig"))
        }.reduce(_ union _)
      val rb = bands.withColumn("rn", row_number().over(
        Window.partitionBy("band", "bsig").orderBy("doc_id")))
      val ref = rb.select(col("band"), col("bsig"), col("doc_id").as("d1"), col("rn").as("r1"))
        .join(rb.select(col("band"), col("bsig"), col("doc_id").as("d2"), col("rn").as("r2")),
          Seq("band", "bsig"))
        .filter(col("r2") - col("r1") >= 1 && col("r2") - col("r1") <= cap)
        .select("d1", "d2").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(capped === ref, s"sample $si (cap=$cap): slice ≠ window")
      // (b) components over capped == components over uncapped,
      //     via driver union-find over each pair set
      def components(pairs: Set[(Long, Long)]): Map[Long, Long] = {
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
        }
        pairs.foreach { case (a, b) =>
          val (ra, rb2) = (find(a), find(b))
          if (ra != rb2) { if (ra < rb2) parent(rb2) = ra else parent(ra) = rb2 }
        }
        val nodes = pairs.flatMap(p => Seq(p._1, p._2))
        nodes.map(x => x -> find(x)).toMap
      }
      val uncapped = withConf("graft.neardedup.bucketCap", "1000000") {
        TextOps.minhashPairs(spark, dir)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      assert(components(capped) === components(uncapped),
        s"sample $si (cap=$cap): groups diverge under the cap")
    }
  }

  test("default cap is inert on the sf0.001 fixture (pair surface unchanged)") {
    val def_ = TextOps.minhashPairs(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = withConf("graft.neardedup.bucketCap", "1000000") {
      TextOps.minhashPairs(spark, sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(def_ === uncapped)
  }

  // ------------------------------------------------ bucket SHARDING

  test("forced tiny shard: pair surface and groups bit-identical on sf0.001 (cap=8 binding)") {
    // The oversize-bucket shard (conf `graft.neardedup.shardSize`)
    // bounds the per-task collect_list buffer to shard + cap entries.
    // Forcing shard=8 with a BINDING cap=8 makes every fixture bucket
    // larger than one segment, exercising the segment split AND the
    // cap-deep overlap replication — and the declared surfaces must
    // not move by one bit.
    val base = withConf("graft.neardedup.bucketCap", "8") {
      TextOps.minhashPairs(spark, sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val sharded = withConf("graft.neardedup.bucketCap", "8") {
      withConf("graft.neardedup.shardSize", "8") {
        TextOps.minhashPairs(spark, sf0001)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
    }
    assert(sharded === base,
      s"shard changed the pair surface: only-sharded=${(sharded -- base).take(5)} " +
        s"only-base=${(base -- sharded).take(5)}")
    assert(sharded.nonEmpty)
    // and the resolved GROUPS under the default cap, sharded vs not
    val g0 = TextOps.resolveGroups(spark, sf0001, maxEdges = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val g1 = withConf("graft.neardedup.shardSize", "2") {
      // effective shard clamps to max(2, cap=4096) = 4096 — still
      // larger than any fixture bucket, so this leg pins the CLAMP;
      // the binding-shard group leg runs with cap forced small
      TextOps.resolveGroups(spark, sf0001, maxEdges = 1000000L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(g1 === g0)
    val g2 = withConf("graft.neardedup.bucketCap", "2") {
      withConf("graft.neardedup.shardSize", "3") {
        TextOps.resolveGroups(spark, sf0001, maxEdges = 1000000L)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
    }
    assert(g2 === g0, "groups diverge under a forced tiny (cap=2, shard=3)")
  }

  test("hot bucket under forced sharding emits the exact capped count and one group") {
    // 30 identical docs = one 30-doc bucket per band; shard=4 splits it
    // into 8 segments per band. The emission count must equal the
    // UNsharded capped window exactly (Σ min(cap, suffix)), dup-free,
    // and the bucket must stay one connected group.
    val dir = writeHotBucketCorpus(nDup = 30)
    val cap = 4
    withConf("graft.neardedup.bucketCap", cap.toString) {
      withConf("graft.neardedup.shardSize", "4") {
        val raw = TextOps.minhashPairs(spark, dir)
        assert(raw.count() === cappedBucketPairs(30, cap))
        val maxDup = raw.groupBy("d1", "d2").agg(count(lit(1)).as("n"))
          .agg(max("n")).head.getLong(0)
        assert(maxDup === 1L, "sharded generation emitted a pair twice")
        val grp = TextOps.resolveGroups(spark, dir, maxEdges = 1000000L)
        val groups = grp.groupBy("group_id").agg(count(lit(1)).as("sz")).collect()
        assert(groups.length === 1 && groups.head.getLong(1) === 30L)
      }
    }
  }

  test("property: random corpora × random caps × random shards — surface equals the rank window") {
    // The sharded generation must equal the shard-FREE rank-window
    // reference for every (cap, shard) draw: the reference below is
    // derived independently from the signature table and never sees
    // the shard conf, so equality proves shard-inertness in general
    // form (segments, overlap replication, home-only emission).
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import org.apache.spark.sql.expressions.Window
    val corpusGen = for {
      n <- Gen.choose(8, 40)
      cap <- Gen.choose(1, 6)
      shard <- Gen.choose(2, 9)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(1, 6)
        ws <- Gen.listOfN(k, Gen.oneOf("aa", "bb", "cc", "dd"))
      } yield ws.mkString(" "))
    } yield (cap, shard, rows)
    val samples = (1 to 4).flatMap(i =>
      corpusGen.apply(Gen.Parameters.default, Seed(4177L + i)))
    for (((cap, shard, texts), si) <- samples.zipWithIndex) {
      import spark.implicits._
      val dir = graft.engine.TempDirs.scratch(s"shardprop$si")
      texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, "en", "web", t.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val sharded = withConf("graft.neardedup.bucketCap", cap.toString) {
        withConf("graft.neardedup.shardSize", shard.toString) {
          TextOps.minhashPairs(spark, dir)
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        }
      }
      val sig = TextOps.minhashSignatures(spark, dir)
      def chain(idxs: Range) =
        idxs.map(i => col(s"m$i")).reduceLeft((a, b) => a * 31 + b)
      val bands = (0 until 2).map { b =>
          sig.select(col("doc_id"), lit(b.toLong).as("band"),
            chain(b * 4 until (b + 1) * 4).as("bsig"))
        }.reduce(_ union _)
      val rb = bands.withColumn("rn", row_number().over(
        Window.partitionBy("band", "bsig").orderBy("doc_id")))
      val ref = rb.select(col("band"), col("bsig"), col("doc_id").as("d1"), col("rn").as("r1"))
        .join(rb.select(col("band"), col("bsig"), col("doc_id").as("d2"), col("rn").as("r2")),
          Seq("band", "bsig"))
        .filter(col("r2") - col("r1") >= 1 && col("r2") - col("r1") <= cap)
        .select("d1", "d2").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(sharded === ref,
        s"sample $si (cap=$cap shard=$shard): sharded slice ≠ rank window: " +
          s"only-engine=${(sharded -- ref).take(5)} only-ref=${(ref -- sharded).take(5)}")
    }
  }

  // -------------------------------------------- nBands > 2 generality

  test("property: 4-band banding (rowsPerBand=2) — dup-free union equals the rank-window reference") {
    // Declared bandings are b=2×r=4 and b=1×r=8, so the cross-band
    // "emitted earlier" suppression only ever sees ONE earlier band in
    // production. This pins the GENERAL form before anyone flips the
    // knob: at rowsPerBand=2 (4 bands, 3 earlier bands at the last),
    // the dup-free union over bands must equal the brute-force
    // distinct of the per-band rank windows — exactly, per pair, with
    // binding caps, on low-entropy corpora whose buckets collide
    // across bands by construction.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import org.apache.spark.sql.expressions.Window
    val corpusGen = for {
      n <- Gen.choose(8, 32)
      cap <- Gen.choose(1, 5)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(1, 5)
        ws <- Gen.listOfN(k, Gen.oneOf("aa", "bb", "cc"))
      } yield ws.mkString(" "))
    } yield (cap, rows)
    val samples = (1 to 4).flatMap(i =>
      corpusGen.apply(Gen.Parameters.default, Seed(6211L + i)))
    for (((cap, texts), si) <- samples.zipWithIndex) {
      import spark.implicits._
      val dir = graft.engine.TempDirs.scratch(s"band4prop$si")
      texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, "en", "web", t.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val engine = withConf("graft.neardedup.bucketCap", cap.toString) {
        TextOps.minhashPairs(spark, dir, rowsPerBand = 2)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
      }
      // dup-free: the raw list must already be distinct
      assert(engine.length === engine.toSet.size,
        s"sample $si (cap=$cap): 4-band union emitted a duplicate pair")
      val sig = TextOps.minhashSignatures(spark, dir)
      def chain(idxs: Range) =
        idxs.map(i => col(s"m$i")).reduceLeft((a, b) => a * 31 + b)
      val bands = (0 until 4).map { b =>
          sig.select(col("doc_id"), lit(b.toLong).as("band"),
            chain(b * 2 until (b + 1) * 2).as("bsig"))
        }.reduce(_ union _)
      val rb = bands.withColumn("rn", row_number().over(
        Window.partitionBy("band", "bsig").orderBy("doc_id")))
      val ref = rb.select(col("band"), col("bsig"), col("doc_id").as("d1"), col("rn").as("r1"))
        .join(rb.select(col("band"), col("bsig"), col("doc_id").as("d2"), col("rn").as("r2")),
          Seq("band", "bsig"))
        .filter(col("r2") - col("r1") >= 1 && col("r2") - col("r1") <= cap)
        .select("d1", "d2").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(engine.toSet === ref,
        s"sample $si (cap=$cap): 4-band union ≠ windowed distinct: " +
          s"only-engine=${(engine.toSet -- ref).take(5)} only-ref=${(ref -- engine.toSet).take(5)}")
      assert(ref.nonEmpty, s"sample $si: vacuous (no colliding buckets)")
    }
  }
}
