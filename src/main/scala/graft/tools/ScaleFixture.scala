package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-curve corpus generator (round 15): replicate the driver's
  * sf0.1 tables k× SELF-SIMILARLY, so timing a query at k ∈
  * {1,4,16,64} fits its growth exponent — the measured form of the
  * "would this hold at 1000×?" question. Self-similar means the
  * distributional SHAPE is scale-invariant while the row count grows:
  *
  *  - documents: doc_id += c·1e8 per copy c; for c > 0 every token is
  *    prefixed `c<c>_` — an injective token-universe remap, so
  *    WITHIN-copy dedup structure (exact dups, near dups, shingles,
  *    MinHash signatures) is isomorphic to the source while copies
  *    share zero vocabulary. Bucket/group COUNTS scale ×k; bucket
  *    SIZES don't (the hot-bucket profile covers the other direction).
  *  - embeddings: vec_id += c·1e8; dimensions ROTATED by c·7 mod 64 —
  *    an orthogonal transform, so within-copy distances are preserved
  *    EXACTLY while cross-copy vectors decorrelate: IVF/LSH cell
  *    counts scale, cell densities don't.
  *  - events: event_id += c·1e8, user_id += c·1e6 (user count scales,
  *    per-user event density fixed — the self-similar direction for
  *    the window/session families), ts shifted c·37 h so copies don't
  *    collapse into the same wall-clock windows.
  *
  * Dimension-style tables (region nation customer supplier part
  * orders lineitem) copy through unscaled — dims grow slower than
  * facts at real scale, and no timed family reads them.
  *
  * Deterministic (no RNG — pure column transforms), PK-contract clean
  * (ids remapped disjointly). Output tables are DIRECTORIES named
  * `<table>.parquet` (multi-part at large k); the batch reader globs
  * them fine, the streaming queries' single-file layout contract does
  * not apply to scale-curve runs (no stream query is timed here).
  *
  * Usage: runMain graft.tools.ScaleFixture <srcSfDir> <outDir> <k>
  */
object ScaleFixture {
  def main(args: Array[String]): Unit = {
    val Array(src, out, kArg) = args.take(3)
    val k = kArg.toInt
    require(k >= 1, s"k=$k must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.Tables.ensureNanosAsLong(spark)

    val idOff = 100000000L

    def copies(name: String)(tx: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val df = (0 until k).map(c => tx(base, c)).reduce(_ union _)
      // width ~ k so 64x writes parallel and reads land multi-part;
      // floor 4 keeps even x1 wide enough for a local[32] scan
      df.repartition(math.max(4, 2 * k))
        .write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
    }

    copies("documents") { (df, c) =>
      val remapped = df.withColumn("doc_id", col("doc_id") + lit(c * idOff))
      if (c == 0) remapped
      else remapped.withColumn("text",
        // injective per-copy token remap; NULL text passes through
        // (transform of NULL is NULL)
        array_join(transform(split(col("text"), " "),
          t => concat(lit(s"c${c}_"), t)), " "))
    }

    copies("embeddings") { (df, c) =>
      val remapped = df.withColumn("vec_id", col("vec_id") + lit(c * idOff))
      val r = (c * 7) % 64
      if (r == 0) remapped
      else remapped.withColumn("embedding",
        concat(expr(s"slice(embedding, ${r + 1}, ${64 - r})"),
          expr(s"slice(embedding, 1, $r)")))
    }

    copies("events") { (df, c) =>
      val shifted = df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => // ns-epoch generation
          df.withColumn("ts", col("ts") + lit(c * 37L * 3600L * 1000000000L))
        case _ =>
          df.withColumn("ts", expr(s"ts + INTERVAL ${c * 37} HOURS"))
      }
      shifted
        .withColumn("event_id", col("event_id") + lit(c * idOff))
        .withColumn("user_id", col("user_id") + lit(c * 1000000L))
    }

    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
      }

    val nd = spark.read.parquet(s"$out/documents.parquet").count()
    val nv = spark.read.parquet(s"$out/embeddings.parquet").count()
    val ne = spark.read.parquet(s"$out/events.parquet").count()
    println(s"[scale-fixture] wrote x$k corpus to $out: documents=$nd embeddings=$nv events=$ne")
    spark.stop()
  }
}
