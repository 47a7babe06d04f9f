package graft.engine.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{ArrayMath, Tables}

/** Similarity search over the `embeddings` table (SURVEY.md §2.2
  * #19, #20, #24 + embedding-cosine near-dedup and the LSH-bucketed
  * ANN scale path).
  *
  * Brute-force cosine/kNN are declared exactly (sf-bounded: 2 000
  * vectors at bench scale); `ann_lsh_topk` is the 100 TB design — an
  * 8-bit random-hyperplane bucket (deterministic integer projections,
  * reproduced by the oracle) restricts candidate pairs to same-bucket
  * vectors, turning O(n²·d) into Σ bucket² — at real scale the bucket
  * join is a shuffle-bounded equi-join and the projection matrix is a
  * broadcast constant.
  *
  * Ordering discipline: pairwise ranking keys are the ROUNDED
  * similarity plus both ids, so cross-engine ulp drift in the 64-term
  * dot products cannot reorder results (§7.6).
  */
object Similarity {

  /** (vec_id, f: array<double>, nrm, label). */
  private def vecs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id"), ArrayMath.toDouble(col("embedding")).as("f"), col("label"))
      .withColumn("nrm", ArrayMath.l2Norm(col("f")))

  private def pairSide(v: DataFrame, n: Int): DataFrame =
    v.select(col("vec_id").as(s"id$n"), col("f").as(s"f$n"), col("nrm").as(s"n$n"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // #19 top-100 most-similar pairs by cosine (brute force, exact)
    "cosine_topk" -> ((s, d) => {
      val v = vecs(s, d)
      pairSide(v, 1).join(pairSide(v, 2), col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          round(ArrayMath.dot(col("f1"), col("f2")) / (col("n1") * col("n2")), 6).as("cos"))
        .orderBy(desc("cos"), col("id1"), col("id2"))
        .limit(100)
    }),

    // #20 5 nearest neighbors per vector (Euclidean)
    "knn_per_vector" -> ((s, d) => {
      val v = vecs(s, d)
      val w = Window.partitionBy("id1").orderBy(col("dist"), col("id2"))
      pairSide(v, 1).join(pairSide(v, 2), col("id1") =!= col("id2"))
        .select(col("id1"), col("id2"),
          round(sqrt(ArrayMath.sqDist(col("f1"), col("f2"))), 6).as("dist"))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select("id1", "rank", "id2", "dist")
        .orderBy("id1", "rank")
    }),

    // #24 per-label L2-norm quality screen
    "embedding_norm_stats" -> ((s, d) =>
      vecs(s, d).groupBy("label")
        .agg(count(lit(1)).as("n"), round(avg("nrm"), 6).as("mean_norm"),
          round(min("nrm"), 6).as("min_norm"), round(max("nrm"), 6).as("max_norm"))
        .orderBy("label")),

    // embedding-cosine near-dup candidates (threshold 0.3; data max
    // cosine ≈ 0.40, so this yields a small deterministic pair set)
    "embedding_cosine_dedup" -> ((s, d) => {
      val v = vecs(s, d)
      pairSide(v, 1).join(pairSide(v, 2), col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          round(ArrayMath.dot(col("f1"), col("f2")) / (col("n1") * col("n2")), 6).as("cos"))
        .filter(col("cos") >= 0.3)
        .orderBy("id1", "id2")
    }),

    // ANN via deterministic random-hyperplane LSH, multi-table banding:
    // 15 integer-weight projections = 5 tables × 3 sign bits; candidate
    // pairs share a (table, signature) bucket in ANY table; answer is
    // the best-cosine candidate per vector. Recall ≈ 0.7 vs brute force
    // on the sf0.001 fixture; at 100 TB the table join is a shuffle-
    // bounded equi-join on (table, sig) and tables/bits scale up.
    "ann_lsh_topk" -> ((s, d) => {
      val v = vecs(s, d)
      val pt = v.select(col("vec_id"), posexplode(col("f")).as(Seq("p", "x")))
        .select(col("vec_id"), (col("p") + 1).as("i"), col("x"))
      val sp = v.sparkSession
      val w = sp.range(1, 65).select(col("id").as("i"))
        .crossJoin(sp.range(15).select(col("id").as("j")))
        .select(col("i"), col("j"),
          (((col("i") * 73 + 19) * (col("j") * 31 + 7)
            + col("i") * col("j") * col("j") + col("i") * col("i")) % 13 - 6).as("wt"))
      val sig = pt.join(broadcast(w), "i")
        .groupBy("vec_id", "j").agg(sum(col("x") * col("wt")).as("proj"))
        .groupBy(col("vec_id"), expr("j div 3").as("t"))
        .agg(sum(when(col("proj") > 0, pow(lit(2.0), col("j") % 3)).otherwise(0.0))
          .cast("long").as("sig"))
      val cand = sig.as("a").join(sig.as("b"),
          col("a.t") === col("b.t") && col("a.sig") === col("b.sig")
            && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2")).distinct()
      val a = v.select(col("vec_id").as("id1"), col("f").as("f1"), col("nrm").as("n1"))
      val b = v.select(col("vec_id").as("id2"), col("f").as("f2"), col("nrm").as("n2"))
      val rankW = Window.partitionBy("id1").orderBy(desc("cos"), col("id2"))
      cand.join(a, "id1").join(b, "id2")
        .select(col("id1"), col("id2"),
          round(ArrayMath.dot(col("f1"), col("f2")) / (col("n1") * col("n2")), 6).as("cos"))
        .withColumn("rn", row_number().over(rankW)).filter(col("rn") === 1)
        .select(col("id1"), col("id2").as("nn_id"), col("cos"))
        .orderBy("id1")
    }),
  )

  /** Shared oracle CTEs: exploded double vectors + norms. */
  private val PT =
    """pt AS (SELECT vec_id, label, u.i AS i, CAST(embedding[u.i] AS DOUBLE) AS v
      |  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)),
      |nrm AS (SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM pt GROUP BY 1)""".stripMargin

  private val COSPAIRS =
    """dots AS (SELECT a.vec_id AS id1, b.vec_id AS id2, SUM(a.v * b.v) AS dot
      |  FROM pt a JOIN pt b ON a.i = b.i AND a.vec_id < b.vec_id
      |  GROUP BY 1, 2),
      |cosp AS (SELECT id1, id2, ROUND(dot / (x.nrm * y.nrm), 6) AS cos
      |  FROM dots JOIN nrm x ON x.vec_id = id1 JOIN nrm y ON y.vec_id = id2)""".stripMargin

  val oracles: Map[String, String] = Map(
    "cosine_topk" ->
      s"""WITH $PT,
         |$COSPAIRS
         |SELECT id1, id2, cos FROM cosp
         |ORDER BY cos DESC, id1, id2 LIMIT 100""".stripMargin,

    "knn_per_vector" ->
      s"""WITH $PT,
         |d2 AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
         |  ROUND(SQRT(SUM((a.v - b.v) * (a.v - b.v))), 6) AS dist
         |  FROM pt a JOIN pt b ON a.i = b.i AND a.vec_id <> b.vec_id
         |  GROUP BY 1, 2),
         |r AS (SELECT id1, id2, dist,
         |  ROW_NUMBER() OVER (PARTITION BY id1 ORDER BY dist, id2) AS rank
         |  FROM d2)
         |SELECT id1, rank, id2, dist FROM r WHERE rank <= 5
         |ORDER BY id1, rank""".stripMargin,

    "embedding_norm_stats" ->
      s"""WITH $PT
         |SELECT label, COUNT(*) AS n, ROUND(AVG(nrm), 6) AS mean_norm,
         |  ROUND(MIN(nrm), 6) AS min_norm, ROUND(MAX(nrm), 6) AS max_norm
         |FROM (SELECT DISTINCT pt.vec_id, pt.label, nrm.nrm
         |  FROM pt JOIN nrm ON pt.vec_id = nrm.vec_id)
         |GROUP BY label ORDER BY label""".stripMargin,

    "embedding_cosine_dedup" ->
      s"""WITH $PT,
         |$COSPAIRS
         |SELECT id1, id2, cos FROM cosp WHERE cos >= 0.3
         |ORDER BY id1, id2""".stripMargin,

    "ann_lsh_topk" ->
      s"""WITH $PT,
         |w AS (SELECT u.i AS i, v.j AS j,
         |  ((u.i * 73 + 19) * (v.j * 31 + 7) + u.i * v.j * v.j + u.i * u.i) % 13 - 6 AS wt
         |  FROM UNNEST(generate_series(1, 64)) AS u(i),
         |       UNNEST(generate_series(0, 14)) AS v(j)),
         |proj AS (SELECT pt.vec_id, w.j, SUM(pt.v * w.wt) AS proj
         |  FROM pt JOIN w ON pt.i = w.i GROUP BY 1, 2),
         |sig AS (SELECT vec_id, j // 3 AS t,
         |  CAST(SUM(CASE WHEN proj > 0 THEN POWER(2, j % 3) ELSE 0 END) AS BIGINT) AS sig
         |  FROM proj GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
         |  FROM sig a JOIN sig b ON a.t = b.t AND a.sig = b.sig
         |    AND a.vec_id <> b.vec_id),
         |dots AS (SELECT c.id1, c.id2, SUM(a.v * b.v) AS dot
         |  FROM cand c JOIN pt a ON a.vec_id = c.id1
         |  JOIN pt b ON b.vec_id = c.id2 AND b.i = a.i
         |  GROUP BY 1, 2),
         |cosp AS (SELECT id1, id2, ROUND(dot / (x.nrm * y.nrm), 6) AS cos
         |  FROM dots JOIN nrm x ON x.vec_id = id1 JOIN nrm y ON y.vec_id = id2),
         |r AS (SELECT id1, id2, cos,
         |  ROW_NUMBER() OVER (PARTITION BY id1 ORDER BY cos DESC, id2) AS rn
         |  FROM cosp)
         |SELECT id1, id2 AS nn_id, cos FROM r WHERE rn = 1 ORDER BY id1""".stripMargin,
  )
}
