package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the ANN/cosine family stage costs (builder-only). */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    graft.engine.expr.GraftFunctions.register(spark)
    val v = graft.engine.Tables.embeddings(spark, d).select(
      col("vec_id"), graft.engine.ArrayMath.toDouble(col("embedding")).as("f"))
      .withColumn("nrm", graft.engine.ArrayMath.l2Norm(col("f")))
    t("vecs count")(v.count())
    t("vecs count again")(v.count())
    val a = v.select(col("vec_id").as("id1"), col("f").as("f1"), col("nrm").as("n1"))
    val b = v.select(col("vec_id").as("id2"), col("f").as("f2"), col("nrm").as("n2"))
    val pairs = a.crossJoin(b).filter(col("id1") < col("id2"))
    t("cross count only")(pairs.count())
    val cosp = pairs.select(col("id1"), col("id2"),
      round(graft.engine.ArrayMath.dotNative(col("f1"), col("f2")) / (col("n1") * col("n2")), 6).as("cos"))
    t("cos scored count")(cosp.count())
    t("cos scored again")(cosp.count())
    t("topk")(cosp.orderBy(desc("cos"), col("id1"), col("id2")).limit(100).count())
    t("topk after repartition")(cosp.repartition(32)
      .orderBy(desc("cos"), col("id1"), col("id2")).limit(100).count())
    t("lsh plan")(graft.engine.sim.Similarity.annLshPlan(spark, d).count())
    t("lsh plan again")(graft.engine.sim.Similarity.annLshPlan(spark, d).count())
    t("ivf plan")(graft.engine.sim.Similarity.annIvfPlan(spark, d).count())
    t("ivf plan again")(graft.engine.sim.Similarity.annIvfPlan(spark, d).count())

    // LSH stage-by-stage
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    def round6(x: Double): Double =
      BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def wt(i: Int, j: Int): Long =
      (((i * 73 + 19) * (j * 31 + 7) + i.toLong * j * j + i.toLong * i) % 13) - 6
    // bits per table MUST track production (lshBits scales with the
    // vector count — 5 at sf0.1's 2000 vecs, not a hardcoded 3): a
    // denser banding inflates candidate counts ~4x and the profile
    // stops decomposing the real annLshPlan cost
    val bits = graft.engine.sim.Similarity.lshBits(v.count())
    val sig = v.select("vec_id", "f").as[(Long, Array[Double])]
      .mapPartitions { it =>
        it.flatMap { case (id, f) =>
          (0 until 5).map { tt =>
            var sigv = 0L
            var b = 0
            while (b < bits) {
              val j = tt * bits + b
              var proj = 0.0
              var i = 0
              while (i < f.length) { proj += f(i) * wt(i + 1, j); i += 1 }
              if (round6(proj) > 0) sigv |= (1L << b)
              b += 1
            }
            (id, tt.toLong, sigv)
          }
        }
      }.toDF("vec_id", "t", "sig")
    t("lsh sig")(sig.count())
    val cand0 = sig.as("a").join(sig.as("b"),
        col("a.t") === col("b.t") && col("a.sig") === col("b.sig")
          && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"))
    t("lsh cand raw")(cand0.count())
    val cand = cand0.distinct()
    t("lsh cand distinct")(cand.count())
    val scored = cand
      .join(v.select(col("vec_id").as("id1"), col("f").as("f1"), col("nrm").as("n1")), "id1")
      .join(v.select(col("vec_id").as("id2"), col("f").as("f2"), col("nrm").as("n2")), "id2")
      .select(col("id1"), col("id2"),
        round(graft.engine.ArrayMath.dotNative(col("f1"), col("f2")) / (col("n1") * col("n2")), 6).as("cos"))
    t("lsh scored")(scored.count())
    val rankW = Window.partitionBy("id1").orderBy(desc("cos"), col("id2"))
    t("lsh window")(scored.withColumn("rn", row_number().over(rankW)).filter(col("rn") === 1).count())
    t("lsh argmax-agg")(scored.groupBy("id1")
      .agg(max(struct(col("cos"), -col("id2"))).as("m"))
      .select(col("id1"), (-col("m.col2")).as("nn_id"), col("m.cos")).count())
    spark.stop()
  }
}
