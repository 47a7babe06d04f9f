package graft.tools

import org.apache.spark.sql.SparkSession

/** Builder-only: isolate q_grouping_sets' recurring cost. */
object ProfileGs {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      System.err.println(f"[gs] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.range(1000).selectExpr("sum(id)").count()
    t("registerViews")(graft.engine.SqlSurface.registerViews(spark, d))
    t("registerViews again")(graft.engine.SqlSurface.registerViews(spark, d))
    val full =
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        |  COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY rf, ls""".stripMargin
    t("full sql")(spark.sql(full).count())
    t("full sql again")(spark.sql(full).count())
    t("no orderby")(spark.sql(full.replace("ORDER BY rf, ls", "")).count())
    t("no decimal")(spark.sql(
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        |  COUNT(*) AS n, SUM(l_quantity) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin).count())
    t("plain groupby")(spark.sql(
      "SELECT l_returnflag, l_linestatus, COUNT(*) FROM lineitem GROUP BY 1,2").count())
    t("scan only")(spark.sql("SELECT COUNT(*) FROM lineitem").count())
    spark.stop()
  }
}
