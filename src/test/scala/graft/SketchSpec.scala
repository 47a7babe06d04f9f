package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.engine.sketch.Sketches

/** Sketch contracts against exact answers on real data (sf0.001):
  * CMS never underestimates and overshoots within ε·N; Bloom has no
  * false negatives and bounded false positives.
  */
class SketchSpec extends SparkSpec {

  private def tokens = Tables.documents(spark, sf0001)
    .select(explode(split(col("text"), " ")).as("token"))

  test("count-min: estimate ≥ exact, overshoot ≤ ε·N for every token") {
    val cms = Sketches.tokenCms(spark, sf0001)
    val exact = tokens.groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val n = exact.map(_._2).sum
    val epsN = math.ceil(1e-4 * n).toLong
    exact.foreach { case (t, c) =>
      val est = cms.estimateCount(t)
      assert(est >= c, s"CMS must never underestimate: $t est=$est exact=$c")
      assert(est <= c + epsN, s"CMS overshoot above ε·N: $t est=$est exact=$c εN=$epsN")
    }
  }

  test("heavy_hitters_cms query: estimates track the exact top-10") {
    val rows = Sketches.queries("heavy_hitters_cms")(spark, sf0001).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"estimate below exact: $r")
    }
  }

  test("bloom: no false negatives; false-positive rate near fpp") {
    val bloom = Sketches.tokenBloom(spark, sf0001, expectedItems = 10000L, fpp = 0.01)
    val vocab = tokens.distinct().collect().map(_.getString(0))
    vocab.foreach(t => assert(bloom.mightContain(t), s"false negative: $t"))
    val absent = (0 until 10000).map(i => s"definitely_absent_token_$i")
    val fp = absent.count(bloom.mightContain)
    assert(fp <= 300, s"false-positive rate ${fp / 10000.0} far above fpp=0.01")
  }

  test("bloom_fpp_contract query: both verdicts true, distributed probe path") {
    val r = Sketches.queries("bloom_fpp_contract")(spark, sf0001).collect()(0)
    assert(r.getLong(0) > 0, "distinct token count must be positive")
    assert(r.getBoolean(1), "a Bloom filter may never produce a false negative")
    assert(r.getBoolean(2), "measured fpp must stay within 3x the configured 1%")
  }

  test("freq_items_contract: every exact-heavy source is in the sketch output") {
    val r = Sketches.queries("freq_items_contract")(spark, sf0001).collect()(0)
    assert(r.getLong(0) > 0 && r.getLong(1) >= 0)
    assert(r.getBoolean(2), "freqItems must contain every item above support*N")
  }

  test("hll_union_contract: union and direct estimates inside the error band") {
    val r = Sketches.queries("hll_union_contract")(spark, sf0001).collect()(0)
    assert(r.getLong(0) > 0)
    assert(r.getBoolean(1), "per-lang sketch union estimate outside 5% of exact")
    assert(r.getBoolean(2), "global sketch estimate outside 5% of exact")
  }

  test("tokenBloom invalidates when the fixture is rewritten IN PLACE (data fingerprint in the memo key)") {
    // Round-13 verdict item 6: the bloom memo's value gates other
    // queries' ROWS, so serving a stale filter after an in-place
    // rewrite was a documented correctness hole. The memo key now
    // carries SessionCache.dataFingerprint(documents.parquet); this
    // pin rewrites the table within ONE session and requires the
    // second build to see the new corpus.
    import spark.implicits._
    val d = graft.engine.TempDirs.scratch("graft_bloomfp")
    def writeDocs(text: String): Unit =
      Seq((1L, text)).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
    writeDocs("alpha beta gamma")
    val b1 = Sketches.tokenBloom(spark, d)
    assert(b1.mightContain("alpha"), "bloom must contain a written token (no false negatives)")
    writeDocs("zulu_token_after_rewrite yankee xray whiskey victor uniform")
    val b2 = Sketches.tokenBloom(spark, d)
    assert(b2.mightContain("zulu_token_after_rewrite"),
      "STALE filter served after an in-place fixture rewrite — fingerprint key regressed")
  }
}
