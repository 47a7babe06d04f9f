package graft

import graft.engine.multimodal.Multimodal.MediaCodec

/** aHash (multimodal_phash) contracts: determinism, dup detection,
  * and edit locality — the properties an image-dedup join relies on
  * (no DuckDB oracle exists for the PNG decode path, so this spec IS
  * the correctness gate, like SketchSpec for the CMS).
  */
class PhashSpec extends SparkSpec {

  private def hashOf(payload: Array[Byte]): Long =
    MediaCodec.phashImage(MediaCodec.encodePng(payload))

  test("identical payloads hash identically; the hash is reproducible") {
    val p = Array.tabulate(300)(i => ((i * 37 + 11) % 251).toByte)
    assert(hashOf(p) == hashOf(p.clone()))
    assert(hashOf(p) == hashOf(p)) // stable across calls
  }

  test("a structured raster yields a non-trivial bit pattern") {
    // top half dark, bottom half bright -> top blocks 0, bottom 1
    val p = Array.tabulate(320)(i => if (i < 160) 10.toByte else 200.toByte)
    val h = hashOf(p)
    assert(h != 0L && h != -1L, f"degenerate hash $h%016x")
    // bottom-half rows (bits 32..63) must be the set ones
    assert((h >>> 32) != 0L && (h & 0xffffffffL) == 0L,
      f"expected bright bottom half: $h%016x")
  }

  test("a local edit flips few bits (locality), a different image flips many") {
    val p = Array.tabulate(320)(i => ((i * 13 + 7) % 251).toByte)
    val q = p.clone(); q(42) = ((q(42) & 0xff) ^ 0x7f).toByte // one-byte edit
    val (hp, hq) = (hashOf(p), hashOf(q))
    val editDist = java.lang.Long.bitCount(hp ^ hq)
    assert(editDist <= 8, s"one-byte edit flipped $editDist bits")
    val r = Array.tabulate(320)(i => ((i * 91 + 53) % 251).toByte)
    val otherDist = java.lang.Long.bitCount(hp ^ hashOf(r))
    assert(otherDist > editDist,
      s"unrelated image ($otherDist bits) should differ more than a 1-byte edit ($editDist)")
  }

  test("declared query returns one fingerprint per image and detects payload dups") {
    import org.apache.spark.sql.functions.{col, expr}
    val df = graft.SparkEntry.queries("multimodal_phash")(spark, sf0001).collect()
    val nImages = graft.engine.Tables.documents(spark, sf0001)
      .filter(expr("doc_id % 3 = 0")).count()
    assert(df.length == nImages, s"${df.length} rows for $nImages images")
    // identical payloads (payload = text bytes) ⇒ equal phash. The
    // fixture contains NO duplicate texts (adding a vacuity guard here
    // revealed the dup half of this test had never executed), so PLANT
    // dups: copy a few image docs under new ids that keep the
    // doc_id % 3 == 0 image classification.
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
    val planted = base.filter(col("doc_id").isin(0L, 3L, 6L))
      .withColumn("doc_id", col("doc_id") + 3000000L) // 3000000 % 3 == 0
    val dir = graft.engine.TempDirs.scratch("phash-dups")
    base.unionByName(planted).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val df2 = graft.SparkEntry.queries("multimodal_phash")(spark, dir).collect()
    val byText = spark.read.parquet(s"$dir/documents.parquet")
      .filter(expr("doc_id % 3 = 0"))
      .select("doc_id", "text").collect()
      .groupBy(_.getString(1)).values.filter(_.length > 1)
    assert(byText.nonEmpty, "planted duplicate image texts missing — dup half would be vacuous")
    val hashes = df2.map(r => r.getLong(0) -> r.getLong(1)).toMap
    byText.foreach { grp =>
      val hs = grp.map(r => hashes(r.getLong(0))).distinct
      assert(hs.length == 1, s"dup texts ${grp.map(_.getLong(0)).mkString(",")} got $hs")
    }
  }
}
