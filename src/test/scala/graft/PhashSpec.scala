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
    val df = graft.SparkEntry.queries("multimodal_phash")(spark, sf0001).collect()
    val nImages = graft.engine.Tables.documents(spark, sf0001)
      .filter(org.apache.spark.sql.functions.expr("doc_id % 3 = 0")).count()
    assert(df.length == nImages, s"${df.length} rows for $nImages images")
    // identical texts (exact dups exist in the fixture) => equal phash
    val byText = graft.engine.Tables.documents(spark, sf0001)
      .filter(org.apache.spark.sql.functions.expr("doc_id % 3 = 0"))
      .select("doc_id", "text").collect()
      .groupBy(_.getString(1)).values.filter(_.length > 1)
    val hashes = df.map(r => r.getLong(0) -> r.getLong(1)).toMap
    byText.foreach { grp =>
      val hs = grp.map(r => hashes(r.getLong(0))).distinct
      assert(hs.length == 1, s"dup texts ${grp.map(_.getLong(0)).mkString(",")} got $hs")
    }
  }
}
