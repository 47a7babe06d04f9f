package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.engine.text.TextOps

/** End-to-end losslessness pins for the two filtered dedup paths whose
  * 100 TB viability rests on a pruning-is-complete argument:
  *
  *  - `ngram_jaccard_dedup`: the rarest-first PPJoin prefix filter +
  *    position filter + size-ratio filter claim to admit EVERY pair
  *    with true Jaccard ≥ 0.5 (TextOps "LOSSLESS for J ≥ t"). The pin
  *    compares the declared output against an unfiltered all-pairs
  *    scan over the SAME per-doc trigram-id arrays, so a counter-
  *    example falsifies exactly the filter chain, not the hashing.
  *
  *  - `simhash_dedup`: the 4×4-bit banded candidate join claims
  *    pigeonhole-COMPLETENESS for Hamming ≤ 3 and exactly-once pair
  *    emission through the distinct-signature dim expansion. The pin
  *    compares against a brute-force pair scan over the SAME signature
  *    table (every doc pair, bit_count(xor) ≤ 3).
  *
  * Random word-soup corpora over a tiny vocabulary maximize shared
  * trigrams and signature collisions — the regime where the filters
  * do real pruning work and an off-by-one (prefix length, position
  * bound, band shift) actually drops a qualifying pair. Each corpus
  * also carries one planted exact duplicate so the J = 1 / ham = 0
  * boundary is exercised every case.
  */
class DedupLosslessPropertySpec extends SparkSpec {
  import spark.implicits._

  private val words = Vector("a", "b", "c", "dd", "ee", "fff", "g", "hh")
  private val corpusGen: Gen[List[(Long, String, String, String)]] = for {
    n <- Gen.choose(6, 18)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(3, 14)
      ws <- Gen.listOfN(len, Gen.oneOf(words))
      src <- Gen.oneOf("s0", "s1")
    } yield (ws.mkString(" "), src))
  } yield {
    // plant an exact duplicate of the first doc at the end: at least
    // one J = 1.0 / ham = 0 pair exists in every generated corpus
    val all = docs :+ docs.head
    all.zipWithIndex.map { case ((t, s), i) => (i.toLong, t, "en", s) }
  }

  private def cases(count: Int): Seq[List[(Long, String, String, String)]] =
    (1 to count).flatMap(i => corpusGen.apply(Gen.Parameters.default, Seed(4099L + i)))

  private def dirOf(rows: Seq[(Long, String, String, String)]): String = {
    val d = java.nio.file.Files.createTempDirectory("dedupprop").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("ngram_jaccard_dedup ≡ unfiltered all-pairs Jaccard on random corpora (prefix/position/size filters lossless)") {
    cases(6).foreach { rows =>
      val dir = dirOf(rows)
      val docsArr = TextOps.docTrigramIdArrays(spark, dir)
      // brute force: every doc pair over the same folded-id arrays,
      // no prefix/position/size pruning anywhere
      val brute = docsArr.select(col("doc_id").as("d1"), col("arr").as("a1"))
        .crossJoin(docsArr.select(col("doc_id").as("d2"), col("arr").as("a2")))
        .filter(col("d1") < col("d2"))
        .withColumn("inter", size(array_intersect(col("a1"), col("a2"))).cast("long"))
        .withColumn("uni",
          size(col("a1")).cast("long") + size(col("a2")).cast("long") - col("inter"))
        .filter(col("inter") / col("uni") >= 0.5)
        .withColumn("jac", round(col("inter") / col("uni"), 6))
        .select("d1", "d2", "jac")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val got = TextOps.queries("ngram_jaccard_dedup")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got.length == got.toSet.size,
        s"duplicate pair rows in declared output: ${got.toSeq.sorted}")
      assert(got.toSet == brute,
        s"filter chain diverged from all-pairs truth:\n missing=${brute -- got.toSet}\n extra=${got.toSet -- brute}")
      assert(brute.exists(_._3 == 1.0), "planted exact duplicate missing from truth")
    }
  }

  test("simhash_dedup ≡ brute-force Hamming ≤ 3 over the same signatures (banding complete, pairs exactly-once)") {
    cases(6).foreach { rows =>
      val dir = dirOf(rows)
      val sh = TextOps.simhashSigPlan(spark, dir)
      val brute = sh.select(col("doc_id").as("d1"), col("simhash").as("h1"))
        .crossJoin(sh.select(col("doc_id").as("d2"), col("simhash").as("h2")))
        .filter(col("d1") < col("d2"))
        .withColumn("ham", bit_count(col("h1").bitwiseXOR(col("h2"))))
        .filter(col("ham") <= 3)
        .select("d1", "d2", "ham")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val got = TextOps.queries("simhash_dedup")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(got.length == got.toSet.size,
        s"pair emitted more than once by the dim expansion: ${got.toSeq.sorted}")
      assert(got.toSet == brute,
        s"banded join diverged from brute-force truth:\n missing=${brute -- got.toSet}\n extra=${got.toSet -- brute}")
      assert(brute.exists(_._3 == 0), "planted exact duplicate missing from truth")
    }
  }
}
