package graft

import graft.engine.multimodal.Multimodal

/** Multimodal plumbing: the decode/resize/frame-sample kernels are
  * deterministic stubs, but the distributed pipeline around them
  * (typed Dataset, mapPartitions batching, schema) is real.
  */
class MultimodalSpec extends SparkSpec {

  test("decode is deterministic and geometry matches the payload") {
    val a = Multimodal.decode(spark, sf0001).collect().sortBy(_.media_id)
    val b = Multimodal.decode(spark, sf0001).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq, "decode must be deterministic across runs")
    a.foreach { m =>
      assert(m.width == 16)
      assert(m.height == (m.n_bytes + 15) / 16)
      assert(m.checksum >= 0 && m.checksum < 1000003L)
    }
  }

  test("resize shrinks payloads and re-decodes consistently") {
    val full = Multimodal.decode(spark, sf0001).collect()
      .map(m => m.media_id -> m.n_bytes).toMap
    val small = Multimodal.resized(spark, sf0001, k = 4).collect()
    small.foreach { m =>
      assert(m.n_bytes == (full(m.media_id) + 3) / 4, "every 4th byte kept")
      assert(m.height == (m.n_bytes + 15) / 16)
    }
  }

  test("media table kinds cycle by id and carry typed metadata") {
    val kinds = Multimodal.mediaTable(spark, sf0001)
      .select("media_id", "kind").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    kinds.foreach { case (id, k) =>
      val expected = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      assert(k == expected)
    }
  }
}
