package graft

import graft.engine.multimodal.Multimodal
import graft.engine.multimodal.Multimodal.MediaCodec

/** Multimodal plumbing: REAL JDK codecs for every kind — javax.imageio
  * PNG (image), javax.sound PCM-WAV (audio), and a Motion-PNG "GVID"
  * container of true PNG frames (video). The distributed pipeline
  * (typed Dataset, mapPartitions batching, schema) is identical for
  * all kinds.
  */
class MultimodalSpec extends SparkSpec {

  test("png codec round-trips payload geometry and checksum (real ImageIO)") {
    val payload = Array.tabulate(100)(i => ((i * 37) % 256).toByte)
    val png = MediaCodec.encodePng(payload)
    // genuine PNG stream: magic bytes \x89PNG
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val (w, h, c) = MediaCodec.decodeImage(png)
    assert(w == 16 && h == 7) // ceil(100/16)
    val expected = payload.map(_ & 0xff).map(_.toLong).sum % 1000003L
    assert(c == expected, "lossless: pixel sum = payload byte sum")
  }

  test("wav codec round-trips payload samples and checksum (real javax.sound)") {
    val payload = Array.tabulate(100)(i => ((i * 53) % 256).toByte)
    val wav = MediaCodec.encodeWav(payload)
    // genuine RIFF/WAVE container, larger than the raw payload
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    assert(wav.length > payload.length)
    val (w, h, n, c) = MediaCodec.decodeWav(wav)
    assert(w == 16 && h == 7 && n == 100) // ceil(100/16) virtual frames
    val expected = payload.map(_ & 0xff).map(_.toLong).sum % 1000003L
    assert(c == expected, "lossless PCM: sample sum = payload byte sum")
  }

  test("gvid codec round-trips frames; stride sampling decodes every 2nd frame") {
    val payload = Array.tabulate(300)(i => ((i * 91) % 256).toByte)
    val vid = MediaCodec.encodeVideo(payload)
    assert(new String(vid.take(4), "US-ASCII") == "GVID")
    val (w, h, px, nf, c) = MediaCodec.decodeVideo(vid)
    assert(w == 16 && nf == 3)       // ceil(300/128) frames
    assert(h == 19 && px == 304)     // 8+8 rows + final ceil(44/16)=3 rows
    val expected = payload.map(_ & 0xff).map(_.toLong).sum % 1000003L
    assert(c == expected, "lossless: frame pixel sum = payload byte sum")
    val (_, _, _, nSampled, _) = MediaCodec.decodeVideo(vid, stride = 2)
    assert(nSampled == 2) // frames 0 and 2
  }

  test("decode is deterministic and geometry matches the payload") {
    val a = Multimodal.decode(spark, sf0001).collect().sortBy(_.media_id)
    val b = Multimodal.decode(spark, sf0001).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq, "decode must be deterministic across runs")
    a.foreach { m =>
      assert(m.width == 16)
      if (m.kind == "image") // decoded raster: padded to whole rows
        assert(m.n_bytes == 16 * m.height)
      else
        assert(m.height == (m.n_bytes + 15) / 16)
      assert(m.checksum >= 0 && m.checksum < 1000003L)
    }
  }

  test("resize shrinks payloads and re-decodes consistently") {
    val payloadSz = Multimodal.mediaTable(spark, sf0001)
      .selectExpr("media_id", "meta.n_bytes").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val small = Multimodal.resized(spark, sf0001, k = 4).collect()
    small.foreach { m =>
      val kept = (payloadSz(m.media_id) + 3) / 4 // every 4th byte/pixel/sample
      m.kind match {
        case "image" | "video" => // padded raster / Σ padded frame rasters
          assert(m.n_bytes == 16 * ((kept + 15) / 16), "re-encoded raster size")
        case _ =>
          assert(m.n_bytes == kept, "every 4th PCM sample kept")
      }
      assert(m.height == (kept + 15) / 16)
    }
  }

  test("mime sniffing agrees with the declared kind for every stream") {
    val rows = Multimodal.queries("mime_sniff_audit")(spark, sf0001)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.map(_._1).toSeq == Seq("audio", "image", "video"))
    rows.foreach { case (kind, n, nMatch, allMatch) =>
      assert(n > 0 && nMatch == n && allMatch, s"$kind: $nMatch/$n sniffed")
    }
  }

  test("media table kinds cycle by id; image/audio bytes are real PNG/WAV streams") {
    val rows = Multimodal.mediaTable(spark, sf0001)
      .select("media_id", "kind", "bytes").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2)))
    rows.foreach { case (id, k, bytes) =>
      val expected = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      assert(k == expected)
      if (k == "image")
        assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G',
          s"media $id should carry a PNG stream")
      if (k == "audio")
        assert(new String(bytes.take(4), "US-ASCII") == "RIFF" &&
          new String(bytes.slice(8, 12), "US-ASCII") == "WAVE",
          s"media $id should carry a WAV stream")
      if (k == "video")
        assert(new String(bytes.take(4), "US-ASCII") == "GVID",
          s"media $id should carry a Motion-PNG container")
    }
  }
}
