package graft.engine.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Multimodal-column surface: image/audio/video as opaque `binary`
  * columns with typed metadata, and decode / feature-extract / resize /
  * frame-sample operators (builder north star; SURVEY.md §2.2 family).
  *
  * The container has no image/audio codecs, so the DECODE KERNEL IS A
  * CLEARLY-MARKED DETERMINISTIC STUB ([[MediaCodec.decodeStub]]) — but
  * the Spark-side plumbing is real and tested: a typed Dataset,
  * iterator-batched `mapPartitions` (the JVM analogue of `mapInPandas`:
  * one partition = one batch through the codec, no per-row UDF
  * dispatch), explicit output schema, and shuffle-free decode (the
  * codec runs map-side on whatever partitioning the source has).
  *
  * Payloads are synthesized from `documents.text` bytes (the only blob
  * source in the driver's testdata); `kind` cycles image/audio/video
  * by doc_id.
  *
  * Scale notes (100 TB): media bytes never shuffle — decode/resize/
  * sample are all map-side; only the small extracted-feature rows
  * flow into joins/aggregations. Partition sizing is governed by
  * `spark.sql.files.maxPartitionBytes` against the blob column.
  */
object Multimodal {

  case class Media(media_id: Long, kind: String, bytes: Array[Byte])
  case class Decoded(media_id: Long, kind: String, width: Int, height: Int,
                     n_bytes: Int, checksum: Long)

  object MediaCodec {
    /** STUB decoder — deterministic fake standing in for a real codec
      * (??? in spirit: a real build would link an imaging library
      * here). Geometry derives from payload length; checksum is a
      * modular byte sum so determinism is testable. */
    def decodeStub(bytes: Array[Byte]): (Int, Int, Long) = {
      val w = 16
      val h = (bytes.length + w - 1) / w
      var c = 0L
      var i = 0
      while (i < bytes.length) { c = (c + (bytes(i) & 0xff)) % 1000003L; i += 1 }
      (w, h, c)
    }

    /** STUB resize: keep every k-th byte — stands in for a real
      * resampling kernel; output length is ceil(n/k), deterministic. */
    def resizeStub(bytes: Array[Byte], k: Int): Array[Byte] =
      bytes.indices.collect { case i if i % k == 0 => bytes(i) }.toArray

    /** STUB frame sampler: fixed 32-byte "frames", every k-th frame. */
    def frameSampleStub(bytes: Array[Byte], k: Int): Seq[Array[Byte]] =
      bytes.grouped(32).zipWithIndex.collect { case (f, i) if i % k == 0 => f }.toSeq
  }

  /** The media table synthesized from documents: (media_id, kind,
    * bytes, meta struct). */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      element_at(lit(Array("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"),
      struct(octet_length(col("text")).as("n_bytes"),
        col("lang").as("container")).as("meta"))

  /** Distributed decode: one `mapPartitions` pass, batch = partition. */
  def decode(s: SparkSession, d: String): Dataset[Decoded] = {
    import s.implicits._
    mediaTable(s, d).select("media_id", "kind", "bytes").as[Media]
      .mapPartitions { batch => // iterator-batched, mapInPandas-shaped
        batch.map { m =>
          val (w, h, c) = MediaCodec.decodeStub(m.bytes)
          Decoded(m.media_id, m.kind, w, h, m.bytes.length, c)
        }
      }
  }

  /** Resize + re-decode, proving the two stub kernels compose. */
  def resized(s: SparkSession, d: String, k: Int = 4): Dataset[Decoded] = {
    import s.implicits._
    mediaTable(s, d).select("media_id", "kind", "bytes").as[Media]
      .mapPartitions(_.map { m =>
        val rs = MediaCodec.resizeStub(m.bytes, k)
        val (w, h, c) = MediaCodec.decodeStub(rs)
        Decoded(m.media_id, m.kind, w, h, rs.length, c)
      })
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-kind stats of the distributed decode; the oracle reproduces
    // the stub's geometry from octet_length (checksum is spec-tested,
    // not oracled — DuckDB can't fold blob bytes)
    "multimodal_decode_stats" -> ((s, d) =>
      decode(s, d).groupBy("kind")
        .agg(count(lit(1)).as("n"),
          sum(col("height").cast("long")).as("sum_h"),
          max("width").as("max_w"),
          sum(col("n_bytes").cast("long")).as("sum_bytes"))
        .orderBy("kind")),

    // frame sampling: number of sampled 32-byte frames per video
    "multimodal_frame_sample" -> ((s, d) => {
      import s.implicits._
      mediaTable(s, d).filter(col("kind") === "video")
        .select("media_id", "kind", "bytes").as[Media]
        .mapPartitions(_.map(m =>
          (m.media_id, MediaCodec.frameSampleStub(m.bytes, 2).length)))
        .toDF("media_id", "n_frames")
        .orderBy("media_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    "multimodal_decode_stats" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  octet_length(encode(text)) AS nb
        |  FROM documents)
        |SELECT kind, COUNT(*) AS n,
        |  CAST(SUM((nb + 15) // 16) AS BIGINT) AS sum_h,
        |  16 AS max_w,
        |  CAST(SUM(nb) AS BIGINT) AS sum_bytes
        |FROM m GROUP BY kind ORDER BY kind""".stripMargin,

    "multimodal_frame_sample" ->
      """WITH m AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS nb
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT media_id, CAST(((nb + 31) // 32 + 1) // 2 AS INTEGER) AS n_frames
        |FROM m ORDER BY media_id""".stripMargin,
  )
}
