package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming semantics (SURVEY.md §5.2-6): batch ≡ streaming
  * for the deterministic windowed aggregations, and watermark
  * late-data dropping, driven through MemoryStream micro-batches.
  */
class StreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // 12 rows / 2 users / 3 hour-windows, incl. one late row
  // (FIXTURES.md micro-fixture 3)
  private val rows = Seq(
    (1L, ts("2024-01-01 00:05:00"), 10L, "click", 1.0),
    (2L, ts("2024-01-01 00:15:00"), 10L, "view", 2.0),
    (3L, ts("2024-01-01 00:45:00"), 20L, "click", 3.0),
    (4L, ts("2024-01-01 01:05:00"), 10L, "click", 4.0),
    (5L, ts("2024-01-01 01:20:00"), 20L, "view", 5.0),
    (6L, ts("2024-01-01 01:55:00"), 20L, "click", 6.0),
    (7L, ts("2024-01-01 02:10:00"), 10L, "view", 7.0),
    (8L, ts("2024-01-01 02:30:00"), 10L, "click", 8.0),
    (9L, ts("2024-01-01 02:50:00"), 20L, "view", 9.0),
    (10L, ts("2024-01-01 02:59:00"), 10L, "click", 10.0),
    (11L, ts("2024-01-01 02:58:00"), 20L, "click", 11.0),
    (12L, ts("2024-01-01 00:10:00"), 10L, "view", 12.0), // late by > 2h
  )

  test("tumbling window agg: streaming (complete mode) ≡ batch") {
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val agg = df.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_v"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("event_type"),
        col("cnt"), col("sum_v"))
    val q = agg.writeStream.format("memory").queryName("t_tumb")
      .outputMode(OutputMode.Complete()).start()
    mem.addData(rows.take(6))
    q.processAllAvailable()
    mem.addData(rows.drop(6))
    q.processAllAvailable()
    q.stop()
    val streaming = spark.table("t_tumb").orderBy("ws", "event_type").collect()

    val batch = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_v"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("event_type"),
        col("cnt"), col("sum_v"))
      .orderBy("ws", "event_type").collect()

    assert(streaming.toSeq == batch.toSeq)
  }

  test("watermark drops data later than the threshold") {
    val mem = MemoryStream[(Long, Timestamp, Double)](spark)
    val df = mem.toDF().toDF("event_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("cnt"))
    val q = df.writeStream.format("memory").queryName("t_wm")
      .outputMode(OutputMode.Append()).start()
    // batch 1 advances watermark to 02:50
    mem.addData(Seq((1L, ts("2024-01-01 03:00:00"), 1.0)))
    q.processAllAvailable()
    // batch 2: a row 2.5 h late — its window [00:00,00:30) is closed
    mem.addData(Seq((2L, ts("2024-01-01 00:10:00"), 1.0)))
    q.processAllAvailable()
    // batch 3 advances watermark far enough to emit the open window
    mem.addData(Seq((3L, ts("2024-01-01 05:00:00"), 1.0)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("t_wm").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // the late row's window must NOT appear with its count
    val w0000 = ts("2024-01-01 00:00:00").getTime / 1000
    assert(!out.contains(w0000), s"late window emitted: $out")
    assert(out.values.forall(_ == 1L))
  }

  test("content dedup drops a duplicate text arriving in a LATER micro-batch") {
    val mem = MemoryStream[(Long, String, String)](spark)
    val df = mem.toDF().toDF("doc_id", "text", "lang")
      .withColumn("h", sha2(col("text").cast("binary"), 256))
      .dropDuplicates("lang", "h")
    val q = df.writeStream.format("memory").queryName("t_cdedup")
      .outputMode(OutputMode.Append()).start()
    mem.addData(Seq((1L, "alpha beta", "en"), (2L, "gamma delta", "en")))
    q.processAllAvailable()
    // batch 2: same text again (cross-batch dup → dedup state drops it),
    // same text under another lang (kept: dedup is scoped per lang),
    // and a brand-new text (kept)
    mem.addData(Seq((3L, "alpha beta", "en"), (4L, "alpha beta", "de"),
      (5L, "epsilon zeta", "en")))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("t_cdedup").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L, 5L), s"kept=$kept")
  }

  test("session_window matches gaps-and-islands semantics") {
    // user 10: events at 00:05, 00:15 (gap 10m → same), 00:50 (gap 35m → new)
    val df = Seq(
      (10L, ts("2024-01-01 00:05:00")), (10L, ts("2024-01-01 00:15:00")),
      (10L, ts("2024-01-01 00:50:00")),
    ).toDF("user_id", "ts")
    val sessions = df.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("session_window.start")).as("s"), col("n"))
      .orderBy("s").collect()
    assert(sessions.length == 2)
    assert(sessions(0).getLong(1) == 2 && sessions(1).getLong(1) == 1)
  }
}
