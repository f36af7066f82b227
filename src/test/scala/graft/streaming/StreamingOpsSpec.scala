package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec
import graft.model.TimeSpan

/** Streaming operators beyond the store façade: watermarked windowed aggs
  * and the mapGroupsWithState cadence monitor. */
class StreamingOpsSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def tsq(s: String) = java.sql.Timestamp.valueOf(s)

  test("windowedStats: tumbling day windows with watermark, late row beyond " +
      "watermark dropped") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Double)]
    val q = StreamingUpdate.windowedStats(
        in.toDF().toDF("time", "value"), "time", "value",
        windowLength = "1 day", lateness = "1 hour")
      .writeStream.format("memory").queryName("wstats")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", Files.createTempDirectory("ws").toString)
      .start()

    // batch 1: two days of data → watermark advances past day 1's window
    in.addData((tsq("2024-01-01 05:00:00"), 1.0), (tsq("2024-01-01 06:00:00"), 3.0),
      (tsq("2024-01-03 09:00:00"), 5.0))
    q.processAllAvailable()
    // batch 2: a row for day 1 arrives FAR beyond the watermark → dropped
    in.addData((tsq("2024-01-01 07:00:00"), 100.0))
    q.processAllAvailable()
    // batch 3: advance watermark past day 3 so its window also finalizes
    in.addData((tsq("2024-01-05 00:00:00"), 7.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("wstats")
      .select("window_start", "n_rows", "mean_value").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2))).toSet
    // day-1 window: only the 2 pre-watermark rows (the 100.0 was dropped)
    assert(rows.contains(("2024-01-01 00:00:00.0", 2L, 2.0)), s"got $rows")
    assert(rows.contains(("2024-01-03 00:00:00.0", 1L, 5.0)), s"got $rows")
  }

  test("cadenceMonitor: per-key gaps emitted across micro-batches via state") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, java.sql.Timestamp)]
    val name = "cadence_out"
    val q = StreamingUpdate.cadenceMonitor(in.toDS(), TimeSpan.Daily)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", Files.createTempDirectory("cm").toString)
      .start()

    // batch 1: contiguous days 1-3 for A; day 1 for B
    in.addData(("A", tsq("2024-01-01 00:00:00")), ("A", tsq("2024-01-02 00:00:00")),
      ("A", tsq("2024-01-03 00:00:00")), ("B", tsq("2024-01-01 00:00:00")))
    q.processAllAvailable()
    assert(spark.table(name).count() == 0) // no gaps yet

    // batch 2: A jumps to day 6 (gap vs day 3 held in state); B continues
    in.addData(("A", tsq("2024-01-06 00:00:00")), ("B", tsq("2024-01-02 00:00:00")))
    q.processAllAvailable()
    q.stop()

    val gaps = spark.table(name).as[StreamingUpdate.CadenceGap].collect().toSet
    assert(gaps == Set(StreamingUpdate.CadenceGap("A",
      tsq("2024-01-03 00:00:00"), tsq("2024-01-06 00:00:00"), 3 * 1440L)))
  }

  test("streamingCurate: quality gate + PII scrub + dedup on the stream") {
    implicit val sqlCtx = spark.sqlContext
    val prose = ("the quick brown fox jumps over the lazy dog and runs on " * 3).trim
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val q = StreamingUpdate.streamingCurate(
        in.toDF().toDF("time", "text"), "time", "text", minWords = 10)
      .writeStream.format("memory").queryName("scurate")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", Files.createTempDirectory("sc").toString)
      .start()
    in.addData(
      (tsq("2024-01-01 10:00:00"), s"$prose contact bob@example.com today"),
      (tsq("2024-01-01 10:01:00"), "too short"),                 // gated out
      (tsq("2024-01-01 10:02:00"), s"$prose contact bob@example.com today")) // dup
    q.processAllAvailable()
    q.stop()
    val texts = spark.table("scurate").select("text").collect().map(_.getString(0)).toSeq
    assert(texts == Seq(s"$prose contact <EMAIL> today"),
      s"expected one curated, scrubbed doc; got $texts")
  }

  test("streamingExactDedup drops repeated content across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val q = StreamingUpdate.streamingExactDedup(
        in.toDF().toDF("time", "text"), "time", "text")
      .writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", Files.createTempDirectory("sd").toString)
      .start()
    in.addData((tsq("2024-01-01 10:00:00"), "doc A"), (tsq("2024-01-01 10:01:00"), "doc B"),
      (tsq("2024-01-01 10:02:00"), "doc A"))
    q.processAllAvailable()
    // duplicate arriving in a LATER batch is also dropped (state remembers)
    in.addData((tsq("2024-01-01 10:03:00"), "doc B"), (tsq("2024-01-01 10:04:00"), "doc C"))
    q.processAllAvailable()
    q.stop()
    val texts = spark.table("sdedup").select("text").collect().map(_.getString(0)).toSeq
    assert(texts.sorted == Seq("doc A", "doc B", "doc C"))
  }

  test("startStreamingNearDedup: near-dups dropped within AND across batches; index persists the corpus") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("snd").toString
    def doc(i: Int, tail: String = "") =
      (0 until 40).map(j => s"d${i}tok$j").mkString(" ") + tail
    val in = MemoryStream[(Long, String)]
    val admitted = scala.collection.mutable.ArrayBuffer[Long]()
    val q = StreamingUpdate.startStreamingNearDedup(
      in.toDF().toDF("doc_id", "text"), s"$root/idx", "doc_id", "text",
      s"$root/ckpt", nParts = 8) { batch =>
      admitted ++= batch.select("doc_id").collect().map(_.getLong(0))
    }
    // batch 1: doc 1, doc 2, and 3 = near-dup of 1 (internal, min-id wins)
    in.addData((1L, doc(1)), (2L, doc(2)), (3L, doc(1, " tailtok")))
    q.processAllAvailable()
    assert(admitted.sorted.toSeq == Seq(1L, 2L))
    // batch 2: 4 = near-dup of ADMITTED 1 (cross-batch, via the index),
    // 5 = near-dup of REJECTED 3's extra token — still a near-dup of 1,
    // 6 = genuinely new
    in.addData((4L, doc(1, " othertok")), (5L, doc(1, " tailtok")), (6L, doc(6)))
    q.processAllAvailable()
    assert(admitted.sorted.toSeq == Seq(1L, 2L, 6L))
    q.stop()
    // the index now holds exactly the admitted corpus
    val idx = spark.read.parquet(s"$root/idx/docs").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(idx == Seq(1L, 2L, 6L))
  }

  test("startStreamingDistinctMonitor: per-source distincts accumulate across " +
      "batches and restarts via the persisted sketch table") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("sdm").toString
    val in = MemoryStream[(Long, String, String)]
    var latest = Map.empty[String, Long]
    def capture(df: org.apache.spark.sql.DataFrame): Unit =
      latest = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val q = StreamingUpdate.startStreamingDistinctMonitor(
      in.toDF().toDF("doc_id", "source", "text"), s"$root/sk",
      "source", "text", s"$root/ckpt")(capture)
    in.addData((1L, "a", "x"), (2L, "a", "y"), (3L, "b", "x"))
    q.processAllAvailable()
    assert(latest == Map("a" -> 2L, "b" -> 1L), latest.toString)
    // batch 2: repeats do not count, new values do — without rescanning
    in.addData((4L, "a", "x"), (5L, "a", "z"), (6L, "b", "w"))
    q.processAllAvailable()
    assert(latest == Map("a" -> 3L, "b" -> 2L), latest.toString)
    q.stop()
    // a RESTARTED query continues from the persisted table, not from zero
    val q2 = StreamingUpdate.startStreamingDistinctMonitor(
      in.toDF().toDF("doc_id", "source", "text"), s"$root/sk",
      "source", "text", s"$root/ckpt")(capture)
    in.addData((7L, "a", "x"), (8L, "c", "q"))
    q2.processAllAvailable()
    q2.stop()
    assert(latest == Map("a" -> 3L, "b" -> 2L, "c" -> 1L), latest.toString)
  }

  test("anomalyAlert: departures beyond threshold emit; unknown cells flag " +
      "no_baseline; normal rows pass silently") {
    implicit val sqlCtx = spark.sqlContext
    // batch-side climatology: January normal is 10.0 at lat=0, 20.0 at lat=1
    val clim = Seq((1, 0.0, 10.0), (1, 1.0, 20.0))
      .toDF("month", "lat", "climatology")
    val in = MemoryStream[(java.sql.Timestamp, Double, Double)]
    val q = StreamingUpdate.anomalyAlert(
        in.toDF().toDF("time", "lat", "value"), clim,
        "time", Seq("lat"), "value", period = "month", threshold = 5.0)
      .writeStream.format("memory").queryName("alerts")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", Files.createTempDirectory("aa").toString)
      .start()
    in.addData(
      (tsq("2024-01-03 00:00:00"), 0.0, 11.0),  // |1| ≤ 5 → silent
      (tsq("2024-01-04 00:00:00"), 0.0, 17.0),  // |7| > 5 → alert
      (tsq("2024-01-05 00:00:00"), 1.0, 2.0),   // |−18| > 5 → alert
      (tsq("2024-01-06 00:00:00"), 9.0, 1.0))   // unknown cell → no_baseline
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("alerts")
      .select("lat", "value", "anomaly", "no_baseline").collect()
      .map(r => (r.getDouble(0), r.getDouble(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3))).toSet
    assert(rows == Set(
      (0.0, 17.0, Some(7.0), false),
      (1.0, 2.0, Some(-18.0), false),
      (9.0, 1.0, None, true)))
  }

  test("streamingSessionize: gap closes in-batch, watermark timeout closes " +
      "idle sessions, state is reclaimed") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val q = StreamingUpdate.streamingSessionize(
        in.toDF().toDF("user_id", "ts").withWatermark("ts", "0 seconds"),
        gapMinutes = 30L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", Files.createTempDirectory("ss").toString)
      .start()

    // batch 1: user 1 has an open 2-event session; user 2 a 1-event one
    in.addData((1L, tsq("2024-01-01 10:00:00")), (1L, tsq("2024-01-01 10:10:00")),
      (2L, tsq("2024-01-01 10:00:00")))
    q.processAllAvailable()
    assert(spark.table("sessions").count() == 0) // nothing closed yet

    // batch 2: user 1 returns past the gap → the old session closes NOW
    in.addData((1L, tsq("2024-01-01 12:00:00")))
    q.processAllAvailable()
    // batch 3+4: unrelated traffic advances the watermark → user 2's and
    // then user 1's idle sessions close via EventTimeTimeout
    in.addData((3L, tsq("2024-01-01 23:00:00")))
    q.processAllAvailable()
    in.addData((3L, tsq("2024-01-01 23:05:00")))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sessions")
      .as[StreamingUpdate.ClosedSession].collect().toSet
    assert(out == Set(
      StreamingUpdate.ClosedSession(1L, tsq("2024-01-01 10:00:00"),
        tsq("2024-01-01 10:10:00"), 2L),
      StreamingUpdate.ClosedSession(2L, tsq("2024-01-01 10:00:00"),
        tsq("2024-01-01 10:00:00"), 1L),
      StreamingUpdate.ClosedSession(1L, tsq("2024-01-01 12:00:00"),
        tsq("2024-01-01 12:00:00"), 1L)), s"got $out")
  }
}
