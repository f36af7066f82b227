package graft.ops

import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionsSpec extends SparkSpec {

  private def events(rows: (Long, String, Long)*) = {
    val sp = spark; import sp.implicits._
    rows.map { case (uid, t, id) => (uid, LocalDateTime.parse(t), id) }
      .toDF("user_id", "ts", "event_id")
  }

  test("gap strictly greater than the threshold starts a new session") {
    val df = events(
      (1L, "2024-01-01T00:00:00", 1L),
      (1L, "2024-01-01T00:30:00", 2L), // gap == 30min: SAME session
      (1L, "2024-01-01T01:00:01", 3L), // gap 30min+1s: NEW session
      (2L, "2024-01-01T00:00:00", 4L))
    val out = Sessions.sessionize(df, "user_id", "ts", "event_id", 30L)
      .select("event_id", "session_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("stats roll up count, bounds, and whole-second duration per session") {
    val df = events(
      (1L, "2024-01-01T00:00:00", 1L),
      (1L, "2024-01-01T00:10:00", 2L),
      (1L, "2024-01-01T02:00:00", 3L))
    val out = Sessions.sessionStats(df, "user_id", "ts", "event_id", 30L)
      .orderBy("session_idx").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("n_events") === 2L)
    assert(out(0).getAs[Long]("duration_sec") === 600L)
    assert(out(1).getAs[Long]("n_events") === 1L)
    assert(out(1).getAs[Long]("duration_sec") === 0L)
  }

  test("equal timestamps tiebreak on the id — numbering is deterministic") {
    val df = events(
      (1L, "2024-01-01T00:00:00", 2L),
      (1L, "2024-01-01T00:00:00", 1L),
      (1L, "2024-01-01T01:00:00", 3L))
    val out = Sessions.sessionize(df, "user_id", "ts", "event_id", 30L)
      .select("event_id", "session_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 1L && out(2L) === 1L && out(3L) === 2L)
  }

  test("plan: one exchange on the user key, windows collapse onto one sort") {
    val df = events((1L, "2024-01-01T00:00:00", 1L))
    val plan = Sessions.sessionStats(df, "user_id", "ts", "event_id", 30L)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
  }
}
