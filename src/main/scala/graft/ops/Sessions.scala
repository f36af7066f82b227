package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the standard event-analytics construction:
  * a user's events belong to one session until the idle gap to the next
  * event exceeds a threshold, at which point a new session starts.
  *
  * Plan shape: ONE shuffle on the user key; both windows (the lag that
  * flags boundaries and the running sum that numbers sessions) share the
  * same (user, time) sort, so Catalyst collapses them into a single
  * Window over a single Exchange+Sort. The per-partition state is one
  * user's event list — bounded by per-user activity, not corpus size, so
  * the plan survives 100 TB as long as no single user holds a partition's
  * worth of events (true by construction for event data; a pathological
  * hot key would salt at the aggregate stage below, never at the window).
  *
  * Determinism: gap arithmetic is whole-microsecond BIGINT (unix_micros),
  * and the sort tiebreaks equal timestamps on the event id — the session
  * numbering is bit-stable across engines and partitionings.
  */
object Sessions {

  /** Per-event session assignment: adds `session_idx` (1-based per user,
    * in time order). `gapMinutes` is the idle threshold — a gap strictly
    * greater than it starts a new session. */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapMinutes: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val micros = unix_micros(col(tsCol).cast("timestamp"))
    val boundary = when(
      micros - lag(micros, 1).over(w) > gapMinutes * 60000000L ||
        lag(micros, 1).over(w).isNull, 1L).otherwise(0L)
    df.withColumn("session_idx", sum(boundary).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Session-level rollup: one row per (user, session) with event count,
    * start/end, and duration in whole seconds. The aggregate reuses the
    * window's (user) partitioning — no second shuffle. */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapMinutes: Long): DataFrame =
    sessionize(df, userCol, tsCol, idCol, gapMinutes)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        ((unix_micros(max(col(tsCol)).cast("timestamp")) -
          unix_micros(min(col(tsCol)).cast("timestamp"))) / 1000000L)
          .cast("long").as("duration_sec"))
}
