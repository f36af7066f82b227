package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.TimeSpan

/** Small reduction operators (SURVEY §2.6 A2, A3, A7). */
object Stats {

  /** A2 — first/last value of the time dimension.
    * Reference: `get_date_range_from_dataset` (utils/convenience.py:269-294).
    * Output columns: start_time, end_time. */
  def dateRange(df: DataFrame, timeCol: String): DataFrame =
    df.agg(min(col(timeCol)).as("start_time"), max(col(timeCol)).as("end_time"))

  /** A3 — the next expected timestep: last time + declared resolution.
    * Reference: `next_date` (utils/convenience.py:377-404). The reference
    * infers the delta from `t[1]-t[0]`; here the descriptor's declared
    * resolution is authoritative (and month/year spans stay calendar-correct
    * through interval arithmetic instead of being refused). */
  def nextDate(df: DataFrame, timeCol: String, resolution: TimeSpan): DataFrame =
    df.agg(max(col(timeCol)).as("__last"))
      .select((col("__last") + expr(resolution.intervalExpr)).as("next_date"))

  /** A7 — per-dimension cardinalities for metadata/STAC assembly.
    * Reference: array-size stats (utils/metadata.py:462-470).
    * Output: one row, `n_<dim>` per dim + n_rows. */
  def dimSizeStats(df: DataFrame, dims: Seq[String]): DataFrame = {
    val aggs = dims.map(d => countDistinct(col(d)).as(s"n_$d")) :+ count(lit(1)).as("n_rows")
    df.agg(aggs.head, aggs.tail: _*)
  }
}
