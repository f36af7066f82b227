package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Selection / filtering operators (SURVEY §2.3 F1-F6).
  *
  * All of these are thin declarative wrappers: the point is that each one
  * stays a single Catalyst `Filter`/`Join` node so predicate pushdown and
  * partition pruning reach the parquet scan (`PushedFilters` in
  * `.explain("formatted")`).
  */
object Filters {

  /** F1 — contiguous time-range filter.
    * Reference: `ds.sel(time=slice(a,b))` (utils/publish.py:427, 1004-1009).
    * A `between` predicate pushes down to row-group min/max stats. */
  def timeSlice(df: DataFrame, timeCol: String, start: Column, end: Column): DataFrame =
    df.filter(col(timeCol) >= start && col(timeCol) <= end)

  /** F2 — explicit time-membership filter.
    * Reference: `ds.sel(time=[t1..tn])` (utils/publish.py:503).
    * For short lists an `isin` (an `In` predicate, pushdown-friendly);
    * callers with large membership sets should use [[semiJoinFilter]]. */
  def timeMembership(df: DataFrame, timeCol: String, times: Seq[Any]): DataFrame =
    df.filter(col(timeCol).isin(times: _*))

  /** F3 — keep only rows whose key appears in another dataset.
    * Reference: `where(original.time.isin(update.time), drop=True)`
    * (utils/publish.py:867). A left-semi join: Catalyst broadcasts the
    * distinct key side when small, so no full-grid shuffle. */
  def semiJoinFilter(df: DataFrame, other: DataFrame, keyCols: Seq[String]): DataFrame =
    df.join(other.select(keyCols.map(col): _*).distinct(), keyCols, "left_semi")

  /** Complement of [[semiJoinFilter]]: rows whose key does NOT appear. */
  def antiJoinFilter(df: DataFrame, other: DataFrame, keyCols: Seq[String]): DataFrame =
    df.join(other.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")

  /** F4 — nearest-timestamp point lookup with tolerance.
    * Reference: `sel(..., method="nearest", tolerance=ε)`
    * (utils/publish.py:609-617, 1049-1055; tolerance attributes.py:333-338).
    * The tolerance filter prunes first (pushdown-friendly range predicate);
    * the top-1 is a TakeOrderedAndProject, not a global sort. Seconds-typed
    * distance keeps sub-second precision (timestamp cast to double).
    */
  def nearestWithTolerance(
      df: DataFrame,
      timeCol: String,
      target: Column,
      toleranceSeconds: Double,
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    // Microsecond-integer distance: exact, ANSI-safe (no numeric<->timestamp
    // cast), and sub-second precise.
    val dist = abs(unix_micros(col(timeCol).cast("timestamp")) -
      unix_micros(target.cast("timestamp")))
    df.filter(dist <= lit((toleranceSeconds * 1e6).toLong))
      .orderBy(dist.asc +: tieBreakCols.map(col(_).asc): _*)
      .limit(1)
  }

  /** F4 (bulk) — backward as-of join: for every left row, the most recent
    * right row with `rightTime <= leftTime` (within `toleranceSeconds`, if
    * given), matched within `partitionKeys`.
    *
    * Scale shape: tag + union + window, ONE shuffle on the partition keys —
    * never a range-join explosion and never a per-key loop. Within each key
    * the rows sort by time; `last(_, ignoreNulls)` over an unbounded
    * preceding frame carries the latest right-side values forward onto left
    * rows. Ties (equal timestamps) order the right row first, so an exact
    * match wins over an earlier one.
    */
  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      partitionKeys: Seq[String],
      valueCols: Seq[String],
      toleranceSeconds: Option[Double] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // `valueCols` must not collide with left-side column names, and the two
    // time columns must share a timestamp type.
    val l = left.withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val r = right.select(
      (partitionKeys.map(col) :+ col(rightTime).as("__t")) ++
        valueCols.map(col): _*)
      .withColumn("__side", lit(0))
      .withColumn("__rt", col("__t"))
    // allowMissingColumns null-fills each side's exclusive columns (left
    // rows get null valueCols/__rt; right rows get null left attributes).
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(partitionKeys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ALL carried values ride in ONE struct per right row, so every output
    // column comes from the SAME matched row — carrying columns
    // independently would back-fill a null field from an older right row
    // (diverging from true as-of semantics).
    val payload = when(col("__side") === 0,
      struct((col("__rt").as("__rt") +: valueCols.map(col)): _*))
    val carried = unioned
      .withColumn("__m", last(payload, ignoreNulls = true).over(w))
    val matchedRt = col("__m").getField("__rt")
    val withinTol = toleranceSeconds match {
      case Some(tol) =>
        col("__m").isNotNull &&
          (unix_micros(col("__t").cast("timestamp")) -
            unix_micros(matchedRt.cast("timestamp"))) <= lit((tol * 1e6).toLong)
      case None => col("__m").isNotNull
    }
    val kept = carried.filter(col("__side") === 1)
    val result = valueCols.foldLeft(kept) { (d, v) =>
      d.withColumn(v, when(withinTol, col("__m").getField(v))) }
    result.withColumn("__matched_time", when(withinTol, matchedRt))
      .drop("__t", "__side", "__rt", "__m")
  }

  /** F4 (bulk) — FORWARD as-of join (pandas `merge_asof(direction=
    * "forward")`): for every left row, the EARLIEST right row with
    * `rightTime >= leftTime` (within `toleranceSeconds`, if given),
    * matched within `partitionKeys` — "the next observation after this
    * event". Same union+window shape as [[asofJoinBackward]] (one shuffle,
    * no range-join explosion); the frame looks FORWARD
    * (`first(_, ignoreNulls)` over current→unbounded-following) and ties
    * order the left row first so an exact match still wins. */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      partitionKeys: Seq[String],
      valueCols: Seq[String],
      toleranceSeconds: Option[Double] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = left.withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val r = right.select(
      (partitionKeys.map(col) :+ col(rightTime).as("__t")) ++
        valueCols.map(col): _*)
      .withColumn("__side", lit(0))
      .withColumn("__rt", col("__t"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // __side DESC puts the left row (side 1) BEFORE a same-time right row,
    // so the following frame includes exact-time matches
    val w = Window.partitionBy(partitionKeys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val payload = when(col("__side") === 0,
      struct((col("__rt").as("__rt") +: valueCols.map(col)): _*))
    val carried = unioned
      .withColumn("__m", first(payload, ignoreNulls = true).over(w))
    val matchedRt = col("__m").getField("__rt")
    val withinTol = toleranceSeconds match {
      case Some(tol) =>
        col("__m").isNotNull &&
          (unix_micros(matchedRt.cast("timestamp")) -
            unix_micros(col("__t").cast("timestamp"))) <= lit((tol * 1e6).toLong)
      case None => col("__m").isNotNull
    }
    val kept = carried.filter(col("__side") === 1)
    val result = valueCols.foldLeft(kept) { (d, v) =>
      d.withColumn(v, when(withinTol, col("__m").getField(v))) }
    result.withColumn("__matched_time", when(withinTol, matchedRt))
      .drop("__t", "__side", "__rt", "__m")
  }

  /** F8 — drop non-key columns (e.g. stray coords on an insert slice).
    * Reference: `drop_vars` (utils/publish.py:441). Tolerates absent names,
    * like xarray's `errors="ignore"`. */
  def dropVars(df: DataFrame, cols: Seq[String]): DataFrame =
    df.drop(cols: _*)

  /** F6/J5 — prune a file manifest to entries overlapping [start, end].
    * Reference: binary search over the time-sorted manifest
    * (utils/publish.py:897-949). Spark-first this is a range predicate over
    * per-file (minTime, maxTime) stats — the same pruning parquet row-group
    * stats give for free; kept explicit for manifest `Dataset[FileMeta]`s.
    */
  def pruneManifest(
      manifest: DataFrame,
      minTimeCol: String,
      maxTimeCol: String,
      start: Column,
      end: Column): DataFrame =
    manifest.filter(col(maxTimeCol) >= start && col(minTimeCol) <= end)
}
