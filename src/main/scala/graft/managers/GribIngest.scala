package graft.managers

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared GRIB-ingest hypercube guards for the category managers. */
private[managers] object GribIngest {

  /** Accumulation-window (step_start) guard: the store key projects
    * step_start away, so a (group, ref_time, step) cell carrying TWO
    * windows ending at one valid time (the GFS precip-bucket file shape)
    * would land silently colliding rows.
    *
    * Runs on the memoized message HEADERS (zero payload decode, no extra
    * Spark job): `pathGroups` maps each store-key group — "" for the
    * forecast/ensemble managers, the hindcast date for the hindcast
    * manager, whose 6-D key separates same-ref runs of different
    * hindcast dates — to the files feeding it.
    *
    *  - `stepStart = None`: every (group, refTime, endStep) cell must
    *    carry at most ONE window; a multi-bucket cell refuses by name.
    *  - `stepStart = Some(startMinutes)`: the caller will filter
    *    `step_start === startMinutes` (pushed down, message-pruned);
    *    this guard only verifies the selection matches at least one
    *    message — a wrong-unit selection refuses by name instead of
    *    writing an empty store. */
  def checkWindows(spark: SparkSession,
      pathGroups: Seq[(String, Seq[String])],
      stepStart: Option[Long]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val keys: Seq[(String, graft.sources.grib.GribTable.WindowKey)] =
      pathGroups.flatMap { case (group, paths) =>
        graft.sources.grib.GribTable.windowKeys(conf, paths)
          .flatMap(_._2.map(group -> _))
      }
    stepStart match {
      case Some(ss) =>
        require(keys.exists(_._2.start == ss), {
          val named = keys.map(_._2.start).distinct.sorted.map(v =>
            if (v == Long.MinValue) "point" else s"${v}min")
          s"no message carries an accumulation window starting at " +
            s"${ss}min — available step_start values: " +
            s"${named.mkString(", ")} (the column is MINUTES)"
        })
      case None =>
        val clash = keys.distinct
          .groupBy { case (g, wk) => (g, wk.key) }
          .filter(_._2.lengthCompare(1) > 0)
        require(clash.isEmpty, {
          val k = clash.keys.minBy(_.toString)
          val (g, key) = k
          val rows = clash(k)
          val starts = rows.map { case (_, wk) =>
            if (wk.start == Long.MinValue) "point" else s"${wk.start}min"
          }.sorted
          val where = if (g.isEmpty) "" else s"group $g, "
          s"(${where}param=${key._1}, ref_time=${key._7}, " +
            s"step=${key._8}min) carries ${rows.length} accumulation " +
            s"windows (step_start: ${starts.mkString(", ")}) — the store " +
            "key cannot hold two windows ending at one valid time; pass " +
            "stepStart = Some(startMinutes) to select one bucket"
        })
    }
  }

  /** The DataFrame side of a `stepStart` selection: pushed down to the
    * scan, so off-bucket messages prune at planning. */
  def filterWindow(df: org.apache.spark.sql.DataFrame,
      stepStart: Option[Long]): org.apache.spark.sql.DataFrame =
    stepStart.fold(df)(ss => df.filter(col("step_start") === ss))
}
