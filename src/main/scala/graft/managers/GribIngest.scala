package graft.managers

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared GRIB-ingest hypercube guards for the category managers. */
private[managers] object GribIngest {

  /** Accumulation-window (step_start) selection: the store key projects
    * step_start away, so a step carrying TWO windows ending at one valid
    * time (the GFS precip-bucket file shape) would land silently
    * colliding rows. Some(start) keeps exactly that window; None demands
    * each step carry at most one window and refuses the mix by name. */
  def selectWindow(scanned: DataFrame, stepStart: Option[Long]): DataFrame =
    stepStart match {
      case Some(ss) => scanned.filter(col("step_start") === ss)
      case None =>
        // clash = one (ref_time, step) cell carrying >1 window: after the
        // store projects step_start away those rows collide silently
        val windows = scanned
          .select("ref_time", "step", "step_start").distinct().collect()
        val clash = windows
          .groupBy(r => (r.get(0), r.getLong(1))).filter(_._2.length > 1)
        require(clash.isEmpty, {
          val ((ref, step), rows) = clash.minBy(_._1.toString)
          val starts = rows.map(r =>
            if (r.isNullAt(2)) "point" else s"${r.getLong(2)}min").sorted
          s"(ref_time=$ref, step=${step}min) carries ${rows.length} " +
            s"accumulation windows (step_start: ${starts.mkString(", ")}) " +
            "— the store key cannot hold two windows ending at one " +
            "valid time; pass stepStart = Some(startMinutes) to select " +
            "one bucket"
        })
        scanned
    }
}
