package graft.managers

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.grib.GribTable.WindowKey

/** Shared GRIB-ingest hypercube guard for the category managers.
  *
  * The store key projects away every axis the category does not model
  * (step_start, the level axes, the derived statistic), so an input in
  * which one store cell carries MORE THAN ONE surviving hypercube — two
  * accumulation windows ending at one valid time (the GFS precip-bucket
  * file shape), or one parameter at two vertical levels — would land
  * silently colliding rows. This guard runs on the memoized message
  * HEADERS (zero payload decode, no extra Spark job), AFTER the exact
  * same hypercube selection the manager's scan filter applies, and
  * refuses a multi-cube store cell by name, pointing at the selection
  * knob for each varying axis. */
private[managers] object GribIngest {

  /** One manager's header-level selection, mirroring its DataFrame
    * filters. `ensembleDim` marks member as a STORE dimension (the
    * ensemble/hindcast categories) rather than a filtered-out axis. */
  final case class CubeSelection(
      paramId: Int,
      ensembleDim: Boolean,
      derivedStat: Option[Int],
      stepStart: Option[Long],
      level: Option[(Int, Double)]) {
    def keep(wk: WindowKey): Boolean = {
      val (param, member, derived, levelType, levelBits, _, _, _) = wk.key
      param == paramId &&
        (if (ensembleDim) member >= 0
         else member < 0 && derived == derivedStat.getOrElse(-1)) &&
        stepStart.forall(_ == wk.start) &&
        level.forall { case (t, v) => levelType == t &&
          levelBits == java.lang.Double.doubleToLongBits(v) }
    }
  }

  def checkWindows(spark: SparkSession,
      pathGroups: Seq[(String, Seq[String])],
      sel: CubeSelection): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val group: Map[String, String] = pathGroups
      .flatMap { case (g, ps) => ps.map(_ -> g) }.toMap
    // ONE listing/parse pass over every path; regroup afterwards
    val all: Seq[(String, WindowKey)] =
      graft.sources.grib.GribTable
        .windowKeys(conf, pathGroups.flatMap(_._2).distinct)
        .flatMap { case (p, wks) => wks.map(group.getOrElse(p, "") -> _) }
    val kept = all.filter { case (_, wk) => sel.keep(wk) }.distinct
    // an explicit selection that matches nothing writes an empty store —
    // refuse by name instead, listing what IS there
    if (sel.stepStart.isDefined || sel.level.isDefined) {
      pathGroups.foreach { case (g, _) =>
        require(kept.exists(_._1 == g), {
          val starts = all.filter(k => k._1 == g && k._2.key._1 == sel.paramId)
            .map(_._2.start).distinct.sorted.map(v =>
              if (v == Long.MinValue) "point" else s"${v}min")
          val levels = all.filter(k => k._1 == g && k._2.key._1 == sel.paramId)
            .map(k => (k._2.key._4, java.lang.Double.longBitsToDouble(k._2.key._5)))
            .distinct.sorted
          val where = if (g.isEmpty) "the input" else s"group $g"
          s"the stepStart/level selection matches no message in $where — " +
            s"available step_start values: ${starts.mkString(", ")} (the " +
            s"column is MINUTES); available (level_type, level): " +
            s"${levels.mkString(", ")}"
        })
      }
    }
    // store cell = (group, ref, end [, member]); everything else must be
    // single-valued or rows collide after the store projects it away
    val clash = kept
      .groupBy { case (g, wk) =>
        val (_, member, _, _, _, _, ref, end) = wk.key
        (g, ref, end, if (sel.ensembleDim) member else -1)
      }
      .find(_._2.lengthCompare(1) > 0)
    clash.foreach { case ((g, ref, end, _), rows) =>
      val starts = rows.map { case (_, wk) =>
        if (wk.start == Long.MinValue) "point" else s"${wk.start}min"
      }.distinct.sorted
      val levels = rows.map { case (_, wk) =>
        (wk.key._4, java.lang.Double.longBitsToDouble(wk.key._5))
      }.distinct.sorted
      val where = if (g.isEmpty) "" else s"group $g, "
      throw new IllegalArgumentException(
        s"(${where}ref_time=$ref, step=${end}min) carries ${rows.length} " +
          s"hypercubes the store key cannot separate — windows " +
          s"[${starts.mkString(", ")}] (point = instantaneous), levels " +
          s"[${levels.mkString(", ")}]; select one with " +
          "stepStart = Some(startMinutes) and/or level = Some((type, value))")
    }
  }

  /** The DataFrame side of the selection (pushed down, message-pruned). */
  def filterCube(df: org.apache.spark.sql.DataFrame,
      stepStart: Option[Long],
      level: Option[(Int, Double)]): org.apache.spark.sql.DataFrame = {
    val a = stepStart.fold(df)(ss => df.filter(col("step_start") === ss))
    level.fold(a) { case (t, v) =>
      a.filter(col("level_type") === t && col("level") === v)
    }
  }
}
