package graft.managers

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.grib.GribTable.WindowKey

/** Shared GRIB-ingest hypercube guard for the category managers.
  *
  * The store key projects away every axis the category does not model
  * (step_start, the level axes, the derived statistic), so an input in
  * which one store cell carries MORE THAN ONE surviving hypercube — two
  * accumulation windows ending at one valid time (the GFS precip-bucket
  * file shape), one parameter at two vertical levels, or the same cube
  * delivered in two files — would land silently colliding rows. This
  * guard runs on the memoized message HEADERS (zero payload decode, no
  * extra Spark job), AFTER the exact same hypercube selection the
  * manager's scan filter applies, and refuses a multi-cube store cell by
  * name, pointing at the selection knob for each varying axis. */
private[managers] object GribIngest {

  /** `stepStart = Some(PointProducts)` selects the INSTANTANEOUS fields
    * (step_start IS NULL) — the escape hatch when a point product and an
    * accumulation end at the same valid time. */
  val PointProducts: Long = Long.MinValue

  /** One manager's header-level selection, mirroring its DataFrame
    * filters. `ensembleDim` marks member as a STORE dimension (the
    * ensemble/hindcast categories) rather than a filtered-out axis.
    * `refDayGranular` marks stores whose reference axis is DAY-granular
    * (the hindcast category's forecast_reference_offset is a datediff in
    * whole days): the guard cell must collapse ref_time the same way, or
    * two runs of one hindcast date initialized at different hours (00Z /
    * 12Z) form distinct guard cells yet land on ONE store key —
    * bypassing exactly the refusal this guard exists for. */
  final case class CubeSelection(
      paramId: Int,
      ensembleDim: Boolean,
      derivedStat: Option[Int],
      stepStart: Option[Long],
      level: Option[(Int, Double)],
      refDayGranular: Boolean = false) {
    /** The param/member/derived part — the manager's category identity. */
    def keepCategory(wk: WindowKey): Boolean = {
      val (param, member, derived, _, _, _, _, _) = wk.key
      param == paramId &&
        (if (ensembleDim) member >= 0
         else member < 0 && derived == derivedStat.getOrElse(-1))
    }
    /** The full selection (category + window + level). */
    def keep(wk: WindowKey): Boolean =
      keepCategory(wk) &&
        stepStart.forall(_ == wk.start) &&
        level.forall { case (t, v) => wk.key._4 == t &&
          wk.key._5 == java.lang.Double.doubleToLongBits(v) }
  }

  private def fmtStart(v: Long): String =
    if (v == PointProducts) "point" else s"${v}min"
  private def fmtLevels(wks: Seq[WindowKey]): String =
    wks.map(wk => (wk.key._4, java.lang.Double.longBitsToDouble(wk.key._5),
        java.lang.Double.longBitsToDouble(wk.key._6)))
      .distinct.sortBy(_.toString)
      .map { case (t, v, to) =>
        if (to.isNaN) s"($t, $v)" else s"($t, $v..$to layer)"
      }.mkString(", ")

  def checkWindows(spark: SparkSession,
      pathGroups: Seq[(String, Seq[String])],
      sel: CubeSelection): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    def qualified(p: String): String = {
      val hp = new HPath(p)
      hp.getFileSystem(conf).makeQualified(hp).toString
    }
    val group: Map[String, String] = pathGroups
      .flatMap { case (g, ps) => ps.map(p => qualified(p) -> g) }.toMap
    // ONE listing/parse pass over every path; regroup afterwards. A
    // group path may be a DIRECTORY (the forecast manager's inputDir) —
    // files inside it resolve through their parent.
    def groupOf(filePath: String): String = {
      val qp = qualified(filePath)
      group.get(qp)
        .orElse(group.get(new HPath(qp).getParent.toString))
        .getOrElse(throw new IllegalStateException(
          s"window-guard grouping lost track of $qp — neither the file " +
            "nor its directory was passed to checkWindows"))
    }
    // NO cross-file dedup: the same cube delivered twice is a collision
    val all: Seq[(String, WindowKey)] =
      graft.sources.grib.GribTable
        .windowKeys(conf, pathGroups.flatMap(_._2).distinct)
        .flatMap { case (p, wks) => wks.map(groupOf(p) -> _) }
    val kept = all.filter { case (_, wk) => sel.keep(wk) }
    // an explicit selection that matches nothing writes an empty store —
    // refuse by name instead, listing what IS there for this CATEGORY
    if (sel.stepStart.isDefined || sel.level.isDefined) {
      pathGroups.foreach { case (g, _) =>
        require(kept.exists(_._1 == g), {
          val inCat = all.filter { case (g2, wk) =>
            g2 == g && sel.keepCategory(wk) }.map(_._2)
          val where = if (g.isEmpty) "the input" else s"group $g"
          if (inCat.isEmpty)
            s"no message in $where matches the param/member/derived " +
              s"selection (param=${sel.paramId}, " +
              s"${if (sel.ensembleDim) "ensemble members" else "deterministic"})"
          else {
            val starts = inCat.map(_.start).distinct.sorted.map(fmtStart)
            s"the stepStart/level selection matches no message in $where " +
              s"— available step_start values: ${starts.mkString(", ")} " +
              s"(the column is MINUTES; GribIngest.PointProducts selects " +
              s"the instantaneous fields); available levels: " +
              s"${fmtLevels(inCat)}"
          }
        })
      }
    }
    // store cell = (group, ref, end [, member]); everything else must be
    // single-valued or rows collide after the store projects it away
    val cells = kept.groupBy { case (g, wk) =>
      val (_, member, _, _, _, _, ref, end) = wk.key
      val refCell = if (sel.refDayGranular) ref.toLocalDate.atStartOfDay
                    else ref
      (g, refCell, end, if (sel.ensembleDim) member else -1)
    }.filter(_._2.lengthCompare(1) > 0)
    if (cells.nonEmpty) {
      val cellKey = cells.keys.minBy(_.toString) // deterministic report
      val (g, ref, end, _) = cellKey
      val rows = cells(cellKey).map(_._2)
      val starts = rows.map(_.start).distinct.sorted.map(fmtStart)
      val where = if (g.isEmpty) "" else s"group $g, "
      val refs = rows.map(_.key._7).distinct.sortBy(_.toString)
      val dupNote =
        if (rows.distinct.lengthCompare(1) == 0)
          " (ONE cube delivered by several files — deduplicate the input)"
        else if (refs.lengthCompare(1) > 0)
          s" (reference times [${refs.mkString(", ")}] collapse to one " +
            "day-granular store offset — this store keys runs by whole " +
            "days; deliver one initialization per day or widen the " +
            "offset axis)"
        else ""
      throw new IllegalArgumentException(
        s"(${where}ref_time=$ref, step=${end}min) carries ${rows.length} " +
          s"hypercubes the store key cannot separate$dupNote — windows " +
          s"[${starts.mkString(", ")}] (point = instantaneous), levels " +
          s"[${fmtLevels(rows)}]; select one with stepStart = " +
          "Some(startMinutes) (or GribIngest.PointProducts) and/or " +
          "level = Some((type, value)); layer variants sharing a level " +
          "must arrive in separate files")
    }
  }

  /** The DataFrame side of the selection (pushed down, message-pruned).
    * `Some(PointProducts)` keeps the instantaneous fields (NULL
    * step_start) — mirroring the header-side sentinel explicitly. */
  def filterCube(df: org.apache.spark.sql.DataFrame,
      stepStart: Option[Long],
      level: Option[(Int, Double)]): org.apache.spark.sql.DataFrame = {
    val a = stepStart.fold(df) {
      case PointProducts => df.filter(col("step_start").isNull)
      case ss => df.filter(col("step_start") === ss)
    }
    level.fold(a) { case (t, v) =>
      a.filter(col("level_type") === t && col("level") === v)
    }
  }
}
