package graft.managers

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.grib.GribTable.WindowKey

/** Shared GRIB-ingest hypercube guard for the category managers.
  *
  * The store key projects away every axis the category does not model
  * (step_start, the level axes, the derived statistic, the probability
  * thresholds, the percentile), so an input in which one store cell
  * carries MORE THAN ONE surviving hypercube — two accumulation windows
  * ending at one valid time (the GFS precip-bucket file shape), one
  * parameter at two vertical levels, two probability thresholds at one
  * (ref, step) (the NBM shape), or the same cube delivered in two files —
  * would land silently colliding rows. This guard runs on the memoized
  * message HEADERS (zero payload decode, no extra Spark job), AFTER the
  * exact same hypercube selection the manager's scan filter applies, and
  * refuses a multi-cube store cell by name, pointing at the selection
  * knob for each varying axis. */
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
      refDayGranular: Boolean = false,
      /** Probability-product selection (templates 4.5/4.9): (table-4.9
        * type, lower limit, upper limit) with NaN = that limit absent —
        * the NBM move of picking ONE threshold out of a multi-threshold
        * file. None (default) passes only NON-probability products. */
      probability: Option[(Int, Double, Double)] = None,
      /** Percentile-product selection (templates 4.6/4.10). None
        * (default) passes only non-percentile products. */
      percentile: Option[Int] = None) {
    /** The param/member/derived/product-family part — the manager's
      * category identity (which probability/percentile VARIANT is wanted
      * belongs to [[keep]]; here only whether that family is wanted). */
    def keepCategory(wk: WindowKey): Boolean =
      wk.param == paramId &&
        (if (ensembleDim) wk.member >= 0
         else wk.member < 0 && wk.derived == derivedStat.getOrElse(-1)) &&
        (probability.isDefined == (wk.probType >= 0)) &&
        (percentile.isDefined == (wk.percentile >= 0))
    /** The full selection (category + window + level + prob/percentile). */
    def keep(wk: WindowKey): Boolean =
      keepCategory(wk) &&
        stepStart.forall(_ == wk.start) &&
        level.forall { case (t, v) => wk.levelType == t &&
          wk.levelBits == java.lang.Double.doubleToLongBits(v) } &&
        probability.forall { case (t, lo, hi) => wk.probType == t &&
          wk.probLoBits == java.lang.Double.doubleToLongBits(lo) &&
          wk.probHiBits == java.lang.Double.doubleToLongBits(hi) } &&
        percentile.forall(_ == wk.percentile)
  }

  private def fmtStart(v: Long): String =
    if (v == PointProducts) "point" else s"${v}min"
  private def fmtLevels(wks: Seq[WindowKey]): String =
    wks.map(wk => (wk.levelType, java.lang.Double.longBitsToDouble(wk.levelBits),
        java.lang.Double.longBitsToDouble(wk.levelToBits)))
      .distinct.sortBy(_.toString)
      .map { case (t, v, to) =>
        if (to.isNaN) s"($t, $v)" else s"($t, $v..$to layer)"
      }.mkString(", ")
  /** Probability/percentile variants in a cell — named in the refusal so
    * the threshold knob is discoverable from the message alone. */
  private def fmtProbs(wks: Seq[WindowKey]): String = {
    val variants = wks.map { wk =>
      if (wk.percentile >= 0) s"percentile ${wk.percentile}"
      else if (wk.probType >= 0) {
        val lo = java.lang.Double.longBitsToDouble(wk.probLoBits)
        val hi = java.lang.Double.longBitsToDouble(wk.probHiBits)
        val lim = (lo.isNaN, hi.isNaN) match {
          case (false, false) => s"$lo..$hi"
          case (false, true) => s"lo $lo"
          case (true, false) => s"hi $hi"
          case _ => "?"
        }
        s"prob(type ${wk.probType}, $lim)"
      } else "plain"
    }.distinct.sorted
    variants.mkString(", ")
  }

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
    if (sel.stepStart.isDefined || sel.level.isDefined ||
        sel.probability.isDefined || sel.percentile.isDefined) {
      pathGroups.foreach { case (g, _) =>
        require(kept.exists(_._1 == g), {
          val inCat = all.filter { case (g2, wk) =>
            g2 == g && sel.keepCategory(wk) }.map(_._2)
          val where = if (g.isEmpty) "the input" else s"group $g"
          if (inCat.isEmpty)
            s"no message in $where matches the param/member/derived/" +
              s"product-family selection (param=${sel.paramId}, " +
              s"${if (sel.ensembleDim) "ensemble members" else "deterministic"}" +
              s"${if (sel.probability.isDefined) ", probability products" else ""}" +
              s"${if (sel.percentile.isDefined) ", percentile products" else ""})"
          else {
            val starts = inCat.map(_.start).distinct.sorted.map(fmtStart)
            s"the stepStart/level/probability/percentile selection " +
              s"matches no message in $where — available step_start " +
              s"values: ${starts.mkString(", ")} (the column is MINUTES; " +
              s"GribIngest.PointProducts selects the instantaneous " +
              s"fields); available levels: ${fmtLevels(inCat)}; " +
              s"available product variants: ${fmtProbs(inCat)}"
          }
        })
      }
    }
    // store cell = (group, ref, end [, member]); everything else must be
    // single-valued or rows collide after the store projects it away
    val cells = kept.groupBy { case (g, wk) =>
      val refCell = if (sel.refDayGranular) wk.ref.toLocalDate.atStartOfDay
                    else wk.ref
      (g, refCell, wk.end, if (sel.ensembleDim) wk.member else -1)
    }.filter(_._2.lengthCompare(1) > 0)
    if (cells.nonEmpty) {
      val cellKey = cells.keys.minBy(_.toString) // deterministic report
      val (g, ref, end, _) = cellKey
      val rows = cells(cellKey).map(_._2)
      val starts = rows.map(_.start).distinct.sorted.map(fmtStart)
      val where = if (g.isEmpty) "" else s"group $g, "
      val refs = rows.map(_.ref).distinct.sortBy(_.toString)
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
          s"[${fmtLevels(rows)}], product variants [${fmtProbs(rows)}]; " +
          "select one with stepStart = Some(startMinutes) (or " +
          "GribIngest.PointProducts) and/or level = Some((type, value)) " +
          "and/or probability = Some((type, lo, hi)) / percentile = " +
          "Some(p); layer variants sharing a level must arrive in " +
          "separate files")
    }
  }

  /** The DataFrame side of the selection (pushed down, message-pruned),
    * mirroring [[CubeSelection.keep]]'s window/level/probability/
    * percentile axes (the category axes — param, member, derived — stay
    * with the manager's own filter). `Some(PointProducts)` keeps the
    * instantaneous fields (NULL step_start). A None probability/
    * percentile keeps only the NON-probability/percentile products, the
    * same default as the header-side guard. */
  def filterCube(df: org.apache.spark.sql.DataFrame,
      sel: CubeSelection): org.apache.spark.sql.DataFrame = {
    val a = sel.stepStart.fold(df) {
      case PointProducts => df.filter(col("step_start").isNull)
      case ss => df.filter(col("step_start") === ss)
    }
    val b = sel.level.fold(a) { case (t, v) =>
      a.filter(col("level_type") === t && col("level") === v)
    }
    val c = sel.probability match {
      case None => b.filter(col("prob_type").isNull)
      case Some((t, lo, hi)) =>
        val loF = if (lo.isNaN) col("prob_lo").isNull else col("prob_lo") === lo
        val hiF = if (hi.isNaN) col("prob_hi").isNull else col("prob_hi") === hi
        b.filter(col("prob_type") === t && loF && hiF)
    }
    sel.percentile match {
      case None => c.filter(col("percentile").isNull)
      case Some(p) => c.filter(col("percentile") === p)
    }
  }
}
