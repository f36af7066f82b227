package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic operators users of the reference run on a PUBLISHED store —
  * the xarray verbs (`resample`, `groupby` climatology, `rolling`,
  * `coarsen`, `interp`) re-expressed as distributed relational plans over
  * the long-format grid (time, dims..., value).
  *
  * The reference ETL finishes at `to_zarr` (utils/publish.py:155-268);
  * everything downstream of the store is xarray on the opened dataset.
  * These operators close that loop so the engine covers the read-side
  * queries too, at cluster scale:
  *
  *  - every operator is ONE shuffle (a groupBy on the target key or a
  *    window partitioned by cell) — never a global sort, never a
  *    driver-side loop;
  *  - climatology joins stay on (period, cell) keys so a 1M-cell × 40-year
  *    hourly archive shuffles climatology rows bounded by period×cells,
  *    not raw rows twice;
  *  - regridding enumerates at most 4 corner contributions per target
  *    point and joins on integer grid indices — work is O(|target|·4),
  *    independent of source cardinality, and AQE can broadcast whichever
  *    side is small.
  */
object GridAnalytics {

  /** xarray `da.resample(time=freq).mean()` — truncate time to `unit`
    * buckets ("week", "month", "day", "hour", ...) and aggregate the value
    * per (bucket, cell). `agg` ∈ {mean, sum, min, max, count}.
    * Output: (timeCol, dims..., value). One shuffle on the target key. */
  def temporalResample(df: DataFrame, timeCol: String, dims: Seq[String],
      valueCol: String, unit: String, agg: String = "mean"): DataFrame = {
    val v = col(valueCol)
    val a = agg match {
      case "mean"  => avg(v)
      case "sum"   => sum(v)
      case "min"   => min(v)
      case "max"   => max(v)
      case "count" => count(v)
      case other   => throw new IllegalArgumentException(s"unsupported agg: $other")
    }
    df.groupBy(date_trunc(unit, col(timeCol)).as(timeCol) +: dims.map(col): _*)
      .agg(a.as(valueCol))
  }

  /** xarray `da.groupby("time.month").mean()` — the long-term mean per
    * (calendar period, cell). `period` ∈ {month, dayofweek, dayofyear,
    * hour}. Output: (period, dims..., climatology). The result is bounded
    * by |periods|×|cells| regardless of archive length. */
  def climatology(df: DataFrame, timeCol: String, dims: Seq[String],
      valueCol: String, period: String = "month"): DataFrame =
    df.groupBy(periodOf(col(timeCol), period).as(period) +: dims.map(col): _*)
      .agg(avg(col(valueCol)).as("climatology"))

  /** xarray `da.groupby("time.month") - clim` — each observation minus its
    * period climatology. Output: input columns + climatology + anomaly.
    *
    * The climatology side carries an explicit broadcast hint (guide §3.1):
    * it is an aggregate bounded by |periods|×|cells| regardless of archive
    * length — exactly the side a 100 TB run must broadcast (the
    * alternative shuffles every grid row for a join against a
    * dimensionally-bounded table). The hint matters for MATERIALIZED
    * inputs: `localCheckpoint` erases size statistics (LogicalRDD defaults
    * to defaultSizeInBytes), so estimate-driven planning silently degrades
    * the join to sort-merge — the r15 trap that forced callers to choose
    * between single-evaluation inputs and the broadcast shape. With the
    * hint, callers may checkpoint an expensive `df` and keep both. */
  def anomalies(df: DataFrame, timeCol: String, dims: Seq[String],
      valueCol: String, period: String = "month"): DataFrame = {
    val clim = climatology(df, timeCol, dims, valueCol, period)
    df.withColumn(period, periodOf(col(timeCol), period))
      .join(broadcast(clim), period +: dims, "left")
      .withColumn("anomaly", col(valueCol) - col("climatology"))
  }

  private def periodOf(t: Column, period: String): Column = period match {
    case "month"     => month(t)
    case "dayofweek" => dayofweek(t) // 1=Sunday..7, Spark convention
    case "dayofyear" => dayofyear(t)
    case "hour"      => hour(t)
    case other       => throw new IllegalArgumentException(s"unsupported period: $other")
  }

  /** xarray `da.rolling(time=k).mean()` — trailing k-step aggregate per
    * cell, rows-based (the grid's cadence is the step). Emits a row per
    * input row with `rolling_<agg>`; windows shorter than `minPeriods`
    * yield null. The window partitions on the CELL key — there is no
    * global sort, and per-partition state is one cell's history.
    * (time, cell) must be unique, which `GridStore`/`ZarrStore` datasets
    * guarantee by construction. */
  def rollingTime(df: DataFrame, timeCol: String, dims: Seq[String],
      valueCol: String, k: Int, agg: String = "mean",
      minPeriods: Int = 1): DataFrame = {
    require(k >= 1, s"window of $k steps")
    require(dims.nonEmpty,
      "rollingTime needs at least one cell dim: an undimensioned window is a single-partition sort")
    val w = Window.partitionBy(dims.map(col): _*).orderBy(col(timeCol))
      .rowsBetween(-(k - 1), Window.currentRow)
    val v = col(valueCol)
    val a = agg match {
      case "mean" => avg(v).over(w)
      case "sum"  => sum(v).over(w)
      case "min"  => min(v).over(w)
      case "max"  => max(v).over(w)
      case other  => throw new IllegalArgumentException(s"unsupported agg: $other")
    }
    df.withColumn(s"rolling_$agg",
      when(count(v).over(w) >= minPeriods, a))
  }

  /** xarray `da.coarsen(latitude=fy, longitude=fx).mean()` — block-aggregate
    * a regular grid by integer factors. Cells are assigned to blocks by
    * index distance from the grid origin; the output carries the block's
    * mean coordinate position (xarray's default `coord_func="mean"` on a
    * trim-complete grid) computed from the block INDEX, so partial edge
    * blocks still land on the canonical centre. One shuffle. */
  def coarsen(df: DataFrame, timeCol: String, latCol: String, lonCol: String,
      valueCol: String, lat0: Double, dLat: Double, lon0: Double, dLon: Double,
      fy: Int, fx: Int, agg: String = "mean"): DataFrame = {
    require(fy >= 1 && fx >= 1, s"coarsen factors ($fy,$fx)")
    val by = floor(round((col(latCol) - lat0) / dLat, 6) / fy).cast("long")
    val bx = floor(round((col(lonCol) - lon0) / dLon, 6) / fx).cast("long")
    val v = col(valueCol)
    val a = agg match {
      case "mean" => avg(v)
      case "sum"  => sum(v)
      case "min"  => min(v)
      case "max"  => max(v)
      case other  => throw new IllegalArgumentException(s"unsupported agg: $other")
    }
    df.groupBy(col(timeCol), by.as("block_y"), bx.as("block_x"))
      .agg(a.as(valueCol))
      .select(col(timeCol),
        (lit(lat0) + (col("block_y") * fy + (fy - 1) / 2.0) * dLat).as(latCol),
        (lit(lon0) + (col("block_x") * fx + (fx - 1) / 2.0) * dLon).as(lonCol),
        col(valueCol))
  }

  /** xarray `da.interp(latitude=..., longitude=...)` — bilinear regrid from
    * a regular source grid to arbitrary target points (one time slice or
    * many; the join carries `timeCol` when present).
    *
    * Each target point spans at most 4 source corners; contributions are
    * enumerated target-side (explode of a 4-element array), joined to the
    * source on integer (i,j) grid indices, and reduced by a weighted
    * average. Missing source cells simply drop their corner (NaN-aware
    * regridding: sum w·v / sum w over PRESENT corners); target points with
    * no present corner disappear. Work is O(|target|·4) rows through one
    * equi-join — source cardinality only sets the join's build side.
    *
    * `target` must carry (latCol, lonCol) target coordinates. Output:
    * (timeCol?, latCol, lonCol, value). */
  def regridBilinear(source: DataFrame, target: DataFrame,
      timeCol: Option[String], latCol: String, lonCol: String,
      valueCol: String,
      lat0: Double, dLat: Double, nLat: Int,
      lon0: Double, dLon: Double, nLon: Int): DataFrame = {
    // fractional index of each target point in the source grid
    val fi = (col(latCol) - lat0) / dLat
    val fj = (col(lonCol) - lon0) / dLon
    // corner enumeration: (i, j, weight), weights from the fractional parts.
    // floor() pins the lower corner; targets outside the grid hull keep
    // only in-range corners (weights renormalize in the final division).
    val corners = target
      .withColumn("__i0", floor(fi).cast("int"))
      .withColumn("__j0", floor(fj).cast("int"))
      .withColumn("__wy", fi - col("__i0"))
      .withColumn("__wx", fj - col("__j0"))
      .select(col("*"), explode(array(
        struct(col("__i0").as("i"), col("__j0").as("j"),
          ((lit(1.0) - col("__wy")) * (lit(1.0) - col("__wx"))).as("w")),
        struct(col("__i0").as("i"), (col("__j0") + 1).as("j"),
          ((lit(1.0) - col("__wy")) * col("__wx")).as("w")),
        struct((col("__i0") + 1).as("i"), col("__j0").as("j"),
          (col("__wy") * (lit(1.0) - col("__wx"))).as("w")),
        struct((col("__i0") + 1).as("i"), (col("__j0") + 1).as("j"),
          (col("__wy") * col("__wx")).as("w")))).as("c"))
      .filter(col("c.i").between(0, nLat - 1) &&
        col("c.j").between(0, nLon - 1) && col("c.w") > 0)
      .select(
        Seq(col(latCol).as("__tlat"), col(lonCol).as("__tlon"),
          col("c.i").as("__i"), col("c.j").as("__j"), col("c.w").as("__w")): _*)
    // source rows keyed by integer grid index (round() absorbs coordinate
    // float noise before the cast)
    val src = source.select(
      timeCol.map(col).toSeq ++ Seq(
        round((col(latCol) - lat0) / dLat, 6).cast("int").as("__i"),
        round((col(lonCol) - lon0) / dLon, 6).cast("int").as("__j"),
        col(valueCol).as("__v")): _*)
    val keyCols = Seq(col("__tlat"), col("__tlon")) ++ timeCol.map(col).toSeq
    corners.join(src, Seq("__i", "__j"))
      .groupBy(keyCols: _*)
      .agg((sum(col("__w") * col("__v")) / sum(col("__w"))).as(valueCol))
      .select(timeCol.map(col).toSeq ++ Seq(
        col("__tlat").as(latCol), col("__tlon").as(lonCol), col(valueCol)): _*)
  }

  /** xarray `da.interpolate_na(dim="time", method="linear")` — fill null
    * cells by linear interpolation between the nearest non-null neighbours
    * along time, PER CELL. Leading/trailing gaps (no neighbour on one
    * side) stay null, matching xarray's default (no extrapolation).
    *
    * Two window passes over one (cell, time-ordered) partitioning — Spark
    * plans them in a single sort+window stage, so the cost is one shuffle
    * on the cell key. Null runs of any length interpolate against the run's
    * bracketing values; time distances weight the blend, so irregular
    * cadences interpolate correctly. Adds `<valueCol>_filled`. */
  def interpolateNaTime(df: DataFrame, timeCol: String, dims: Seq[String],
      valueCol: String): DataFrame = {
    require(dims.nonEmpty,
      "interpolateNaTime needs at least one cell dim: an undimensioned window is a single-partition sort")
    val v = col(valueCol)
    // seconds (fractional) since epoch; NTZ routes through TIMESTAMP (the
    // engine pins the session zone to UTC, so the conversion is identity)
    val t = col(timeCol).cast(org.apache.spark.sql.types.TimestampType).cast("double")
    val back = Window.partitionBy(dims.map(col): _*).orderBy(col(timeCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(dims.map(col): _*).orderBy(col(timeCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prevV = last(when(v.isNotNull, v), ignoreNulls = true).over(back)
    val prevT = last(when(v.isNotNull, t), ignoreNulls = true).over(back)
    val nextV = first(when(v.isNotNull, v), ignoreNulls = true).over(fwd)
    val nextT = first(when(v.isNotNull, t), ignoreNulls = true).over(fwd)
    df.withColumn(s"${valueCol}_filled",
      when(v.isNotNull, v)
        .when(prevV.isNotNull && nextV.isNotNull,
          prevV + (nextV - prevV) * ((t - prevT) / (nextT - prevT))))
  }

  /** xarray `da.weighted(np.cos(np.deg2rad(lat))).mean(("latitude",
    * "longitude"))` — the area-correct spatial mean on a regular lat/lon
    * grid (cells shrink towards the poles; an unweighted mean over-weights
    * high latitudes). Output: (timeCol, mean). One shuffle on time. */
  def weightedSpatialMean(df: DataFrame, timeCol: String, latCol: String,
      valueCol: String): DataFrame = {
    val w = cos(radians(col(latCol)))
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(timeCol))
      .agg((sum(w * col(valueCol)) / sum(w)).as("mean"))
  }

  /** Focal (neighborhood) mean on a regular grid — xarray
    * `da.rolling(lat=k, lon=k, center=True, min_periods=1).mean()`, the
    * standard spatial smoothing pass. Each cell's smoothed value averages
    * the PRESENT cells of its (2·radius+1)² window; edge and hole cells
    * renormalize over what exists (min_periods=1 semantics). Grid indices
    * derive from the coordinate origin/step, so the neighbor relation is
    * pure integer arithmetic — no geometry join.
    *
    * Scale shape: each row fans out to (2r+1)² contribution rows keyed by
    * the TARGET cell index — a map-side-combinable aggregate on
    * (time, cell), ONE shuffle whose volume is k²·rows before partial
    * aggregation collapses co-partitioned contributions. No self-join, no
    * window sort. Output: (timeCol, latCol, lonCol, <valueCol>_focal). */
  def focalMean(df: DataFrame, timeCol: String, latCol: String,
      lonCol: String, valueCol: String,
      lat0: Double, latStep: Double, lon0: Double, lonStep: Double,
      radius: Int = 1): DataFrame = {
    require(radius >= 1, s"radius must be >= 1, got $radius")
    require(latStep != 0 && lonStep != 0, "grid steps must be non-zero")
    val li = round((col(latCol) - lit(lat0)) / lit(latStep)).cast("int")
    val lj = round((col(lonCol) - lit(lon0)) / lit(lonStep)).cast("int")
    val offsets = for { di <- -radius to radius; dj <- -radius to radius }
      yield (di, dj)
    val offs = explode(array(offsets.map { case (di, dj) =>
      struct(lit(di).as("di"), lit(dj).as("dj")) }: _*)).as("o")
    df.withColumn("__li", li).withColumn("__lj", lj)
      .select(col(timeCol), col(latCol), col(lonCol), col(valueCol),
        col("__li"), col("__lj"), offs)
      .groupBy(col(timeCol), (col("__li") + col("o.di")).as("__ti"),
        (col("__lj") + col("o.dj")).as("__tj"))
      .agg(
        avg(col(valueCol)).as(s"${valueCol}_focal"),
        max(col("o.di") === 0 && col("o.dj") === 0).as("__keep"),
        max(when(col("o.di") === 0 && col("o.dj") === 0, col(latCol)))
          .as(latCol),
        max(when(col("o.di") === 0 && col("o.dj") === 0, col(lonCol)))
          .as(lonCol))
      .filter(col("__keep"))
      .select(col(timeCol), col(latCol), col(lonCol),
        col(s"${valueCol}_focal"))
  }

  /** regionmask-style aggregation — the "mean over each named region"
    * query (xarray + regionmask, the standard basin/country reduction):
    * per (region, time) cos-lat-weighted mean over labeled lat/lon boxes.
    * `regions` columns: (region, lat_min, lat_max, lon_min, lon_max),
    * inclusive bounds; OVERLAPPING regions each receive the cell (a cell
    * can belong to a basin and its parent continent). Null values are
    * excluded, matching xarray's skipna.
    *
    * The region table is dimension-sized, so it BROADCASTS: the range
    * join is a per-row predicate against an in-memory list emitting at
    * most |regions| rows per cell — no shuffle on the raw grid — and the
    * only exchange is the (region, time) aggregate, bounded by
    * |regions|×|timesteps|. Output: (region, timeCol, mean, n_cells). */
  def regionWeightedMean(df: DataFrame, regions: DataFrame, timeCol: String,
      latCol: String, lonCol: String, valueCol: String): DataFrame = {
    val joined = df.filter(col(valueCol).isNotNull)
      .join(broadcast(regions),
        col(latCol) >= col("lat_min") && col(latCol) <= col("lat_max") &&
          col(lonCol) >= col("lon_min") && col(lonCol) <= col("lon_max"))
    val w = cos(radians(col(latCol)))
    joined.groupBy(col("region"), col(timeCol))
      .agg((sum(w * col(valueCol)) / sum(w)).as("mean"),
        count(lit(1)).as("n_cells"))
  }

  /** xarray `da.quantile(q, dim="time")` — exact linear-interpolated
    * percentiles of the value per cell (Spark's sort-based `percentile`,
    * not the approximate sketch; the per-group sort is bounded by one
    * cell's history). Output: (dims..., p_<q> per requested q). */
  def percentilesByCell(df: DataFrame, dims: Seq[String], valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1), s"quantiles $qs")
    val aggs = qs.map(q => percentile(col(valueCol), lit(q))
      .as(s"p_${(q * 100).round}"))
    df.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** xarray `da.shift(time=k)` — the value k steps back (k < 0: forward)
    * along each cell's time-ordered history; the first |k| steps are null.
    * Adds `<valueCol>_shift`. Same one-shuffle cell-key window as
    * [[rollingTime]]; an undimensioned call is refused for the same
    * single-partition-sort reason. */
  def shiftTime(df: DataFrame, timeCol: String, dims: Seq[String],
      valueCol: String, k: Int): DataFrame = {
    require(k != 0, "shift of 0 steps is the identity")
    require(dims.nonEmpty,
      "shiftTime needs at least one cell dim: an undimensioned window is a single-partition sort")
    val w = Window.partitionBy(dims.map(col): _*).orderBy(col(timeCol))
    val shifted = if (k > 0) lag(col(valueCol), k).over(w)
                  else lead(col(valueCol), -k).over(w)
    df.withColumn(s"${valueCol}_shift", shifted)
  }

  /** xarray `da.diff("time", n=k)` — the k-step difference per cell
    * (`v(t) − v(t−k)`); xarray drops the first k steps, so rows with no
    * k-back neighbour carry null here rather than disappearing (callers
    * filter if they want xarray's exact row set). Adds `<valueCol>_diff`. */
  def diffTime(df: DataFrame, timeCol: String, dims: Seq[String],
      valueCol: String, k: Int = 1): DataFrame = {
    require(k >= 1, s"diff over $k steps")
    require(dims.nonEmpty,
      "diffTime needs at least one cell dim: an undimensioned window is a single-partition sort")
    val w = Window.partitionBy(dims.map(col): _*).orderBy(col(timeCol))
    df.withColumn(s"${valueCol}_diff", col(valueCol) - lag(col(valueCol), k).over(w))
  }

  /** xarray `da.cumsum("time")` — the running total per cell. Nulls pass
    * through without contributing (Spark `sum` ignores nulls), matching
    * xarray's `skipna=True` default. Adds `<valueCol>_cumsum`. */
  def cumsumTime(df: DataFrame, timeCol: String, dims: Seq[String],
      valueCol: String): DataFrame = {
    require(dims.nonEmpty,
      "cumsumTime needs at least one cell dim: an undimensioned window is a single-partition sort")
    val w = Window.partitionBy(dims.map(col): _*).orderBy(col(timeCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(s"${valueCol}_cumsum", sum(col(valueCol)).over(w))
  }

  /** Empirical quantile of each observation WITHIN its cell's history —
    * `percent_rank` along the value axis per cell, the return-period /
    * SPI-style statistic ("this month's rainfall sits at the 3rd
    * percentile of this cell's record"). Exact integer arithmetic
    * ((rank−1)/(n−1)), ties share a rank, single-observation cells rank 0.
    * One shuffle on the cell key; per-partition sort bounded by one cell's
    * history. Adds `<valueCol>_pct_rank`. */
  def percentRankInCell(df: DataFrame, dims: Seq[String],
      valueCol: String): DataFrame = {
    require(dims.nonEmpty,
      "percentRankInCell needs at least one cell dim: an undimensioned window is a single-partition sort")
    val w = Window.partitionBy(dims.map(col): _*).orderBy(col(valueCol))
    df.withColumn(s"${valueCol}_pct_rank", percent_rank().over(w))
  }

  /** xarray `da.ffill(dim="time", limit=…)` / `da.bfill(...)` — propagate
    * the last (next) observed value into nulls along each cell's time axis,
    * optionally at most `limit` steps away (rows-based, matching xarray).
    * Adds `<valueCol>_filled`; nulls beyond the limit (or before the first
    * / after the last observation) stay null. One cell-key shuffle + one
    * sort; ffill's preceding frame and bfill's following frame share the
    * same (cell, time ASC) ordering, so composing both stays one sort. */
  def fillTime(df: DataFrame, timeCol: String, dims: Seq[String],
      valueCol: String, method: String = "ffill",
      limit: Option[Int] = None): DataFrame = {
    require(dims.nonEmpty,
      "fillTime needs at least one cell dim: an undimensioned window is a single-partition sort")
    limit.foreach(k => require(k > 0, s"limit must be positive, got $k"))
    val ord = Window.partitionBy(dims.map(col): _*).orderBy(col(timeCol))
    val v = col(valueCol)
    val (frame, pick, pickRn) = method match {
      case "ffill" =>
        val f = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        (f, last(v, ignoreNulls = true).over(f),
          (c: Column) => last(c, ignoreNulls = true).over(f))
      case "bfill" =>
        val f = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        (f, first(v, ignoreNulls = true).over(f),
          (c: Column) => first(c, ignoreNulls = true).over(f))
      case other => throw new IllegalArgumentException(
        s"method must be ffill or bfill, got $other")
    }
    limit match {
      case None => df.withColumn(s"${valueCol}_filled", coalesce(v, pick))
      case Some(k) =>
        // rn must be a materialized column — window functions can't nest
        val srcRn = pickRn(when(v.isNotNull, col("__rn")))
        df.withColumn("__rn", row_number().over(ord))
          .withColumn(s"${valueCol}_filled",
            when(v.isNotNull, v).when(abs(col("__rn") - srcRn) <= k, pick))
          .drop("__rn")
    }
  }

  /** Standardized anomaly (z-score) against the cell's own record — the
    * SPI-style normalization `(y − μ)/σ_pop`, algebraically rearranged to
    * `(n·y − Σy)/√(n·Σy² − (Σy)²)` so every intermediate is an EXACT
    * integer: the only float operations are one int→double conversion, one
    * √, and one division — all IEEE-exactly-rounded, so the result is
    * bit-identical on any engine (no rounding belt needed). Requires
    * integer-valued `y` (casts to BIGINT, like [[trendInCell]]).
    * Constant cells (zero variance) yield null. Adds `<valueCol>_zscore`.
    * One unordered cell-key window — a single shuffle, no sort frames
    * beyond the partition hash. */
  def zscoreInCell(df: DataFrame, dims: Seq[String],
      valueCol: String): DataFrame = {
    require(dims.nonEmpty, "zscoreInCell needs at least one cell dim")
    val w = Window.partitionBy(dims.map(col): _*)
    val y = col(valueCol).cast("long")
    df.withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sy", sum(y).over(w))
      .withColumn("__syy", sum(y * y).over(w))
      .withColumn(s"${valueCol}_zscore", {
        val varNum = col("__n") * col("__syy") - col("__sy") * col("__sy")
        when(varNum > 0,
          (col("__n") * y - col("__sy")).cast("double") /
            sqrt(varNum.cast("double")))
      })
      .drop("__n", "__sy", "__syy")
  }

  /** Threshold-exceedance spells per cell — the run-length statistic behind
    * the ETCCDI climate indices (consecutive dry days, warm-spell duration):
    * maximal runs of time steps where `value <comparison> threshold` holds
    * (default `>=`, the warm-spell family; `<` / `<=` give CDD-style dry
    * spells) and consecutive steps are at most `maxGapSeconds` apart (so a
    * missing day BREAKS a spell — per-cell time axes are allowed to have
    * holes). Output: (dims..., spell_start, spell_end, n_steps, peak) with
    * peak = the max value inside the spell.
    *
    * Plan shape: filter → lag(time) window → running-sum window → groupBy,
    * all partitioned by the cell key: the two windows share one exchange +
    * one sort. The final groupBy adds a second exchange only formally —
    * float cell keys get NaN-normalized in the window's output
    * partitioning, so Catalyst can't prove reuse — but the map-side
    * partial aggregate below it already collapses each spell (whose rows
    * are co-located by the first shuffle) to ONE row, so it moves one row
    * per spell, not per observation. */
  def spellsInCell(df: DataFrame, timeCol: String, dims: Seq[String],
      valueCol: String, threshold: Double,
      maxGapSeconds: Long = 86400L,
      comparison: String = ">="): DataFrame = {
    require(dims.nonEmpty,
      "spellsInCell needs at least one cell dim: an undimensioned window is a single-partition sort")
    require(maxGapSeconds > 0, s"maxGapSeconds must be positive, got $maxGapSeconds")
    // ">=" / ">" = warm-spell family (WSDI); "<=" / "<" = dry-spell family
    // (CDD: consecutive days BELOW the wet-day threshold)
    val exceeds = comparison match {
      case ">=" => col(valueCol) >= lit(threshold)
      case ">"  => col(valueCol) > lit(threshold)
      case "<=" => col(valueCol) <= lit(threshold)
      case "<"  => col(valueCol) < lit(threshold)
      case other => throw new IllegalArgumentException(
        s"comparison must be one of >=, >, <=, <; got $other")
    }
    val w = Window.partitionBy(dims.map(col): _*).orderBy(col(timeCol))
    val prev = lag(col(timeCol), 1).over(w)
    val isStart = prev.isNull ||
      (unix_timestamp(col(timeCol)) - unix_timestamp(prev) > lit(maxGapSeconds))
    val run = Window.partitionBy(dims.map(col): _*).orderBy(col(timeCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(exceeds)
      .withColumn("__spell", sum(isStart.cast("long")).over(run))
      .groupBy(dims.map(col) :+ col("__spell"): _*)
      .agg(min(col(timeCol)).as("spell_start"), max(col(timeCol)).as("spell_end"),
        count(lit(1)).as("n_steps"), max(col(valueCol)).as("peak"))
      .drop("__spell")
  }

  /** xarray `da.idxmax(dim="time")` + the max itself — WHEN each cell's
    * record value occurred, with a deterministic tie-break (the EARLIEST
    * achieving time; bare `arg_max`/`max_by` tie-breaks are
    * engine-arbitrary). Output: (dims..., <valueCol>_max, <timeCol>_at_max).
    * One exchange: the unordered window max and the groupBy share the cell
    * hash partitioning. */
  def idxmaxInCell(df: DataFrame, timeCol: String, dims: Seq[String],
      valueCol: String): DataFrame = {
    require(dims.nonEmpty, "idxmaxInCell needs at least one cell dim")
    val w = Window.partitionBy(dims.map(col): _*)
    df.withColumn("__vmax", max(col(valueCol)).over(w))
      .filter(col(valueCol) === col("__vmax"))
      .groupBy(dims.map(col): _*)
      .agg(max(col("__vmax")).as(s"${valueCol}_max"),
        min(col(timeCol)).as(s"${timeCol}_at_max"))
  }

  /** Per-cell linear trend — xarray `polyfit(dim="time", deg=1)`, the
    * warming-trend map. Least squares over (x = whole days since epoch,
    * y = value) carried ENTIRELY in integer arithmetic so the result is
    * bit-exact and engine-portable: returns the closed-form numerators and
    * shared denominator as BIGINTs —
    * slope = slope_num/den, intercept = icept_num/den, with
    * slope_num = n·Σxy − Σx·Σy, den = n·Σx² − (Σx)²,
    * icept_num = Σy·Σx² − Σx·Σxy. Requires integer-valued `y` (casts to
    * BIGINT); day-grain x keeps every term far inside Int64 for any
    * century-scale daily record. Single-step cells return den = 0 (the
    * undefined-slope marker) rather than a divide error. One map-side
    * combined groupBy on the cell key. */
  def trendInCell(df: DataFrame, timeCol: String, dims: Seq[String],
      valueCol: String): DataFrame = {
    require(dims.nonEmpty, "trendInCell needs at least one cell dim")
    val x = datediff(col(timeCol).cast("date"), to_date(lit("1970-01-01")))
      .cast("long")
    val y = col(valueCol).cast("long")
    df.select(dims.map(col) :+ x.as("__x") :+ y.as("__y"): _*)
      .groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"), sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .select(dims.map(col) ++ Seq(
        col("n"),
        (col("n") * col("__sxy") - col("__sx") * col("__sy")).as("slope_num"),
        (col("n") * col("__sxx") - col("__sx") * col("__sx")).as("den"),
        (col("__sy") * col("__sxx") - col("__sx") * col("__sxy")).as("icept_num")): _*)
  }

  /** xarray `da.groupby_bins(valueCol, bins).agg()` on uniform bins — the
    * value-distribution histogram (count + mean per bin). Bins are
    * left-closed `[lo + i·step, lo + (i+1)·step)` (numpy `digitize`
    * `right=False`); values outside `[lo, lo + nBins·step)` are discarded,
    * matching xarray's out-of-range handling. Output: (bin_lo, n, mean).
    * The bin index is pure per-row arithmetic, so this is one map-side-
    * combined aggregation bounded by nBins groups. */
  def groupbyBins(df: DataFrame, valueCol: String, lo: Double, step: Double,
      nBins: Int): DataFrame = {
    require(step > 0 && nBins >= 1, s"bins: step=$step n=$nBins")
    val bin = floor((col(valueCol) - lo) / step).cast("long")
    df.filter(col(valueCol).isNotNull)
      .withColumn("__bin", bin)
      .filter(col("__bin") >= 0 && col("__bin") < nBins)
      .groupBy((lit(lo) + col("__bin") * step).as("bin_lo"))
      .agg(count(lit(1)).as("n"), avg(col(valueCol)).as("mean"))
  }

  /** Nearest-neighbour regrid: same join shape as [[regridBilinear]] but a
    * single rounded corner per target point — for categorical/flag grids
    * where interpolation is meaningless. */
  def regridNearest(source: DataFrame, target: DataFrame,
      timeCol: Option[String], latCol: String, lonCol: String,
      valueCol: String,
      lat0: Double, dLat: Double, nLat: Int,
      lon0: Double, dLon: Double, nLon: Int): DataFrame = {
    val corners = target.select(
      col(latCol).as("__tlat"), col(lonCol).as("__tlon"),
      round((col(latCol) - lat0) / dLat, 0).cast("int").as("__i"),
      round((col(lonCol) - lon0) / dLon, 0).cast("int").as("__j"))
      .filter(col("__i").between(0, nLat - 1) && col("__j").between(0, nLon - 1))
    val src = source.select(
      timeCol.map(col).toSeq ++ Seq(
        round((col(latCol) - lat0) / dLat, 6).cast("int").as("__i"),
        round((col(lonCol) - lon0) / dLon, 6).cast("int").as("__j"),
        col(valueCol).as("__v")): _*)
    corners.join(src, Seq("__i", "__j"))
      .select(timeCol.map(col).toSeq ++ Seq(
        col("__tlat").as(latCol), col("__tlon").as(lonCol),
        col("__v").as(valueCol)): _*)
  }

  /** Threshold-based climate indices per (cell, period) — the ETCCDI
    * family's accumulation/count recipe (growing degree days, frost days,
    * heat days) over a daily grid:
    *
    *   - `degree_days`  = Σ max(0, value − base)   (GDD accumulation)
    *   - `days_below`   = #{value < lowThresh}     (e.g. frost days FD)
    *   - `days_above`   = #{value > highThresh}    (e.g. summer days SU)
    *   - `n_days`       = observation count (exposes partial periods —
    *                      indices over incomplete coverage are flagged by
    *                      the caller, matching the reference's QC posture)
    *
    * One map-side-combined hash aggregate on (cell, period) — no window,
    * no sort, no self-join; the canonical 100 TB reduction. `period` is
    * "month" | "year" (date_trunc), kept as a timestamp for oracle parity.
    */
  def thresholdIndices(df: DataFrame, timeCol: String, dims: Seq[String],
      valueCol: String, period: String, base: Double,
      lowThresh: Double, highThresh: Double): DataFrame = {
    require(period == "month" || period == "year", s"period: $period")
    val v = col(valueCol)
    df.groupBy(date_trunc(period, col(timeCol)).as("period") +:
        dims.map(col): _*)
      .agg(
        sum(greatest(v - base, lit(0.0))).as("degree_days"),
        count(when(v < lowThresh, 1)).as("days_below"),
        count(when(v > highThresh, 1)).as("days_above"),
        count(v).as("n_days"))
  }
}
