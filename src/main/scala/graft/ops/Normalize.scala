package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.{DatasetDescriptor, TimeSpan}

/** Coordinate / scalar normalization operators (SURVEY §2.3-§2.4).
  *
  * Every operator is a pure `DataFrame => DataFrame` so Catalyst sees one
  * declarative plan: filters and projections fold into the parquet scan,
  * and nothing here materializes driver-side state.
  */
object Normalize {

  /** Normalize longitudes into [-180, 180).
    *
    * Reference: `standardize_longitudes` (utils/convenience.py:506-524) —
    * `((lon + 180) % 360) - 180`. `pmod` keeps the result non-negative for
    * west-of-Greenwich inputs (numpy `%` semantics, unlike Java `%`).
    * The reference's subsequent `sortby` is a physical-layout concern here:
    * apply ordering at write time via `sortWithinPartitions`, not in the plan.
    */
  def standardizeLongitudes(df: DataFrame, lonCol: String = "longitude"): DataFrame =
    df.withColumn(lonCol, pmod(col(lonCol) + lit(180.0), lit(360.0)) - lit(180.0))

  /** Provider missing-value sentinel → NaN at scan.
    *
    * Reference: `preprocess_kerchunk` rewrites the refs' `fill_value`
    * (utils/transform.py:347-375); in a long-form scan it is a single
    * `when` over the value column, which stays inside whole-stage codegen.
    */
  def missingToNaN(df: DataFrame, valueCol: String, missingValue: Double): DataFrame =
    df.withColumn(valueCol,
      when(col(valueCol) === lit(missingValue), lit(Float.NaN)).otherwise(col(valueCol)))

  /** Enforce the declared dtype of the data variable (float32 by default).
    *
    * Reference: `data_var_dtype = "<f4"` (utils/attributes.py:172-175),
    * enforced at write (utils/publish.py:653-657).
    */
  def enforceValueType(df: DataFrame, valueCol: String, dt: DataType = FloatType): DataFrame =
    df.withColumn(valueCol, col(valueCol).cast(dt))

  /** Reindex the time axis onto a complete spine, NaN/null-filling holes.
    *
    * Reference: `fill_in_missing_time_steps` (util_funcs/reindexing.py:5-28).
    * Scale shape: the untouched original rows pass through verbatim (no
    * join, no shuffle); only the *missing* timesteps — spine anti-join the
    * distinct present times, usually a handful — are cross-joined with the
    * distinct spatial key set and unioned in with null values. A naive
    * spine×spatial left join would shuffle the full grid to fill a few holes.
    *
    * Precondition (xarray's dense model, which the reference reindexes):
    * timesteps PRESENT in the input are spatially complete. Only wholly-
    * absent timesteps are padded; a ragged long-form input with partial
    * spatial coverage on a present timestep keeps its holes (use
    * `Manifest.missingCombinations` to detect that case).
    */
  def fillMissingTimeSteps(
      df: DataFrame,
      timeCol: String,
      otherDims: Seq[String],
      resolution: TimeSpan): DataFrame = {
    // Materialize the distinct PRESENT times once (r15, guide §2.3): one
    // row per timestep — the driver-held-axis bound, never the grid. The
    // former shape evaluated df three times (bounds aggregate, distinct
    // times, dim set); bounds and the anti-join probe now read this
    // axis-sized checkpoint, so df itself is computed once here (plus the
    // verbatim pass-through in the union below).
    val times = df.select(col(timeCol)).distinct().localCheckpoint(true)
    val bounds = times.agg(min(col(timeCol)).as("lo"), max(col(timeCol)).as("hi"))
    val spine = bounds.select(
      explode(expr(s"sequence(lo, hi, ${resolution.intervalExpr})")).as(timeCol))
    val missingTimes = spine.join(times, Seq(timeCol), "left_anti")
    val holeRows =
      if (otherDims.isEmpty) missingTimes
      else missingTimes.crossJoin(df.select(otherDims.map(col): _*).distinct())
    val valueCols = df.columns.filterNot((timeCol +: otherDims).contains)
    val padded = valueCols.foldLeft(holeRows) { (acc, c) =>
      acc.withColumn(c, lit(null).cast(df.schema(c).dataType))
    }
    df.unionByName(padded.select(df.columns.map(col): _*))
  }

  /** Full dense reindex onto (time spine × spatial key set) — the ragged-
    * input counterpart of [[fillMissingTimeSteps]]: EVERY absent
    * (time, cell) combination gets a null row, including cells missing
    * from a timestep that other cells observe. Use this when the long-form
    * input does not satisfy the dense-cube precondition (e.g. a per-cell
    * event aggregate where quiet cells simply have no row).
    *
    * Scale shape: the synthesized side is spine×cells KEYS ONLY, anti-
    * joined against the input's key columns — the input's value columns
    * never shuffle (original rows pass through the union verbatim), and
    * the anti join's exchange carries just (time, dims) tuples. The output
    * is inherently |spine|·|cells| rows; the extra key shuffle relative to
    * [[fillMissingTimeSteps]] is the price of detecting per-cell holes. */
  def reindexDense(
      df: DataFrame,
      timeCol: String,
      otherDims: Seq[String],
      resolution: TimeSpan): DataFrame = {
    // Materialize the KEY projection once (r16, guide §2.3): the former
    // shape referenced df four times — bounds aggregate, dim-set distinct,
    // the anti-join's present-key side, and the verbatim union
    // pass-through — so an expensive input (at these call sites, a full
    // scan + aggregate) evaluated four times. The first three only need
    // the key columns; they now read this checkpoint, leaving df itself
    // evaluated once (the pass-through). Keys-only, so the blocks carry
    // no value payload; caller/sweep releases the checkpoint.
    val keys = df.select((timeCol +: otherDims).map(col): _*)
      .localCheckpoint(true)
    val bounds = keys.agg(min(col(timeCol)).as("lo"), max(col(timeCol)).as("hi"))
    val spine = bounds.select(
      explode(expr(s"sequence(lo, hi, ${resolution.intervalExpr})")).as(timeCol))
    val spineAll =
      if (otherDims.isEmpty) spine
      else spine.crossJoin(keys.select(otherDims.map(col): _*).distinct())
    val holeRows = spineAll.join(keys, timeCol +: otherDims, "left_anti")
    val valueCols = df.columns.filterNot((timeCol +: otherDims).contains)
    val padded = valueCols.foldLeft(holeRows) { (acc, c) =>
      acc.withColumn(c, lit(null).cast(df.schema(c).dataType))
    }
    df.unionByName(padded.select(df.columns.map(col): _*))
  }

  /** Materialize a length-1 dimension dropped upstream (e.g. a squeezed time
    * axis, or a timestep synthesized from a filename date).
    *
    * Reference: `expand_dims` usages (utils/publish.py:505, 1147-1173).
    * Long-form rows make this a constant column.
    */
  def expandDim(df: DataFrame, dim: String, value: Column): DataFrame =
    df.withColumn(dim, value)

  /** Rename the (first) data variable to the canonical name; tolerate the
    * canonical name already being present.
    *
    * Reference: `rename_data_variable` (utils/metadata.py:748-771).
    */
  def renameDataVariable(df: DataFrame, desc: DatasetDescriptor): DataFrame = {
    val dimSet = desc.standardDims.toSet
    // a column already carrying the standard name wins — renaming some
    // OTHER non-dim column over it (e.g. the grib scan's `param`) would
    // duplicate the name; extra columns fall away in transposeToStandard
    if (df.columns.contains(desc.dataVar)) return df
    val candidates = df.columns.filter(c => !dimSet.contains(c))
    val pick =
      if (candidates.length == 1) Some(candidates.head)
      // the DSv2 scans' data-column convention: grib emits (param, value,
      // member…) — `value` is the field, the rest are grid metadata
      else if (candidates.contains("value")) Some("value")
      else None
    pick match {
      case Some(v) => df.withColumnRenamed(v, desc.dataVar)
      case None if candidates.isEmpty => df
      case None => throw new IllegalArgumentException(
        s"ambiguous data variable for ${desc.dataVar}: " +
          s"${candidates.mkString(", ")} — select or rename it in preprocess")
    }
  }

  /** Project to the standard dimension order, tolerating absent dims.
    *
    * Reference: transpose to `standard_dims` (utils/transform.py:670-673,
    * `_standard_dims_except` 761-762; utils/publish.py:507-510).
    */
  def transposeToStandard(df: DataFrame, desc: DatasetDescriptor): DataFrame = {
    val present = desc.standardDims.filter(df.columns.contains)
    df.select((present :+ desc.dataVar).map(col): _*)
  }

  /** Replace coordinate values via a mapping table (assign_coords analog,
    * utils/publish.py:680-685). `mapping` must be small: it is broadcast. */
  def assignCoords(df: DataFrame, dim: String, mapping: DataFrame,
      fromCol: String, toCol: String): DataFrame =
    df.join(broadcast(mapping), df(dim) === mapping(fromCol), "left")
      .withColumn(dim, coalesce(col(toCol), col(dim)))
      .drop(fromCol, toCol)

  /** Full normalization pipeline for one scanned grid, descriptor-driven —
    * the in-memory half of the reference's `transform`
    * (dataset_manager.py:438-468). Hooks for per-dataset overrides mirror
    * `preprocess_zarr`/`postprocess_zarr` (utils/transform.py:614-650). */
  def normalize(
      df: DataFrame,
      desc: DatasetDescriptor,
      pre: DataFrame => DataFrame = identity,
      post: DataFrame => DataFrame = identity): DataFrame = {
    val p0 = pre(df)
    val p1 = renameDataVariable(p0, desc)
    val p2 = desc.missingValue.fold(p1)(missingToNaN(p1, desc.dataVar, _))
    val p3 = enforceValueType(p2, desc.dataVar)
    val p4 =
      if (desc.spatialDims.contains("longitude")) standardizeLongitudes(p3) else p3
    post(transposeToStandard(p4, desc))
  }
}
