package graft.managers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.DatasetManager
import graft.model.{DatasetCategory, DatasetDescriptor, TimeSpan, TimeUnitKind}
import graft.ops.Normalize

/** Forecast / ensemble-category ingest from NATIVE forecast GRIB: the
  * reference's `forecast` and `ensemble` dataset categories
  * (transform.py:724-759 dim sets; attributes.py:223-233) wired end-to-end
  * onto the scan's (ref_time, step, member) columns — two reference times
  * with overlapping VALID times land as distinct hypercubes keyed by
  * (forecast_reference_time, step), never aliased.
  *
  * transform: grib scan (param + member pruned at the message level)
  *   → rename ref_time → forecast_reference_time, member → ensemble
  *   → descriptor-driven normalize (the category supplies the leading
  *     dims; valid time stays derivable as frt + step minutes).
  *
  * The store layout is the standard bucketed GridStore keyed on the
  * category's standardDims — forecast grids are "just more key columns"
  * in the long-form model (HindcastGridSpec pins the same property for
  * the 6-D hindcast shape). */
final class ForecastGribManager(
    val spark: SparkSession,
    root: String,
    /** GRIB parameter the data var maps to (2 m temperature = 167). */
    val paramId: Int = 167,
    /** Ensemble category: keep perturbed members and surface the
      * perturbation number as the `ensemble` dim; false = deterministic
      * forecast (members refused — a perturbed field landing in a
      * deterministic store would silently average nothing, so the
      * filter keeps only member-less fields and QC counts catch a
      * fully-ensemble input as an empty frame). */
    val ensemble: Boolean = false,
    /** Hypercube selection for derived-ensemble products (templates
      * 4.2/4.12, code table 4.7): None (default) ingests only
      * non-derived fields — a GEFS mean+spread file must NOT blend two
      * statistics onto one (frt, step) key; Some(code) selects exactly
      * that statistic (0 = mean, 2 = spread), the reference's
      * `scan_grib(filter)[scan_indices]` move. Derived products carry
      * no perturbation number, so this applies to the deterministic
      * branch only. */
    val derivedStat: Option[Int] = None,
    /** Accumulation-window selection: Some(startMinutes) keeps only the
      * window whose step_start matches (the GFS bucket-file move); None
      * accepts any input in which each step carries at most ONE window —
      * a multi-bucket step is refused by name, because the store key
      * (frt, step) cannot carry two windows ending at one valid time. */
    val stepStart: Option[Long] = None,
    /** Vertical-level selection (type from code table 4.5, value):
      * required when the input carries one parameter at several levels —
      * the category's store key has no level dim, so a multi-level input
      * without a selection refuses by name. */
    val level: Option[(Int, Double)] = None,
    /** Probability-product selection (templates 4.5/4.9): (table-4.9
      * type, lower, upper) with NaN = that limit absent — picks ONE
      * threshold out of a multi-threshold NBM-style file. None ingests
      * only non-probability fields. */
    val probability: Option[(Int, Double, Double)] = None,
    /** Percentile-product selection (templates 4.6/4.10). None ingests
      * only non-percentile fields. */
    val percentile: Option[Int] = None) extends DatasetManager {
  require(derivedStat.isEmpty || !ensemble,
    "derived-ensemble statistics (4.2/4.12) carry no perturbation " +
      "number; derivedStat selection applies to the non-ensemble branch")

  val desc: DatasetDescriptor = DatasetDescriptor(
    datasetName = if (ensemble) "ens_t2m" else "forecast_t2m",
    dataVar = "t2m",
    category =
      if (ensemble) DatasetCategory.Ensemble else DatasetCategory.Forecast,
    spatialDims = Seq("latitude", "longitude"),
    timeResolution = TimeSpan.Daily, // reference-time cycle cadence
    hasNans = false,
    unitOfMeasurement = Some("K"),
    staticMetadata = Map(
      "collection_name" -> (if (ensemble) "ENS" else "HRES"),
      "provider_description" -> "forecast-category ingest (native GRIB)"))

  val storePath: String = s"$root/${desc.datasetName}"
  val inputDir: String = s"$root/input"

  override def bucketSpan: TimeUnitKind = TimeUnitKind.Months

  override def inputFiles(): Seq[String] = {
    val fs = graft.store.GridStore.fileSystem(spark, inputDir)
    if (!fs.exists(new org.apache.hadoop.fs.Path(inputDir))) Seq.empty
    else graft.sources.Manifest
      .listInputFiles(spark, inputDir, graft.sources.Manifest.GribExtensions)
      .select("path").collect().map(_.getString(0)).toSeq
  }

  /** O1 on the forecast path: the scan's forecast keys become the
    * category's leading dims. param/member predicates prune whole
    * messages at planning. */
  override def transform(): DataFrame = {
    val files = inputFiles()
    require(files.nonEmpty, s"No input files in $inputDir")
    val scanned = spark.read.format("grib1").load(inputDir)
      .filter(col("param") === paramId)
    val keyed =
      if (ensemble)
        scanned.filter(col("member").isNotNull)
          .withColumnRenamed("member", "ensemble")
      else derivedStat match {
        // select ONE hypercube: either the non-derived deterministic
        // fields, or exactly one derived statistic — never both, and
        // never two statistics blended onto one (frt, step) key
        case None => scanned.filter(col("member").isNull &&
          col("derived").isNull)
        case Some(code) => scanned.filter(col("member").isNull &&
          col("derived") === code)
      }
    val selection = GribIngest.CubeSelection(paramId,
      ensembleDim = ensemble, derivedStat = derivedStat,
      stepStart = stepStart, level = level,
      probability = probability, percentile = percentile)
    GribIngest.checkWindows(spark, Seq("" -> Seq(inputDir)), selection)
    val shaped = GribIngest.filterCube(keyed, selection)
      .withColumnRenamed("ref_time", "forecast_reference_time")
    Normalize.normalize(shaped, desc, pre = preprocess, post = postprocess)
  }

  /** O3 — the newest-file probe reads the scan's ref_time (the manager's
    * time dim does not exist as a physical GRIB column). */
  override def checkIfNewData(): Boolean = {
    if (!store.hasExisting) return true
    val files = inputFiles()
    if (files.isEmpty) return false
    val newestEnd = spark.read.format("grib1").load(files.last)
      .agg(max(col("ref_time"))).head().get(0)
    val endOpt: Option[java.time.LocalDateTime] = newestEnd match {
      case t: java.time.LocalDateTime => Some(t)
      case t: java.sql.Timestamp => Some(t.toLocalDateTime)
      case _ => None
    }
    (endOpt, getMetadataDateRange()) match {
      case (Some(end), Some((_, storeEnd))) => end.isAfter(storeEnd)
      case _ => true
    }
  }
}
