package graft.managers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.DatasetManager
import graft.model.{DatasetDescriptor, TimeSpan, TimeUnitKind}
import graft.ops.{Normalize, Spectral}
import graft.sources.grib.GribFormat

/** ERA5 model-level fields from the NATIVE MARS archive form: SPECTRAL
  * GRIB2 (spherical-harmonic coefficients, templates 3.50 + 5.50/5.51 —
  * docs/etl_developers_manual.md:158-168 names these the hardest ERA5
  * inputs). Where [[Era5LikeManager]] scans gridded messages directly,
  * this manager's transform is the full spectral workflow IN-ENGINE:
  *
  *   grib-spectral scan (coefficient rows, message-level time pruning)
  *     → [[Spectral.synthesize]] onto the target Gaussian grid
  *       (inverse spherical-harmonic transform)
  *     → the standard normalize → publish lifecycle.
  *
  * No eccodes/cdo regrid stage — the synthesis is a Spark job whose grid
  * rows are emitted from mapPartitions and never shuffle, partitioned by
  * timestep. */
final class Era5SpectralManager(
    val spark: SparkSession,
    root: String,
    /** Target Gaussian resolution: N parallels pole→equator. */
    val gaussianN: Int = 1,
    /** GRIB parameter id this manager's data var maps to (ERA5
      * temperature = 130). The transform filters the spectral scan to
      * exactly this param with no ensemble member — a MARS request
      * routinely returns several params/members per file, and feeding
      * more than one field per timestep into the synthesis would blend
      * coefficients; [[graft.ops.Spectral.synthesize]] additionally
      * refuses duplicate coefficients by name as the backstop. */
    val paramId: Int = 130,
    /** Vertical hypercube selection: when set, the transform filters the
      * scan to this first-fixed-surface value (pushed down as a
      * message-level prune) — the engine's form of the reference's
      * `grib_filter` + `scan_indices` level selection (transform.py:
      * 214-219, 234-240). When None, a multi-level file is refused by
      * name by [[graft.ops.Spectral.synthesize]]'s duplicate-coefficient
      * backstop rather than blended. */
    val level: Option[Double] = None) extends DatasetManager {

  val desc: DatasetDescriptor = DatasetDescriptor(
    datasetName = "era5_spectral_t",
    dataVar = "t",
    spatialDims = Seq("latitude", "longitude"),
    timeResolution = TimeSpan.Hourly,
    hasNans = false,
    unitOfMeasurement = Some("K"),
    staticMetadata = Map(
      "collection_name" -> "ERA5",
      "provider_description" ->
        "ECMWF fifth-generation global atmospheric reanalysis (model levels)",
      "source_representation" -> "spherical harmonics (GRIB2 3.50)",
      "license" -> "Copernicus License"))

  val storePath: String = s"$root/${desc.datasetName}"
  val inputDir: String = s"$root/input"

  override def bucketSpan: TimeUnitKind = TimeUnitKind.Years

  /** Target grid: the full regular Gaussian grid of resolution N —
    * 2N parallels × 4N points per circle starting at 0°E (the archive's
    * 0-360 convention; normalize standardizes afterwards). */
  def gridLats: Seq[Double] = GribFormat.gaussianLatitudes(gaussianN).toSeq
  def gridLons: Seq[Double] =
    (0 until 4 * gaussianN).map(i => i * 360.0 / (4 * gaussianN))

  override def inputFiles(): Seq[String] = {
    val fs = graft.store.GridStore.fileSystem(spark, inputDir)
    if (!fs.exists(new org.apache.hadoop.fs.Path(inputDir))) Seq.empty
    else graft.sources.Manifest
      .listInputFiles(spark, inputDir, graft.sources.Manifest.GribExtensions)
      .select("path").collect().map(_.getString(0)).toSeq
  }

  /** O1 on the spectral path: coefficients → synthesis → normalize. */
  override def transform(): DataFrame = {
    val files = inputFiles()
    require(files.nonEmpty, s"No input files in $inputDir")
    // Message-level pruning: param/member equality predicates prune whole
    // messages exactly in the spectral scan, so off-param fields are never
    // even unpacked.
    val base = spark.read.format("grib-spectral").load(inputDir)
      .filter(col("param") === paramId && col("member").isNull)
    val coeffs = level.fold(base)(l => base.filter(col("level") === l))
    val grid = Spectral.synthesize(coeffs, Seq("time"), gridLats, gridLons)
      .withColumnRenamed("value", desc.dataVar)
    Normalize.normalize(grid, desc, pre = preprocess, post = postprocess)
  }

  /** O3 — the newest-file probe must open through the SPECTRAL scan (the
    * gridded scan refuses 3.50 messages by design). */
  override def checkIfNewData(): Boolean = {
    if (!store.hasExisting) return true
    val files = inputFiles()
    if (files.isEmpty) return false
    val newestEnd = spark.read.format("grib-spectral").load(files.last)
      .agg(max(col("time"))).head().get(0)
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
