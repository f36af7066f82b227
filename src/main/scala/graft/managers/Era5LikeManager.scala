package graft.managers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.DatasetManager
import graft.model.{DatasetDescriptor, Registry, TimeSpan, TimeUnitKind}

/** Example concrete manager for the reference's flagship dataset shape:
  * ERA5 (docs/etl_developers_manual.md:158-168 — hourly global reanalysis,
  * >639k timesteps, large time chunks; dataset_manager.py /
  * utils/attributes.py carry the ERA5 metadata conventions).
  *
  * The landing files are ERA5's NATIVE archive form, which this engine
  * scans directly: GRIB2 messages on (reduced or regular) Gaussian grids
  * with JPEG 2000 (5.40) packing — no eccodes/cdo conversion stage. Two
  * ERA5-specific behaviors from the manual are expressed as the standard
  * hooks:
  *
  *  - longitudes arrive 0–360 and standardize to −180..180
  *    (etl_developers_manual.md:298's kerchunk-preprocess case is
  *    [[graft.ops.Normalize.standardizeLongitudes]], already wired into
  *    every manager's normalize);
  *  - hourly cadence with LARGE time buckets (the manual's 5,000-step
  *    time-chunk guidance): bucketSpan = Years keeps the bucket count
  *    manageable over 75+ years of hours while updates still overwrite
  *    only touched buckets.
  */
final class Era5LikeManager(
    val spark: SparkSession,
    root: String) extends DatasetManager {

  val desc: DatasetDescriptor = DatasetDescriptor(
    datasetName = "era5_2m_temperature",
    dataVar = "t2m",
    spatialDims = Seq("latitude", "longitude"),
    timeResolution = TimeSpan.Hourly,
    hasNans = false,
    unitOfMeasurement = Some("K"),
    datasetStartDate = Some(java.time.Instant.parse("1950-01-01T00:00:00Z")),
    staticMetadata = Map(
      "collection_name" -> "ERA5",
      "provider_description" ->
        "ECMWF fifth-generation global atmospheric reanalysis",
      "spatial_resolution" -> "0.25",
      "license" -> "Copernicus License"))

  val storePath: String = s"$root/${desc.datasetName}"
  val inputDir: String = s"$root/input"

  /** Hourly data, yearly buckets — the large-time-chunk guidance
    * (etl_developers_manual.md:160-162) at bucket granularity: 8,760
    * steps per bucket, ~75 buckets for the full archive. */
  override def bucketSpan: TimeUnitKind = TimeUnitKind.Years

  /** ERA5 files commonly bundle several parameters per GRIB message
    * group; this dataset is 2 m temperature (ECMWF paramId 167). Without
    * the filter a multi-parameter file would publish every variable's
    * cells under `t2m`. */
  override def preprocess(df: DataFrame): DataFrame =
    df.filter(col("param") === 167)

  /** The manifest lister supplies the NATURAL sort `checkIfNewData`'s
    * newest-file probe relies on (unpadded numerics would otherwise sort
    * "part10" before "part2") plus dotfile/.idx-sidecar skipping, over
    * every GRIB extension the scan accepts. */
  override def inputFiles(): Seq[String] = {
    val fs = graft.store.GridStore.fileSystem(spark, inputDir)
    if (!fs.exists(new org.apache.hadoop.fs.Path(inputDir))) Seq.empty
    else graft.sources.Manifest
      .listInputFiles(spark, inputDir, graft.sources.Manifest.GribExtensions)
      .select("path").collect().map(_.getString(0)).toSeq
  }
}

object Era5LikeManager {
  /** O5 — register the descriptor for name-based resolution
    * (dataset_manager.py:494-534). */
  def registerIn(registry: Registry[DatasetDescriptor], spark: SparkSession,
      root: String): Era5LikeManager = {
    val m = new Era5LikeManager(spark, root)
    registry.register(m.desc.datasetName, m.desc.timeResolution, m.desc)
    m
  }
}
