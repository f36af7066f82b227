package graft.managers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.DatasetManager
import graft.model.{DatasetCategory, DatasetDescriptor, TimeSpan, TimeUnitKind}
import graft.ops.Normalize

/** Hindcast-category ingest from native reforecast GRIB — the reference's
  * 6-D `hindcast` category (transform.py:740-756 dim set;
  * conftest.py:108-134 fixture): dims (hindcast_reference_time,
  * forecast_reference_offset, step, ensemble, latitude, longitude).
  *
  * Reforecast archives key runs by TWO reference times: the hindcast
  * reference date rides the FILE NAME (the reference extracts it with
  * regex patterns, flat_to_nd.py:7-72, and computes the offset with a
  * `calc_fro` callable), while each run's own initialization time rides
  * the GRIB PDS. So the transform is:
  *
  *   manifest (S8) → parseFilenames (C8: hindcast_reference_time)
  *     → per-file grib scan (param + member pruned at the message level)
  *     → forecast_reference_offset = hindcast_reference_time − ref_time
  *       (whole DAYS — reforecast runs initialize on day boundaries)
  *     → member → ensemble → descriptor-driven normalize → 6-D store.
  *
  * Scale note: the union is one scan per FILE (the per-file lit() carries
  * the filename coordinate, exactly the reference's per-file datasets
  * concatenated). For archives with many thousands of files, lay the
  * landing dir out as one SUBDIRECTORY per hindcast date and point each
  * scan at a directory — the grib source fans any number of files inside
  * one scan, keeping the union width = number of hindcast dates. */
final class HindcastGribManager(
    val spark: SparkSession,
    root: String,
    /** GRIB parameter the data var maps to (2 m temperature = 167). */
    val paramId: Int = 167,
    /** Regex with ONE capture group extracting the hindcast reference
      * date (ISO yyyy-MM-dd) from the file name. */
    val hrtPattern: String = "hindcast-([0-9]{4}-[0-9]{2}-[0-9]{2})",
    /** Accumulation-window selection — see
      * [[ForecastGribManager.stepStart]]. */
    val stepStart: Option[Long] = None,
    /** Vertical-level selection — see [[ForecastGribManager.level]]. */
    val level: Option[(Int, Double)] = None) extends DatasetManager {

  val desc: DatasetDescriptor = DatasetDescriptor(
    datasetName = "hindcast_t2m",
    dataVar = "t2m",
    category = DatasetCategory.Hindcast,
    spatialDims = Seq("latitude", "longitude"),
    timeResolution = TimeSpan.Daily, // hindcast-date cadence
    hasNans = false,
    unitOfMeasurement = Some("K"),
    staticMetadata = Map(
      "collection_name" -> "REFORECAST",
      "provider_description" -> "hindcast-category ingest (native GRIB)"))

  val storePath: String = s"$root/${desc.datasetName}"
  val inputDir: String = s"$root/input"

  override def bucketSpan: TimeUnitKind = TimeUnitKind.Months

  /** (path, hindcast reference date) per input file, from the manifest +
    * C8 filename parse; a file whose name carries no hindcast date is a
    * layout error and refused by name. */
  private def hrtFiles(): Seq[(String, String)] = {
    val fs = graft.store.GridStore.fileSystem(spark, inputDir)
    if (!fs.exists(new org.apache.hadoop.fs.Path(inputDir))) return Seq.empty
    val manifest = graft.sources.Manifest
      .listInputFiles(spark, inputDir, graft.sources.Manifest.GribExtensions)
    val parsed = graft.sources.Manifest
      .parseFilenames(manifest, Map("hrt" -> hrtPattern))
      .select("path", "file_name", "hrt").collect()
    parsed.foreach { r =>
      require(r.getString(2).nonEmpty,
        s"${r.getString(1)}: file name carries no hindcast reference " +
          s"date (pattern $hrtPattern) — the hindcast axis rides the " +
          "file name in reforecast archives")
    }
    parsed.map(r => (r.getString(0), r.getString(2))).toSeq
  }

  override def inputFiles(): Seq[String] = hrtFiles().map(_._1)

  /** O1 on the hindcast path: the 6-D key assembles from the file name
    * (hindcast_reference_time), the PDS (ref_time → offset, step) and
    * the ensemble octets (member → ensemble). */
  override def transform(): DataFrame = {
    val files = hrtFiles()
    require(files.nonEmpty, s"No input files in $inputDir")
    val perFile = files.map { case (path, hrt) =>
      spark.read.format("grib1").load(path)
        .filter(col("param") === paramId && col("member").isNotNull &&
          col("derived").isNull)
        .withColumn("hindcast_reference_time",
          // NTZ like every other time axis in the engine (the verify
          // gate's DuckDB compare and the stores are zone-free)
          to_timestamp_ntz(lit(hrt), lit("yyyy-MM-dd")))
    }
    val scanned = perFile.reduce(_ unionByName _)
    // hypercube guard per HINDCAST DATE: the 6-D key separates same-ref
    // runs of different hindcast dates, so the clash cell is
    // (hrt, DAY(ref_time), step, ensemble) — day-granular on ref because
    // the store's forecast_reference_offset is a whole-day datediff: two
    // runs of one hindcast date initialized 00Z/12Z land on ONE store key
    val selection = GribIngest.CubeSelection(paramId, ensembleDim = true,
      derivedStat = None, stepStart = stepStart, level = level,
      refDayGranular = true)
    GribIngest.checkWindows(spark,
      files.groupBy(_._2).toSeq.map { case (hrt, fs) => hrt -> fs.map(_._1) },
      selection)
    val keyed = GribIngest.filterCube(scanned, selection)
      .withColumn("forecast_reference_offset",
        datediff(col("hindcast_reference_time"), col("ref_time"))
          .cast("long"))
      .withColumnRenamed("member", "ensemble")
    require(keyed.schema("forecast_reference_offset").dataType ==
      org.apache.spark.sql.types.LongType, "offset must be a long")
    Normalize.normalize(keyed, desc, pre = preprocess, post = postprocess)
  }

  /** O3 — newest hindcast date in the landing dir vs the store's range
    * (the hindcast axis lives in file NAMES, so the probe never opens a
    * data file). */
  override def checkIfNewData(): Boolean = {
    if (!store.hasExisting) return true
    val files = hrtFiles()
    if (files.isEmpty) return false
    val newest = java.time.LocalDate.parse(files.map(_._2).max).atStartOfDay()
    getMetadataDateRange() match {
      case Some((_, storeEnd)) => newest.isAfter(storeEnd)
      case None => true
    }
  }
}
