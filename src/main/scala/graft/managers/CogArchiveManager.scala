package graft.managers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.DatasetManager
import graft.model.{DatasetDescriptor, TimeSpan, TimeUnitKind}
import graft.ops.Normalize

/** Observation-category ingest from a per-date GeoTIFF/COG archive —
  * the raster publication shape CHIRPS-style providers ship next to
  * NetCDF (one file per day, the date in the filename). The reference
  * converts such inputs to a scannable form before parsing
  * (transform.py:75-79's format list); here the DSv2 COG scan reads
  * the tiles directly and the manager supplies the one thing the
  * format lacks: the TIME axis, parsed from filenames (C8) and
  * validated DRIVER-SIDE before any tile is read.
  *
  * transform: geotiff scan (tile-pruned) → per-file date from the
  * filename → band selection → descriptor-driven normalize. Two
  * header-level guards refuse by name at PLANNING, on memoized
  * headers (the GribIngest.checkWindows pattern):
  *  - a filename that does not parse a date (a silently-null time
  *    would corrupt the store key);
  *  - duplicate dates across files (two rasters landing on one time
  *    key would silently collide);
  *  - a multi-band raster with no explicit `band` selection (dropping
  *    bands 2+ silently is the exact failure mode the GRIB hypercube
  *    guard exists to prevent). */
final class CogArchiveManager(
    val spark: SparkSession,
    root: String,
    /** Regex over the FILE NAME with ONE capture group yielding the
      * date portion (C8). Default matches `..._YYYYMMDD.tif`. */
    val datePattern: String = "(\\d{8})\\.tiff?$",
    /** java.time format for the captured group. */
    val dateFormat: String = "yyyyMMdd",
    /** Band to ingest. None is only legal when every raster is
      * single-band; a multi-band archive must select explicitly. */
    val band: Option[Int] = None) extends DatasetManager {

  val desc: DatasetDescriptor = DatasetDescriptor(
    datasetName = "cog_precip",
    dataVar = "precip",
    spatialDims = Seq("latitude", "longitude"),
    timeResolution = TimeSpan.Daily,
    hasNans = true, // NODATA surfaces as null from the scan
    unitOfMeasurement = Some("mm"),
    staticMetadata = Map(
      "collection_name" -> "COG",
      "provider_description" -> "observation-category ingest (native COG)"))

  val storePath: String = s"$root/${desc.datasetName}"
  val inputDir: String = s"$root/input"

  override def bucketSpan: TimeUnitKind = TimeUnitKind.Months

  override def inputFiles(): Seq[String] = {
    val fs = graft.store.GridStore.fileSystem(spark, inputDir)
    if (!fs.exists(new org.apache.hadoop.fs.Path(inputDir))) Seq.empty
    else graft.sources.Manifest
      .listInputFiles(spark, inputDir, graft.sources.Manifest.TiffExtensions)
      .select("path").collect().map(_.getString(0)).toSeq
  }

  /** Driver-side filename → LocalDateTime, the validated form of the
    * scan-side expression; refuses BY NAME on a non-matching name. */
  private def dateOf(path: String): java.time.LocalDateTime = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    val m = java.util.regex.Pattern.compile(datePattern).matcher(name)
    require(m.find() && m.groupCount() >= 1,
      s"COG filename '$name' does not match date pattern '$datePattern' — " +
        "fix the archive naming or pass a matching datePattern")
    java.time.LocalDate.parse(m.group(1),
      java.time.format.DateTimeFormatter.ofPattern(dateFormat)).atStartOfDay()
  }

  /** O1 on the COG path: tile scan + filename time axis + band
    * selection → normalize. */
  override def transform(): DataFrame = {
    val files = inputFiles()
    require(files.nonEmpty, s"No input files in $inputDir")
    // guard 1+2: every filename parses, and no two files share a date
    val dates = files.map(f => f -> dateOf(f))
    dates.groupBy(_._2).find(_._2.length > 1).foreach { case (d, fs) =>
      throw new IllegalArgumentException(
        s"duplicate COG date $d across ${fs.map(_._1).mkString(", ")} — " +
          "two rasters would silently collide on one time key")
    }
    // guard 3: band structure, from memoized headers (no payload reads)
    val bands = graft.sources.tiff.TiffTable.bandCounts(
      spark.sparkContext.hadoopConfiguration, Seq(inputDir))
    band match {
      case None =>
        bands.find(_._2 > 1).foreach { case (p, n) =>
          throw new IllegalArgumentException(
            s"$p carries $n bands and no band selection was given — " +
              "pass band=Some(k) so bands are never dropped silently")
        }
      case Some(k) =>
        bands.find(_._2 < k).foreach { case (p, n) =>
          throw new IllegalArgumentException(
            s"band $k selected but $p carries only $n band(s)")
        }
    }
    val scanned = spark.read.format("geotiff").load(inputDir)
      .filter(col("band") === lit(band.getOrElse(1)))
    val withTime = scanned
      .withColumn("time",
        to_timestamp(regexp_extract(
            element_at(split(col("path"), "/"), -1), datePattern, 1),
          dateFormat).cast("timestamp_ntz"))
      .drop("path", "band")
    Normalize.normalize(withTime, desc, pre = preprocess, post = postprocess)
  }

  /** O3 — the newest input's date comes from FILENAMES only, zero scans
    * on the no-new-data path. Max over every file's parsed date, NOT
    * `dateOf(files.last)`: under mixed filename prefixes the
    * natural-sort-last file need not carry the maximum date, and a
    * newly landed file would be missed on the fast path. */
  override def checkIfNewData(): Boolean = {
    if (!store.hasExisting) return true
    val files = inputFiles()
    if (files.isEmpty) return false
    val newest = files.map(dateOf).max
    getMetadataDateRange() match {
      case Some((_, storeEnd)) => newest.isAfter(storeEnd)
      case None => true
    }
  }
}
