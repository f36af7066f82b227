package graft.managers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.DatasetManager
import graft.model.{DatasetDescriptor, Registry, TimeSpan, TimeUnitKind}
import graft.sources.{Extract, Manifest}

/** Example concrete manager, the Scala analog of the reference's CHIRPS
  * wiring (examples/managers/chirps.py:16-406): everything dataset-specific
  * is declarative descriptor state plus two small overrides — which input
  * files feed the scan, and a per-dataset postprocess hook.
  *
  * The extract step mirrors chirps.py:158-204 (FTP listing → pool download
  * gated on the store's recorded end date) but takes the URL list from the
  * caller: acquisition endpoints are deployment config, not engine code.
  */
final class ChirpsLikeManager(
    val spark: SparkSession,
    root: String,
    /** URL → local-path fetcher (defaults to the FTP driver); injectable
      * for offline runs and tests. */
    fetcher: (String, java.nio.file.Path) => Unit =
      (url, dest) => new Extract.FtpExtractor().download(url, dest))
  extends DatasetManager {

  /** chirps.py:89-126 declarative attributes, as a descriptor. */
  val desc: DatasetDescriptor = DatasetDescriptor(
    datasetName = "chirps_final_25",
    dataVar = "precip",
    spatialDims = Seq("latitude", "longitude"),
    timeResolution = TimeSpan.Daily,
    missingValue = Some(-9999.0),
    hasNans = true,
    unitOfMeasurement = Some("mm"),
    datasetStartDate = Some(java.time.Instant.parse("1981-01-01T00:00:00Z")),
    staticMetadata = Map(
      "collection_name" -> "CHIRPS",
      "license" -> "Creative Commons Attribution 3.0",
      "provider_description" ->
        "Climate Hazards Group InfraRed Precipitation with Station data",
      "spatial_resolution" -> "0.25"))

  val storePath: String = s"$root/${desc.datasetName}"
  val inputDir: String = s"$root/input"

  /** Daily data in monthly buckets (chirps chunk sizing analog,
    * chirps.py:339-342). */
  override def bucketSpan: TimeUnitKind = TimeUnitKind.Months

  /** Download any URLs newer than the store's end date into `inputDir`
    * (chirps.py:158-204's year-range logic, driven by O4 metadata). */
  def extractUrls(urls: Seq[String]): Seq[java.nio.file.Path] = {
    extract(None) // O2 guard (no explicit range here)
    // any-success: one bad URL must not abort the batch — the successes
    // below are what feed the manifest scan
    val results = Extract.batchDownload(urls, inputDir, fetcher,
      acceptAnySuccess = true)
    results.collect { case scala.util.Success(p) => p }
  }

  override def inputFiles(): Seq[String] = {
    val fs = graft.store.GridStore.fileSystem(spark, inputDir)
    val p = new org.apache.hadoop.fs.Path(inputDir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).sorted
  }

  /** chirps.py:234-279's attribute scrub analog: drop rows with
    * out-of-range coordinates the provider occasionally ships. */
  override def postprocess(df: DataFrame): DataFrame =
    df.filter(col("latitude").between(-50.0, 50.0) &&
      col("longitude").between(-180.0, 180.0))
}

object ChirpsLikeManager {
  /** O5 — register the descriptor for name-based resolution
    * (dataset_manager.py:494-534). */
  def registerIn(registry: Registry[DatasetDescriptor], spark: SparkSession,
      root: String): ChirpsLikeManager = {
    val m = new ChirpsLikeManager(spark, root)
    registry.register(m.desc.datasetName, m.desc.timeResolution, m.desc)
    m
  }
}
