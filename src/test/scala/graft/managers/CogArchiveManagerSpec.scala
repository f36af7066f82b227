package graft.managers

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.tiff.TiffFormat

/** Observation-category COG ingest end-to-end: per-date GeoTIFFs →
  * tile scan + filename time axis → bucketed store → append of the
  * next date — plus the three header-level guards (unparseable name,
  * duplicate date, unselected multi-band) refusing BY NAME. */
class CogArchiveManagerSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private val W = 4; private val H = 3

  /** One daily raster: v(x, y) = base + y*W + x, float64 deflate tiles
    * with one NODATA hole at (0, 0) when `hole`. */
  private def writeDay(dir: String, ymd: String, base: Double,
      hole: Boolean = false, bands: Int = 1): Unit = {
    val vals = Array.tabulate(bands)(b =>
      Array.tabulate(W * H)(i =>
        if (hole && i == 0) -9999.0 else base + b * 10000 + i))
    Files.write(Paths.get(s"$dir/chirps_v2_$ymd.tif"),
      TiffFormat.write(W, H, vals, 3, 64, -20, 50, 0.25, 0.25,
        TiffFormat.WriteOpts(compression = 8, noData = Some(-9999))))
  }

  test("per-date COG archive publishes, appends, and reads back on the time axis") {
    val root = Files.createTempDirectory("cog_mgr").toString
    val mgr = new CogArchiveManager(spark, root)
    new java.io.File(mgr.inputDir).mkdirs()
    writeDay(mgr.inputDir, "20240301", 100.0, hole = true)
    writeDay(mgr.inputDir, "20240302", 200.0)
    assert(mgr.checkIfNewData())
    mgr.run()
    val ds = mgr.store.dataset()
    assert(ds.columns.toSeq == Seq("time", "latitude", "longitude", "precip"))
    assert(ds.count() == 2L * W * H)
    // NODATA hole arrived as NaN (descriptor hasNans), not −9999
    assert(ds.filter(col("precip") === -9999.0).count() == 0)
    // geo-referencing + value: day 2, pixel (x=1, y=1) = 200 + 5
    val v = ds.filter(col("time") === lit(ts("2024-03-02T00:00:00")) &&
      col("latitude") === (50 - 1.5 * 0.25) &&
      col("longitude") === (-20 + 1.5 * 0.25))
      .select("precip").as[Double].head()
    assert(v == 205.0)

    // append the next date; O3 gates on the filename, no scan
    assert(!mgr.checkIfNewData())
    writeDay(mgr.inputDir, "20240303", 300.0)
    assert(mgr.checkIfNewData())
    mgr.run()
    assert(mgr.store.dataset().count() == 3L * W * H)
  }

  test("guards refuse by name: bad filename, duplicate date, multi-band without selection") {
    val root = Files.createTempDirectory("cog_guard").toString
    val mgr = new CogArchiveManager(spark, root)
    new java.io.File(mgr.inputDir).mkdirs()
    // unparseable filename
    Files.write(Paths.get(s"${mgr.inputDir}/noDate.tif"),
      TiffFormat.write(W, H, Array(Array.tabulate(W * H)(_.toDouble)),
        3, 64, 0, 3, 1.0, 1.0))
    val eName = intercept[IllegalArgumentException](mgr.transform())
    assert(eName.getMessage.contains("does not match date pattern"), eName.getMessage)
    Files.delete(Paths.get(s"${mgr.inputDir}/noDate.tif"))
    // duplicate date across two files
    writeDay(mgr.inputDir, "20240301", 1.0)
    Files.write(Paths.get(s"${mgr.inputDir}/other_20240301.tif"),
      TiffFormat.write(W, H, Array(Array.tabulate(W * H)(_.toDouble)),
        3, 64, 0, 3, 1.0, 1.0))
    val eDup = intercept[IllegalArgumentException](mgr.transform())
    assert(eDup.getMessage.contains("duplicate COG date"), eDup.getMessage)
    Files.delete(Paths.get(s"${mgr.inputDir}/other_20240301.tif"))
    // multi-band without a selection
    writeDay(mgr.inputDir, "20240302", 2.0, bands = 3)
    val eBand = intercept[IllegalArgumentException](mgr.transform())
    assert(eBand.getMessage.contains("no band selection"), eBand.getMessage)
    // selecting a band past the count refuses too
    val mgr9 = new CogArchiveManager(spark, root, band = Some(9))
    val eOver = intercept[IllegalArgumentException](mgr9.transform())
    assert(eOver.getMessage.contains("only"), eOver.getMessage)
    // an explicit selection ingests that band exactly — but only once
    // every file carries it (the single-band day must go first)
    Files.delete(Paths.get(s"${mgr.inputDir}/chirps_v2_20240301.tif"))
    val mgr2 = new CogArchiveManager(spark, root, band = Some(2))
    val df = mgr2.transform()
    val day2 = df.filter(col("time") === lit(ts("2024-03-02T00:00:00")))
    assert(day2.count() == W * H)
    // normalize enforces the float32 value convention
    assert(day2.agg(min("precip")).head().getFloat(0) == 10002.0f)
  }
}
