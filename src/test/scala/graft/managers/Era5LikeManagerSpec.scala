package graft.managers

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.grib.GribFormat

/** The reference's flagship dataset shape end-to-end, offline: hourly
  * GRIB2 landing files in ERA5's NATIVE archive form — reduced Gaussian
  * grid, JPEG 2000 (5.40) packing, 0-360 longitudes — scan directly
  * (no conversion stage), standardize, publish, append. */
class Era5LikeManagerSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  /** One file of hourly messages on a reduced N=1 Gaussian band: rows of
    * 4 and 6 points starting at lon 0 (the 0-360 convention), jpeg-packed,
    * value = base + hour + cellIndex/4. */
  private def writeHourly(path: String, day: Int, hours: Range,
      base: Double): Unit = {
    val lats = GribFormat.gaussianLatitudes(1).toSeq
    val msgs = hours.map { h =>
      val vals = Array.tabulate(10)(i => base + h + i / 4.0)
      (167, java.time.LocalDateTime.of(2024, 3, day, h, 0), lats, Seq(0.0), vals)
    }
    GribFormat.writeFile(spark, path, msgs, decimalScale = 2, edition = 2,
      jpegPacking = true, gaussianN = Some(1), reducedRows = Some(Seq(4, 6)))
  }

  test("native ERA5 landing files: scan → standardize → publish → append") {
    val root = Files.createTempDirectory("era5_like").toString
    val mgr = new Era5LikeManager(spark, root)
    new java.io.File(mgr.inputDir).mkdirs()
    writeHourly(s"${mgr.inputDir}/era5_d01a.grb2", 1, 0 until 6, base = 250.0)
    assert(mgr.checkIfNewData())
    mgr.run()
    val ds = mgr.store.dataset()
    assert(ds.count() == 60) // 6 hours x 10 reduced-grid cells
    // 0-360 input longitudes standardized to -180..180: the 4-point row
    // spans 0,90,180,270 and the 6-point row 0,60,...,300 — together
    // {-180,-120,-90,-60,0,60,90,120} after standardization
    val lons = ds.select("longitude").distinct()
      .as[Double].collect().sorted.toSeq
    assert(lons == Seq(-180.0, -120.0, -90.0, -60.0, 0.0, 60.0, 90.0, 120.0),
      lons.toString)
    // values survive the 5.40 decode bit-exact (float32 store dtype)
    val v = ds.filter(col("time") === lit(ts("2024-03-01T05:00:00")))
      .agg(max(col("t2m"))).head().getFloat(0)
    assert(v == (250.0 + 5 + 9 / 4.0).toFloat, v.toString)
    // incremental append: six more hours land as one more bucketed delta
    writeHourly(s"${mgr.inputDir}/era5_d01b.grb2", 1, 6 until 12, base = 250.0)
    assert(mgr.checkIfNewData())
    mgr.run()
    assert(mgr.store.dataset().count() == 120)
    assert(mgr.getMetadataDateRange().map(_._2.toString)
      == Some("2024-03-01T11:00"))
  }
}
