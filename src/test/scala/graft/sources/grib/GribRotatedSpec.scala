package graft.sources.grib

import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Projection

/** GRIB2 grid template 3.1 (rotated lat/lon — COSMO/ICON/HARMONIE
  * regional grids): the stored coordinates are rotated; the scan must
  * emit TRUE lat/lon via the CF `rotated_latitude_longitude` inverse. */
class GribRotatedSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  test("rotated-pole mapping: convention fixed points and scalar↔Column roundtrips") {
    // COSMO-EU pole
    val m = Projection.RotatedPole(poleLat = 40.0, poleLon = -170.0)
    // true north pole → (rlat = poleLat, rlon = 0) — the COSMO convention
    val (prl, pln) = m.forwardXY(90.0, 0.0)
    assert(math.abs(prl - 40.0) < 1e-6 && math.abs(pln) < 1e-6, s"NP -> ($prl, $pln)")
    // the rotated pole itself → rlat = 90
    assert(math.abs(m.forwardXY(40.0, -170.0)._1 - 90.0) < 1e-6)
    // COSMO-EU: Europe's (50°N, 10°E) sits at the rotated origin
    val (erl, eln) = m.forwardXY(50.0, 10.0)
    assert(math.abs(erl) < 1e-6 && math.abs(eln) < 1e-6, s"EU -> ($erl, $eln)")
    // scalar roundtrip across the grid, including an angle
    val ma = Projection.RotatedPole(poleLat = 40.0, poleLon = -170.0, angle = 7.5)
    for (lat <- BigDecimal(-80) to BigDecimal(80) by 17;
         lon0 <- BigDecimal(-170) to BigDecimal(170) by 23) {
      val (latD, lon) = (lat.toDouble, lon0.toDouble)
      val (rlat, rlon) = ma.forwardXY(latD, lon)
      val (lat2, lon2) = ma.inverseXY(rlat, rlon)
      assert(math.abs(lat2 - latD) < 1e-9 && math.abs(lon2 - lon) < 1e-9,
        s"($latD, $lon) -> ($rlat, $rlon) -> ($lat2, $lon2)")
    }
    // Column forward matches scalar forward; Column inverse roundtrips
    val pts = Seq((10.0, 20.0), (-35.0, 140.0), (62.0, -40.0)).toDF("lat", "lon")
    val proj = Projection.assignCrs(pts, "lat", "lon", ma)
    val (latB, lonB) = Projection.unproject(col("northing"), col("easting"), ma)
    val rows = proj.withColumn("latB", latB).withColumn("lonB", lonB).collect()
    rows.foreach { r =>
      val (srlat, srlon) = ma.forwardXY(r.getDouble(0), r.getDouble(1))
      assert(math.abs(r.getDouble(2) - srlat) < 1e-9)
      assert(math.abs(r.getDouble(3) - srlon) < 1e-9)
      assert(math.abs(r.getDouble(4) - r.getDouble(0)) < 1e-9)
      assert(math.abs(r.getDouble(5) - r.getDouble(1)) < 1e-9)
    }
    assert(Projection.cfAttrs(m)("grid_mapping_name") == "rotated_latitude_longitude")
  }

  test("template 3.1 file: scan emits true coordinates, values bit-exact") {
    val dir = Files.createTempDirectory("gribrot").toString
    val pole = (40.0, -170.0, 0.0)
    val rlats = Seq(-1.0, 0.0, 1.0) // rotated grid around the rotated equator
    val rlons = Seq(-2.0, -1.0, 0.0, 1.0)
    val vals = Array.tabulate(12)(i => i * 2.5)
    GribFormat.writeFile(spark, s"$dir/rot.grb2", Seq(
      (33, LocalDateTime.of(2024, 7, 1, 6, 0), rlats, rlons, vals)),
      decimalScale = 1, edition = 2, rotatedPole = Some(pole))
    val df = spark.read.format("grib1").load(s"$dir/rot.grb2")
    assert(df.count() == 12)
    val m = Projection.RotatedPole(pole._1, pole._2, pole._3)
    // every cell must sit at the INVERSE-rotated true coordinate
    val got = df.select("latitude", "longitude", "value").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2))).toSet
    val expect = (for {
      (rlat, j) <- rlats.zipWithIndex
      (rlon, i) <- rlons.zipWithIndex
    } yield {
      val (lat, lon) = m.inverseXY(rlat, rlon)
      (lat, if (lon < 0) lon + 360 else lon, vals(j * 4 + i))
    }).toSet
    def close(a: (Double, Double, Double), b: (Double, Double, Double)) =
      math.abs(a._1 - b._1) < 1e-5 && math.abs(a._2 - b._2) < 1e-5 && a._3 == b._3
    expect.foreach { e =>
      assert(got.exists(g => close(g, e)), s"missing cell $e in $got")
    }
    // rotated grids sit far from their true coordinates: assert the scan
    // did NOT just echo the stored grid (the rotated equator here is ~50°N)
    assert(df.agg(min("latitude")).as[Double].head() > 40.0)
  }

  test("template 3.1 composes with CCSDS packing and bitmaps") {
    val dir = Files.createTempDirectory("gribrotcc").toString
    val vals = Array(1.5, Double.NaN, 3.0, -2.25, 0.0, Double.NaN)
    GribFormat.writeFile(spark, s"$dir/rc.grb2", Seq(
      (33, LocalDateTime.of(2024, 7, 2, 0, 0), Seq(0.0, 0.5), Seq(10.0, 10.5, 11.0),
        vals)),
      decimalScale = 2, edition = 2, ccsdsPacking = true,
      rotatedPole = Some((35.0, 15.0, 0.0)))
    val df = spark.read.format("grib1").load(s"$dir/rc.grb2")
    assert(df.count() == 6)
    assert(df.filter(col("value").isNull).count() == 2)
    val present = df.filter(col("value").isNotNull)
      .select("value").as[Double].collect().sorted.toSeq
    assert(present == Seq(-2.25, 0.0, 1.5, 3.0))
  }
}
