package graft.sources.grib

import java.time.LocalDateTime

import graft.SparkSpec

/** Grid template 3.10 (Mercator — tropical regional archives): cells walk
  * the projection plane from the first grid point with metre spacing;
  * longitudes come out evenly spaced in degrees, latitudes follow the
  * inverse Gudermannian. Pinned against independently-written Snyder
  * 7-1..7-4 test-side math (sphere, true scale at LaD). */
class GribMercatorSpec extends SparkSpec {

  private val dir = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft_gribmerc"
    val p = new org.apache.hadoop.fs.Path(d)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true); fs.mkdirs(p)
    d
  }

  private val grid = GribFormat.MercWriterGrid(
    la1 = -10.0, lo1 = 100.0, latTs = 10.0, dxM = 100000.0, dyM = 100000.0)

  // Snyder 7-1..7-4 on the sphere, scaled by cos(latTs) — written from
  // the book, NOT calling ops/Projection
  private val scale = 6371229.0 * math.cos(math.toRadians(grid.latTs))
  private def inv(y: Double, x: Double): (Double, Double) = {
    val lat = math.toDegrees(2.0 * math.atan(math.exp(y / scale)) - math.Pi / 2)
    (lat, grid.lo1 + math.toDegrees(x / scale))
  }

  test("3.10 scan inverts every cell to the Snyder lat/lon; lon spacing " +
      "is uniform in degrees") {
    val values = Array.tabulate(10)(_.toDouble)
    val p = new org.apache.hadoop.fs.Path(s"$dir/m.grb2")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(p, true)))
    try GribFormat.writeMessage2Fields(out,
      LocalDateTime.parse("2024-03-01T00:00"),
      Seq(0.0, 1.0), Seq(0.0, 1.0, 2.0, 3.0, 4.0),
      fields = Seq((61, 0, values)), mercator = Some(grid))
    finally out.close()
    val df = spark.read.format("grib1").load(s"$dir/m.grb2")
    assert(df.count() == 10)
    val rows = df.select("latitude", "longitude", "value").collect()
      .sortBy(_.getAs[Double]("value"))
    val y0 = scale *
      math.log(math.tan(math.Pi / 4 + math.toRadians(grid.la1) / 2))
    rows.zipWithIndex.foreach { case (r, k) =>
      val (expLat, expLon) = inv(y0 + (k / 5) * grid.dyM, (k % 5) * grid.dxM)
      assert(math.abs(r.getAs[Double]("latitude") - expLat) < 1e-9,
        s"cell $k latitude")
      assert(math.abs(r.getAs[Double]("longitude") - expLon) < 1e-9,
        s"cell $k longitude")
    }
    // first point back to La1/Lo1; +y crosses toward the equator (lat up)
    assert(math.abs(rows(0).getAs[Double]("latitude") + 10.0) < 1e-9)
    assert(math.abs(rows(0).getAs[Double]("longitude") - 100.0) < 1e-9)
    assert(rows(5).getAs[Double]("latitude") > -10.0)
    // Mercator x is linear in longitude: uniform degree spacing per row
    val lons = rows.take(5).map(_.getAs[Double]("longitude"))
    val d0 = lons(1) - lons(0)
    (1 until 4).foreach(i =>
      assert(math.abs((lons(i + 1) - lons(i)) - d0) < 1e-9))
  }
}
