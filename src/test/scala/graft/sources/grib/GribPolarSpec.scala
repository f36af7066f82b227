package graft.sources.grib

import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Grid template 3.20 (polar stereographic — the NCEP Alaska / sea-ice
  * regional shape): cells are defined by the first grid point + metre
  * spacing on the projection plane; the scan inverse-projects each cell
  * to true lat/lon, like the Lambert grid (GribBitmapSpec's real-file
  * suite). Reference scope: transform.py's scan accepts whatever grid
  * the archive carries; this pins the 3.20 octet layout and the Snyder
  * inverse against independently-written test-side math. */
class GribPolarSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft_gribpolar_$tag"
    val p = new org.apache.hadoop.fs.Path(d)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true); fs.mkdirs(p)
    d
  }

  private def write(path: String)(body: java.io.DataOutputStream => Unit): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(p, true)))
    try body(out) finally out.close()
  }

  // grid dims ride the axis lengths; the values themselves are unused
  private val rowAxis = Seq(0.0, 1.0) // nj = 2
  private val colAxis = Seq(0.0, 1.0, 2.0, 3.0, 4.0) // ni = 5
  private val ref = LocalDateTime.parse("2024-03-01T00:00")
  private val grid = GribFormat.PsWriterGrid(
    la1 = 70.0, lo1 = 200.0, latTs = 60.0, lov = 210.0,
    dxM = 50000.0, dyM = 50000.0)

  /** Test-side Snyder 21-5..21-10 (sphere, north aspect) — written from
    * the book, NOT calling ops/Projection: forward to the plane. */
  private def fwd(lat: Double, lon: Double): (Double, Double) = {
    val R = 6371229.0
    val k0 = (1.0 + math.sin(math.toRadians(grid.latTs))) / 2.0
    val rho = 2.0 * R * k0 * math.tan(math.Pi / 4 - math.toRadians(lat) / 2)
    val dl = math.toRadians(lon - grid.lov)
    (-rho * math.cos(dl), rho * math.sin(dl)) // (y, x)
  }
  private def inv(y: Double, x: Double): (Double, Double) = {
    val R = 6371229.0
    val k0 = (1.0 + math.sin(math.toRadians(grid.latTs))) / 2.0
    val rho = math.sqrt(x * x + y * y)
    val lat = math.toDegrees(
      math.Pi / 2 - 2.0 * math.atan(rho / (2.0 * R * k0)))
    val lon0 = grid.lov + math.toDegrees(math.atan2(x, -y))
    (lat, if (lon0 < 0) lon0 + 360 else lon0)
  }

  test("3.20 scan inverts every cell to the Snyder lat/lon; first point " +
      "is exactly La1/Lo1") {
    val dir = freshDir("ak")
    val values = Array.tabulate(10)(_.toDouble)
    write(s"$dir/ps.grb2") { out =>
      GribFormat.writeMessage2Fields(out, ref, rowAxis, colAxis,
        fields = Seq((61, 0, values)), polarStereo = Some(grid))
    }
    val df = spark.read.format("grib1").load(s"$dir/ps.grb2")
    assert(df.count() == 10)
    val rows = df.select("latitude", "longitude", "value").collect()
      .sortBy(_.getAs[Double]("value"))
    // cell k sits at (x0 + (k%5)·dx, y0 + (k/5)·dy) on the plane
    val (y0, x0) = fwd(grid.la1, grid.lo1)
    rows.zipWithIndex.foreach { case (r, k) =>
      val (expLat, expLon) = inv(y0 + (k / 5) * grid.dyM,
        x0 + (k % 5) * grid.dxM)
      assert(math.abs(r.getAs[Double]("latitude") - expLat) < 1e-9,
        s"cell $k latitude")
      assert(math.abs(r.getAs[Double]("longitude") - expLon) < 1e-9,
        s"cell $k longitude")
    }
    // the first grid point must invert back to La1/Lo1
    assert(math.abs(rows(0).getAs[Double]("latitude") - 70.0) < 1e-9)
    assert(math.abs(rows(0).getAs[Double]("longitude") - 200.0) < 1e-9)
    // northern-aspect grid walking +y from 70N toward the projection
    // origin moves AWAY from the pole along the LoV meridian? No: +y
    // (north aspect) moves toward the pole — latitudes must increase
    // along j at the Lo1 column's bearing; pin the monotone fact
    val latCol0 = inv(y0 + grid.dyM, x0)._1
    assert(latCol0 > 70.0)
  }

  test("a truncated projected-grid section refuses by name, never by " +
      "index error") {
    val dir = freshDir("trunc")
    val raw = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(raw)
    GribFormat.writeMessage2Fields(dos, ref, rowAxis, colAxis,
      fields = Seq((61, 0, Array.tabulate(10)(_.toDouble))),
      polarStereo = Some(grid))
    dos.close()
    val bytes = raw.toByteArray
    // section 3 (offset 37): shrink its declared length below the 3.20
    // minimum while keeping the byte stream section-aligned by moving
    // the truncated tail into a fake local-use section is overkill —
    // simply shrinking the declared length makes the parser slice a
    // short body, which must refuse by name
    val sec3 = 37
    val declared = ((bytes(sec3) & 0xFF) << 24) | ((bytes(sec3 + 1) & 0xFF) << 16) |
      ((bytes(sec3 + 2) & 0xFF) << 8) | (bytes(sec3 + 3) & 0xFF)
    assert(declared == 65)
    bytes(sec3 + 3) = 40 // declared 65 -> 40: body short of the template
    write(s"$dir/t.grb2")(_.write(bytes))
    val e = intercept[Exception] {
      spark.read.format("grib1").load(s"$dir/t.grb2").count()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("3.20 section too short")),
      s"got: ${chain(e).map(_.getMessage).mkString(" | ")}")
  }

  test("projection centre flag 0x80 flips to the south aspect") {
    val dir = freshDir("south")
    val values = Array.tabulate(10)(_.toDouble)
    val raw = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(raw)
    GribFormat.writeMessage2Fields(dos, ref,
      rowAxis, colAxis, fields = Seq((61, 0, values)),
      polarStereo = Some(grid.copy(la1 = -70.0, latTs = -60.0)))
    dos.close()
    val bytes = raw.toByteArray
    // section 0 (16) + section 1 (21) → section 3 at offset 37; its
    // octet 64 (projection centre flag) is file offset 37 + 63
    assert(bytes(100) == 0, "projection-centre octet moved; update patch")
    bytes(100) = 0x80.toByte
    write(s"$dir/sps.grb2")(_.write(bytes))
    val df = spark.read.format("grib1").load(s"$dir/sps.grb2")
    val first = df.filter(col("value") === 0.0).head()
    assert(math.abs(first.getAs[Double]("latitude") + 70.0) < 1e-9)
    assert(math.abs(first.getAs[Double]("longitude") - 200.0) < 1e-9)
    // all cells stay in the southern hemisphere on a south-aspect grid
    assert(df.filter(col("latitude") >= 0.0).count() == 0)
  }
}
