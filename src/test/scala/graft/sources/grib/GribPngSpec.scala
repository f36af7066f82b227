package graft.sources.grib

import java.time.LocalDateTime

import graft.SparkSpec

/** Template 5.41 (PNG packing — MRMS-style archives) + the in-repo PNG
  * codec itself. */
class GribPngSpec extends SparkSpec {

  test("PNG codec roundtrips all five filters and every GRIB depth") {
    // ≥5 rows so the encoder's per-row filter cycle hits every type
    for (nbits <- Seq(1, 8, 9, 16, 17, 24, 25, 32)) {
      val w = 7; val h = 6
      val max = if (nbits == 64) Long.MaxValue else (1L << nbits) - 1
      val samples = Array.tabulate(w * h)(k =>
        (k.toLong * 2654435761L) & max)
      val bytes = Png.encode(w, h, nbits, samples)
      val (dw, dh, out) = Png.decode(bytes)
      assert((dw, dh) == ((w, h)))
      assert(out.toSeq == samples.toSeq, s"nbits=$nbits")
    }
  }

  test("PNG codec rejects non-GRIB profiles and truncation") {
    val ok = Png.encode(3, 2, 8, Array.fill(6)(5L))
    intercept[IllegalArgumentException](Png.decode(ok.take(20)))
    intercept[IllegalArgumentException](Png.decode(Array.fill[Byte](16)(0)))
  }

  private val lats = Seq(10.0, 11.0, 12.0)
  private val lons = Seq(20.0, 21.0, 22.0, 23.0)

  test("template 5.41 roundtrips through write → scan (no bitmap)") {
    val vals = Array.tabulate(12)(k => k * 1.5)
    val path = s"${System.getProperty("java.io.tmpdir")}/grib_png_plain.grb2"
    GribFormat.writeFile(spark, path,
      Seq((7, LocalDateTime.parse("2024-04-01T06:00"), lats, lons, vals)),
      decimalScale = 1, edition = 2, pngPacking = true)
    val rows = spark.read.format("grib1").load(path)
      .orderBy("latitude", "longitude").collect()
    assert(rows.length == 12)
    rows.zipWithIndex.foreach { case (r, k) =>
      assert(r.getAs[Double]("value") == k * 1.5, s"cell $k")
    }
  }

  test("template 5.41 with bitmap flattens present cells to one PNG row") {
    val vals = Array.tabulate(12)(k =>
      if (k == 3 || k == 7) Double.NaN else k * 2.0)
    val path = s"${System.getProperty("java.io.tmpdir")}/grib_png_bm.grb2"
    GribFormat.writeFile(spark, path,
      Seq((7, LocalDateTime.parse("2024-04-01T06:00"), lats, lons, vals)),
      edition = 2, pngPacking = true)
    val rows = spark.read.format("grib1").load(path)
      .orderBy("latitude", "longitude").collect()
    assert(rows.length == 12)
    rows.zipWithIndex.foreach { case (r, k) =>
      if (k == 3 || k == 7) assert(r.isNullAt(r.fieldIndex("value")), s"cell $k")
      else assert(r.getAs[Double]("value") == k * 2.0, s"cell $k")
    }
  }

  test("wide-range field picks a 16-bit grayscale raster and stays exact") {
    val n = 40 * 50
    val big = Array.tabulate(n)(k => (k % 40000).toDouble)
    val path = s"${System.getProperty("java.io.tmpdir")}/grib_png_big.grb2"
    GribFormat.writeFile(spark, path,
      Seq((7, LocalDateTime.parse("2024-04-01T06:00"),
        (0 until 40).map(10.0 + _ * 0.1), (0 until 50).map(20.0 + _ * 0.1), big)),
      edition = 2, pngPacking = true)
    val rows = spark.read.format("grib1").load(path)
      .select("latitude", "longitude", "value").collect()
    assert(rows.length == n)
    rows.foreach { r =>
      val j = math.round((r.getDouble(0) - 10.0) * 10).toInt
      val i = math.round((r.getDouble(1) - 20.0) * 10).toInt
      assert(r.getDouble(2) == big(j * 50 + i), s"cell ($j, $i)")
    }
  }

  test("constant field (zero range) roundtrips through a 1-bit raster") {
    val path = s"${System.getProperty("java.io.tmpdir")}/grib_png_const.grb2"
    GribFormat.writeFile(spark, path,
      Seq((7, LocalDateTime.parse("2024-04-01T06:00"), lats, lons,
        Array.fill(12)(42.0))),
      edition = 2, pngPacking = true)
    val rows = spark.read.format("grib1").load(path).select("value").collect()
    assert(rows.length == 12 && rows.forall(_.getDouble(0) == 42.0))
  }

  test("complex and PNG packing are mutually exclusive") {
    intercept[IllegalArgumentException] {
      GribFormat.writeFile(spark, "/tmp/never.grb2",
        Seq((7, LocalDateTime.parse("2024-04-01T06:00"), lats, lons,
          Array.fill(12)(1.0))),
        edition = 2, complexPacking = true, pngPacking = true)
    }
  }
}
