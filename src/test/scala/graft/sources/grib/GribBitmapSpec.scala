package graft.sources.grib

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** GRIB bitmap (section 6 / BMS) + complex packing (template 5.2) — the
  * features real archives carry (the reference's own `rtma_pcp.grib` test
  * input is LCC grid + bitmap + 5.2): writer↔scan roundtrips for both
  * editions, and a scan of the REAL NCEP-written rtma file. */
class GribBitmapSpec extends SparkSpec {

  private val lats = Seq(10.0, 11.0, 12.0)
  private val lons = Seq(20.0, 21.0, 22.0, 23.0)
  private def vals(holes: Boolean): Array[Double] =
    Array.tabulate(12)(k => if (holes && (k == 3 || k == 7)) Double.NaN else k * 2.0)

  private def writeTmp(tag: String, edition: Int, complexPacking: Boolean,
      holes: Boolean = true): String = {
    val path = s"${System.getProperty("java.io.tmpdir")}/grib_bm_$tag." +
      (if (edition == 1) "grb" else "grb2")
    GribFormat.writeFile(spark, path,
      Seq((7, LocalDateTime.parse("2024-04-01T06:00"), lats, lons, vals(holes))),
      edition = edition, complexPacking = complexPacking)
    path
  }

  private def checkHoles(path: String): Unit = {
    val rows = spark.read.format("grib1").load(path)
      .orderBy("latitude", "longitude").collect()
    assert(rows.length == 12)
    rows.zipWithIndex.foreach { case (r, k) =>
      if (k == 3 || k == 7) assert(r.isNullAt(r.fieldIndex("value")), s"cell $k must be null")
      else assert(r.getAs[Double]("value") == k * 2.0, s"cell $k")
    }
  }

  test("edition-1 bitmap: NaN cells round-trip as nulls") {
    checkHoles(writeTmp("ed1", edition = 1, complexPacking = false))
  }

  test("edition-2 bitmap: NaN cells round-trip as nulls") {
    checkHoles(writeTmp("ed2", edition = 2, complexPacking = false))
  }

  test("edition-2 complex packing round-trips exactly (with bitmap)") {
    checkHoles(writeTmp("cx", edition = 2, complexPacking = true))
  }

  test("complex packing without bitmap round-trips a large ramp exactly") {
    val n = 40 * 50
    val big = Array.tabulate(n)(k => (k % 977).toDouble) // >1 group, wide refs
    val path = s"${System.getProperty("java.io.tmpdir")}/grib_bm_big.grb2"
    GribFormat.writeFile(spark, path,
      Seq((7, LocalDateTime.parse("2024-04-01T06:00"),
        (0 until 40).map(10.0 + _ * 0.1), (0 until 50).map(20.0 + _ * 0.1), big)),
      edition = 2, complexPacking = true)
    val rows = spark.read.format("grib1").load(path)
      .select("latitude", "longitude", "value").collect()
    assert(rows.length == n)
    rows.foreach { r =>
      val j = math.round((r.getDouble(0) - 10.0) * 10).toInt
      val i = math.round((r.getDouble(1) - 20.0) * 10).toInt
      assert(r.getDouble(2) == big(j * 50 + i), s"cell ($j, $i)")
    }
  }

  test("template 5.3 spatial differencing round-trips exactly (orders 1 and 2, with bitmap)") {
    Seq(1, 2).foreach { order =>
      val path = s"${System.getProperty("java.io.tmpdir")}/grib_sd_$order.grb2"
      GribFormat.writeFile(spark, path,
        Seq((7, LocalDateTime.parse("2024-04-01T06:00"), lats, lons, vals(holes = true))),
        edition = 2, complexPacking = true, spatialDiffOrder = order)
      // header sanity: the parser must see order + descriptor width
      val in = new java.io.FileInputStream(path)
      val m = (try GribFormat.parseMessages(in) finally in.close()).head
      assert(m.complex.exists(cp =>
        cp.spatialOrder == order && cp.spatialDescBytes == 4), s"order $order header")
      checkHoles(path)
    }
  }

  test("template 5.3 carries a smooth wide-range field a 24-bit simple pack cannot") {
    // a ramp whose scaled range exceeds 2^24 — simple packing refuses it,
    // spatial differencing stores only the tiny constant differences
    val n = 60 * 70
    val smooth = Array.tabulate(n)(k => 1.0e5 + k * 500.0) // scaled range ~21M > 2^24
    val latsW = (0 until 60).map(10.0 + _ * 0.1)
    val lonsW = (0 until 70).map(20.0 + _ * 0.1)
    val p53 = s"${System.getProperty("java.io.tmpdir")}/grib_sd_wide.grb2"
    intercept[IllegalArgumentException] {
      GribFormat.writeFile(spark, s"$p53.simple",
        Seq((7, LocalDateTime.parse("2024-04-01T06:00"), latsW, lonsW, smooth)),
        decimalScale = 1, edition = 2)
    }
    GribFormat.writeFile(spark, p53,
      Seq((7, LocalDateTime.parse("2024-04-01T06:00"), latsW, lonsW, smooth)),
      decimalScale = 1, edition = 2, complexPacking = true, spatialDiffOrder = 2)
    val rows = spark.read.format("grib1").load(p53)
      .select("latitude", "longitude", "value").collect()
    assert(rows.length == n)
    rows.foreach { r =>
      val j = math.round((r.getDouble(0) - 10.0) * 10).toInt
      val i = math.round((r.getDouble(1) - 20.0) * 10).toInt
      assert(r.getDouble(2) == smooth(j * 70 + i), s"cell ($j, $i)")
    }
    // ...and the differenced sections are much smaller than simple packing
    // would be (25 bits × 4200 cells ≈ 13 KB): whole file under 4 KB
    assert(new java.io.File(p53).length() < 4096)
  }

  test("template 5.3 negative values and negative differences round-trip") {
    val v = Array(-40.5, -41.0, -39.5, -38.0, -42.5, -44.0,
      -37.5, -36.0, -45.5, -47.0, -35.5, -34.0)
    Seq(1, 2).foreach { order =>
      val path = s"${System.getProperty("java.io.tmpdir")}/grib_sd_neg_$order.grb2"
      GribFormat.writeFile(spark, path,
        Seq((7, LocalDateTime.parse("2024-04-01T06:00"), lats, lons, v)),
        decimalScale = 1, edition = 2, complexPacking = true,
        spatialDiffOrder = order)
      val rows = spark.read.format("grib1").load(path)
        .orderBy("latitude", "longitude").collect()
      rows.zipWithIndex.foreach { case (r, k) =>
        assert(r.getAs[Double]("value") == v(k), s"order $order cell $k")
      }
    }
  }

  test("template 4.1 ensemble members round-trip; member predicate prunes messages") {
    val path = s"${System.getProperty("java.io.tmpdir")}/grib_ens.grb2"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new DataOutputStream(fs.create(new org.apache.hadoop.fs.Path(path), true))
    try GribFormat.writeMessage2Fields(out,
      LocalDateTime.parse("2024-04-03T00:00"), lats, lons,
      fields = Seq(
        (0x0101, 0, vals(holes = false)),
        (0x0101, 0, vals(holes = false).map(_ + 100.0)),
        (0x0101, 0, vals(holes = true).map(_ + 200.0))),
      members = Seq(0, 1, 2))
    finally out.close()
    val in = new java.io.FileInputStream(path)
    val msgs = try GribFormat.parseMessages(in) finally in.close()
    assert(msgs.map(_.member) == Seq(0, 1, 2))

    val df = spark.read.format("grib1").load(path)
    assert(df.count() == 36)
    // deterministic file → member is null; ensemble file → populated
    val det = writeTmp("det41", edition = 2, complexPacking = false, holes = false)
    assert(spark.read.format("grib1").load(det).filter(col("member").isNull).count() == 12)
    val m1 = df.filter(col("member") === 1)
    assert(m1.queryExecution.executedPlan.toString.contains("messages=1/3"),
      "member equality must prune whole messages at planning:\n" +
        m1.queryExecution.executedPlan.toString)
    val rows = m1.orderBy("latitude", "longitude").collect()
    rows.zipWithIndex.foreach { case (r, k) =>
      assert(r.getAs[Double]("value") == k * 2.0 + 100.0, s"member-1 cell $k")
    }
    // member 2 keeps its bitmap holes
    val m2 = df.filter(col("member") === 2).orderBy("latitude", "longitude").collect()
    val vIdx = m2.head.fieldIndex("value")
    assert(m2(3).isNullAt(vIdx) && m2(7).isNullAt(vIdx))
  }

  private val rtma = "/root/reference/tests/unit/inputs/rtma_pcp.grib"

  test("REAL NCEP rtma_pcp.grib (LCC grid + bitmap + template 5.2) scans") {
    assume(new java.io.File(rtma).isFile)
    val df = spark.read.format("grib1").load(rtma)
    val agg = df.agg(
      count(lit(1)), count(col("value")), min("value"), max("value"),
      min("latitude"), max("latitude"), min("longitude"), max("longitude"),
      min("time")).head()
    assert(agg.getLong(0) == 2145L * 1377) // Nx × Ny cells
    assert(agg.getLong(1) == 2385858L) // present cells = section-5 ndata
    assert(agg.getDouble(2) >= 0.0) // precipitation is non-negative
    assert(agg.getDouble(3) < 1000.0) // sane mm upper bound
    // CONUS 2.5 km RTMA extent (degrees; lon in GRIB 0..360 convention)
    assert(agg.getDouble(4) > 19.0 && agg.getDouble(5) < 58.0)
    assert(agg.getDouble(6) > 225.0 && agg.getDouble(7) < 310.0)
    // template 4.8 interval product: ref 08Z, 1-h accumulation ending
    // 09Z — the VALID time is the interval END, step the endStep
    val t = df.select("time", "ref_time", "step").distinct().head()
    assert(t.getAs[java.time.LocalDateTime]("time") ==
      java.time.LocalDateTime.parse("2025-02-06T09:00"))
    assert(t.getAs[java.time.LocalDateTime]("ref_time") ==
      java.time.LocalDateTime.parse("2025-02-06T08:00"))
    assert(t.getAs[Long]("step") == 60L)
  }

  test("rtma first grid point inverts to exactly La1/Lo1") {
    assume(new java.io.File(rtma).isFile)
    val in = new java.io.FileInputStream(rtma)
    val msgs = try GribFormat.parseMessages(in) finally in.close()
    assert(msgs.length == 1)
    val m = msgs.head
    assert(m.ni == 2145 && m.nj == 1377)
    assert(m.complex.isDefined && m.hasBitmap && m.lcc.isDefined)
    assert(m.complex.get.ng == 12891)
    val (lat0, lon0) = m.latLonAt(0)
    assert(math.abs(lat0 - 20.191999) < 1e-9, lat0)
    assert(math.abs(lon0 - 238.445999) < 1e-9, lon0)
    // a diagonal of cells must invert inside the projection's valid area
    (0 until 20).foreach { t =>
      val k = t * (m.nValues / 20) + t
      val (la, lo) = m.latLonAt(k)
      assert(la > 15 && la < 60 && lo > 220 && lo < 315, s"cell $k: ($la, $lo)")
    }
  }

  test("multi-field GRIB2 message: repeated 4-7 groups, one per parameter") {
    // one message, three fields sharing sections 0-3: different params,
    // one with a bitmap, one complex-packed — each must surface as its own
    // scan row set with the right values
    val path = s"${System.getProperty("java.io.tmpdir")}/grib_multifield.grb2"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new DataOutputStream(fs.create(
      new org.apache.hadoop.fs.Path(path), true))
    try GribFormat.writeMessage2Fields(out,
      LocalDateTime.parse("2024-04-02T00:00"), lats, lons,
      fields = Seq(
        (0x0101, 0, vals(holes = false)),
        (0x0102, 6, vals(holes = true)), // bitmap field, +6h lead
        (0x0103, 0, Array.tabulate(12)(k => (k * 7 % 29).toDouble))))
    finally out.close()

    val in = new java.io.FileInputStream(path)
    val msgs = try GribFormat.parseMessages(in) finally in.close()
    assert(msgs.length == 3)
    assert(msgs.map(_.paramId) == Seq(0x0101, 0x0102, 0x0103))
    assert(msgs(1).hasBitmap && !msgs(0).hasBitmap && !msgs(2).hasBitmap)
    assert(msgs(1).validTime == LocalDateTime.parse("2024-04-02T06:00"))

    val df = spark.read.format("grib1").load(path)
    assert(df.count() == 36)
    val f2 = df.filter(col("param") === 0x0102)
      .orderBy("latitude", "longitude").collect()
    f2.zipWithIndex.foreach { case (r, k) =>
      if (k == 3 || k == 7) assert(r.isNullAt(r.fieldIndex("value")), s"field-2 cell $k")
      else assert(r.getAs[Double]("value") == k * 2.0, s"field-2 cell $k")
    }
    val f3 = df.filter(col("param") === 0x0103)
      .orderBy("latitude", "longitude").collect()
    f3.zipWithIndex.foreach { case (r, k) =>
      assert(r.getAs[Double]("value") == (k * 7 % 29).toDouble, s"field-3 cell $k")
    }
  }

  test("bitmap message survives the fuzz writer's even-length padding") {
    // 5 cells → bitmap byte with 3 unused bits; BMS forced odd→even
    val path = s"${System.getProperty("java.io.tmpdir")}/grib_bm_pad.grb"
    GribFormat.writeFile(spark, path,
      Seq((7, LocalDateTime.parse("2024-04-01T06:00"), Seq(10.0),
        (0 until 5).map(20.0 + _), Array(1.0, Double.NaN, 3.0, Double.NaN, 5.0))),
      edition = 1)
    val rows = spark.read.format("grib1").load(path).orderBy("longitude").collect()
    assert(rows.map(r => if (r.isNullAt(r.fieldIndex("value"))) None
      else Some(r.getAs[Double]("value"))).toSeq ==
      Seq(Some(1.0), None, Some(3.0), None, Some(5.0)))
  }
}
