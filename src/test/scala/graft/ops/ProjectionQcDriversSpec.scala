package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.{DatasetDescriptor, TimeSpan}

class ProjectionQcDriversSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  test("EPSG:4326 is identity; EPSG:3857 matches known landmark") {
    val df = Seq((51.5, -0.12)).toDF("lat", "lon") // London
    val id = Projection.assignCrs(df, "lat", "lon", 4326).head()
    assert(id.getAs[Double]("northing") == 51.5 && id.getAs[Double]("easting") == -0.12)
    val merc = Projection.assignCrs(df, "lat", "lon", 3857).head()
    assert(math.abs(merc.getAs[Double]("easting") - -13358.34) < 1.0)
    assert(math.abs(merc.getAs[Double]("northing") - 6710219.11) < 10.0)
  }

  test("EPSG:3857 round-trips through the inverse") {
    val df = Seq((45.0, 90.0), (-60.0, -170.0), (0.0, 0.0)).toDF("lat", "lon")
    val proj = Projection.assignCrs(df, "lat", "lon", 3857)
    val (latB, lonB) = Projection.unproject3857(col("northing"), col("easting"))
    val bad = proj.filter(abs(latB - col("lat")) > 1e-9 || abs(lonB - col("lon")) > 1e-9)
    assert(bad.count() == 0)
  }

  test("unsupported EPSG raises") {
    assertThrows[IllegalArgumentException] {
      Projection.project(lit(0.0), lit(0.0), 32633)
    }
  }

  test("Lambert conformal (HRRR-style): origin at (0,0), scale true at the standard parallel") {
    val m = Projection.LambertConformalConic(38.5, -97.5, 38.5, 38.5)
    val df = Seq((38.5, -97.5), (38.5, -96.5), (39.5, -97.5)).toDF("lat", "lon")
    val rows = Projection.assignCrs(df, "lat", "lon", m)
      .select("lat", "lon", "northing", "easting").collect()
    val origin = rows.find(r => r.getDouble(0) == 38.5 && r.getDouble(1) == -97.5).get
    assert(math.abs(origin.getAs[Double]("northing")) < 1e-6)
    assert(math.abs(origin.getAs[Double]("easting")) < 1e-6)
    // 1° east at the standard parallel ≈ R·cos(38.5°)·1°·k(=1): ~87 031 m
    val east = rows.find(_.getDouble(1) == -96.5).get
    val expectedX = 6371229.0 * math.cos(math.toRadians(38.5)) * math.toRadians(1.0)
    assert(math.abs(east.getAs[Double]("easting") - expectedX) < 20.0)
    assert(east.getAs[Double]("northing") > 0.0) // cone curves parallels upward
    // 1° north along the central meridian ≈ R·1° of arc, x stays 0
    val north = rows.find(_.getDouble(0) == 39.5).get
    assert(math.abs(north.getAs[Double]("easting")) < 1e-6)
    assert(math.abs(north.getAs[Double]("northing") - 6371229.0 * math.toRadians(1.0)) < 300.0)
  }

  test("LCC with two distinct parallels round-trips tightly") {
    val m = Projection.LambertConformalConic(40.0, -100.0, 33.0, 45.0)
    val df = Seq((20.0, -130.0), (55.0, -70.0), (40.0, -100.0), (70.0, -97.0))
      .toDF("lat", "lon")
    val proj = Projection.assignCrs(df, "lat", "lon", m)
    val (latB, lonB) = Projection.unproject(col("northing"), col("easting"), m)
    assert(proj.filter(abs(latB - col("lat")) > 1e-8 ||
      abs(lonB - col("lon")) > 1e-8).count() == 0)
  }

  test("polar stereographic: both aspects, known directions, tight roundtrip") {
    val n = Projection.PolarStereographic(northPole = true, lon0 = -45.0, latTs = 60.0)
    // at the pole: (0, 0); at lon0 the point projects straight "down" (y<0)
    val df = Seq((90.0, 13.0), (70.0, -45.0), (70.0, 45.0)).toDF("lat", "lon")
    val rows = Projection.assignCrs(df, "lat", "lon", n)
      .select("lat", "lon", "northing", "easting").collect()
    val pole = rows.find(_.getDouble(0) == 90.0).get
    assert(math.abs(pole.getAs[Double]("northing")) < 1e-6 &&
      math.abs(pole.getAs[Double]("easting")) < 1e-6)
    val below = rows.find(r => r.getDouble(1) == -45.0).get
    assert(below.getAs[Double]("northing") < 0 &&
      math.abs(below.getAs[Double]("easting")) < 1e-6)
    val right = rows.find(r => r.getDouble(1) == 45.0).get
    assert(right.getAs[Double]("easting") > 0) // 90° clockwise from lon0
    // roundtrips, both aspects
    for (gm <- Seq(n, Projection.PolarStereographic(false, 0.0, -71.0))) {
      val sign = if (gm.northPole) 1.0 else -1.0
      val pts = Seq((sign * 85.0, 120.0), (sign * 55.0, -179.0), (sign * 65.0, 0.3))
        .toDF("lat", "lon")
      val proj = Projection.assignCrs(pts, "lat", "lon", gm)
      val (latB, lonB) = Projection.unproject(col("northing"), col("easting"), gm)
      assert(proj.filter(abs(latB - col("lat")) > 1e-8 ||
        abs(lonB - col("lon")) > 1e-8).count() == 0, s"aspect north=${gm.northPole}")
    }
  }

  test("cfAttrs emit the CF grid-mapping keys") {
    val lcc = Projection.cfAttrs(Projection.LambertConformalConic(38.5, -97.5, 38.5, 38.5))
    assert(lcc("grid_mapping_name") == "lambert_conformal_conic")
    assert(lcc("standard_parallel") == "38.5")
    val ps = Projection.cfAttrs(Projection.PolarStereographic(false, 0.0, -71.0))
    assert(ps("grid_mapping_name") == "polar_stereographic")
    assert(ps("latitude_of_projection_origin") == "-90.0")
  }

  test("isRegularGrid accepts even spacing, rejects jitter (conventions.py:200-260)") {
    val even = (0 until 20).map(i => Tuple1(i * 0.25)).toDF("latitude")
    assert(Projection.isRegularGrid(even, "latitude"))
    val jittered = (Seq(0.0, 0.25, 0.5, 1.5, 1.75)).map(Tuple1(_)).toDF("latitude")
    assert(!Projection.isRegularGrid(jittered, "latitude"))
  }

  private def grid(nDays: Int) = dailyGrid(1, nDays)
  private val desc = DatasetDescriptor("x", "value",
    spatialDims = Seq("latitude", "longitude"), timeResolution = TimeSpan.Daily,
    hasNans = false, unitOfMeasurement = None)

  test("preParseQualityCheck passes a clean contiguous grid") {
    QcDrivers.preParseQualityCheck(
      grid(5).withColumn("value", col("value").cast("float")), desc)
  }

  test("preParseQualityCheck rejects gapped times, bad dtype, forbidden NaN") {
    val gapped = grid(3).unionByName(dailyGrid(7, 2))
      .withColumn("value", col("value").cast("float"))
    assertThrows[QcDrivers.QcFailure](QcDrivers.preParseQualityCheck(gapped, desc))

    val intTyped = grid(3).withColumn("value", lit(1L))
    assertThrows[QcDrivers.QcFailure](QcDrivers.preParseQualityCheck(intTyped, desc))

    val withNaN = grid(3).withColumn("value", lit(Float.NaN))
    assertThrows[QcDrivers.QcFailure](QcDrivers.preParseQualityCheck(withNaN, desc))
  }

  test("preParseQualityCheck NaN-frequency gate fires only for existing stores") {
    val d = desc.copy(hasNans = true, expectedNanFrequency = Some(0.0))
    val noisy = grid(5).withColumn("value",
      when(col("latitude") === 10.0, lit(Double.NaN)).otherwise(col("value")))
    QcDrivers.preParseQualityCheck(noisy, d, hasExisting = false) // initial: skipped
    assertThrows[QcDrivers.QcFailure] {
      QcDrivers.preParseQualityCheck(noisy, d, hasExisting = true)
    }
  }

  test("postParseQualityCheck compares sampled source cells against the store") {
    val dir = java.nio.file.Files.createTempDirectory("ppqc").toString
    val src = grid(3)
    src.write.parquet(s"$dir/f1")
    val store = grid(3) // identical → no mismatches
    def ranged(df: org.apache.spark.sql.DataFrame)(
        lo: java.time.LocalDateTime, hi: java.time.LocalDateTime) =
      df.filter(col("time").between(lit(lo), lit(hi)))
    val keys = Seq("time", "latitude", "longitude")
    val ok = QcDrivers.postParseQualityCheck(spark, ranged(store), Seq(s"$dir/f1"),
      f => spark.read.parquet(f), keys, "value", desc, maxChecks = 10)
    assert(ok.count() == 0)
    val corrupted = store.withColumn("value", col("value") + 5.0)
    val bad = QcDrivers.postParseQualityCheck(spark, ranged(corrupted), Seq(s"$dir/f1"),
      f => spark.read.parquet(f), keys, "value", desc, maxChecks = 10)
    assert(bad.count() > 0)
  }

  test("postParseQualityCheck honors the wall-clock cap (publish.py:23)") {
    val dir = java.nio.file.Files.createTempDirectory("ppqc2").toString
    dailyGrid(1, 2).write.parquet(s"$dir/f1")
    val out = QcDrivers.postParseQualityCheck(spark,
      (_, _) => dailyGrid(1, 2),
      Seq(s"$dir/f1", s"$dir/f1"), f => spark.read.parquet(f),
      Seq("time", "latitude", "longitude"), "value", desc,
      maxChecks = 100, timeLimitMillis = 0)
    assert(out.count() == 0) // deadline already passed → no checks run
  }

  test("crsAttrs emits proj:code/wkt2/projjson; spatialAttrs summarizes the grid (W15)") {
    val a = Projection.crsAttrs(3857)
    assert(a("proj:code") == "EPSG:3857")
    assert(a("proj:wkt2").startsWith("PROJCRS[") && a("proj:wkt2").contains("3857"))
    assert(a("proj:projjson").contains("\"code\":3857"))
    assert(Projection.crsAttrs(4326)("proj:wkt2").startsWith("GEOGCRS["))
    assertThrows[IllegalArgumentException](Projection.crsAttrs(32633))

    val g = dailyGrid(1, 2)
    val s = Projection.spatialAttrs(g, "latitude", "longitude")
    assert(s("spatial:shape") == "2,2")
    assert(s("spatial:bbox") == "100.0,10.0,100.25,10.25")
  }
}
