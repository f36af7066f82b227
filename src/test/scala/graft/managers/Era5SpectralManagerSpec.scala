package graft.managers

import java.io.DataOutputStream
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.grib.GribFormat

/** The hardest ERA5 input shape end-to-end, offline: SPECTRAL GRIB2
  * landing files (templates 3.50 + 5.51, the native MARS archive form)
  * → grib-spectral scan → in-engine spherical-harmonic synthesis onto a
  * Gaussian grid → standardize → publish → append. No external regrid
  * stage anywhere. */
class Era5SpectralManagerSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  /** One file of hourly spectral messages, T=2 (12 coefficient values),
    * 5.51 complex packing with an integral Laplacian (exact roundtrip):
    * the (0,0) coefficient carries `base + h`, the (0,1) coefficient 10.
    * Synthesized field: f(φ) = (base + h) + 10·√3·sin φ — latitude-only,
    * so every expectation is closed-form. */
  private def writeHourly(path: String, day: Int, hours: Range,
      base: Double): Unit = {
    val out = new DataOutputStream(Files.newOutputStream(Paths.get(path)))
    try hours.foreach { h =>
      val coeffs = new Array[Double](12)
      coeffs(0) = base + h // (0,0) re
      coeffs(2) = 10.0 // (0,1) re
      GribFormat.writeSpectralMessage2(out,
        java.time.LocalDateTime.of(2024, 3, day, h, 0), trunc = 2,
        fields = Seq((130, 0, coeffs)), complexSub = Some((1.0, 0)))
    } finally out.close()
  }

  test("spectral landing files: scan → synthesize → publish → append") {
    val root = Files.createTempDirectory("era5_sp").toString
    val mgr = new Era5SpectralManager(spark, root, gaussianN = 1)
    new java.io.File(mgr.inputDir).mkdirs()
    writeHourly(s"${mgr.inputDir}/era5_sp_a.grb2", 1, 0 until 4, base = 250.0)
    assert(mgr.checkIfNewData())
    mgr.run()
    val ds = mgr.store.dataset()
    // N=1 grid: 2 parallels x 4 longitudes x 4 hours
    assert(ds.count() == 32)
    // longitudes 0,90,180,270 standardized to -180..180
    val lons = ds.select("longitude").distinct().as[Double].collect().sorted.toSeq
    assert(lons == Seq(-180.0, -90.0, 0.0, 90.0), lons.toString)
    // closed form: f = (250 + h) + 10*sqrt(3)*sin(phi); zonal — the same
    // value on every longitude of a parallel
    val lat = GribFormat.gaussianLatitudes(1)(0)
    val expect3 = 250.0 + 3 + 10 * math.sqrt(3) * math.sin(math.toRadians(lat))
    val got = ds.filter(col("time") === lit(ts("2024-03-01T03:00:00")) &&
        col("latitude") > 0)
      .select("t").as[Double].collect()
    assert(got.length == 4)
    got.foreach(v => assert(math.abs(v - expect3) < 1e-9, s"$v vs $expect3"))
    // incremental append through the same lifecycle
    writeHourly(s"${mgr.inputDir}/era5_sp_b.grb2", 1, 4 until 8, base = 250.0)
    assert(mgr.checkIfNewData())
    mgr.run()
    assert(mgr.store.dataset().count() == 64)
    assert(mgr.getMetadataDateRange().map(_._2.toString)
      == Some("2024-03-01T07:00"))
    assert(!mgr.checkIfNewData())
  }

  test("multi-param landing files: only the manager's paramId is " +
      "synthesized, never blended (ADVICE r8)") {
    val root = Files.createTempDirectory("era5_spmp").toString
    val mgr = new Era5SpectralManager(spark, root, gaussianN = 1)
    new java.io.File(mgr.inputDir).mkdirs()
    // one file, one message, TWO params: 130 (t, the manager's) and 138
    // (vorticity-like) with a wildly different (0,0) — pre-fix, the
    // synthesis summed both fields' coefficients
    val out = new DataOutputStream(Files.newOutputStream(
      Paths.get(s"${mgr.inputDir}/era5_sp_mp.grb2")))
    try {
      val t = new Array[Double](12); t(0) = 250.0; t(2) = 10.0
      val vo = new Array[Double](12); vo(0) = 9999.0; vo(2) = -3.0
      GribFormat.writeSpectralMessage2(out,
        java.time.LocalDateTime.of(2024, 3, 1, 0, 0), trunc = 2,
        fields = Seq((130, 0, t), (138, 0, vo)), complexSub = Some((1.0, 0)))
    } finally out.close()
    mgr.run()
    val ds = mgr.store.dataset()
    assert(ds.count() == 8) // 2 parallels x 4 longitudes x 1 hour
    val lat = GribFormat.gaussianLatitudes(1)(0)
    val expect = 250.0 + 10 * math.sqrt(3) * math.sin(math.toRadians(lat))
    val got = ds.filter(col("latitude") > 0).select("t").as[Double].collect()
    assert(got.length == 4)
    got.foreach(v => assert(math.abs(v - expect) < 1e-9,
      s"$v vs $expect — param 138 must not leak into the synthesis"))
  }

  test("multi-LEVEL landing files: the level filter selects one " +
      "hypercube; a levelless manager refuses by name, never blends") {
    // one message, ONE param at TWO model levels — the ERA5 model-level
    // shape the reference selects with grib_filter + scan_indices
    def writeTwoLevels(inputDir: String): Unit = {
      val out = new DataOutputStream(Files.newOutputStream(
        Paths.get(s"$inputDir/era5_sp_ml.grb2")))
      try {
        val l1 = new Array[Double](12); l1(0) = 250.0; l1(2) = 10.0
        val l2 = new Array[Double](12); l2(0) = 300.0; l2(2) = -5.0
        GribFormat.writeSpectralMessage2(out,
          java.time.LocalDateTime.of(2024, 3, 1, 0, 0), trunc = 2,
          fields = Seq((130, 0, l1), (130, 0, l2)),
          complexSub = Some((1.0, 0)),
          levels = Seq((105, 1L), (105, 137L))) // hybrid levels 1 and 137
      } finally out.close()
    }
    val root = Files.createTempDirectory("era5_spml").toString
    val mgr = new Era5SpectralManager(spark, root, gaussianN = 1,
      level = Some(137.0))
    new java.io.File(mgr.inputDir).mkdirs()
    writeTwoLevels(mgr.inputDir)
    mgr.run()
    val ds = mgr.store.dataset()
    assert(ds.count() == 8)
    val lat = GribFormat.gaussianLatitudes(1)(0)
    val expect = 300.0 - 5 * math.sqrt(3) * math.sin(math.toRadians(lat))
    val got = ds.filter(col("latitude") > 0).select("t").as[Double].collect()
    got.foreach(v => assert(math.abs(v - expect) < 1e-9,
      s"$v vs $expect — only level 137 may synthesize"))
    // WITHOUT the level filter the duplicate-coefficient backstop refuses
    // by name instead of blending the two levels
    val root2 = Files.createTempDirectory("era5_spml2").toString
    val mgr2 = new Era5SpectralManager(spark, root2, gaussianN = 1)
    new java.io.File(mgr2.inputDir).mkdirs()
    writeTwoLevels(mgr2.inputDir)
    val e = intercept[Exception] { mgr2.run() }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("duplicate spectral coefficient"), msgs)
  }
}
