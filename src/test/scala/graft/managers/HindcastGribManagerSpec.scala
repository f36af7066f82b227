package graft.managers

import java.io.DataOutputStream
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.grib.GribFormat

/** Hindcast-category (6-D) ingest end-to-end: reforecast GRIB files whose
  * names carry the hindcast reference date and whose PDS carries each
  * run's own init time → (hrt, forecast_reference_offset, step, ensemble)
  * keyed store — the reference's 4th dataset category
  * (transform.py:740-756; conftest.py:108-134) as a working lifecycle. */
class HindcastGribManagerSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private val lats = Seq(10.0, 10.25)
  private val lons = Seq(100.0, 100.25)

  /** One reforecast run file: ensemble members 1/2, leads 6/12 h of param
    * 167, initialized `initDay` March 2024. value = base + lead +
    * 20(lat−10) + 20(lon−100) + 10·member — integer Kelvin, exact. */
  private def writeRun(path: String, initDay: Int, base: Double,
      initHour: Int = 0): Unit = {
    val out = new DataOutputStream(Files.newOutputStream(Paths.get(path)))
    val refTime = java.time.LocalDateTime.of(2024, 3, initDay, initHour, 0)
    try for (lead <- Seq(6, 12)) {
      def vals(extra: Double) = (for (la <- lats; lo <- lons)
        yield base + lead + (la - 10.0) * 20 + (lo - 100.0) * 20 + extra).toArray
      GribFormat.writeMessage2Fields(out, refTime, lats, lons,
        fields = Seq(1, 2).map(m => (167, lead, vals(m * 10.0))),
        members = Seq(1, 2))
    } finally out.close()
  }

  test("reforecast runs keyed by (hrt from the file name, offset from the " +
      "PDS): publish, point lookups, append of the next hindcast date") {
    val root = Files.createTempDirectory("hind_mgr").toString
    val mgr = new HindcastGribManager(spark, root)
    new java.io.File(mgr.inputDir).mkdirs()
    // hindcast date Mar 10 reconstructed from runs initialized Mar 8 and
    // Mar 9 (offsets 2 and 1 day); overlapping VALID times across runs
    writeRun(s"${mgr.inputDir}/hindcast-2024-03-10_init-08.grb2", 8, 250.0)
    writeRun(s"${mgr.inputDir}/hindcast-2024-03-10_init-09.grb2", 9, 260.0)
    assert(mgr.checkIfNewData())
    mgr.run()
    val ds = mgr.store.dataset()
    assert(ds.columns.toSeq == Seq("hindcast_reference_time",
      "forecast_reference_offset", "step", "ensemble", "latitude",
      "longitude", "t2m"))
    // 2 offsets x 2 steps x 2 members x 2x2 cells
    assert(ds.count() == 32)
    assert(ds.select("forecast_reference_offset").distinct()
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // point lookup: offset 2 (init Mar 8), step 6 h, member 2, first cell
    val v = ds.filter(col("forecast_reference_offset") === 2L &&
        col("step") === 360L && col("ensemble") === 2 &&
        col("latitude") === 10.0 && col("longitude") === 100.0)
      .select("t2m").as[Double].head()
    assert(v == 250.0 + 6 + 20.0)
    // the two runs' valid times overlap (Mar 8 + 12 h lands inside Mar 9's
    // horizon) but the offset axis keeps every 6-D key distinct
    assert(ds.select("hindcast_reference_time", "forecast_reference_offset",
      "step", "ensemble", "latitude", "longitude").distinct().count() == 32)

    // next hindcast date appends through the same lifecycle
    writeRun(s"${mgr.inputDir}/hindcast-2024-03-11_init-09b.grb2", 9, 270.0)
    assert(mgr.checkIfNewData())
    mgr.run()
    val ds2 = mgr.store.dataset()
    assert(ds2.count() == 48)
    assert(ds2.select("hindcast_reference_time").distinct().count() == 2)
    assert(!mgr.checkIfNewData())
  }

  test("two runs of one hindcast date initialized at different HOURS of " +
      "one day refuse by name: the day-granular offset collapses them " +
      "onto one store key") {
    val root = Files.createTempDirectory("hind_hours").toString
    val mgr = new HindcastGribManager(spark, root)
    new java.io.File(mgr.inputDir).mkdirs()
    // offset = datediff(hrt, ref) is 2 DAYS for both 00Z and 12Z of Mar 8
    writeRun(s"${mgr.inputDir}/hindcast-2024-03-10_init-08-00z.grb2", 8,
      250.0, initHour = 0)
    writeRun(s"${mgr.inputDir}/hindcast-2024-03-10_init-08-12z.grb2", 8,
      255.0, initHour = 12)
    val e = intercept[IllegalArgumentException] { mgr.run() }
    assert(e.getMessage.contains("day-granular"),
      s"expected the day-collapse refusal, got: ${e.getMessage}")
    assert(e.getMessage.contains("2024-03-08T00:00") &&
      e.getMessage.contains("2024-03-08T12:00"))
    // distinct init DAYS of one hindcast date still ingest (the original
    // green path is untouched by the day-granular cell)
    Files.delete(Paths.get(s"${mgr.inputDir}/hindcast-2024-03-10_init-08-12z.grb2"))
    writeRun(s"${mgr.inputDir}/hindcast-2024-03-10_init-09.grb2", 9, 260.0)
    mgr.run()
    assert(mgr.store.dataset().count() == 32)
  }

  test("a file whose name carries no hindcast date is refused by name") {
    val root = Files.createTempDirectory("hind_bad").toString
    val mgr = new HindcastGribManager(spark, root)
    new java.io.File(mgr.inputDir).mkdirs()
    writeRun(s"${mgr.inputDir}/run-2024-03-08.grb2", 8, 250.0)
    val e = intercept[IllegalArgumentException] { mgr.run() }
    assert(e.getMessage.contains("hindcast reference date"))
  }
}
