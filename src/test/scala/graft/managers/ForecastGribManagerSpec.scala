package graft.managers

import java.io.DataOutputStream
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.grib.GribFormat

/** Forecast / ensemble-category GRIB ingest end-to-end: native forecast
  * files (several leads per reference time, overlapping valid times
  * across cycles) → grib scan → (forecast_reference_time, step) keyed
  * store → append of the next cycle — the reference's forecast/ensemble
  * dim sets (transform.py:724-759) as a working lifecycle. */
class ForecastGribManagerSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private val lats = Seq(10.0, 10.25)
  private val lons = Seq(100.0, 100.25)

  /** One cycle file: reference time `day` 00Z with leads 0/6/12 h of
    * param 167 (plus an off-param 130 field whose out-of-Kelvin values
    * would trip the pre-parse QC if message pruning ever leaked it).
    * value = base + lead + 20(lat−10) + 20(lon−100) [+ 10·member] —
    * integer Kelvin inside the QC extreme bounds, exact at scale 0. */
  private def writeCycle(path: String, day: Int, base: Double,
      members: Seq[Int] = Seq.empty): Unit = {
    val out = new DataOutputStream(Files.newOutputStream(Paths.get(path)))
    val refTime = java.time.LocalDateTime.of(2024, 3, day, 0, 0)
    try {
      for (lead <- Seq(0, 6, 12)) {
        def vals(extra: Double) = (for (la <- lats; lo <- lons)
          yield base + lead + (la - 10.0) * 20 + (lo - 100.0) * 20 + extra).toArray
        if (members.isEmpty)
          GribFormat.writeMessage2Fields(out, refTime, lats, lons,
            fields = Seq((167, lead, vals(0)), (130, lead, vals(9999))))
        else
          GribFormat.writeMessage2Fields(out, refTime, lats, lons,
            fields = members.map(m => (167, lead, vals(m * 10.0))),
            members = members)
      }
    } finally out.close()
  }

  test("forecast category: cycles with overlapping valid times publish, " +
      "append, and read back by (frt, step)") {
    val root = Files.createTempDirectory("fcst_mgr").toString
    val mgr = new ForecastGribManager(spark, root)
    new java.io.File(mgr.inputDir).mkdirs()
    // cycle 1 (Mar 1 00Z, leads 0/6/12) — lead 12 of day 1 is VALID at
    // the same instant as a later cycle's lead 0 would be... day-cycle
    // keeps it simple: leads within a day overlap the NEXT day's cycle
    writeCycle(s"${mgr.inputDir}/cycle_01.grb2", 1, base = 250.0)
    assert(mgr.checkIfNewData())
    mgr.run()
    val ds = mgr.store.dataset()
    assert(ds.columns.toSeq == Seq("forecast_reference_time", "step",
      "latitude", "longitude", "t2m"))
    assert(ds.count() == 3 * 4) // 3 leads x 2x2 grid, off-param pruned
    // step is minutes; valid time derivable as frt + step
    assert(ds.select("step").distinct().as[Long].collect().sorted.toSeq ==
      Seq(0L, 360L, 720L))
    val v = ds.filter(col("step") === 360L && col("latitude") === 10.0 &&
      col("longitude") === 100.25).select("t2m").as[Double].head()
    assert(v == 250.0 + 6 + 0 + 5)

    // cycle 2 appends the next reference time (daily cadence gate passes)
    writeCycle(s"${mgr.inputDir}/cycle_02.grb2", 2, base = 260.0)
    assert(mgr.checkIfNewData())
    mgr.run()
    val ds2 = mgr.store.dataset()
    assert(ds2.count() == 2 * 3 * 4)
    // the two cycles have OVERLAPPING VALID times (Mar1+12h vs Mar2+0h is
    // not equal — but Mar1 12Z lead and Mar2 00Z analysis differ; the
    // real overlap test: frt keys keep every (frt, step) cell distinct)
    assert(ds2.select("forecast_reference_time", "step").distinct().count() == 6)
    assert(!mgr.checkIfNewData())
  }

  test("ensemble category: perturbation numbers become the ensemble dim") {
    val root = Files.createTempDirectory("ens_mgr").toString
    val mgr = new ForecastGribManager(spark, root, ensemble = true)
    new java.io.File(mgr.inputDir).mkdirs()
    writeCycle(s"${mgr.inputDir}/ens_01.grb2", 1, base = 250.0,
      members = Seq(0, 1))
    mgr.run()
    val ds = mgr.store.dataset()
    assert(ds.columns.toSeq == Seq("forecast_reference_time", "step",
      "ensemble", "latitude", "longitude", "t2m"))
    assert(ds.count() == 3 * 2 * 4) // 3 leads x 2 members x 2x2
    val m1 = ds.filter(col("ensemble") === 1 && col("step") === 0L &&
      col("latitude") === 10.0 && col("longitude") === 100.0)
      .select("t2m").as[Double].head()
    assert(m1 == 250.0 + 0 + 0 + 0 + 10.0)
    // a deterministic-category manager over the same ensemble file keeps
    // only member-less fields — here there are none
    val det = new ForecastGribManager(spark, root + "_det")
    new java.io.File(det.inputDir).mkdirs()
    writeCycle(s"${det.inputDir}/ens_01.grb2", 1, base = 250.0,
      members = Seq(0, 1))
    val e = intercept[Exception] { det.run() }
    assert(e.getMessage != null)
  }

  test("precip-bucket files: a multi-window step refuses by name; " +
      "stepStart selects one bucket") {
    val root = Files.createTempDirectory("bkt_mgr").toString
    val mgr = new ForecastGribManager(spark, root)
    new java.io.File(mgr.inputDir).mkdirs()
    // one cycle carrying APCP-style accumulations over [0,12] and [6,12]:
    // same endStep, two windows — the store's (frt, step) key can't hold
    // both
    val out = new DataOutputStream(Files.newOutputStream(
      Paths.get(s"${mgr.inputDir}/bkt_01.grb2")))
    val refTime = java.time.LocalDateTime.of(2024, 3, 1, 0, 0)
    try {
      def vals(extra: Double) = (for (la <- lats; lo <- lons)
        yield 250.0 + (la - 10.0) * 20 + (lo - 100.0) * 20 + extra).toArray
      GribFormat.writeMessage2Fields(out, refTime, lats, lons,
        fields = Seq((167, 0, vals(0)), (167, 6, vals(7))),
        intervals = Seq(12, 6))
    } finally out.close()
    val e = intercept[IllegalArgumentException] { mgr.run() }
    assert(e.getMessage.contains("windows [0min, 360min]") &&
      e.getMessage.contains("stepStart"))
    // selecting the [6,12] bucket ingests exactly that window
    val sel = new ForecastGribManager(spark, root + "_sel",
      stepStart = Some(6 * 60L))
    new java.io.File(sel.inputDir).mkdirs()
    java.nio.file.Files.copy(Paths.get(s"${mgr.inputDir}/bkt_01.grb2"),
      Paths.get(s"${sel.inputDir}/bkt_01.grb2"))
    sel.run()
    val ds = sel.store.dataset()
    assert(ds.count() == 4)
    assert(ds.select("step").distinct().head().getLong(0) == 12 * 60L)
    assert(ds.filter(col("latitude") === 10.0 && col("longitude") === 100.0)
      .select("t2m").as[Double].head() == 257.0)
  }

  test("point+interval mixes select via PointProducts; a cube delivered " +
      "twice refuses as a duplicate") {
    val root = Files.createTempDirectory("pt_mgr").toString
    val mgr = new ForecastGribManager(spark, root)
    new java.io.File(mgr.inputDir).mkdirs()
    val refTime = java.time.LocalDateTime.of(2024, 3, 1, 0, 0)
    def vals(extra: Double) = (for (la <- lats; lo <- lons)
      yield 250.0 + (la - 10.0) * 20 + (lo - 100.0) * 20 + extra).toArray
    // an instantaneous field and a 12-h accumulation both valid at 12Z
    val out = new DataOutputStream(Files.newOutputStream(
      Paths.get(s"${mgr.inputDir}/mix_01.grb2")))
    try {
      GribFormat.writeMessage2Fields(out, refTime, lats, lons,
        fields = Seq((167, 12, vals(0))))
      GribFormat.writeMessage2Fields(out, refTime, lats, lons,
        fields = Seq((167, 0, vals(5))), intervals = Seq(12))
    } finally out.close()
    val e = intercept[IllegalArgumentException] { mgr.run() }
    assert(e.getMessage.contains("point"), e.getMessage)
    // PointProducts selects the instantaneous variant
    val pt = new ForecastGribManager(spark, root + "_pt",
      stepStart = Some(GribIngest.PointProducts))
    new java.io.File(pt.inputDir).mkdirs()
    java.nio.file.Files.copy(Paths.get(s"${mgr.inputDir}/mix_01.grb2"),
      Paths.get(s"${pt.inputDir}/mix_01.grb2"))
    pt.run()
    assert(pt.store.dataset().count() == 4)
    assert(pt.store.dataset()
      .filter(col("latitude") === 10.0 && col("longitude") === 100.0)
      .select("t2m").as[Double].head() == 250.0)
    // the SAME cube in two files is a collision, refused by name
    val dup = new ForecastGribManager(spark, root + "_dup")
    new java.io.File(dup.inputDir).mkdirs()
    val o2 = new DataOutputStream(Files.newOutputStream(
      Paths.get(s"${dup.inputDir}/a.grb2")))
    try GribFormat.writeMessage2Fields(o2, refTime, lats, lons,
      fields = Seq((167, 0, vals(0))))
    finally o2.close()
    java.nio.file.Files.copy(Paths.get(s"${dup.inputDir}/a.grb2"),
      Paths.get(s"${dup.inputDir}/b.grb2"))
    val e2 = intercept[IllegalArgumentException] { dup.run() }
    assert(e2.getMessage.contains("deduplicate the input"), e2.getMessage)
  }

  test("multi-level inputs: the level-less store key refuses the mix by " +
      "name; level selects one; off-param buckets never block the ingest") {
    val root = Files.createTempDirectory("lvl_mgr").toString
    val mgr = new ForecastGribManager(spark, root)
    new java.io.File(mgr.inputDir).mkdirs()
    val out = new DataOutputStream(Files.newOutputStream(
      Paths.get(s"${mgr.inputDir}/lvl_01.grb2")))
    val refTime = java.time.LocalDateTime.of(2024, 3, 1, 0, 0)
    try {
      def vals(extra: Double) = (for (la <- lats; lo <- lons)
        yield 250.0 + (la - 10.0) * 20 + (lo - 100.0) * 20 + extra).toArray
      // t2m at 2 m (103) and at the surface (1): two levels, one param —
      // plus an OFF-param precip-bucket pair that must not block t2m
      GribFormat.writeMessage2Fields(out, refTime, lats, lons,
        fields = Seq((167, 0, vals(0)), (167, 0, vals(9))),
        levels = Seq((103, 2L), (1, 0L)))
      GribFormat.writeMessage2Fields(out, refTime, lats, lons,
        fields = Seq((61, 0, vals(0)), (61, 6, vals(0))),
        intervals = Seq(12, 6))
    } finally out.close()
    val e = intercept[IllegalArgumentException] { mgr.run() }
    assert(e.getMessage.contains("hypercubes") &&
      e.getMessage.contains("level"), e.getMessage)
    // selecting the 2 m level ingests exactly that hypercube — the
    // off-param buckets stay invisible throughout
    val sel = new ForecastGribManager(spark, root + "_sel",
      level = Some((103, 2.0)))
    new java.io.File(sel.inputDir).mkdirs()
    java.nio.file.Files.copy(Paths.get(s"${mgr.inputDir}/lvl_01.grb2"),
      Paths.get(s"${sel.inputDir}/lvl_01.grb2"))
    sel.run()
    val ds = sel.store.dataset()
    assert(ds.count() == 4)
    assert(ds.filter(col("latitude") === 10.0 && col("longitude") === 100.0)
      .select("t2m").as[Double].head() == 250.0)
    // a level selection matching nothing refuses by name, never an
    // empty store
    val bad = new ForecastGribManager(spark, root + "_bad",
      level = Some((100, 85000.0)))
    new java.io.File(bad.inputDir).mkdirs()
    java.nio.file.Files.copy(Paths.get(s"${mgr.inputDir}/lvl_01.grb2"),
      Paths.get(s"${bad.inputDir}/lvl_01.grb2"))
    val e2 = intercept[IllegalArgumentException] { bad.run() }
    assert(e2.getMessage.contains("matches no message"), e2.getMessage)
  }

  test("derived-ensemble products (4.2): the deterministic manager never " +
      "blends mean and spread; derivedStat selects one hypercube") {
    val root = Files.createTempDirectory("drv_mgr").toString
    val mgr = new ForecastGribManager(spark, root)
    new java.io.File(mgr.inputDir).mkdirs()
    // one cycle whose file carries a deterministic field AND the GEFS
    // mean/spread pair for the same (frt, lead, param): three member-less
    // hypercubes that only the derived axis separates
    val out = new DataOutputStream(Files.newOutputStream(
      Paths.get(s"${mgr.inputDir}/mix_01.grb2")))
    val refTime = java.time.LocalDateTime.of(2024, 3, 1, 0, 0)
    try for (lead <- Seq(0, 6)) {
      def vals(extra: Double) = (for (la <- lats; lo <- lons)
        yield 250.0 + lead + (la - 10.0) * 20 + (lo - 100.0) * 20 + extra).toArray
      GribFormat.writeMessage2Fields(out, refTime, lats, lons,
        fields = Seq((167, lead, vals(0)), (167, lead, vals(3)),
          (167, lead, vals(6))),
        derivedStats = Seq(-1, 0, 2))
    } finally out.close()
    mgr.run()
    val ds = mgr.store.dataset()
    // only the NON-derived hypercube landed: 2 leads x 2x2 cells
    assert(ds.count() == 2 * 4)
    assert(ds.filter(col("step") === 360L && col("latitude") === 10.0 &&
      col("longitude") === 100.0).select("t2m").as[Double].head() == 256.0)
    // a mean-selecting manager over the same input lands the +3 cube
    val mean = new ForecastGribManager(spark, root + "_mean",
      derivedStat = Some(0))
    new java.io.File(mean.inputDir).mkdirs()
    java.nio.file.Files.copy(Paths.get(s"${mgr.inputDir}/mix_01.grb2"),
      Paths.get(s"${mean.inputDir}/mix_01.grb2"))
    mean.run()
    val dsMean = mean.store.dataset()
    assert(dsMean.count() == 2 * 4)
    assert(dsMean.filter(col("step") === 360L && col("latitude") === 10.0 &&
      col("longitude") === 100.0).select("t2m").as[Double].head() == 259.0)
    // derivedStat on the ensemble branch is refused by name
    val bad = intercept[IllegalArgumentException] {
      new ForecastGribManager(spark, root + "_bad", ensemble = true,
        derivedStat = Some(0))
    }
    assert(bad.getMessage.contains("derived"))
  }

  test("probability products (4.5, the NBM shape): a multi-threshold " +
      "file refuses by name; the probability knob selects one " +
      "threshold's hypercube") {
    val root = Files.createTempDirectory("prob_mgr").toString
    // plain deterministic manager over a PURE probability file: nothing
    // matches its (non-probability) category — the store stays empty via
    // the manager's own filters, and a probability-selecting manager is
    // the route in
    val out = new DataOutputStream(Files.newOutputStream(
      Paths.get(s"$root/pop_01.grb2")))
    val refTime = java.time.LocalDateTime.of(2024, 3, 1, 0, 0)
    try for (lead <- Seq(0, 6)) {
      def vals(extra: Double) = (for (la <- lats; lo <- lons)
        yield 250.0 + lead + (la - 10.0) * 20 + (lo - 100.0) * 20 + extra).toArray
      GribFormat.writeMessage2Fields(out, refTime, lats, lons,
        fields = Seq((167, lead, vals(0)), (167, lead, vals(50))),
        probs = Seq((3, 1L, Long.MinValue), (3, 5L, Long.MinValue)))
    } finally out.close()
    // selecting ONE threshold ingests exactly that hypercube
    val mgr = new ForecastGribManager(spark, root,
      probability = Some((3, 5.0, Double.NaN)))
    new java.io.File(mgr.inputDir).mkdirs()
    java.nio.file.Files.copy(Paths.get(s"$root/pop_01.grb2"),
      Paths.get(s"${mgr.inputDir}/pop_01.grb2"))
    mgr.run()
    val ds = mgr.store.dataset()
    assert(ds.count() == 2 * 4)
    assert(ds.filter(col("step") === 360L && col("latitude") === 10.0 &&
      col("longitude") === 100.0).select("t2m").as[Double].head() == 306.0)
    // a probability selection over BOTH thresholds cannot exist — a
    // wrong threshold refuses by name, listing what IS there
    val miss = new ForecastGribManager(spark, root + "_miss",
      probability = Some((3, 2.0, Double.NaN)))
    new java.io.File(miss.inputDir).mkdirs()
    java.nio.file.Files.copy(Paths.get(s"$root/pop_01.grb2"),
      Paths.get(s"${miss.inputDir}/pop_01.grb2"))
    val e = intercept[IllegalArgumentException] { miss.run() }
    assert(e.getMessage.contains("matches no message") &&
      e.getMessage.contains("prob(type 3, lo 1.0)") &&
      e.getMessage.contains("prob(type 3, lo 5.0)"),
      s"got: ${e.getMessage}")
  }
}
