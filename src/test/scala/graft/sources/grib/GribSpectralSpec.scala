package graft.sources.grib

import java.io.DataOutputStream
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** GRIB2 spectral fields (grid template 3.50 + DRS 5.50): coefficient
  * roundtrip through the `grib-spectral` scan, message-level pruning,
  * and the named refusals for everything outside the profile (5.51
  * complex spectral packing, pentagonal truncation, non-Legendre
  * representation, and cross-source misuse in both directions). */
class GribSpectralSpec extends SparkSpec {

  private def writeFixture(path: String,
      days: Seq[java.time.LocalDateTime], trunc: Int,
      coeffsOf: Int => Array[Double]): Unit = {
    val out = new DataOutputStream(Files.newOutputStream(Paths.get(path)))
    try days.zipWithIndex.foreach { case (d, i) =>
      GribFormat.writeSpectralMessage2(out, d, trunc,
        Seq((61, 0, coeffsOf(i))))
    } finally out.close()
  }

  /** Walk GRIB2 sections of the FIRST message and return the absolute
    * offset of the first section with the given number. */
  private def sectionOffset(bytes: Array[Byte], num: Int): Int = {
    var off = 16 // section 0 is fixed 16 bytes
    while (off < bytes.length - 4) {
      if (new String(bytes, off, 4, "US-ASCII") == "7777") fail(s"no section $num")
      val len = GribFormat.u32(bytes, off).toInt
      if ((bytes(off + 4) & 0xFF) == num) return off
      off += len
    }
    fail(s"no section $num")
  }

  test("coefficients round-trip: negative values, pair ordering, real00 path") {
    val tmp = Files.createTempDirectory("gribsp")
    val path = tmp.resolve("sp.grb2").toString
    val t0 = ts("2024-03-01T00:00:00")
    // M=2 → 6 pairs, 12 values; include negatives and a negative real00
    val coeffs = Array(-7.0, 0.0, 3.0, -1.0, 250.0, 2.0,
      -40.0, 4.0, 5.0, -5.0, 6.0, 60.0)
    writeFixture(path, Seq(t0), trunc = 2, _ => coeffs)
    val df = spark.read.format("grib-spectral").load(path)
      .orderBy("m", "n", "part")
    val rows = df.collect()
    assert(rows.length == 12)
    // m-major ordering: pairs (0,0),(0,1),(0,2),(1,1),(1,2),(2,2)
    val expectMN = Seq((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
    val byMN = rows.groupBy(r => (r.getAs[Int]("m"), r.getAs[Int]("n")))
    assert(byMN.keySet == expectMN.toSet)
    expectMN.zipWithIndex.foreach { case ((m, n), p) =>
      val re = byMN((m, n)).find(_.getAs[String]("part") == "re").get
        .getAs[Double]("value")
      val im = byMN((m, n)).find(_.getAs[String]("part") == "im").get
        .getAs[Double]("value")
      assert(re == coeffs(2 * p), s"re($m,$n)")
      assert(im == coeffs(2 * p + 1), s"im($m,$n)")
    }
  }

  test("time predicates prune whole messages at planning") {
    val tmp = Files.createTempDirectory("gribsp2")
    val path = tmp.resolve("sp.grb2").toString
    val days = (1 to 4).map(d => ts(f"2024-03-0${d}%dT00:00:00"))
    writeFixture(path, days, trunc = 1,
      i => Array(i.toDouble, 0.0, 1.0, 2.0, 3.0, 4.0))
    val df = spark.read.format("grib-spectral").load(path)
      .filter(col("time") >= ts("2024-03-03T00:00:00"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("messages=2/4"), s"expected message pruning in: $plan")
    assert(df.count() == 2 * 6)
  }

  test("DRS 5.51 is refused by name with the regrid workaround") {
    val tmp = Files.createTempDirectory("gribsp3")
    val path = tmp.resolve("sp.grb2").toString
    writeFixture(path, Seq(ts("2024-03-01T00:00:00")), trunc = 1,
      _ => Array(1.0, 0.0, 2.0, 3.0, 4.0, 5.0))
    val bytes = Files.readAllBytes(Paths.get(path))
    val s5 = sectionOffset(bytes, 5)
    // template number = section octets 10-11 → bytes s5+9, s5+10
    assert(bytes(s5 + 10) == 50)
    bytes(s5 + 10) = 51
    val bad = tmp.resolve("bad.grb2").toString
    Files.write(Paths.get(bad), bytes)
    val e = intercept[Throwable] {
      spark.read.format("grib-spectral").load(bad).count()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("5.51") && msgs.contains("regrid"), msgs)
  }

  test("pentagonal truncation and non-Legendre representation are refused by name") {
    val tmp = Files.createTempDirectory("gribsp4")
    val path = tmp.resolve("sp.grb2").toString
    writeFixture(path, Seq(ts("2024-03-01T00:00:00")), trunc = 1,
      _ => Array(1.0, 0.0, 2.0, 3.0, 4.0, 5.0))
    val bytes = Files.readAllBytes(Paths.get(path))
    val s3 = sectionOffset(bytes, 3)
    // template body: J at s3+14 (octets 15-18), K at s3+18, M at s3+22,
    // type at s3+26, mode at s3+27
    val pent = bytes.clone()
    pent(s3 + 21) = 2 // K = 2 while J = M = 1
    val pentPath = tmp.resolve("pent.grb2").toString
    Files.write(Paths.get(pentPath), pent)
    val e1 = intercept[Throwable] {
      spark.read.format("grib-spectral").load(pentPath).count()
    }
    val m1 = Iterator.iterate(e1)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(m1.contains("pentagonal") || m1.contains("triangular"), m1)

    val bivar = bytes.clone()
    bivar(s3 + 26) = 2 // representation type 2
    val bivarPath = tmp.resolve("type.grb2").toString
    Files.write(Paths.get(bivarPath), bivar)
    val e2 = intercept[Throwable] {
      spark.read.format("grib-spectral").load(bivarPath).count()
    }
    val m2 = Iterator.iterate(e2)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(m2.contains("representation type"), m2)
  }

  test("cross-source misuse is redirected by name in both directions") {
    val tmp = Files.createTempDirectory("gribsp5")
    val spPath = tmp.resolve("sp.grb2").toString
    writeFixture(spPath, Seq(ts("2024-03-01T00:00:00")), trunc = 1,
      _ => Array(1.0, 0.0, 2.0, 3.0, 4.0, 5.0))
    val e1 = intercept[Throwable] {
      spark.read.format("grib1").load(spPath).count()
    }
    assert(Iterator.iterate(e1)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("grib-spectral"))))

    val gridPath = tmp.resolve("grid.grb2").toString
    val out = new DataOutputStream(Files.newOutputStream(Paths.get(gridPath)))
    try GribFormat.writeMessage2Fields(out, ts("2024-03-01T00:00:00"),
      lats = Seq(0.0, 1.0), lons = Seq(0.0, 1.0),
      fields = Seq((61, 0, Array(1.0, 2.0, 3.0, 4.0))))
    finally out.close()
    val e2 = intercept[Throwable] {
      spark.read.format("grib-spectral").load(gridPath).count()
    }
    assert(Iterator.iterate(e2)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("grib1"))))
  }
}
