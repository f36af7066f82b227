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

  test("malformed spectral DRS fails named: short 5.51 body, unknown 5.52") {
    val tmp = Files.createTempDirectory("gribsp3")
    val path = tmp.resolve("sp.grb2").toString
    writeFixture(path, Seq(ts("2024-03-01T00:00:00")), trunc = 1,
      _ => Array(1.0, 0.0, 2.0, 3.0, 4.0, 5.0))
    val bytes = Files.readAllBytes(Paths.get(path))
    val s5 = sectionOffset(bytes, 5)
    // template number = section octets 10-11 → bytes s5+9, s5+10
    assert(bytes(s5 + 10) == 50)
    def failMsg(tmpl: Byte): String = {
      val b = bytes.clone(); b(s5 + 10) = tmpl
      val bad = tmp.resolve(s"bad$tmpl.grb2").toString
      Files.write(Paths.get(bad), b)
      val e = intercept[Throwable] {
        spark.read.format("grib-spectral").load(bad).count()
      }
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    }
    // a 5.50-sized section relabeled 5.51 is TOO SHORT for 5.51's body —
    // refused with the octet count named, never misparsed
    assert(failMsg(51).contains("36 needed"), failMsg(51))
    // unknown spectral template refused by name
    assert(failMsg(52).contains("unsupported"), failMsg(52))
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

  test("5.51 complex packing: subset exact, Laplacian remainder within quantization") {
    val tmp = Files.createTempDirectory("gribsp51")
    val path = tmp.resolve("cx.grb2").toString
    val t0 = ts("2024-03-01T00:00:00")
    // M=3, sub-truncation 1: pairs (0,0),(0,1),(1,1) travel IEEE32; the
    // other 7 pairs are premultiplied by (n(n+1))^0.5 (irrational — the
    // general case) with decimal scale 3
    val coeffs = Array(
      250.5, 0.0, -3.25, 1.5, 7.0, -2.0, 0.125, 4.0, // (0,0) (0,1) (0,2) (0,3)
      -40.0, 5.5, 6.25, -6.0, 1.0, 2.0, // (1,1) (1,2) (1,3)
      3.5, -0.75, 0.5, 9.0, // (2,2) (2,3)
      -1.125, 11.0) // (3,3)
    val out = new DataOutputStream(Files.newOutputStream(Paths.get(path)))
    try GribFormat.writeSpectralMessage2(out, t0, trunc = 3,
      Seq((61, 0, coeffs)), decimalScale = 3, complexSub = Some((0.5, 1)))
    finally out.close()
    val rows = spark.read.format("grib-spectral").load(path)
      .orderBy("m", "n", "part").collect()
    assert(rows.length == 20)
    val grid = GribFormat.SpectralGrid(3, GribFormat.SpectralComplex(0.5, 1, 4))
    // reader emits ordered by (m, n, part) with part im < re; rebuild the
    // m-major value order to compare
    val got = rows.map(r => ((r.getAs[Int]("m"), r.getAs[Int]("n"),
      r.getAs[String]("part")), r.getAs[Double]("value"))).toMap
    grid.pairMN.zipWithIndex.foreach { case ((m, n), p) =>
      val re = got((m, n, "re")); val im = got((m, n, "im"))
      if (grid.inSubset(p, 1)) {
        assert(re == coeffs(2 * p).toFloat.toDouble, s"subset re($m,$n)")
        assert(im == coeffs(2 * p + 1).toFloat.toDouble, s"subset im($m,$n)")
      } else {
        // quantization bound: half a decimal step, divided by the
        // Laplacian premultiplier
        val tol = 0.5e-3 / math.sqrt(n.toDouble * (n + 1)) + 1e-9
        assert(math.abs(re - coeffs(2 * p)) <= tol, s"re($m,$n): $re")
        assert(math.abs(im - coeffs(2 * p + 1)) <= tol, s"im($m,$n): $im")
      }
    }
  }

  test("5.51 refuses pentagonal sub-truncation, bad Ts, and exotic precision by name") {
    val tmp = Files.createTempDirectory("gribsp51r")
    val path = tmp.resolve("cx.grb2").toString
    val out = new DataOutputStream(Files.newOutputStream(Paths.get(path)))
    try GribFormat.writeSpectralMessage2(out, ts("2024-03-01T00:00:00"),
      trunc = 2, Seq((61, 0, Array.tabulate(12)(_.toDouble))),
      complexSub = Some((1.0, 1)))
    finally out.close()
    val bytes = Files.readAllBytes(Paths.get(path))
    val s5 = sectionOffset(bytes, 5)
    // 5.51 body: octets 22-25 P, 26-27 Js, 28-29 Ks, 30-31 Ms, 32-35 Ts,
    // 36 precision → Ks low byte at s5+28, Ts low byte at s5+34, prec s5+35
    def patched(off: Int, v: Byte): String = {
      val b = bytes.clone(); b(off) = v
      val p2 = tmp.resolve(s"p$off.grb2").toString
      Files.write(Paths.get(p2), b); p2
    }
    def failMsg(p: String): String = {
      val e = intercept[Throwable] {
        spark.read.format("grib-spectral").load(p).count()
      }
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    }
    assert(failMsg(patched(s5 + 28, 2)).contains("pentagonal"))
    assert(failMsg(patched(s5 + 34, 9)).contains("Ts"))
    assert(failMsg(patched(s5 + 35, 3)).contains("precision"))
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
