package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Spectral synthesis: closed-form checks for the low-degree harmonics,
  * and the strong self-consistency gate — a Gauss–Legendre ANALYSIS
  * (numerical projection) of the synthesized field recovers every input
  * coefficient to near machine precision, which no sign/normalization/
  * recurrence bug survives. */
class SpectralSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def coeffDf(entries: (Int, Int, String, Double)*) =
    entries.toSeq.map { case (m, n, p, v) => (1L, m, n, p, v) }
      .toDF("k", "m", "n", "part", "value")

  test("low-degree harmonics match their closed forms") {
    val lats = Seq(-60.0, -15.0, 0.0, 30.0, 75.0)
    val lons = Seq(0.0, 45.0, 120.0, 250.0)
    def field(cs: (Int, Int, String, Double)*): Map[(Double, Double), Double] =
      Spectral.synthesize(coeffDf(cs: _*), Seq("k"), lats, lons)
        .collect()
        .map(r => (r.getAs[Double]("latitude"), r.getAs[Double]("longitude")) ->
          r.getAs[Double]("value")).toMap
    // (0,0): constant
    field((0, 0, "re", 2.5)).values.foreach(v => assert(math.abs(v - 2.5) < 1e-12))
    // (0,1): sqrt(3)·sin(phi)
    val f01 = field((0, 1, "re", 1.0))
    for (la <- lats; lo <- lons)
      assert(math.abs(f01((la, lo)) -
        math.sqrt(3) * math.sin(math.toRadians(la))) < 1e-12)
    // (1,1) re: sqrt(3/2)·cos(phi)·cos(lambda); im: ... sin(lambda)
    val f11r = field((1, 1, "re", 1.0))
    val f11i = field((1, 1, "im", 1.0))
    for (la <- lats; lo <- lons) {
      val c = math.sqrt(1.5) * math.cos(math.toRadians(la))
      assert(math.abs(f11r((la, lo)) - c * math.cos(math.toRadians(lo))) < 1e-12)
      assert(math.abs(f11i((la, lo)) - c * math.sin(math.toRadians(lo))) < 1e-12)
    }
  }

  test("Gauss-Legendre analysis of the synthesized field recovers every coefficient") {
    val trunc = 10
    val gaussN = 16 // 32 parallels: exact for Legendre products up to degree 63
    val nLon = 32 // > 2T: exact Fourier orthogonality
    val rnd = new scala.util.Random(11)
    val entries = for {
      m <- 0 to trunc; n <- m to trunc
      part <- Seq("re", "im") if !(m == 0 && part == "im")
    } yield (m, n, part, math.rint(rnd.nextDouble() * 200 - 100) / 10.0)
    val lats = graft.sources.grib.GribFormat.gaussianLatitudes(gaussN).toSeq
    val lons = (0 until nLon).map(_ * 360.0 / nLon)
    val grid = Spectral.synthesize(coeffDf(entries: _*), Seq("k"), lats, lons)
      .collect()
      .map(r => (r.getAs[Double]("latitude"), r.getAs[Double]("longitude")) ->
        r.getAs[Double]("value")).toMap

    // Gauss-Legendre weights on x = sin(phi): w = 2 / ((1-x^2) P'_{2N}(x)^2)
    val m2 = 2 * gaussN
    def weight(x: Double): Double = {
      var p0 = 1.0; var p1 = x
      var k = 2
      while (k <= m2) {
        val p2 = ((2 * k - 1) * x * p1 - (k - 1) * p0) / k
        p0 = p1; p1 = p2; k += 1
      }
      val dp = m2 * (x * p1 - p0) / (x * x - 1.0)
      2.0 / ((1.0 - x * x) * dp * dp)
    }
    val xw = lats.map { la =>
      val x = math.sin(math.toRadians(la)); (la, x, weight(x))
    }
    // project back: c_nm = (2 - d_m0)/(4*pi) * Int f * Pnm * trig dOmega
    entries.foreach { case (m, n, part, expect) =>
      var acc = 0.0
      xw.foreach { case (la, x, w) =>
        val p = Spectral.legendreTable(trunc, x)(
          m * (2 * trunc + 3 - m) / 2 + (n - m))
        lons.foreach { lo =>
          val lam = math.toRadians(lo)
          val trig = if (part == "re") math.cos(m * lam) else math.sin(m * lam)
          acc += w * (2 * math.Pi / nLon) * grid((la, lo)) * p * trig
        }
      }
      val got = acc * (if (m == 0) 1.0 else 2.0) / (4 * math.Pi)
      assert(math.abs(got - expect) < 1e-9,
        s"analysis of ($m,$n,$part): $got vs $expect")
    }
  }

  test("synthesis scales over keys without shuffling grid rows") {
    val df = Seq((1L, 0, 0, "re", 1.0), (2L, 0, 0, "re", 5.0))
      .toDF("k", "m", "n", "part", "value")
    val out = Spectral.synthesize(df, Seq("k"), Seq(0.0, 45.0), Seq(0.0, 180.0))
    val plan = out.queryExecution.executedPlan.toString
    // one aggregate exchange for the coefficient reshape; grid rows are
    // emitted from mapPartitions and never shuffle
    assert(plan.split("Exchange").length - 1 <= 2, plan)
    val vals = out.collect().map(r =>
      r.getAs[Long]("k") -> r.getAs[Double]("value")).toMap
    assert(vals(1L) == 1.0 && vals(2L) == 5.0)
  }

  test("duplicate (m,n,part) rows under one key are refused by name, " +
      "never summed (ADVICE r8)") {
    // two fields (e.g. two params) mistakenly grouped under one key: the
    // pre-fix accumulator summed 1.0 + 5.0 into one garbage coefficient
    val df = Seq((1L, 0, 0, "re", 1.0), (1L, 0, 0, "re", 5.0))
      .toDF("k", "m", "n", "part", "value")
    val e = intercept[org.apache.spark.SparkException] {
      Spectral.synthesize(df, Seq("k"), Seq(0.0), Seq(0.0)).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("duplicate spectral coefficient"), msgs)
    assert(msgs.contains("param"), msgs) // the fix hint names the columns
  }

  test("synthesizeVars: two params from one scan land as two variables, " +
      "values matching the single-param synthesis") {
    // param 61 is a pure (0,0) field of 2.0; param 62 a pure (0,1) field
    // of 3.0 (closed form √3·3·sinφ); a third param 99 must be excluded
    val df = Seq(
      (1L, 61, 0, 0, "re", 2.0),
      (1L, 62, 0, 1, "re", 3.0),
      (1L, 99, 0, 0, "re", 777.0))
      .toDF("k", "param", "m", "n", "part", "value")
    val out = Spectral.synthesizeVars(df, Seq("k"), Map(61 -> "t", 62 -> "u"),
      Seq(0.0, 90.0), Seq(0.0))
    assert(out.columns.toSeq == Seq("k", "latitude", "longitude", "t", "u"))
    val rows = out.collect().map(r =>
      r.getAs[Double]("latitude") ->
        (r.getAs[Double]("t"), r.getAs[Double]("u"))).toMap
    assert(rows(0.0)._1 == 2.0 && math.abs(rows(0.0)._2) < 1e-12)
    assert(rows(90.0)._1 == 2.0 &&
      math.abs(rows(90.0)._2 - math.sqrt(3) * 3.0) < 1e-12)
    // a param with no coefficients under a key surfaces as null, not 0
    val partial = Seq((1L, 61, 0, 0, "re", 2.0))
      .toDF("k", "param", "m", "n", "part", "value")
    val p = Spectral.synthesizeVars(partial, Seq("k"),
      Map(61 -> "t", 62 -> "u"), Seq(0.0), Seq(0.0)).head()
    assert(p.getAs[Double]("t") == 2.0 && p.isNullAt(p.fieldIndex("u")))
  }
}
