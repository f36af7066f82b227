package graft.sources.grib

import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** GRIB2 template 5.40 — JPEG 2000 (lossless Part-1) packing. Codec-level
  * roundtrips sweep geometry (1×N and N×1 strips, odd dims, multi-code-block
  * grids), precision and data texture; ScalaCheck drives arbitrary images;
  * out-of-profile codestreams (9/7 irreversible, code-block styles, POC,
  * signed components) are refused by name; writer→scan roundtrips gate the
  * GRIB integration incl. bitmaps, decimals and constant fields. */
class Grib2JpegSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def texture(i: Int, w: Int, nbits: Int, shape: Int): Long = {
    val xmax = (1L << nbits) - 1
    shape match {
      case 0 => 0L // all-zero → every code block excluded
      case 1 => xmax // constant max → one bit-plane everywhere
      case 2 => (i.toLong * 3) % (xmax + 1) // gentle ramp → small high bands
      case 3 => // white noise → every pass carries data
        val h = (i * 2654435761L) ^ (i << 9)
        java.lang.Long.remainderUnsigned(h, xmax + 1)
      case 4 => if (i % 53 == 0) xmax else 0L // sparse spikes → run-length mode
      case 5 => // smooth 2-D field (the realistic GRIB texture)
        val x = i % w; val y = i / w
        val v = (math.sin(x * 0.21) + math.cos(y * 0.17) + 2.0) / 4.0
        math.min(xmax, (v * xmax).toLong)
    }
  }

  test("codec roundtrip across geometry, precision and texture") {
    for {
      (w, h) <- Seq((1, 1), (4, 1), (1, 9), (7, 5), (10, 1), (64, 64),
        (65, 63), (130, 3), (3, 130), (200, 40))
      nbits <- Seq(1, 2, 8, 12, 16, 25)
      shape <- 0 to 5
    } {
      val xs = Array.tabulate(w * h)(i => texture(i, w, nbits, shape))
      val enc = Jpeg2000.encode(w, h, nbits, xs)
      val (gw, gh, dec) = Jpeg2000.decode(enc)
      assert(gw == w && gh == h, s"geometry $gw x $gh for $w x $h")
      assert(dec.sameElements(xs),
        s"roundtrip w=$w h=$h nbits=$nbits shape=$shape: first diff at " +
          s"${dec.indices.find(i => dec(i) != xs(i))}")
    }
  }

  test("property: arbitrary images roundtrip bit-exact") {
    import org.scalacheck.{Gen, Prop}
    val gen = for {
      w <- Gen.choose(1, 90)
      h <- Gen.choose(1, 90)
      nbits <- Gen.choose(1, 24)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield (w, h, nbits, seed)
    val prop = Prop.forAll(gen) { case (w, h, nbits, seed) =>
      val xmax = (1L << nbits) - 1
      val rnd = new scala.util.Random(seed)
      // mixed texture: flat runs, ramps, noise — exercises run-length
      // cleanup, refinement and significance-propagation paths
      val xs = Array.tabulate(w * h) { i =>
        rnd.nextInt(4) match {
          case 0 => 0L
          case 1 => xmax
          case 2 => (i.toLong * (1 + (seed & 15))) % (xmax + 1)
          case _ => (rnd.nextLong() & Long.MaxValue) % (xmax + 1)
        }
      }
      val (gw, gh, dec) = Jpeg2000.decode(Jpeg2000.encode(w, h, nbits, xs))
      gw == w && gh == h && dec.sameElements(xs)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(120), prop)
    assert(res.passed, res.status.toString)
  }

  private def patchAfterMarker(cs: Array[Byte], marker: Int, offset: Int,
      value: Int): Array[Byte] = {
    val out = cs.clone()
    val at = out.indices.dropRight(1).find(i =>
      (out(i) & 0xFF) == 0xFF && (out(i + 1) & 0xFF) == (marker & 0xFF)).get
    out(at + offset) = value.toByte
    out
  }

  test("multi-layer, RLCP and SOP/EPH codestreams decode (foreign-encoder shapes)") {
    // rate-controlled encoders spread inclusion across layers and bracket
    // packets with SOP/EPH — exercise the decoder's layer loop, the
    // incremental tag-tree thresholds and both packet orderings
    for {
      (w, h) <- Seq((7, 5), (65, 63), (90, 1))
      layers <- Seq(1, 2, 4)
      prog <- Seq(0, 1)
      sopEph <- Seq(false, true)
    } {
      val xs = Array.tabulate(w * h)(i => texture(i, w, 10, (i + layers) % 6))
      val enc = Jpeg2000.encode(w, h, 10, xs, layers, prog, sopEph)
      val (gw, gh, dec) = Jpeg2000.decode(enc)
      assert(gw == w && gh == h && dec.sameElements(xs),
        s"w=$w h=$h layers=$layers prog=$prog sopEph=$sopEph")
    }
  }

  test("out-of-profile codestreams are refused by name") {
    val xs = Array.tabulate(48)(i => (i % 17).toLong)
    val cs = Jpeg2000.encode(8, 6, 6, xs)
    // COD body: marker(2) len(2) Scod(1) prog(1) layers(2) mct(1) nl(1)
    // xcb(1) ycb(1) style(1) transform(1) → transform at +13, style at +12
    val irrev = intercept[IllegalArgumentException] {
      Jpeg2000.decode(patchAfterMarker(cs, 0x52, 13, 0))
    }
    assert(irrev.getMessage.contains("9/7"), irrev.getMessage)
    val style = intercept[IllegalArgumentException] {
      Jpeg2000.decode(patchAfterMarker(cs, 0x52, 12, 0x01))
    }
    assert(style.getMessage.contains("bypass"), style.getMessage)
    // SIZ Ssiz (component precision/sign) sits at +40 in the marker segment
    val signed = intercept[IllegalArgumentException] {
      Jpeg2000.decode(patchAfterMarker(cs, 0x51, 40, 0x85))
    }
    assert(signed.getMessage.contains("signed"), signed.getMessage)
    val notJ2k = intercept[IllegalArgumentException] {
      Jpeg2000.decode(Array[Byte](1, 2, 3, 4, 5))
    }
    assert(notJ2k.getMessage.contains("SOC"), notJ2k.getMessage)
  }

  test("ERA5-sized grid (1440 x 721, 16-bit) roundtrips; decode stays sub-second") {
    val w = 1440; val h = 721
    val xs = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      // smooth synthetic geophysical field + quantization noise
      val v = (math.sin(x * 0.013) * math.cos(y * 0.017) + 1.5) / 3.0
      ((v * 60000).toLong + (i * 2654435761L & 15)) & 0xFFFF
    }
    val enc = Jpeg2000.encode(w, h, 16, xs)
    val t0 = System.nanoTime()
    val (gw, gh, dec) = Jpeg2000.decode(enc)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(gw == w && gh == h && dec.sameElements(xs))
    info(f"1M-cell decode: $ms%.0f ms, ${enc.length / 1024} KiB codestream " +
      f"(${w * h * 2.0 / enc.length}%.1f x vs raw 16-bit)")
    // one message per task at scan time: a multi-second decode would
    // dominate the scan's cost model, so pin an upper bound with margin
    assert(ms < 10000, f"decode took $ms%.0f ms")
  }

  test("hostile SIZ dimensions are refused before allocation") {
    val xs = Array.tabulate(48)(i => (i % 17).toLong)
    val cs = Jpeg2000.encode(8, 6, 6, xs)
    // SIZ Xsiz sits at +6 in the marker segment body (after Lsiz+Rsiz);
    // claim a ~2-gigacell raster from this 100-byte stream
    val huge = patchAfterMarker(cs, 0x51, 6, 0x7F)
    val e1 = intercept[IllegalArgumentException] { Jpeg2000.decode(huge) }
    assert(e1.getMessage.contains("implausible") || e1.getMessage.contains("out of range"),
      e1.getMessage)
    // with a caller expectation the refusal still lands pre-allocation
    // (whichever guard fires first names the problem)
    val e2 = intercept[IllegalArgumentException] {
      Jpeg2000.decode(huge, expectedCells = 48L)
    }
    assert(e2.getMessage.contains("48") || e2.getMessage.contains("out of range"),
      e2.getMessage)
    // a mismatch below the absolute cap is caught by the expectation itself
    val e3 = intercept[IllegalArgumentException] {
      Jpeg2000.decode(cs, expectedCells = 47L)
    }
    assert(e3.getMessage.contains("47"), e3.getMessage)
    // and the true expectation still decodes
    val (w, h, dec) = Jpeg2000.decode(cs, expectedCells = 48L)
    assert(w == 8 && h == 6 && dec.sameElements(xs))
  }

  test("hostile codestreams fail fast — truncation and corruption never hang") {
    val xs = Array.tabulate(40 * 30)(i => texture(i, 40, 12, i % 6))
    val cs = Jpeg2000.encode(40, 30, 12, xs)
    // every truncation point: the NAMED parse diagnostic or (for tail
    // truncation inside padded MQ data) a successful decode — never a
    // hang, never a raw index error (the documented contract)
    (0 until cs.length by 7).foreach { cut =>
      try Jpeg2000.decode(java.util.Arrays.copyOf(cs, cut))
      catch { case e: IllegalArgumentException => () }
    }
    // single-byte corruption sweep past the SIZ segment (dimension bytes
    // are require-guarded; corrupting them would just test the allocator)
    val rnd = new scala.util.Random(7)
    (0 until 400).foreach { _ =>
      val bad = cs.clone()
      bad(45 + rnd.nextInt(bad.length - 45)) = rnd.nextInt(256).toByte
      try Jpeg2000.decode(bad)
      catch { case e: IllegalArgumentException => () }
    }
  }

  test("writer → parser → scan roundtrip: negatives, decimals, bitmap holes") {
    val dir = Files.createTempDirectory("grib2jpeg").toString
    val vals = Array(1.25, -3.5, Double.NaN, 10.0, 0.0, 99.75, -0.25, 7.5,
      Double.NaN, 2.0)
    GribFormat.writeFile(spark, s"$dir/j.grb2", Seq(
      (61, LocalDateTime.of(2024, 3, 1, 0, 0), Seq(-45.5, -45.0),
        Seq(10.0, 10.5, 11.0, 11.5, 12.0), vals)),
      decimalScale = 2, edition = 2, jpegPacking = true)
    val df = spark.read.format("grib1").load(s"$dir/j.grb2")
      .orderBy("latitude", "longitude")
    val got = df.select("value").as[java.lang.Double].collect()
    assert(got.length == 10)
    vals.zip(got).foreach { case (e, g) =>
      if (e.isNaN) assert(g == null) else assert(g == e, s"$e vs $g")
    }
  }

  test("multi-code-block grid (wider than 64) survives the scan bit-exact") {
    val dir = Files.createTempDirectory("grib2jpeg_big").toString
    val lats = (0 until 70).map(j => -10.0 + j * 0.25)
    val lons = (0 until 150).map(i => 40.0 + i * 0.1)
    val vals = Array.tabulate(70 * 150)(i => ((i * 37) % 4001).toDouble / 4.0)
    GribFormat.writeFile(spark, s"$dir/big.grb2", Seq(
      (7, LocalDateTime.of(2024, 6, 1, 12, 0), lats, lons, vals)),
      decimalScale = 2, edition = 2, jpegPacking = true)
    val got = spark.read.format("grib1").load(s"$dir/big.grb2")
      .orderBy(col("latitude"), col("longitude"))
      .select("value").as[Double].collect()
    assert(got.toSeq == vals.toSeq)
  }

  test("constant field (zero bits per value) scans without a codestream") {
    val dir = Files.createTempDirectory("grib2jpeg_const").toString
    GribFormat.writeFile(spark, s"$dir/c.grb2", Seq(
      (61, LocalDateTime.of(2024, 3, 1, 0, 0), Seq(0.0, 1.0), Seq(0.0, 1.0),
        Array(5.5, 5.5, 5.5, 5.5))),
      decimalScale = 1, edition = 2, jpegPacking = true)
    val got = spark.read.format("grib1").load(s"$dir/c.grb2")
      .select("value").as[Double].collect()
    assert(got.toSeq == Seq(5.5, 5.5, 5.5, 5.5))
  }
}
