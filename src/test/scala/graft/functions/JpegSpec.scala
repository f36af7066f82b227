package graft.functions

import graft.SparkSpec

/** Baseline JPEG codec: near-lossless roundtrips under all-ones
  * quantization (grayscale + 4:4:4 color), non-multiple-of-8 geometry,
  * marker-segment skipping, restart intervals... and the named refusals
  * (progressive, non-baseline SOFs, non-JPEG magic, truncation). */
class JpegSpec extends SparkSpec {

  private def gray(w: Int, h: Int)(f: Int => Int): Array[Int] =
    Array.tabulate(w * h)(i => f(i) & 0xFF)

  test("grayscale roundtrip within DCT rounding (±2) across geometries") {
    for ((w, h) <- Seq((8, 8), (16, 8), (13, 7), (1, 1), (33, 9))) {
      val px = gray(w, h)(i => (i * 37 + 11) % 256)
      val dec = Jpeg.decode(Jpeg.encode(w, h, px))
      assert(dec.width == w && dec.height == h && dec.components == 1)
      px.zip(dec.pixels).zipWithIndex.foreach { case ((e, g), i) =>
        assert(math.abs(e - g) <= 2, s"${w}x$h pixel $i: $e vs $g")
      }
    }
  }

  test("4:4:4 color roundtrip within combined DCT + YCbCr rounding") {
    val w = 16; val h = 12
    val px = Array.tabulate(w * h) { i =>
      (((i * 23) % 256) << 16) | (((i * 57 + 10) % 256) << 8) | ((i * 91 + 3) % 256)
    }
    val dec = Jpeg.decode(Jpeg.encode(w, h, px, color = true))
    assert(dec.components == 3)
    px.zip(dec.pixels).zipWithIndex.foreach { case ((e, g), i) =>
      for (shift <- Seq(16, 8, 0)) {
        val a = (e >> shift) & 0xFF; val b = (g >> shift) & 0xFF
        // YCbCr forward+inverse rounding adds ~±2 on top of DCT's ±2
        assert(math.abs(a - b) <= 4, s"pixel $i shift $shift: $a vs $b")
      }
    }
  }

  test("APPn/COM segments are skipped; smooth images compress well") {
    val w = 32; val h = 32
    val px = gray(w, h)(i => 100 + (i % w) / 4)
    val enc = Jpeg.encode(w, h, px)
    // splice a JFIF APP0 and a COM segment after SOI
    val app0 = Array[Byte](0xFF.toByte, 0xE0.toByte, 0, 16,
      'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    val com = Array[Byte](0xFF.toByte, 0xFE.toByte, 0, 7) ++ "hello".getBytes
    val spliced = enc.take(2) ++ app0 ++ com ++ enc.drop(2)
    val dec = Jpeg.decode(spliced)
    px.zip(dec.pixels).foreach { case (e, g) => assert(math.abs(e - g) <= 2) }
    assert(enc.length < w * h, s"smooth gradient should beat raw: ${enc.length}")
  }

  test("out-of-profile and corrupt inputs are refused by name") {
    val px = gray(8, 8)(identity)
    val enc = Jpeg.encode(8, 8, px)
    // SOF0 byte flipped to SOF2: now routes to the progressive path,
    // where a baseline-shaped full-band DC scan is malformed — named
    val prog = enc.clone()
    val sof = prog.indices.find(i => (prog(i) & 0xFF) == 0xFF &&
      (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sof + 1) = 0xC2.toByte
    val e1 = intercept[IllegalArgumentException] { Jpeg.decode(prog) }
    assert(e1.getMessage.contains("progressive"), e1.getMessage)
    // lossless SOF3
    val sl = enc.clone(); sl(sof + 1) = 0xC3.toByte
    val e2 = intercept[IllegalArgumentException] { Jpeg.decode(sl) }
    assert(e2.getMessage.contains("SOF"), e2.getMessage)
    // not a JPEG
    val e3 = intercept[IllegalArgumentException] {
      Jpeg.decode("GIF89a....".getBytes)
    }
    assert(e3.getMessage.contains("gif"), e3.getMessage)
    // truncation sweep: named diagnostic or clean refusal, never raw errors
    (2 until enc.length by 5).foreach { cut =>
      try Jpeg.decode(java.util.Arrays.copyOf(enc, cut))
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("4:2:0 subsampled MCUs decode: luma tight, chroma within box-mean loss") {
    val w = 20; val h = 18 // forces partial MCUs on both axes
    // chroma varies SLOWLY (so 2x2 box averaging loses little) while luma
    // carries the detail — the shape real 4:2:0 assumes
    val px = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val r = (80 + x * 4 + y) & 0xFF
      val g = (90 + x / 4 * 8) & 0xFF
      val b = (70 + y / 4 * 8) & 0xFF
      (r << 16) | (g << 8) | b
    }
    val dec = Jpeg.decode(Jpeg.encode(w, h, px, color = true, subsample420 = true))
    assert(dec.width == w && dec.height == h)
    // luma accuracy: compare Y of original vs decoded
    def lum(p: Int) = 0.299 * ((p >> 16) & 0xFF) + 0.587 * ((p >> 8) & 0xFF) +
      0.114 * (p & 0xFF)
    px.zip(dec.pixels).zipWithIndex.foreach { case ((e, g), i) =>
      assert(math.abs(lum(e) - lum(g)) <= 6, s"pixel $i: ${lum(e)} vs ${lum(g)}")
      for (shift <- Seq(16, 8, 0)) {
        val a = (e >> shift) & 0xFF; val b2 = (g >> shift) & 0xFF
        assert(math.abs(a - b2) <= 24, s"pixel $i shift $shift: $a vs $b2")
      }
    }
  }

  test("restart intervals reset DC prediction and re-sync the decoder") {
    val w = 40; val h = 8 // 5 MCUs in a row
    val px = gray(w, h)(i => (i * 53 + 7) % 256)
    val dec = Jpeg.decode(Jpeg.encode(w, h, px, restartInterval = 2))
    px.zip(dec.pixels).zipWithIndex.foreach { case ((e, g), i) =>
      assert(math.abs(e - g) <= 2, s"pixel $i: $e vs $g")
    }
  }

  // ------------------------------------------------- progressive (SOF2)

  test("progressive grayscale roundtrip within DCT rounding across geometries") {
    for ((w, h) <- Seq((8, 8), (16, 8), (13, 7), (1, 1), (33, 9), (64, 48))) {
      val px = gray(w, h)(i => (i * 37 + 11) % 256)
      val dec = Jpeg.decode(Jpeg.encodeProgressive(w, h, px))
      assert(dec.width == w && dec.height == h && dec.components == 1)
      px.zip(dec.pixels).zipWithIndex.foreach { case ((e, g), i) =>
        assert(math.abs(e - g) <= 2, s"${w}x$h pixel $i: $e vs $g")
      }
    }
  }

  test("progressive decode is BIT-IDENTICAL to baseline: successive " +
      "approximation reassembles every coefficient exactly") {
    // both encoders produce the same all-ones-quant DCT coefficients;
    // progressive splits them across DC/AC first + refinement scans —
    // any slip in EOB runs, correction bits or bit-plane order breaks
    // the exact equality
    for ((w, h) <- Seq((16, 16), (24, 17), (48, 31))) {
      val px = gray(w, h)(i => (i * 151 + 17) % 256) // rough texture
      val base = Jpeg.decode(Jpeg.encode(w, h, px)).pixels
      val prog = Jpeg.decode(Jpeg.encodeProgressive(w, h, px)).pixels
      assert(prog.sameElements(base), s"${w}x$h: progressive != baseline")
    }
  }

  test("progressive 4:4:4 color matches baseline exactly; roundtrip in bound") {
    val w = 16; val h = 12
    val px = Array.tabulate(w * h) { i =>
      (((i * 23) % 256) << 16) | (((i * 57 + 10) % 256) << 8) | ((i * 91 + 3) % 256)
    }
    val base = Jpeg.decode(Jpeg.encode(w, h, px, color = true))
    val prog = Jpeg.decode(Jpeg.encodeProgressive(w, h, px, color = true))
    assert(prog.components == 3)
    assert(prog.pixels.sameElements(base.pixels))
  }

  test("sparse image: cross-block EOB runs (EOBn, n > 0) decode exactly") {
    // a nearly-flat 8x8-block grid leaves most AC bands empty, so the
    // encoder accumulates multi-block EOB runs — the decoder paths the
    // dense tests never reach
    val w = 64; val h = 64
    val px = Array.fill(w * h)(128)
    px(5 * w + 7) = 255; px(40 * w + 50) = 0; px(63 * w + 63) = 200
    val base = Jpeg.decode(Jpeg.encode(w, h, px)).pixels
    val prog = Jpeg.decode(Jpeg.encodeProgressive(w, h, px)).pixels
    assert(prog.sameElements(base))
    // fully-constant image: ONE EOB run covers every block of each scan
    val flat = Array.fill(w * h)(77)
    val decFlat = Jpeg.decode(Jpeg.encodeProgressive(w, h, flat)).pixels
    decFlat.foreach(v => assert(math.abs(v - 77) <= 2))
  }

  test("progressive 4:2:0: interleaved DC over sampled MCUs + " +
      "non-interleaved AC over the TRUE block grid") {
    // 24x20 at 4:2:0: luma padded grid (4x4 blocks of 2x2-per-MCU) is
    // WIDER than its true grid (3x3) — the AC scans cover only the true
    // raster while DC covers the padded MCU walk; a stride slip between
    // the two grids scrambles blocks
    val w = 24; val h = 20
    val px = Array.tabulate(w * h) { i =>
      (((i * 23) % 256) << 16) | (((i * 57 + 10) % 256) << 8) | ((i * 91 + 3) % 256)
    }
    val base = Jpeg.decode(Jpeg.encode(w, h, px, color = true, subsample420 = true))
    val prog = Jpeg.decode(Jpeg.encodeProgressive(w, h, px, color = true,
      subsample420 = true))
    assert(prog.width == w && prog.height == h && prog.components == 3)
    // identical coefficients through both encoders -> identical pixels;
    // the baseline 4:2:0 test already bounds quality vs the source, so
    // bit-equality here transfers that bound to the progressive path
    assert(prog.pixels.sameElements(base.pixels))
  }

  test("progressive refusals stay named: arithmetic, 12-bit, truncation") {
    val px = gray(16, 16)(i => (i * 37) % 256)
    val enc = Jpeg.encodeProgressive(16, 16, px)
    val sof = enc.indices.find(i => (enc(i) & 0xFF) == 0xFF &&
      (enc(i + 1) & 0xFF) == 0xC2).get
    // SOF10 = progressive ARITHMETIC — refused by name
    val ar = enc.clone(); ar(sof + 1) = 0xCA.toByte
    val e1 = intercept[IllegalArgumentException] { Jpeg.decode(ar) }
    assert(e1.getMessage.contains("SOF"), e1.getMessage)
    // 12-bit precision (SOF2 precision octet)
    val p12 = enc.clone(); p12(sof + 4) = 12
    val e2 = intercept[IllegalArgumentException] { Jpeg.decode(p12) }
    assert(e2.getMessage.contains("12-bit"), e2.getMessage)
    // truncation sweep: named refusal or clean failure, never raw errors
    (2 until enc.length by 7).foreach { cut =>
      try Jpeg.decode(java.util.Arrays.copyOf(enc, cut))
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("hostile SOF dimensions and out-of-profile ids are refused before allocation") {
    val enc = Jpeg.encode(8, 8, gray(8, 8)(identity))
    val sof = enc.indices.find(i => (enc(i) & 0xFF) == 0xFF &&
      (enc(i + 1) & 0xFF) == 0xC0).get
    // height/width at sof+5..8: claim 46000 x 46000 from a 100-byte stream
    val huge = enc.clone()
    huge(sof + 5) = 0xB3.toByte; huge(sof + 6) = 0xB0.toByte // 45996
    huge(sof + 7) = 0xB3.toByte; huge(sof + 8) = 0xB0.toByte
    val e1 = intercept[IllegalArgumentException] { Jpeg.decode(huge) }
    assert(e1.getMessage.contains("implausible"), e1.getMessage)
    // grayscale with 2x2 sampling factors: refused, never scrambled
    val gs = enc.clone()
    gs(sof + 11) = 0x22.toByte // component 1 hv
    val e2 = intercept[IllegalArgumentException] { Jpeg.decode(gs) }
    assert(e2.getMessage.contains("non-interleaved"), e2.getMessage)
    // DQT id 4: named, not 'truncated'
    val dqt = enc.indices.find(i => (enc(i) & 0xFF) == 0xFF &&
      (enc(i + 1) & 0xFF) == 0xDB).get
    val badQ = enc.clone()
    badQ(dqt + 4) = 4
    val e3 = intercept[IllegalArgumentException] { Jpeg.decode(badQ) }
    assert(e3.getMessage.contains("quantization table id"), e3.getMessage)
  }

  test("trailing bytes after EOI never decode as entropy data") {
    val px = gray(16, 16)(i => (i * 31) % 256)
    val enc = Jpeg.encode(16, 16, px)
    val withTrailer = enc ++ Array.fill[Byte](64)(0x55)
    val dec = Jpeg.decode(withTrailer)
    px.zip(dec.pixels).foreach { case (e, g) => assert(math.abs(e - g) <= 2) }
  }
}
