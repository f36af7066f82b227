package graft.functions

import graft.SparkSpec
import WebP.EncodeOpts

/** VP8L lossless WebP codec: exact roundtrips through every transform
  * (spatial prediction modes 0-13, cross-color, subtract-green, color
  * indexing with sub-byte bundling), color cache, LZ77 runs, the
  * extended VP8X container... and the named refusals (lossy VP8,
  * animation, missing VP8L chunk, truncation, non-WebP magic).
  * Lossless means EXACT equality — no tolerance anywhere. */
class WebPSpec extends SparkSpec {

  private def argb(w: Int, h: Int)(f: Int => Int): Array[Int] =
    Array.tabulate(w * h)(i => 0xFF000000 | (f(i) & 0xFFFFFF))

  private def roundtrip(w: Int, h: Int, px: Array[Int],
      opts: EncodeOpts = EncodeOpts(), label: String = ""): Unit = {
    val img = WebP.decode(WebP.encode(w, h, px, opts))
    assert(img.width == w && img.height == h, s"$label: dims ${img.width}x${img.height}")
    px.zip(img.argb).zipWithIndex.foreach { case ((e, g), i) =>
      assert(e == g, f"$label pixel $i: expected $e%08x got $g%08x")
    }
  }

  test("literal stream roundtrips exactly across geometries") {
    for ((w, h) <- Seq((1, 1), (8, 8), (13, 7), (16, 16), (33, 9), (2, 40)))
      roundtrip(w, h, argb(w, h)(i => i * 0x010307 + 11), label = s"${w}x$h")
  }

  test("alpha channel survives and sets has_alpha") {
    val w = 9; val h = 5
    val px = Array.tabulate(w * h)(i => ((i * 37 + 5) % 256) << 24 | (i * 0x010101 & 0xFFFFFF))
    val img = WebP.decode(WebP.encode(w, h, px))
    assert(img.hasAlpha)
    px.zip(img.argb).foreach { case (e, g) => assert(e == g) }
    assert(!WebP.decode(WebP.encode(2, 2, argb(2, 2)(identity))).hasAlpha)
  }

  test("all 14 spatial predictor modes roundtrip exactly") {
    val w = 17; val h = 11 // > one 16px transform tile in x
    val px = argb(w, h)(i => (i * 41 + 7) * 0x010509)
    for (mode <- 0 to 13)
      roundtrip(w, h, px, EncodeOpts(predictorMode = mode), s"predictor $mode")
  }

  test("subtract-green, cross-color, and their composition roundtrip") {
    val w = 19; val h = 13
    val px = argb(w, h)(i => i * 0x030117 + 0x405060)
    roundtrip(w, h, px, EncodeOpts(subtractGreen = true), "subtract-green")
    roundtrip(w, h, px, EncodeOpts(colorTransform = Some((23, -45, 101))), "cross-color")
    roundtrip(w, h, px, EncodeOpts(subtractGreen = true,
      colorTransform = Some((-128, 127, 64)), predictorMode = 11),
      "subtract-green + cross-color + predictor")
  }

  test("color indexing roundtrips at every bundling width (1/2/4/8 bpp)") {
    // palette sizes straddling each widthBits threshold: 2 colors -> 1bpp
    // (8 px/byte), 3-4 -> 2bpp, 5-16 -> 4bpp, 17+ -> plain 8bpp
    for (nColors <- Seq(2, 3, 4, 5, 16, 17, 200)) {
      val pal = Array.tabulate(nColors)(c => 0xFF000000 | (c * 0x010101 * 31 + 0x123456) & 0xFFFFFFFF.toInt | 0xFF000000)
      val w = 21; val h = 6 // 21 not a multiple of any pack factor
      val px = Array.tabulate(w * h)(i => pal((i * 7 + i / w) % nColors))
      roundtrip(w, h, px, EncodeOpts(palette = true), s"palette $nColors")
    }
  }

  test("color cache and LZ77 runs roundtrip, and runs compress") {
    val w = 32; val h = 32
    // long horizontal runs: RLE backrefs + cache hits both fire
    val px = argb(w, h)(i => ((i / w) % 7) * 0x101010)
    for (cb <- Seq(1, 4, 11))
      roundtrip(w, h, px, EncodeOpts(cacheBits = cb), s"cache $cb")
    roundtrip(w, h, px, EncodeOpts(rleBackrefs = true), "rle")
    roundtrip(w, h, px, EncodeOpts(rleBackrefs = true, cacheBits = 6), "rle+cache")
    val plain = WebP.encode(w, h, px)
    val rle = WebP.encode(w, h, px, EncodeOpts(rleBackrefs = true))
    assert(rle.length < plain.length,
      s"RLE should beat literals on runs: ${rle.length} vs ${plain.length}")
  }

  test("VP8X extended container wrapping decodes identically") {
    val w = 10; val h = 4
    val px = argb(w, h)(i => i * 0x070301)
    val plain = WebP.encode(w, h, px)
    val ext = WebP.encode(w, h, px, EncodeOpts(vp8x = true))
    assert(!java.util.Arrays.equals(plain, ext))
    val img = WebP.decode(ext)
    assert(img.width == w && img.height == h)
    px.zip(img.argb).foreach { case (e, g) => assert(e == g) }
  }

  test("everything-at-once: transforms + cache + rle + vp8x") {
    val w = 40; val h = 23
    val px = Array.tabulate(w * h) { i =>
      val a = if (i % 3 == 0) 0xFF else 0x80 + (i % 64)
      (a << 24) | (((i / w) * 11) % 256) << 16 | ((i * 13) % 256) << 8 | ((i * 29 + 3) % 256)
    }
    roundtrip(w, h, px, EncodeOpts(subtractGreen = true, predictorMode = 2,
      colorTransform = Some((5, -3, 17)), cacheBits = 5, rleBackrefs = true,
      vp8x = true), "kitchen sink")
  }

  test("out-of-profile and corrupt inputs are refused by name") {
    val good = WebP.encode(4, 4, argb(4, 4)(identity))
    // lossy VP8: rewrite the chunk fourcc
    val lossy = good.clone()
    val vp8lAt = lossy.indexOfSlice("VP8L".getBytes)
    lossy(vp8lAt + 3) = ' '
    val eLossy = intercept[IllegalArgumentException](WebP.decode(lossy))
    assert(eLossy.getMessage.contains("lossy VP8"), eLossy.getMessage)
    // animated: splice an ANIM chunk before VP8L
    val anim = good.take(12) ++ "ANIM".getBytes ++
      Array[Byte](6, 0, 0, 0) ++ Array.fill[Byte](6)(0) ++ good.drop(12)
    val eAnim = intercept[IllegalArgumentException](WebP.decode(anim))
    assert(eAnim.getMessage.contains("animated"), eAnim.getMessage)
    // no VP8L chunk at all
    val noVp8l = good.take(12) ++ "EXIF".getBytes ++ Array[Byte](2, 0, 0, 0, 1, 2)
    val eNone = intercept[IllegalArgumentException](WebP.decode(noVp8l))
    assert(eNone.getMessage.contains("no VP8L"), eNone.getMessage)
    // truncated mid-chunk
    val eTrunc = intercept[IllegalArgumentException](
      WebP.decode(good.dropRight(good.length - vp8lAt - 8)))
    assert(eTrunc.getMessage.toLowerCase.contains("truncated"), eTrunc.getMessage)
    // wrong magic
    val eMagic = intercept[IllegalArgumentException](
      WebP.decode("RIFFxxxxWAVEdata0123".getBytes))
    assert(eMagic.getMessage.contains("not a WebP"), eMagic.getMessage)
    // one-bit corruption inside the entropy stream must never mis-decode
    // silently into a wrong-size image: either named corrupt or same dims
    val bad = good.clone()
    bad(bad.length - 3) = (bad(bad.length - 3) ^ 0x55).toByte
    try {
      val img = WebP.decode(bad)
      assert(img.width == 4 && img.height == 4)
    } catch {
      case e: IllegalArgumentException =>
        assert(e.getMessage.contains("WebP") || e.getMessage.contains("prefix"),
          e.getMessage)
    }
  }
}
