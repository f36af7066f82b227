package graft.sources.tiff

import org.scalatest.funsuite.AnyFunSuite
import TiffFormat.{TiffRaster, WriteOpts}

/** GeoTIFF codec: exact roundtrips across sample formats, layouts
  * (strips / tiles), compressions (none / PackBits / LZW / Deflate),
  * the horizontal predictor, BigTIFF, multi-band, COG overview
  * skipping, the affine geo-transform, NODATA... and the named
  * refusals. */
class TiffFormatSpec extends AnyFunSuite {

  private def readAt(bytes: Array[Byte])(off: Long, len: Int): Array[Byte] =
    bytes.slice(off.toInt, math.min(bytes.length, off.toInt + len))

  private def parse(bytes: Array[Byte]): TiffRaster =
    TiffFormat.parse(readAt(bytes), bytes.length.toLong)

  /** Assemble the full raster from per-tile decodes (clipping edge
    * padding) — the spec-side analog of what the scan does per
    * partition. */
  private def decodeAll(bytes: Array[Byte]): (TiffRaster, Array[Array[Double]]) = {
    val r = parse(bytes)
    val out = Array.fill(r.bands)(new Array[Double](r.width * r.height))
    for (t <- r.tileOffsets.indices) {
      val tx = t % r.tilesAcross; val ty = t / r.tilesAcross
      val pix = TiffFormat.decodeTile(r,
        readAt(bytes)(r.tileOffsets(t), r.tileByteCounts(t).toInt), ty)
      for (y <- 0 until r.tileHeight; x <- 0 until r.tileWidth) {
        val gy = ty * r.tileHeight + y; val gx = tx * r.tileWidth + x
        if (gy < r.height && gx < r.width)
          for (b <- 0 until r.bands)
            out(b)(gy * r.width + gx) = pix((y * r.tileWidth + x) * r.bands + b)
      }
    }
    (r, out)
  }

  private def grid(w: Int, h: Int)(f: Int => Double): Array[Double] =
    Array.tabulate(w * h)(f)

  test("sample formats roundtrip exactly (uint8/16/32, int16/32, f32/f64)") {
    val w = 13; val h = 9
    val cases = Seq(
      (1, 8, grid(w, h)(i => (i * 37 + 5) % 256.0)),
      (1, 16, grid(w, h)(i => (i * 371 + 5) % 65536.0)),
      (1, 32, grid(w, h)(i => (i * 100003.0 + 7) % 4000000000.0)),
      (2, 16, grid(w, h)(i => ((i * 371) % 65536) - 32768.0)),
      (2, 32, grid(w, h)(i => ((i * 100003) % 2000000) - 1000000.0)),
      (3, 32, grid(w, h)(i => (i * 0.37f + 0.25f).toFloat.toDouble)),
      (3, 64, grid(w, h)(i => i * 0.123456789 + 1e-9)))
    for ((sf, bits, vals) <- cases) {
      val bytes = TiffFormat.write(w, h, Array(vals), sf, bits,
        -20.0, 50.0, 0.05, 0.05)
      val (r, out) = decodeAll(bytes)
      assert(r.width == w && r.height == h && r.sampleFormat == sf &&
        r.bitsPerSample == bits)
      vals.zip(out(0)).zipWithIndex.foreach { case ((e, g), i) =>
        assert(e == g, s"sf=$sf bits=$bits pixel $i: $e vs $g")
      }
    }
  }

  test("layouts and compressions roundtrip (strips/tiles x none/packbits/lzw/deflate x predictor)") {
    val w = 37; val h = 21
    val vals = grid(w, h)(i => ((i / w) * 11 + (i % w) / 3) % 256.0) // runs
    for {
      tile <- Seq(0, 16, 32)
      comp <- Seq(1, 32773, 5, 8, 50000)
      pred <- Seq(1, 2)
    } {
      val bytes = TiffFormat.write(w, h, Array(vals), 1, 8, 0, 0, 1, 1,
        WriteOpts(tileSize = tile, rowsPerStrip = 5, compression = comp,
          predictor = pred))
      val (_, out) = decodeAll(bytes)
      vals.zip(out(0)).zipWithIndex.foreach { case ((e, g), i) =>
        assert(e == g, s"tile=$tile comp=$comp pred=$pred pixel $i: $e vs $g")
      }
    }
  }

  test("predictor 2 at 16 and 32 bits, and on multi-band interleave") {
    val w = 33; val h = 7
    val v16 = grid(w, h)(i => (i * 523 + 11) % 65536.0)
    val b16 = TiffFormat.write(w, h, Array(v16), 1, 16, 0, 0, 1, 1,
      WriteOpts(tileSize = 16, compression = 8, predictor = 2))
    assert(decodeAll(b16)._2(0).sameElements(v16))
    val bandsV = Array(grid(w, h)(i => (i * 7) % 256.0),
      grid(w, h)(i => (i * 13 + 1) % 256.0),
      grid(w, h)(i => (i * 29 + 2) % 256.0))
    val bMulti = TiffFormat.write(w, h, bandsV, 1, 8, 0, 0, 1, 1,
      WriteOpts(compression = 5, predictor = 2, rowsPerStrip = 3))
    val (rM, outM) = decodeAll(bMulti)
    assert(rM.bands == 3)
    for (b <- 0 to 2) assert(outM(b).sameElements(bandsV(b)), s"band $b")
  }

  test("LZW survives a mid-stream table clear (large low-entropy raster)") {
    val w = 128; val h = 128 // 16k samples: fills the 12-bit table
    val vals = grid(w, h)(i => ((i * 31 + (i / w) * 7) % 251).toDouble)
    val bytes = TiffFormat.write(w, h, Array(vals), 1, 8, 0, 0, 1, 1,
      WriteOpts(compression = 5, rowsPerStrip = h)) // one big strip
    assert(decodeAll(bytes)._2(0).sameElements(vals))
  }

  test("BigTIFF roundtrips and is structurally distinct") {
    val w = 20; val h = 10
    val vals = grid(w, h)(i => (i * 3.5) % 1000)
    val classic = TiffFormat.write(w, h, Array(vals), 3, 64, 10, 60, 0.1, 0.1)
    val big = TiffFormat.write(w, h, Array(vals), 3, 64, 10, 60, 0.1, 0.1,
      WriteOpts(bigTiff = true))
    assert((classic(2) & 0xFF) == 42 && (big(2) & 0xFF) == 43)
    assert(decodeAll(big)._2(0).sameElements(vals))
    assert(decodeAll(classic)._2(0).sameElements(vals))
  }

  test("COG overview IFDs are skipped; full-res raster survives") {
    val w = 32; val h = 16
    val vals = grid(w, h)(i => (i % 200).toDouble)
    val bytes = TiffFormat.write(w, h, Array(vals), 1, 8, 0, 0, 1, 1,
      WriteOpts(tileSize = 16, compression = 8, overview = true))
    val (r, out) = decodeAll(bytes)
    assert(r.width == w && r.height == h, "full-res IFD selected, not the overview")
    assert(out(0).sameElements(vals))
  }

  test("geo-transform: lat/lon of pixel centers, and PixelIsPoint shift") {
    val w = 10; val h = 6
    val vals = grid(w, h)(_.toDouble)
    // tiepoint at raster (0,0) -> model (-20, 50), scale 0.25
    val area = parse(TiffFormat.write(w, h, Array(vals), 1, 8, -20, 50, 0.25, 0.25))
    assert(area.lonOf(0) == -20 + 0.125 && area.latOf(0) == 50 - 0.125)
    assert(area.lonOf(9) == -20 + 9.5 * 0.25 && area.latOf(5) == 50 - 5.5 * 0.25)
    val point = parse(TiffFormat.write(w, h, Array(vals), 1, 8, -20, 50, 0.25, 0.25,
      WriteOpts(pixelIsPoint = true)))
    assert(point.pixelIsPoint && point.lonOf(0) == -20.0 && point.latOf(0) == 50.0)
  }

  test("GDAL_NODATA parses; bare TIFF gets identity pixel-space transform") {
    val w = 4; val h = 4
    val nd = parse(TiffFormat.write(w, h, Array(grid(w, h)(_.toDouble)), 1, 8,
      0, 0, 1, 1, WriteOpts(noData = Some(-9999))))
    assert(nd.noData.contains(-9999.0))
  }

  test("big-endian TIFFs parse (MM byte order)") {
    // flip a written LE file to BE by rewriting: cheaper to hand-build a
    // tiny MM TIFF — 2x2 uint8, uncompressed, one strip
    val b = collection.mutable.ArrayBuffer[Byte]()
    def u16(v: Int): Unit = { b += ((v >> 8) & 0xFF).toByte; b += (v & 0xFF).toByte }
    def u32(v: Long): Unit = { u16(((v >> 16) & 0xFFFF).toInt); u16((v & 0xFFFF).toInt) }
    b += 'M'; b += 'M'; u16(42); u32(12) // IFD at 12
    b += 1; b += 2; b += 3; b += 4 // strip data at offset 8
    // IFD: 7 entries
    u16(7)
    def entry(tag: Int, typ: Int, count: Long, value: Long): Unit = {
      u16(tag); u16(typ); u32(count)
      if (typ == 3) { u16(value.toInt); u16(0) } else u32(value)
    }
    entry(256, 4, 1, 2); entry(257, 4, 1, 2)
    entry(258, 3, 1, 8)
    entry(273, 4, 1, 8) // strip offset
    entry(277, 3, 1, 1)
    entry(278, 4, 1, 2)
    entry(279, 4, 1, 4)
    u32(0)
    val (r, out) = decodeAll(b.toArray)
    assert(r.bigEndian && r.width == 2 && r.height == 2)
    assert(out(0).sameElements(Array(1.0, 2.0, 3.0, 4.0)))
  }

  test("floating-point predictor 3 roundtrips float32/float64, multi-band") {
    val w = 23; val h = 9
    val f32 = grid(w, h)(i => (math.sin(i * 0.1) * 1000).toFloat.toDouble)
    val b32 = TiffFormat.write(w, h, Array(f32), 3, 32, 0, 9, 1.0, 1.0,
      WriteOpts(compression = 8, predictor = 3))
    assert(decodeAll(b32)._2(0).sameElements(f32))
    val f64a = grid(w, h)(i => i * 0.123456789)
    val f64b = grid(w, h)(i => 7.5 - i * 0.001)
    val b64 = TiffFormat.write(w, h, Array(f64a, f64b), 3, 64, 0, 9, 1.0, 1.0,
      WriteOpts(tileSize = 16, compression = 5, predictor = 3))
    val (_, out) = decodeAll(b64)
    assert(out(0).sameElements(f64a) && out(1).sameElements(f64b))
    // predictor 3 genuinely helps smooth float data under deflate
    val plain = TiffFormat.write(w, h, Array(f64a), 3, 64, 0, 9, 1.0, 1.0,
      WriteOpts(compression = 8))
    val pred = TiffFormat.write(w, h, Array(f64a), 3, 64, 0, 9, 1.0, 1.0,
      WriteOpts(compression = 8, predictor = 3))
    assert(pred.length < plain.length,
      s"fp predictor should shrink smooth data: ${pred.length} vs ${plain.length}")
  }

  test("JPEG-in-TIFF (compression 7) decodes gray and RGB tiles within codec tolerance") {
    val w = 32; val h = 16
    val gray = grid(w, h)(i => 100.0 + (i % w) / 4) // smooth: DCT-friendly
    val bg = TiffFormat.write(w, h, Array(gray), 1, 8, 0, 16, 1.0, 1.0,
      WriteOpts(tileSize = 16, compression = 7))
    val (rg, outG) = decodeAll(bg)
    assert(rg.compression == 7)
    gray.zip(outG(0)).zipWithIndex.foreach { case ((e, g), i) =>
      assert(math.abs(e - g) <= 2, s"gray pixel $i: $e vs $g") // all-ones quant ±2
    }
    val rgb = Array.tabulate(3)(b => grid(w, h)(i => (60.0 * b) + 40 + (i % w)))
    val bc = TiffFormat.write(w, h, rgb, 1, 8, 0, 16, 1.0, 1.0,
      WriteOpts(rowsPerStrip = 16, compression = 7))
    val (_, outC) = decodeAll(bc)
    for (b <- 0 to 2)
      rgb(b).zip(outC(b)).zipWithIndex.foreach { case ((e, g), i) =>
        // DCT ±2 plus YCbCr forward+inverse rounding
        assert(math.abs(e - g) <= 5, s"band $b pixel $i: $e vs $g")
      }
  }

  test("short LAST strip (TIFF 6.0 unpadded) roundtrips; height % rps != 0") {
    val w = 8; val h = 8
    val vals = grid(w, h)(i => (i * 9 + 1) % 256.0)
    for (comp <- Seq(1, 5, 8, 32773)) {
      // rps 3 -> strips of 3, 3, 2 rows: the last is SHORT
      val bytes = TiffFormat.write(w, h, Array(vals), 1, 8, 0, 8, 1.0, 1.0,
        WriteOpts(rowsPerStrip = 3, compression = comp))
      val r = parse(bytes)
      assert(r.stripped && r.rowsInTile(2) == 2)
      assert(decodeAll(bytes)._2(0).sameElements(vals), s"comp $comp")
    }
  }

  test("PADDED final strips (legacy writers) still decode for every codec") {
    // write h=9 with rps=3 (strips of 3/3/3), then patch ImageLength to
    // 8: the last strip now carries one PADDING row — some writers pad
    // instead of truncating, and decode must tolerate both shapes
    val w = 8
    val vals9 = grid(w, 9)(i => (i * 9 + 1) % 256.0)
    for (comp <- Seq(1, 5, 8, 32773)) {
      val bytes = TiffFormat.write(w, 9, Array(vals9), 1, 8, 0, 9, 1.0, 1.0,
        WriteOpts(rowsPerStrip = 3, compression = comp))
      // ImageLength (tag 257, LONG) — find and patch 9 -> 8
      val ifd = (bytes(4) & 0xFF) | ((bytes(5) & 0xFF) << 8) |
        ((bytes(6) & 0xFF) << 16) | ((bytes(7) & 0xFF) << 24)
      val n = (bytes(ifd) & 0xFF) | ((bytes(ifd + 1) & 0xFF) << 8)
      val o = (0 until n).map(i => ifd + 2 + i * 12)
        .find(o => ((bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)) == 257).get
      assert(bytes(o + 8) == 9); bytes(o + 8) = 8
      val (r, out) = decodeAll(bytes)
      assert(r.height == 8 && r.rowsInTile(2) == 2, s"comp $comp")
      assert(out(0).sameElements(vals9.take(w * 8)), s"comp $comp padded strip")
    }
  }

  test("short-final-strip JPEG (the libtiff/GDAL shape) decodes") {
    // libtiff encodes the last strip as a JPEG of ONLY the remaining
    // rows; emulate with a hand-assembled descriptor + 8x2 JPEG
    val w = 8
    val full = TiffFormat.write(w, 8, Array(grid(w, 8)(i => 100.0 + i % 50)),
      1, 8, 0, 8, 1.0, 1.0, WriteOpts(rowsPerStrip = 3, compression = 7))
    val r = parse(full) // strips of 3/3/2; our writer pads the last to 3
    // decode the REAL libtiff shape: replace the last strip's bytes
    // with a 2-row JPEG and decode directly
    val shortJpeg = graft.functions.Jpeg.encode(w, 2,
      Array.tabulate(w * 2)(i => 100 + i % 50))
    val pix = TiffFormat.decodeTile(r, shortJpeg, 2)
    assert(pix.length == w * 3) // padded to full strip size
    for (i <- 0 until w * 2)
      assert(math.abs(pix(i) - (100 + i % 50)) <= 2, s"jpeg strip pixel $i")
  }

  test("GDAL_NODATA 'nan' (GDAL's float spelling) parses to NaN") {
    val w = 4; val h = 2
    val bytes = TiffFormat.write(w, h,
      Array(grid(w, h)(i => if (i == 3) Double.NaN else i.toDouble)), 3, 64,
      0, 2, 1.0, 1.0, WriteOpts(noData = Some(Double.NaN)))
    // the writer stamps "NaN"; GDAL writes lowercase — patch to 'nan'
    val idx = bytes.indexOfSlice("NaN".getBytes)
    assert(idx > 0)
    bytes(idx) = 'n'
    val r = parse(bytes)
    assert(r.noData.exists(_.isNaN))
  }

  test("JPEGTables (tag 347) shared-tables split: abbreviated tiles decode") {
    val w = 32; val h = 16
    val vals = grid(w, h)(i => 90.0 + (i % w) / 4)
    val split = TiffFormat.write(w, h, Array(vals), 1, 8, 0, 16, 1.0, 1.0,
      WriteOpts(tileSize = 16, compression = 7, jpegTablesSplit = true))
    val plain = TiffFormat.write(w, h, Array(vals), 1, 8, 0, 16, 1.0, 1.0,
      WriteOpts(tileSize = 16, compression = 7))
    val r = parse(split)
    assert(r.jpegTables != null, "tag 347 must surface on the descriptor")
    // shared tables are stored once: the split file is smaller
    assert(split.length < plain.length,
      s"split ${split.length} vs plain ${plain.length}")
    val (_, out) = decodeAll(split)
    val (_, ref) = decodeAll(plain)
    assert(out(0).sameElements(ref(0)), "abbreviated == standalone decode")
  }

  test("Zstd (compression 50000, the modern GDAL COG default) roundtrips " +
      "float + predictor 3 and refuses corrupt streams by name") {
    val w = 24; val h = 10
    val vals = grid(w, h)(i => i * 0.25 - 14.5)
    val bytes = TiffFormat.write(w, h, Array(vals), 3, 32, 0, 0, 1, 1,
      WriteOpts(tileSize = 16, compression = 50000, predictor = 3))
    val (r, out) = decodeAll(bytes)
    assert(r.compression == 50000)
    assert(out(0).sameElements(vals))
    // corrupt stream named (not a zstd frame at all)
    val e = intercept[IllegalArgumentException] {
      TiffFormat.decodeTile(r, Array.fill[Byte](20)(0x55), 0)
    }
    assert(e.getMessage.contains("zstd"), e.getMessage)
  }

  test("out-of-profile and corrupt inputs are refused by name") {
    val w = 18; val h = 6
    val good = TiffFormat.write(w, h, Array(grid(w, h)(_.toDouble)), 1, 8,
      0, 0, 1, 1, WriteOpts(compression = 8))
    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    def findTag(bytes: Array[Byte], tag: Int): Int = {
      // little-endian classic: IFD offset at 4
      val ifd = (bytes(4) & 0xFF) | ((bytes(5) & 0xFF) << 8) |
        ((bytes(6) & 0xFF) << 16) | ((bytes(7) & 0xFF) << 24)
      val n = (bytes(ifd) & 0xFF) | ((bytes(ifd + 1) & 0xFF) << 8)
      (0 until n).map(i => ifd + 2 + i * 12)
        .find(o => ((bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)) == tag)
        .getOrElse(fail(s"tag $tag not found"))
    }
    // old-style JPEG (code 6) named; new-style 7 is in profile now
    val eJpeg = intercept[IllegalArgumentException](parse(patched { c =>
      val o = findTag(c, 259); c(o + 8) = 6; c(o + 9) = 0 }))
    assert(eJpeg.getMessage.contains("old-style JPEG"), eJpeg.getMessage)
    // float predictor named (tag only present when predictor != 1)
    val withPred = TiffFormat.write(w, h, Array(grid(w, h)(_.toDouble)), 1, 8,
      0, 0, 1, 1, WriteOpts(compression = 8, predictor = 2))
    val ePred = intercept[IllegalArgumentException] {
      val c = withPred.clone()
      val ifd = (c(4) & 0xFF) | ((c(5) & 0xFF) << 8) |
        ((c(6) & 0xFF) << 16) | ((c(7) & 0xFF) << 24)
      val n = (c(ifd) & 0xFF) | ((c(ifd + 1) & 0xFF) << 8)
      val o = (0 until n).map(i => ifd + 2 + i * 12)
        .find(o => ((c(o) & 0xFF) | ((c(o + 1) & 0xFF) << 8)) == 317).get
      c(o + 8) = 3
      parse(c)
    }
    assert(ePred.getMessage.contains("floating-point predictor"), ePred.getMessage)
    // separate planar named
    val ePlanar = intercept[IllegalArgumentException](parse(patched { c =>
      val o = findTag(c, 284); c(o + 8) = 2 }))
    assert(ePlanar.getMessage.contains("chunky only"), ePlanar.getMessage)
    // paletted (photometric 3) SCANS — the index is the data value
    // (GDAL land-cover shape; the ColorMap is display metadata)
    val pal = patched { c => val o = findTag(c, 262); c(o + 8) = 3 }
    assert(decodeAll(pal)._2(0).sameElements(grid(w, h)(_.toDouble)))
    // wrong magic
    val eMagic = intercept[IllegalArgumentException](
      parse("PKxxxxxxxx".getBytes))
    assert(eMagic.getMessage.contains("not a TIFF"), eMagic.getMessage)
    // truncated tile payload: shrink the file under the last strip's end
    val r = parse(good)
    val lastEnd = r.tileOffsets.zip(r.tileByteCounts).map { case (o, c) => o + c }.max
    val eTrunc = intercept[IllegalArgumentException](
      TiffFormat.parse(readAt(good), lastEnd - 1))
    assert(eTrunc.getMessage.contains("truncated TIFF"), eTrunc.getMessage)
    // corrupt deflate stream named
    val eBad = intercept[IllegalArgumentException] {
      val rr = parse(good)
      val t = readAt(good)(rr.tileOffsets(0), rr.tileByteCounts(0).toInt)
      t(t.length / 2) = (t(t.length / 2) ^ 0x7F).toByte
      TiffFormat.decodeTile(rr, t, 0)
    }
    assert(eBad.getMessage.toLowerCase.matches(".*(deflate|corrupt|truncated).*"),
      eBad.getMessage)
  }
}
