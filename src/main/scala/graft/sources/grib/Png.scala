package graft.sources.grib

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal PNG codec for GRIB2 data representation template 5.41 — the
  * packing NCEP's MRMS archives carry. GRIB PNG images are non-interlaced
  * grayscale (depth 8/16), RGB (24-bit values) or RGBA (32-bit values)
  * rasters whose pixel bytes are the scaled field integers MSB-first
  * (g2clib pngpack.c/pngunpack.c); no palette, no ancillary chunks needed.
  *
  * Implemented from the public PNG specification (RFC 2083): signature,
  * IHDR/IDAT/IEND chunks, zlib streams via java.util.zip, and all five
  * scanline filters (None/Sub/Up/Average/Paeth) on both sides.
  */
object Png {

  private val Signature = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  /** (bit depth, colour type, bytes per pixel) for a GRIB sample width. */
  def layoutFor(nbits: Int): (Int, Int, Int) =
    if (nbits <= 8) (8, 0, 1) // grayscale
    else if (nbits <= 16) (16, 0, 2) // 16-bit grayscale
    else if (nbits <= 24) (8, 2, 3) // RGB
    else (8, 6, 4) // RGBA

  /** Encode `samples` (row-major, one unsigned value per pixel, MSB-first
    * across the pixel's bytes) as a PNG. The per-row filter cycles through
    * all five types so any decoder path is exercised by any multi-row
    * image. */
  def encode(width: Int, height: Int, nbits: Int, samples: Array[Long]): Array[Byte] = {
    require(samples.length == width * height,
      s"${samples.length} samples for $width x $height")
    val (depth, colourType, bpp) = layoutFor(nbits)
    val stride = width * bpp
    val raw = new Array[Byte](height * (stride + 1))
    val filtered = new Array[Byte](height * (stride + 1))
    // raw scanlines
    var k = 0
    while (k < samples.length) {
      val row = k / width
      val base = row * (stride + 1) + 1 + (k % width) * bpp
      var b = 0
      while (b < bpp) {
        raw(base + b) = ((samples(k) >>> (8 * (bpp - 1 - b))) & 0xFF).toByte
        b += 1
      }
      k += 1
    }
    // per-row filter
    var row = 0
    while (row < height) {
      val ft = row % 5
      val rb = row * (stride + 1) + 1
      val pb = rb - (stride + 1)
      filtered(rb - 1) = ft.toByte
      var i = 0
      while (i < stride) {
        val x = raw(rb + i) & 0xFF
        val a = if (i >= bpp) raw(rb + i - bpp) & 0xFF else 0
        val b = if (row > 0) raw(pb + i) & 0xFF else 0
        val c = if (row > 0 && i >= bpp) raw(pb + i - bpp) & 0xFF else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        filtered(rb + i) = ((x - pred) & 0xFF).toByte
        i += 1
      }
      row += 1
    }
    // zlib-deflate the filtered stream
    val deflater = new Deflater()
    deflater.setInput(filtered)
    deflater.finish()
    val zOut = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zOut.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new ByteArrayOutputStream()
    out.write(Signature)
    val ihdr = new Array[Byte](13)
    putU32(ihdr, 0, width)
    putU32(ihdr, 4, height)
    ihdr(8) = depth.toByte
    ihdr(9) = colourType.toByte // compression 0, filter 0, interlace 0
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", zOut.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode a GRIB-profile PNG back to (width, height, samples). */
  def decode(png: Array[Byte]): (Int, Int, Array[Long]) = {
    require(png.length > 8 && Signature.indices.forall(i => png(i) == Signature(i)),
      "bad PNG signature")
    var pos = 8
    var width = 0; var height = 0; var depth = 0; var colourType = 0
    val idat = new ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(pos + 8 <= png.length, "truncated PNG chunk header")
      val len = u32(png, pos)
      val typ = new String(png, pos + 4, 4, "US-ASCII")
      val body = pos + 8
      require(body + len + 4 <= png.length, s"truncated PNG chunk $typ")
      typ match {
        case "IHDR" =>
          width = u32(png, body); height = u32(png, body + 4)
          depth = png(body + 8) & 0xFF; colourType = png(body + 9) & 0xFF
          require((png(body + 10) & 0xFF) == 0 && (png(body + 11) & 0xFF) == 0 &&
            (png(body + 12) & 0xFF) == 0,
            "PNG compression/filter/interlace methods must be 0")
          require((colourType == 0 && (depth == 8 || depth == 16)) ||
            ((colourType == 2 || colourType == 6) && depth == 8),
            s"PNG profile depth=$depth colour=$colourType outside the GRIB subset")
        case "IDAT" => idat.write(png, body, len)
        case "IEND" => done = true
        case _ => () // ancillary chunk — skip
      }
      pos = body + len + 4 // skip CRC
    }
    require(width > 0 && height > 0, "PNG missing IHDR")
    val channels = colourType match { case 0 => 1; case 2 => 3; case 6 => 4 }
    val bpp = channels * depth / 8
    val stride = width * bpp
    // zlib-inflate
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    val filtered = new Array[Byte](height * (stride + 1))
    var got = 0
    while (got < filtered.length && !inflater.finished()) {
      val n = inflater.inflate(filtered, got, filtered.length - got)
      require(n > 0 || inflater.finished(), "truncated PNG image data")
      got += n
    }
    inflater.end()
    require(got == filtered.length,
      s"PNG image data: got $got of ${filtered.length} filtered bytes")
    // reverse per-row filters in place (raw reuses the filtered buffer)
    var row = 0
    while (row < height) {
      val rb = row * (stride + 1) + 1
      val pb = rb - (stride + 1)
      val ft = filtered(rb - 1) & 0xFF
      require(ft <= 4, s"PNG filter type $ft")
      var i = 0
      while (i < stride) {
        val a = if (i >= bpp) filtered(rb + i - bpp) & 0xFF else 0
        val b = if (row > 0) filtered(pb + i) & 0xFF else 0
        val c = if (row > 0 && i >= bpp) filtered(pb + i - bpp) & 0xFF else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        filtered(rb + i) = (((filtered(rb + i) & 0xFF) + pred) & 0xFF).toByte
        i += 1
      }
      row += 1
    }
    val samples = new Array[Long](width * height)
    var k = 0
    while (k < samples.length) {
      val base = (k / width) * (stride + 1) + 1 + (k % width) * bpp
      var v = 0L
      var b = 0
      while (b < bpp) { v = (v << 8) | (filtered(base + b) & 0xFF); b += 1 }
      samples(k) = v
      k += 1
    }
    (width, height, samples)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def writeChunk(out: ByteArrayOutputStream, typ: String, body: Array[Byte]): Unit = {
    val len = new Array[Byte](4)
    putU32(len, 0, body.length)
    out.write(len)
    val tb = typ.getBytes("US-ASCII")
    out.write(tb)
    out.write(body)
    val crc = new CRC32()
    crc.update(tb)
    crc.update(body)
    val cb = new Array[Byte](4)
    putU32(cb, 0, crc.getValue.toInt)
    out.write(cb)
  }

  private def putU32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  private def u32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)
}
