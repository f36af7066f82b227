package graft.functions

/** Minimal GIF87a/89a codec (public CompuServe/W3C specification):
  * logical screen descriptor, global/local color tables, LZW-compressed
  * indexed raster with variable-width codes and dictionary reset,
  * interlaced and multi-frame (animation) images, extension blocks
  * skipped. Decode returns per-frame palette-resolved RGB; the encoder
  * (fixture/writer side) emits the clear-code-per-symbol LZW form every
  * conformant decoder accepts.
  *
  * Out-of-profile structures are refused BY NAME, never mis-decoded. */
object Gif {

  /** One decoded frame: left/top offset on the logical screen, the
    * frame's own raster as packed 0xRRGGBB ints, and the GIF89a
    * graphic-control state (delay in centiseconds, disposal method
    * 0-3, transparency mask — null when no transparent index). */
  final case class GifFrame(left: Int, top: Int, width: Int, height: Int,
      rgb: Array[Int], delayCs: Int = 0, disposal: Int = 0,
      transparent: Array[Boolean] = null)

  /** `background` is the logical screen's background COLOR (resolved
    * through the global table; 0 when there is none). */
  final case class GifImage(width: Int, height: Int, frames: Seq[GifFrame],
      background: Int = 0)

  def decode(bytes: Array[Byte]): GifImage =
    MediaParse.wrapCorrupt("GIF", bytes.length)(decodeImpl(bytes))

  private def decodeImpl(bytes: Array[Byte]): GifImage = {
    def u16(off: Int) = (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8)
    require(bytes.length >= 13, s"GIF of ${bytes.length} bytes has no header")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a", s"not a GIF: signature '$sig'")
    val sw = u16(6); val sh = u16(8)
    val packed = bytes(10) & 0xFF
    var off = 13
    val globalTable: Array[Int] =
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        val t = Array.tabulate(n) { i =>
          ((bytes(off + 3 * i) & 0xFF) << 16) |
            ((bytes(off + 3 * i + 1) & 0xFF) << 8) | (bytes(off + 3 * i + 2) & 0xFF)
        }
        off += 3 * n
        t
      } else Array.empty[Int]
    val bgIndex = bytes(11) & 0xFF
    val background =
      if (globalTable.nonEmpty && bgIndex < globalTable.length) globalTable(bgIndex)
      else 0
    val frames = scala.collection.mutable.ArrayBuffer.empty[GifFrame]
    // pending graphic-control state, attached to the NEXT image descriptor
    var gceDelay = 0; var gceDisposal = 0; var gceTransIdx = -1
    var done = false
    while (!done) {
      require(off < bytes.length, "truncated GIF: missing trailer")
      (bytes(off) & 0xFF) match {
        case 0x3B => done = true // trailer
        case 0x21 if (bytes(off + 1) & 0xFF) == 0xF9 => // graphic control
          require((bytes(off + 2) & 0xFF) == 4, "malformed GCE block size")
          val packed = bytes(off + 3) & 0xFF
          gceDisposal = (packed >> 2) & 0x7
          require(gceDisposal <= 3,
            s"GIF disposal method $gceDisposal reserved (0-3)")
          gceDelay = u16(off + 4)
          gceTransIdx = if ((packed & 1) != 0) bytes(off + 6) & 0xFF else -1
          off += 7
          require((bytes(off) & 0xFF) == 0, "GCE missing block terminator")
          off += 1
        case 0x21 => // other extension: label + sub-blocks, all skippable
          off += 2
          while ((bytes(off) & 0xFF) != 0) off += 1 + (bytes(off) & 0xFF)
          off += 1
        case 0x2C => // image descriptor
          val left = u16(off + 1); val top = u16(off + 3)
          val w = u16(off + 5); val h = u16(off + 7)
          val ip = bytes(off + 9) & 0xFF
          off += 10
          val table =
            if ((ip & 0x80) != 0) {
              val n = 2 << (ip & 7)
              val t = Array.tabulate(n) { i =>
                ((bytes(off + 3 * i) & 0xFF) << 16) |
                  ((bytes(off + 3 * i + 1) & 0xFF) << 8) | (bytes(off + 3 * i + 2) & 0xFF)
              }
              off += 3 * n
              t
            } else globalTable
          require(table.nonEmpty, "GIF frame has no color table (global or local)")
          val interlaced = (ip & 0x40) != 0
          val minCode = bytes(off) & 0xFF
          off += 1
          require(minCode >= 2 && minCode <= 8, s"GIF LZW min code size $minCode")
          // concatenate the data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while ((bytes(off) & 0xFF) != 0) {
            val len = bytes(off) & 0xFF
            require(off + 1 + len <= bytes.length, "truncated GIF image data")
            data.write(bytes, off + 1, len)
            off += 1 + len
          }
          off += 1
          val indices = lzwDecode(data.toByteArray, minCode, w * h)
          // interlace pass order: rows 0,8,16.. / 4,12.. / 2,6.. / 1,3..
          val rowOrder: Array[Int] =
            if (!interlaced) Array.tabulate(h)(identity)
            else (Seq.range(0, h, 8) ++ Seq.range(4, h, 8) ++
              Seq.range(2, h, 4) ++ Seq.range(1, h, 2)).toArray
          val rgb = new Array[Int](w * h)
          val trans = if (gceTransIdx >= 0) new Array[Boolean](w * h) else null
          var k = 0
          rowOrder.foreach { y =>
            var x = 0
            while (x < w) {
              val idx = indices(k) & 0xFF
              require(idx < table.length, s"GIF index $idx outside the palette")
              rgb(y * w + x) = table(idx)
              if (trans != null && idx == gceTransIdx) trans(y * w + x) = true
              x += 1; k += 1
            }
          }
          frames += GifFrame(left, top, w, h, rgb, gceDelay, gceDisposal, trans)
          gceDelay = 0; gceDisposal = 0; gceTransIdx = -1 // GCE is one-shot
        case other => throw new IllegalArgumentException(
          f"GIF block 0x$other%02x unsupported (image, extension, trailer)")
      }
    }
    require(frames.nonEmpty, "GIF carries no image frames")
    GifImage(sw, sh, frames.toSeq, background)
  }

  /** Composite an animation onto the logical screen: one FULL-CANVAS
    * 0xRRGGBB raster per frame, applying the GIF89a model — the canvas
    * starts as the background color; each frame draws its sub-rectangle
    * (skipping transparent pixels); disposal 0/1 keeps the result,
    * 2 restores the frame's REGION to background, 3 restores the whole
    * canvas to its pre-draw state. Frames drawing outside the screen
    * are refused by name. */
  def composite(img: GifImage): Seq[Array[Int]] = {
    val canvas = Array.fill(img.width * img.height)(img.background)
    img.frames.map { f =>
      require(f.left + f.width <= img.width && f.top + f.height <= img.height,
        s"GIF frame ${f.width}x${f.height}@(${f.left},${f.top}) exceeds the " +
          s"${img.width}x${img.height} screen")
      val before = if (f.disposal == 3) canvas.clone() else null
      var y = 0
      while (y < f.height) {
        var x = 0
        while (x < f.width) {
          val k = y * f.width + x
          if (f.transparent == null || !f.transparent(k))
            canvas((f.top + y) * img.width + (f.left + x)) = f.rgb(k)
          x += 1
        }
        y += 1
      }
      val shown = canvas.clone()
      f.disposal match {
        case 2 => // restore region to background
          var yy = 0
          while (yy < f.height) {
            var xx = 0
            while (xx < f.width) {
              canvas((f.top + yy) * img.width + (f.left + xx)) = img.background
              xx += 1
            }
            yy += 1
          }
        case 3 => System.arraycopy(before, 0, canvas, 0, canvas.length)
        case _ => // 0/1: keep
      }
      shown
    }
  }

  /** GIF-flavored LZW (LSB-first bit packing, variable code width with
    * clear/end codes, 4096-entry dictionary). */
  private def lzwDecode(data: Array[Byte], minCode: Int, expect: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val out = new Array[Byte](expect)
    var outPos = 0
    // dictionary: prefix link + final byte per code
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var dictSize = end + 1
    var width = minCode + 1
    var bitPos = 0L
    val totalBits = data.length.toLong * 8
    def read(): Int = {
      if (bitPos + width > totalBits) return end // truncated: stop cleanly
      var v = 0; var k = 0
      while (k < width) {
        val b = (bitPos + k).toInt
        if (((data(b >> 3) >> (b & 7)) & 1) != 0) v |= 1 << k
        k += 1
      }
      bitPos += width
      v
    }
    def emit(code0: Int): Unit = {
      // walk the chain into a stack, then output in order
      var code = code0
      val stack = new Array[Byte](4096)
      var sp = 0
      while (code >= clear + 2) {
        stack(sp) = suffix(code); sp += 1
        code = prefix(code)
      }
      stack(sp) = code.toByte; sp += 1
      while (sp > 0 && outPos < expect) {
        sp -= 1; out(outPos) = stack(sp); outPos += 1
      }
    }
    def firstByte(code0: Int): Byte = {
      var code = code0
      while (code >= clear + 2) code = prefix(code)
      code.toByte
    }
    var prev = -1
    var stop = false
    while (!stop && outPos < expect) {
      val code = read()
      if (code == end) stop = true
      else if (code == clear) { dictSize = end + 1; width = minCode + 1; prev = -1 }
      else {
        require(code <= dictSize, s"GIF LZW code $code beyond dictionary $dictSize")
        // The KwKwK case (code == dictSize) is only decodable when a
        // previous code exists; as the FIRST code after a clear it has no
        // chain to walk and a lax decoder would emit stale-dictionary
        // garbage — refuse by name instead.
        require(prev >= 0 || code < dictSize,
          s"GIF LZW code $code is not a literal but no previous code " +
            "exists (first code after clear must be < dictionary size)")
        if (prev < 0) { emit(code); prev = code }
        else {
          val cur = if (code == dictSize) { // the KwKwK case
            emit(prev)
            if (outPos < expect) { out(outPos) = firstByte(prev); outPos += 1 }
            code
          } else { emit(code); code }
          if (dictSize < 4096) {
            prefix(dictSize) = prev
            suffix(dictSize) = firstByte(cur)
            dictSize += 1
            if (dictSize == (1 << width) && width < 12) width += 1
          }
          prev = cur
        }
      }
    }
    require(outPos == expect,
      s"GIF LZW stream yielded $outPos of $expect pixels")
    out
  }

  /** Encoder-side animation frame: `rgb` uses −1 for transparent
    * pixels (requires a transparent palette slot + GCE flag). */
  final case class AnimFrame(left: Int, top: Int, width: Int, height: Int,
      rgb: Array[Int], delayCs: Int = 0, disposal: Int = 0)

  /** Encode a multi-frame GIF89a animation (fixture/writer side): the
    * global table carries the background color at index 0; each frame
    * gets its own GCE (delay, disposal, transparency when any pixel is
    * −1) and a LOCAL color table, with the same clear-code-per-symbol
    * LZW form as [[encode]]. */
  def encodeAnimated(width: Int, height: Int, background: Int,
      frames: Seq[AnimFrame]): Array[Byte] = {
    require(frames.nonEmpty, "animation needs at least one frame")
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    w16(width); w16(height)
    out.write(0x80) // global table present, 2 entries (size bits 0)
    out.write(0) // background index 0
    out.write(0)
    // 2-entry global table: background + filler
    out.write((background >> 16) & 0xFF); out.write((background >> 8) & 0xFF)
    out.write(background & 0xFF)
    out.write(0); out.write(0); out.write(0)
    frames.foreach { f =>
      require(f.rgb.length == f.width * f.height,
        s"${f.rgb.length} pixels for ${f.width}x${f.height}")
      require(f.disposal >= 0 && f.disposal <= 3, s"disposal ${f.disposal}")
      val hasTrans = f.rgb.exists(_ == -1)
      val opaque = f.rgb.filter(_ != -1).distinct.sorted
      val palette = if (hasTrans) opaque :+ -1 else opaque // trans slot LAST
      require(palette.length <= 256, s"${palette.length} palette entries (256 max)")
      val bits = math.max(2, 32 - Integer.numberOfLeadingZeros(
        math.max(palette.length - 1, 1)))
      val tableSize = 1 << bits
      val index = palette.zipWithIndex.toMap
      val transIdx = if (hasTrans) index(-1) else -1
      // GCE
      out.write(0x21); out.write(0xF9); out.write(4)
      out.write((f.disposal << 2) | (if (hasTrans) 1 else 0))
      w16(f.delayCs)
      out.write(if (hasTrans) transIdx else 0)
      out.write(0)
      // image descriptor with a local table
      out.write(0x2C); w16(f.left); w16(f.top); w16(f.width); w16(f.height)
      out.write(0x80 | (bits - 1))
      (0 until tableSize).foreach { i =>
        val c = if (i < palette.length && palette(i) != -1) palette(i) else 0
        out.write((c >> 16) & 0xFF); out.write((c >> 8) & 0xFF); out.write(c & 0xFF)
      }
      val minCode = bits
      out.write(minCode)
      val clear = 1 << minCode
      val codeW = minCode + 1
      val bitBuf = new java.io.ByteArrayOutputStream()
      var acc = 0L; var nBits = 0
      def put(code: Int): Unit = {
        acc |= code.toLong << nBits
        nBits += codeW
        while (nBits >= 8) { bitBuf.write((acc & 0xFF).toInt); acc >>= 8; nBits -= 8 }
      }
      f.rgb.foreach { c => put(clear); put(index(c)) }
      put(clear + 1)
      if (nBits > 0) bitBuf.write((acc & 0xFF).toInt)
      val packedBytes = bitBuf.toByteArray
      var p = 0
      while (p < packedBytes.length) {
        val n = math.min(255, packedBytes.length - p)
        out.write(n); out.write(packedBytes, p, n)
        p += n
      }
      out.write(0)
    }
    out.write(0x3B)
    out.toByteArray
  }

  /** Encode one 0xRRGGBB frame as a GIF89a (fixture/writer side): builds
    * the palette from the distinct colors (≤ 256) and emits the
    * clear-code-per-symbol LZW form (dictionary never grows — valid for
    * any decoder, just uncompressed-sized). */
  def encode(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == width * height, s"${rgb.length} pixels for ${width}x$height")
    val palette = rgb.distinct.sorted
    require(palette.length <= 256, s"${palette.length} distinct colors (256 max)")
    val bits = math.max(2, 32 - Integer.numberOfLeadingZeros(
      math.max(palette.length - 1, 1)))
    val tableSize = 1 << bits
    val index = palette.zipWithIndex.toMap
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    w16(width); w16(height)
    out.write(0x80 | (bits - 1)) // global table, size bits
    out.write(0); out.write(0)
    (0 until tableSize).foreach { i =>
      val c = if (i < palette.length) palette(i) else 0
      out.write((c >> 16) & 0xFF); out.write((c >> 8) & 0xFF); out.write(c & 0xFF)
    }
    out.write(0x2C); w16(0); w16(0); w16(width); w16(height); out.write(0)
    val minCode = bits
    out.write(minCode)
    val clear = 1 << minCode
    val codeW = minCode + 1
    // bit-pack: clear before EVERY pixel code, end code last
    val bitBuf = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nBits = 0
    def put(code: Int): Unit = {
      acc |= code.toLong << nBits
      nBits += codeW
      while (nBits >= 8) { bitBuf.write((acc & 0xFF).toInt); acc >>= 8; nBits -= 8 }
    }
    rgb.foreach { c => put(clear); put(index(c)) }
    put(clear + 1) // end
    if (nBits > 0) bitBuf.write((acc & 0xFF).toInt)
    val packedBytes = bitBuf.toByteArray
    var p = 0
    while (p < packedBytes.length) {
      val n = math.min(255, packedBytes.length - p)
      out.write(n); out.write(packedBytes, p, n)
      p += n
    }
    out.write(0) // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }
}
