package graft.functions

import scala.collection.mutable.ArrayBuffer

/** WebP lossless (VP8L) codec, written from the public "WebP Lossless
  * Bitstream Specification" (RFC 9649 §3-5): RIFF/VP8X container walk,
  * LSB-first bitstream, canonical prefix codes (simple 1-2-symbol form
  * and the code-length-coded form with 16/17/18 repeats), color cache,
  * LZ77 backward references with the 120-entry near-distance map, meta
  * prefix images, and all four transforms — spatial prediction (modes
  * 0-13), cross-color, subtract-green, and color indexing with sub-byte
  * pixel bundling.
  *
  * The encoder exists for fixture synthesis (the repo's writer-beside-
  * reader pattern, like [[Gif]]/[[Jpeg]]/graft.sources.grib.Png): it
  * emits literal or RLE-backref streams through real canonical prefix
  * coding and any combination of the four transforms, so the decoder's
  * paths are exercised end-to-end from independently-built bytes.
  *
  * Lossy VP8 and animation are out of profile and refused BY NAME,
  * never mis-decoded. */
object WebP {

  final case class WebPImage(width: Int, height: Int, argb: Array[Int],
      hasAlpha: Boolean)

  // ---------------------------------------------------------------- decode

  def decode(bytes: Array[Byte]): WebPImage =
    MediaParse.wrapCorrupt("WebP", bytes.length)(decodeImpl(bytes))

  private def decodeImpl(bytes: Array[Byte]): WebPImage = {
    require(bytes.length >= 20, s"WebP of ${bytes.length} bytes has no header")
    def fourcc(o: Int) = new String(bytes, o, 4, "US-ASCII")
    def u32le(o: Int) = (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
      ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
    require(fourcc(0) == "RIFF" && fourcc(8) == "WEBP",
      s"not a WebP: RIFF/WEBP magic missing ('${fourcc(0)}'/'${fourcc(8)}')")
    var off = 12
    while (off + 8 <= bytes.length) {
      val fc = fourcc(off)
      val size = u32le(off + 4)
      require(off + 8 + size <= bytes.length,
        s"truncated WebP: chunk '$fc' claims $size bytes past end of file")
      fc match {
        case "VP8L" => return decodeVp8l(bytes, off + 8, size.toInt)
        case "VP8 " => throw new IllegalArgumentException(
          "lossy VP8 WebP unsupported (VP8L lossless only; plug a " +
            "production decoder for lossy payloads)")
        case "ANIM" | "ANMF" => throw new IllegalArgumentException(
          "animated WebP unsupported (single-frame VP8L lossless only)")
        case _ => // VP8X / ICCP / EXIF / XMP / ALPH metadata: skip
      }
      off += 8 + size.toInt + (size.toInt & 1) // chunks pad to even
    }
    throw new IllegalArgumentException(
      "WebP container has no VP8L chunk (lossless payload required)")
  }

  private def decodeVp8l(bytes: Array[Byte], off: Int, size: Int): WebPImage = {
    require(size >= 5, s"VP8L chunk of $size bytes has no header")
    require((bytes(off) & 0xFF) == 0x2F,
      f"bad VP8L signature byte 0x${bytes(off) & 0xFF}%02x (expected 0x2f)")
    val br = new BitReader(bytes, off + 1, off + size)
    val w = br.readBits(14) + 1
    val h = br.readBits(14) + 1
    val alphaHint = br.readBits(1) == 1
    val version = br.readBits(3)
    require(version == 0, s"VP8L version $version unsupported (0 only)")
    val (stored, storedW, transforms) = decodeImageStream(br, w, h, isLevel0 = true)
    val full = applyInverseTransforms(stored, storedW, h, transforms)
    WebPImage(w, h, full, alphaHint)
  }

  /** One transform as read from the stream. `xsizeAt` is the image width
    * BEFORE this transform's forward effect (for color indexing, the
    * width the inverse expands back to). */
  private final case class TransformRec(tpe: Int, bits: Int,
      data: Array[Int], xsizeAt: Int)

  /** 5.2.2 spatially-coded image: transforms (level 0 only), color cache,
    * meta prefix (level 0 only), prefix-code groups, pixel stream.
    * Returns (pixels, stored width, transforms in read order). */
  private def decodeImageStream(br: BitReader, xsize0: Int, ysize: Int,
      isLevel0: Boolean): (Array[Int], Int, List[TransformRec]) = {
    var xsize = xsize0
    val transforms = ArrayBuffer.empty[TransformRec]
    if (isLevel0) {
      var seen = 0
      while (br.readBits(1) == 1) {
        val t = br.readBits(2)
        require((seen & (1 << t)) == 0, s"VP8L transform type $t appears twice")
        seen |= 1 << t
        t match {
          case 0 | 1 => // predictor / cross-color: sub-resolution image
            val bits = br.readBits(3) + 2
            val (img, _, _) = decodeImageStream(br,
              subSize(xsize, bits), subSize(ysize, bits), isLevel0 = false)
            transforms += TransformRec(t, bits, img, xsize)
          case 2 => // subtract green: no data
            transforms += TransformRec(2, 0, null, xsize)
          case 3 => // color indexing
            val tableSize = br.readBits(8) + 1
            val (pal, _, _) = decodeImageStream(br, tableSize, 1, isLevel0 = false)
            var i = 1 // palette entries are component-wise delta coded
            while (i < tableSize) { pal(i) = addPixels(pal(i), pal(i - 1)); i += 1 }
            val widthBits =
              if (tableSize <= 2) 3 else if (tableSize <= 4) 2
              else if (tableSize <= 16) 1 else 0
            transforms += TransformRec(3, widthBits, pal, xsize)
            xsize = subSize(xsize, widthBits) // later reads see the packed width
        }
      }
    }
    val cacheBits = if (br.readBits(1) == 1) {
      val b = br.readBits(4)
      // spec range when the flag bit is SET is 1-11: a declared 0 would
      // silently decode with a 1-entry cache instead of refusing by name
      require(b >= 1 && b <= 11,
        s"VP8L color-cache bits $b out of range (1-11)")
      b
    } else 0
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0

    var metaBits = 0
    var metaW = 0
    var metaImg: Array[Int] = null
    var numGroups = 1
    if (isLevel0 && br.readBits(1) == 1) {
      metaBits = br.readBits(3) + 2
      metaW = subSize(xsize, metaBits)
      val (img, _, _) = decodeImageStream(br, metaW, subSize(ysize, metaBits),
        isLevel0 = false)
      metaImg = img
      var mx = 0
      var i = 0
      while (i < img.length) { // meta code = (red << 8) | green
        val c = (img(i) >>> 8) & 0xFFFF
        if (c > mx) mx = c
        i += 1
      }
      numGroups = mx + 1
    }

    val greenAlphabet = 256 + 24 + cacheSize
    val groups = Array.fill(numGroups)(Array(
      readPrefixCode(br, greenAlphabet), readPrefixCode(br, 256),
      readPrefixCode(br, 256), readPrefixCode(br, 256),
      readPrefixCode(br, 40)))

    val n = xsize * ysize
    val out = new Array[Int](n)
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    def cacheInsert(p: Int): Unit =
      if (cache != null) cache((0x1e35a7bd * p) >>> (32 - cacheBits)) = p
    var pos = 0
    while (pos < n) {
      val grp =
        if (metaImg == null) groups(0)
        else {
          val x = pos % xsize; val y = pos / xsize
          val m = (metaImg((y >> metaBits) * metaW + (x >> metaBits)) >>> 8) & 0xFFFF
          groups(m)
        }
      val s = grp(0).read(br)
      if (s < 256) { // literal: green already read, then r, b, a
        val r = grp(1).read(br); val b = grp(2).read(br); val a = grp(3).read(br)
        val p = (a << 24) | (r << 16) | (s << 8) | b
        out(pos) = p; cacheInsert(p); pos += 1
      } else if (s < 280) { // LZ77 backward reference
        val length = lz77Value(s - 256, br)
        val distCode = lz77Value(grp(4).read(br), br)
        val dist =
          if (distCode > 120) distCode - 120
          else { // near-distance map over the 8x15 causal neighborhood
            val dx = DistMap(2 * (distCode - 1))
            val dy = DistMap(2 * (distCode - 1) + 1)
            val d = dy * xsize + dx
            if (d < 1) 1 else d
          }
        require(dist <= pos,
          s"VP8L backward reference distance $dist exceeds $pos decoded pixels")
        require(pos + length <= n,
          s"VP8L backward reference of $length pixels overruns the image")
        var k = 0
        while (k < length) {
          val p = out(pos - dist); out(pos) = p; cacheInsert(p); pos += 1; k += 1
        }
      } else { // color cache reference
        require(cache != null && s - 280 < cacheSize,
          s"VP8L color-cache symbol $s without a matching cache")
        val p = cache(s - 280)
        out(pos) = p; cacheInsert(p); pos += 1
      }
    }
    (out, xsize, transforms.toList)
  }

  private def applyInverseTransforms(stored: Array[Int], storedW: Int,
      h: Int, transforms: List[TransformRec]): Array[Int] = {
    var img = stored
    var w = storedW
    transforms.reverse.foreach { tr =>
      tr.tpe match {
        case 0 => inversePredictor(img, w, h, tr.bits, tr.data)
        case 1 => inverseColorTransform(img, w, h, tr.bits, tr.data)
        case 2 =>
          var i = 0
          while (i < img.length) { // add green to red and blue
            val p = img(i); val g = (p >>> 8) & 0xFF
            img(i) = (p & 0xFF00FF00) |
              ((((p >>> 16) & 0xFF) + g) & 0xFF) << 16 | ((p + g) & 0xFF)
            i += 1
          }
        case 3 =>
          img = inverseColorIndex(img, w, h, tr.bits, tr.data, tr.xsizeAt)
          w = tr.xsizeAt
      }
    }
    img
  }

  /** Spatial prediction inverse: per-block mode from the sub-image's green
    * channel; first pixel is opaque black, first row predicts from L,
    * first column from T; TR of the rightmost column is the leftmost
    * pixel of the current row (linear indexing gives exactly that). */
  private def inversePredictor(img: Array[Int], w: Int, h: Int,
      bits: Int, modes: Array[Int]): Unit = {
    val bw = subSize(w, bits)
    var pos = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (x == 0 && y == 0) 0xFF000000
          else if (y == 0) img(pos - 1)
          else if (x == 0) img(pos - w)
          else {
            val mode = (modes((y >> bits) * bw + (x >> bits)) >>> 8) & 0xFF
            require(mode <= 13, s"VP8L predictor mode $mode out of range (0-13)")
            predict(mode, img(pos - 1), img(pos - w),
              img(pos - w - 1), img(pos - w + 1))
          }
        img(pos) = addPixels(img(pos), pred)
        pos += 1; x += 1
      }
      y += 1
    }
  }

  private def predict(mode: Int, l: Int, t: Int, tl: Int, tr: Int): Int =
    mode match {
      case 0 => 0xFF000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => average2(average2(l, tr), t)
      case 6 => average2(l, tl)
      case 7 => average2(l, t)
      case 8 => average2(tl, t)
      case 9 => average2(t, tr)
      case 10 => average2(average2(l, tl), average2(t, tr))
      case 11 => select(l, t, tl)
      case 12 => clampAddSubtractFull(l, t, tl)
      case 13 => clampAddSubtractHalf(average2(l, t), tl)
    }

  private def average2(a: Int, b: Int): Int =
    ((((a >>> 24) + (b >>> 24)) >> 1) << 24) |
      (((((a >>> 16) & 0xFF) + ((b >>> 16) & 0xFF)) >> 1) << 16) |
      (((((a >>> 8) & 0xFF) + ((b >>> 8) & 0xFF)) >> 1) << 8) |
      (((a & 0xFF) + (b & 0xFF)) >> 1)

  /** Predictor 11: Manhattan distance of the L+T-TL estimate to T vs L
    * (per channel, summed); ties go to T. */
  private def select(l: Int, t: Int, tl: Int): Int = {
    var pL = 0; var pT = 0
    var sh = 0
    while (sh < 32) {
      val lc = (l >>> sh) & 0xFF; val tc = (t >>> sh) & 0xFF
      val tlc = (tl >>> sh) & 0xFF
      pL += math.abs(tc - tlc) // |estimate - L| = |T - TL|
      pT += math.abs(lc - tlc) // |estimate - T| = |L - TL|
      sh += 8
    }
    if (pT <= pL) t else l
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      val v = clamp255(((l >>> sh) & 0xFF) + ((t >>> sh) & 0xFF) -
        ((tl >>> sh) & 0xFF))
      out |= v << sh
      sh += 8
    }
    out
  }

  private def clampAddSubtractHalf(x: Int, tl: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      val a = (x >>> sh) & 0xFF; val b = (tl >>> sh) & 0xFF
      out |= clamp255(a + (a - b) / 2) << sh // C-style truncation toward zero
      sh += 8
    }
    out
  }

  /** Cross-color inverse: the sub-image pixel packs red_to_blue in red,
    * green_to_blue in green, green_to_red in blue; deltas are
    * (int8 elem * int8 channel) >> 5 with sign extension. */
  private def inverseColorTransform(img: Array[Int], w: Int, h: Int,
      bits: Int, ctes: Array[Int]): Unit = {
    val bw = subSize(w, bits)
    def delta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5
    var pos = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cte = ctes((y >> bits) * bw + (x >> bits))
        val g2r = cte & 0xFF
        val g2b = (cte >>> 8) & 0xFF
        val r2b = (cte >>> 16) & 0xFF
        val p = img(pos)
        val g = (p >>> 8) & 0xFF
        val r = (((p >>> 16) & 0xFF) + delta(g2r, g)) & 0xFF
        val b = ((p & 0xFF) + delta(g2b, g) + delta(r2b, r)) & 0xFF
        img(pos) = (p & 0xFF00FF00) | (r << 16) | b
        pos += 1; x += 1
      }
      y += 1
    }
  }

  /** Color-indexing inverse: indices live in the green channel; palettes
    * of <=16 colors bundle several pixels per stored green byte,
    * least-significant bits first. Out-of-range indices resolve to
    * transparent black (the defined libwebp behavior). */
  private def inverseColorIndex(img: Array[Int], packedW: Int, h: Int,
      widthBits: Int, pal: Array[Int], fullW: Int): Array[Int] = {
    val out = new Array[Int](fullW * h)
    val bitsPerPx = 8 >> widthBits
    val mask = (1 << bitsPerPx) - 1
    val countMask = (1 << widthBits) - 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < fullW) {
        val packed = (img(y * packedW + (x >> widthBits)) >>> 8) & 0xFF
        val idx = (packed >> ((x & countMask) * bitsPerPx)) & mask
        out(y * fullW + x) = if (idx < pal.length) pal(idx) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  private def subSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  private def addPixels(a: Int, b: Int): Int =
    ((((a >>> 24) + (b >>> 24)) & 0xFF) << 24) |
      (((((a >>> 16) & 0xFF) + ((b >>> 16) & 0xFF)) & 0xFF) << 16) |
      (((((a >>> 8) & 0xFF) + ((b >>> 8) & 0xFF)) & 0xFF) << 8) |
      (((a & 0xFF) + (b & 0xFF)) & 0xFF)

  private def subPixels(a: Int, b: Int): Int =
    ((((a >>> 24) - (b >>> 24)) & 0xFF) << 24) |
      (((((a >>> 16) & 0xFF) - ((b >>> 16) & 0xFF)) & 0xFF) << 16) |
      (((((a >>> 8) & 0xFF) - ((b >>> 8) & 0xFF)) & 0xFF) << 8) |
      (((a & 0xFF) - (b & 0xFF)) & 0xFF)

  /** LZ77 length/distance prefix: codes 0-3 are the value minus one;
    * above that, (2 + lsb) << extra plus extra bits. */
  private def lz77Value(code: Int, br: BitReader): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      ((2 + (code & 1)) << extra) + br.readBits(extra) + 1
    }

  /** The spec's 120-entry (dx, dy) near-distance map, ordered by
    * distance then angle. */
  private val DistMap: Array[Int] = Array(
    0, 1, 1, 0, 1, 1, -1, 1, 0, 2, 2, 0, 1, 2, -1, 2,
    2, 1, -2, 1, 2, 2, -2, 2, 0, 3, 3, 0, 1, 3, -1, 3,
    3, 1, -3, 1, 2, 3, -2, 3, 3, 2, -3, 2, 0, 4, 4, 0,
    1, 4, -1, 4, 4, 1, -4, 1, 3, 3, -3, 3, 2, 4, -2, 4,
    4, 2, -4, 2, 0, 5, 3, 4, -3, 4, 4, 3, -4, 3, 5, 0,
    1, 5, -1, 5, 5, 1, -5, 1, 2, 5, -2, 5, 5, 2, -5, 2,
    4, 4, -4, 4, 3, 5, -3, 5, 5, 3, -5, 3, 0, 6, 6, 0,
    1, 6, -1, 6, 6, 1, -6, 1, 2, 6, -2, 6, 6, 2, -6, 2,
    4, 5, -4, 5, 5, 4, -5, 4, 3, 6, -3, 6, 6, 3, -6, 3,
    0, 7, 7, 0, 1, 7, -1, 7, 5, 5, -5, 5, 7, 1, -7, 1,
    4, 6, -4, 6, 6, 4, -6, 4, 2, 7, -2, 7, 7, 2, -7, 2,
    3, 7, -3, 7, 7, 3, -7, 3, 5, 6, -5, 6, 6, 5, -6, 5,
    8, 0, 4, 7, -4, 7, 7, 4, -7, 4, 8, 1, 8, 2, 6, 6,
    -6, 6, 8, 3, 5, 7, -5, 7, 7, 5, -7, 5, 8, 4, 6, 7,
    -6, 7, 7, 6, -7, 6, 8, 5, 7, 7, -7, 7, 8, 6, 8, 7)

  // --------------------------------------------------- prefix-code reading

  private val CodeLengthOrder = Array(
    17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  private def readPrefixCode(br: BitReader, alphabet: Int): Huffman =
    if (br.readBits(1) == 1) { // simple: 1 or 2 symbols spelled out
      val numSyms = br.readBits(1) + 1
      val first = if (br.readBits(1) == 1) br.readBits(8) else br.readBits(1)
      val syms = if (numSyms == 2) Array(first, br.readBits(8)) else Array(first)
      Huffman.simple(syms)
    } else {
      val numCl = 4 + br.readBits(4)
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLens(CodeLengthOrder(i)) = br.readBits(3); i += 1 }
      val clCode = Huffman.fromLengths(clLens)
      var budget = // max_symbol: cap on the number of decode operations
        if (br.readBits(1) == 1) {
          val nbits = 2 + 2 * br.readBits(3)
          2 + br.readBits(nbits)
        } else alphabet
      val lens = new Array[Int](alphabet)
      var prev = 8
      var sym = 0
      while (sym < alphabet && budget > 0) {
        budget -= 1
        val cl = clCode.read(br)
        if (cl < 16) {
          lens(sym) = cl; sym += 1
          if (cl != 0) prev = cl
        } else {
          val (repeat, v) = cl match {
            case 16 => (3 + br.readBits(2), prev)
            case 17 => (3 + br.readBits(3), 0)
            case _ => (11 + br.readBits(7), 0)
          }
          require(sym + repeat <= alphabet,
            s"VP8L code-length repeat overruns the alphabet ($sym+$repeat > $alphabet)")
          var k = 0
          while (k < repeat) { lens(sym) = v; sym += 1; k += 1 }
        }
      }
      Huffman.fromLengths(lens)
    }

  /** Canonical prefix code: DEFLATE-style assignment (shorter codes
    * first, ties by symbol), bits read most-significant-first. A lone
    * symbol decodes with zero bits (both the simple form and a
    * length-coded code with one nonzero length). */
  private final class Huffman(sorted: Array[Int], countByLen: Array[Int],
      firstCodeByLen: Array[Int], cumByLen: Array[Int]) {
    def read(br: BitReader): Int = {
      require(sorted.length > 0, "read from an empty VP8L prefix code")
      if (sorted.length == 1) return sorted(0)
      var code = 0
      var len = 0
      while (len < countByLen.length - 1) {
        code = (code << 1) | br.readBits(1)
        len += 1
        val off = code - firstCodeByLen(len)
        if (off >= 0 && off < countByLen(len)) return sorted(cumByLen(len) + off)
      }
      throw new IllegalArgumentException(
        s"invalid VP8L prefix code (no symbol within ${countByLen.length - 1} bits)")
    }
  }

  private object Huffman {
    def simple(syms: Array[Int]): Huffman =
      if (syms.length == 1) new Huffman(syms, Array(0), Array(0), Array(0))
      else // two symbols, one bit each: bit 0 -> first, 1 -> second
        new Huffman(syms, Array(0, 2), Array(0, 0), Array(0, 0))

    def fromLengths(lens: Array[Int]): Huffman = {
      var maxLen = 0
      var used = 0
      var i = 0
      while (i < lens.length) {
        if (lens(i) > 0) { used += 1; if (lens(i) > maxLen) maxLen = lens(i) }
        i += 1
      }
      if (used <= 1) {
        val syms = (0 until lens.length).filter(lens(_) > 0).toArray
        return new Huffman(syms, Array(0), Array(0), Array(0))
      }
      val count = new Array[Int](maxLen + 1)
      i = 0
      while (i < lens.length) { if (lens(i) > 0) count(lens(i)) += 1; i += 1 }
      // completeness (Kraft): over- or under-subscription refuses by name
      var kraft = 0L
      var len = 1
      while (len <= maxLen) { kraft += count(len).toLong << (maxLen - len); len += 1 }
      require(kraft == (1L << maxLen),
        s"invalid VP8L prefix code lengths (Kraft sum $kraft != ${1L << maxLen})")
      val firstCode = new Array[Int](maxLen + 1)
      val cum = new Array[Int](maxLen + 1)
      var code = 0
      var c = 0
      len = 1
      while (len <= maxLen) {
        firstCode(len) = code
        cum(len) = c
        code = (code + count(len)) << 1
        c += count(len)
        len += 1
      }
      val sorted = new Array[Int](used)
      val fill = cum.clone()
      i = 0
      while (i < lens.length) {
        if (lens(i) > 0) { sorted(fill(lens(i))) = i; fill(lens(i)) += 1 }
        i += 1
      }
      new Huffman(sorted, count, firstCode, cum)
    }
  }

  private final class BitReader(bytes: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var buf = 0L
    private var cnt = 0
    def readBits(n: Int): Int = {
      while (cnt < n) {
        require(pos < end, s"truncated VP8L stream at byte offset $pos")
        buf |= (bytes(pos) & 0xFFL) << cnt
        pos += 1; cnt += 8
      }
      val v = (buf & ((1L << n) - 1)).toInt
      buf >>>= n; cnt -= n
      v
    }
  }

  // ---------------------------------------------------------------- encode

  /** Fixture-encoder knobs; each exercises a distinct decoder path. */
  final case class EncodeOpts(
      subtractGreen: Boolean = false,
      predictorMode: Int = -1, // -1 off; 0-13 = uniform spatial prediction
      colorTransform: Option[(Int, Int, Int)] = None, // (g2r, g2b, r2b) int8s
      palette: Boolean = false, // color indexing; bundles when <=16 colors
      cacheBits: Int = 0, // color cache
      rleBackrefs: Boolean = false, // distance-1 LZ77 runs
      vp8x: Boolean = false) // wrap in the extended container

  /** Encode ARGB pixels as a lossless WebP. The palette transform is
    * exclusive of the pixel-domain transforms (the packed image's green
    * bytes are not meaningful color channels). */
  def encode(width: Int, height: Int, argb: Array[Int],
      opts: EncodeOpts = EncodeOpts()): Array[Byte] = {
    require(argb.length == width * height,
      s"pixel count ${argb.length} != $width x $height")
    require(width <= 16384 && height <= 16384, "VP8L dimensions are 14-bit")
    require(!(opts.palette && (opts.subtractGreen || opts.predictorMode >= 0 ||
      opts.colorTransform.nonEmpty)),
      "palette mode is exclusive of pixel-domain transforms")
    val bw = new BitWriter
    bw.writeBits(0x2F, 8)
    bw.writeBits(width - 1, 14)
    bw.writeBits(height - 1, 14)
    bw.writeBits(if (argb.exists(p => (p >>> 24) != 0xFF)) 1 else 0, 1)
    bw.writeBits(0, 3) // version

    var pix = argb.clone()
    var w = width
    if (opts.palette) {
      val pal = distinctInOrder(argb)
      require(pal.length <= 256, s"palette mode needs <=256 colors, got ${pal.length}")
      val widthBits =
        if (pal.length <= 2) 3 else if (pal.length <= 4) 2
        else if (pal.length <= 16) 1 else 0
      bw.writeBits(1, 1); bw.writeBits(3, 2)
      bw.writeBits(pal.length - 1, 8)
      val deltas = Array.tabulate(pal.length)(i =>
        if (i == 0) pal(i) else subPixels(pal(i), pal(i - 1)))
      encodeImageStream(bw, deltas, cacheBits = 0, rle = false)
      val idxOf = pal.zipWithIndex.toMap
      val packedW = subSize(width, widthBits)
      val bitsPerPx = 8 >> widthBits
      val packed = new Array[Int](packedW * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val idx = idxOf(argb(y * width + x))
          val cell = y * packedW + (x >> widthBits)
          val shift = (x & ((1 << widthBits) - 1)) * bitsPerPx
          packed(cell) |= idx << (8 + shift) // indices live in green
          x += 1
        }
        y += 1
      }
      var i = 0
      while (i < packed.length) { packed(i) |= 0xFF000000; i += 1 }
      pix = packed
      w = packedW
    } else {
      if (opts.subtractGreen) {
        bw.writeBits(1, 1); bw.writeBits(2, 2)
        var i = 0
        while (i < pix.length) {
          val p = pix(i); val g = (p >>> 8) & 0xFF
          pix(i) = (p & 0xFF00FF00) |
            ((((p >>> 16) & 0xFF) - g) & 0xFF) << 16 | ((p - g) & 0xFF)
          i += 1
        }
      }
      opts.colorTransform.foreach { case (g2r, g2b, r2b) =>
        bw.writeBits(1, 1); bw.writeBits(1, 2)
        val bits = 4
        bw.writeBits(bits - 2, 3)
        val cte = 0xFF000000 | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) | (g2r & 0xFF)
        encodeImageStream(bw,
          Array.fill(subSize(w, bits) * subSize(height, bits))(cte),
          cacheBits = 0, rle = false)
        def delta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5
        var i = 0
        while (i < pix.length) { // forward: subtract what the inverse adds
          val p = pix(i)
          val g = (p >>> 8) & 0xFF
          val r0 = (p >>> 16) & 0xFF
          val r = (r0 - delta(g2r, g)) & 0xFF
          val b = ((p & 0xFF) - delta(g2b, g) - delta(r2b, r0)) & 0xFF
          pix(i) = (p & 0xFF00FF00) | (r << 16) | b
          i += 1
        }
      }
      if (opts.predictorMode >= 0) {
        require(opts.predictorMode <= 13, "predictor mode 0-13")
        bw.writeBits(1, 1); bw.writeBits(0, 2)
        val bits = 4
        bw.writeBits(bits - 2, 3)
        encodeImageStream(bw,
          Array.fill(subSize(w, bits) * subSize(height, bits))(
            0xFF000000 | (opts.predictorMode << 8)),
          cacheBits = 0, rle = false)
        val res = new Array[Int](pix.length)
        var pos = 0
        var y = 0
        while (y < height) {
          var x = 0
          while (x < w) {
            val pred =
              if (x == 0 && y == 0) 0xFF000000
              else if (y == 0) pix(pos - 1)
              else if (x == 0) pix(pos - w)
              else predict(opts.predictorMode, pix(pos - 1), pix(pos - w),
                pix(pos - w - 1), pix(pos - w + 1))
            res(pos) = subPixels(pix(pos), pred)
            pos += 1; x += 1
          }
          y += 1
        }
        pix = res
      }
    }
    bw.writeBits(0, 1) // end of transforms
    encodeImageStream(bw, pix, opts.cacheBits, opts.rleBackrefs,
      writeMetaBit = true)
    wrapRiff(bw.result(), width, height, opts)
  }

  /** Encode one entropy-coded image: cache bit, [meta bit], five prefix
    * codes, token stream. Sub-images (palette, transform data) skip the
    * meta bit — the decoder only reads it at level 0. */
  private def encodeImageStream(bw: BitWriter, pix: Array[Int],
      cacheBits: Int, rle: Boolean, writeMetaBit: Boolean = false): Unit = {
    if (cacheBits > 0) { bw.writeBits(1, 1); bw.writeBits(cacheBits, 4) }
    else bw.writeBits(0, 1)
    if (writeMetaBit) bw.writeBits(0, 1)
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    val cacheSet = if (cacheSize > 0) new Array[Boolean](cacheSize) else null

    // tokens: (greenSym, extraVal, extraBits, literal r/b/a or dist token)
    final case class Tok(green: Int, r: Int = -1, b: Int = -1, a: Int = -1,
        lenExtra: Int = 0, lenExtraBits: Int = 0,
        distSym: Int = -1, distExtra: Int = 0, distExtraBits: Int = 0)
    val toks = ArrayBuffer.empty[Tok]
    var pos = 0
    while (pos < pix.length) {
      val p = pix(pos)
      var run = 0
      if (rle && pos > 0 && p == pix(pos - 1)) {
        var k = pos
        while (k < pix.length && pix(k) == pix(pos - 1) && run < 4096) {
          run += 1; k += 1
        }
      }
      if (run >= 3) {
        val (lenSym, lenExtra, lenBits) = lz77Code(run)
        val (dSym, dExtra, dBits) = lz77Code(121) // plain distance 1 (+120)
        toks += Tok(256 + lenSym, lenExtra = lenExtra, lenExtraBits = lenBits,
          distSym = dSym, distExtra = dExtra, distExtraBits = dBits)
        var k = 0
        while (k < run) { cacheInsertEnc(cache, cacheSet, cacheBits, pix(pos)); pos += 1; k += 1 }
      } else {
        val hit =
          if (cache == null) -1
          else {
            val idx = (0x1e35a7bd * p) >>> (32 - cacheBits)
            if (cacheSet(idx) && cache(idx) == p) idx else -1
          }
        if (hit >= 0) toks += Tok(256 + 24 + hit)
        else toks += Tok((p >>> 8) & 0xFF, r = (p >>> 16) & 0xFF,
          b = p & 0xFF, a = (p >>> 24) & 0xFF)
        cacheInsertEnc(cache, cacheSet, cacheBits, p)
        pos += 1
      }
    }

    val greenAlphabet = 256 + 24 + cacheSize
    val hG = new Array[Int](greenAlphabet)
    val hR = new Array[Int](256); val hB = new Array[Int](256)
    val hA = new Array[Int](256); val hD = new Array[Int](40)
    toks.foreach { t =>
      hG(t.green) += 1
      if (t.r >= 0) { hR(t.r) += 1; hB(t.b) += 1; hA(t.a) += 1 }
      if (t.distSym >= 0) hD(t.distSym) += 1
    }
    val cG = writePrefixCode(bw, hG)
    val cR = writePrefixCode(bw, hR)
    val cB = writePrefixCode(bw, hB)
    val cA = writePrefixCode(bw, hA)
    val cD = writePrefixCode(bw, hD)
    toks.foreach { t =>
      bw.writeCode(cG(t.green))
      if (t.green < 256) {
        bw.writeCode(cR(t.r)); bw.writeCode(cB(t.b)); bw.writeCode(cA(t.a))
      } else if (t.green < 280) {
        bw.writeBits(t.lenExtra, t.lenExtraBits)
        bw.writeCode(cD(t.distSym))
        bw.writeBits(t.distExtra, t.distExtraBits)
      }
    }
  }

  private def cacheInsertEnc(cache: Array[Int], set: Array[Boolean],
      bits: Int, p: Int): Unit =
    if (cache != null) {
      val idx = (0x1e35a7bd * p) >>> (32 - bits)
      cache(idx) = p; set(idx) = true
    }

  /** value -> (prefix symbol, extra value, extra bit count); inverse of
    * [[lz77Value]]. */
  private def lz77Code(value: Int): (Int, Int, Int) =
    if (value <= 4) (value - 1, 0, 0)
    else {
      // find (sym, extra) s.t. ((2+(sym&1))<<extra)+rest+1 == value
      var s = 4
      while (s < 40) {
        val e = (s - 2) >> 1
        val lo = ((2 + (s & 1)) << e) + 1
        val hi = lo + (1 << e) - 1
        if (value >= lo && value <= hi) return (s, value - lo, e)
        s += 1
      }
      throw new IllegalArgumentException(s"LZ77 value $value out of range")
    }

  /** Write one prefix code: the simple form when <=2 used symbols all
    * below 256, else canonical lengths through the code-length code. A
    * lone used symbol >=256 gets a dummy companion length (never
    * emitted) so the code stays complete. */
  private def writePrefixCode(bw: BitWriter,
      freq: Array[Int]): Array[(Int, Int)] = {
    val used = (0 until freq.length).filter(freq(_) > 0)
    if (used.isEmpty) { // unused code (e.g. distance with no refs)
      bw.writeBits(1, 1); bw.writeBits(0, 1) // simple, 1 symbol
      bw.writeBits(0, 1); bw.writeBits(0, 1) // 1-bit symbol 0
      return new Array[(Int, Int)](freq.length)
    }
    if (used.length == 1 && used(0) < 256) {
      bw.writeBits(1, 1); bw.writeBits(0, 1)
      writeSimpleSymbol(bw, used(0))
      val codes = new Array[(Int, Int)](freq.length)
      codes(used(0)) = (0, 0)
      return codes
    }
    if (used.length == 2 && used(1) < 256) {
      bw.writeBits(1, 1); bw.writeBits(1, 1)
      writeSimpleSymbol(bw, used(0))
      bw.writeBits(used(1), 8)
      val codes = new Array[(Int, Int)](freq.length)
      codes(used(0)) = (0, 1); codes(used(1)) = (1, 1)
      return codes
    }
    val f = freq.clone()
    if (used.length == 1) f(if (used(0) == 0) 1 else 0) = 1 // dummy companion
    val lens = huffmanLengths(f, 15)
    writeCodeLengths(bw, lens)
    canonicalCodes(lens)
  }

  private def writeSimpleSymbol(bw: BitWriter, sym: Int): Unit =
    if (sym <= 1) { bw.writeBits(0, 1); bw.writeBits(sym, 1) }
    else { bw.writeBits(1, 1); bw.writeBits(sym, 8) }

  /** RLE the lengths through the 19-symbol code-length code (16 repeats
    * the previous nonzero length, 17/18 run zeros), mirroring the
    * decoder's prev tracking exactly. */
  private def writeCodeLengths(bw: BitWriter, lens: Array[Int]): Unit = {
    bw.writeBits(0, 1) // not simple
    final case class ClTok(sym: Int, extra: Int, extraBits: Int)
    val toks = ArrayBuffer.empty[ClTok]
    var prev = 8
    var i = 0
    while (i < lens.length) {
      if (lens(i) == 0) {
        var run = 0
        while (i + run < lens.length && lens(i + run) == 0) run += 1
        var left = run
        while (left >= 11) {
          val take = math.min(left, 138)
          toks += ClTok(18, take - 11, 7); left -= take
        }
        if (left >= 3) { toks += ClTok(17, left - 3, 3); left = 0 }
        while (left > 0) { toks += ClTok(0, 0, 0); left -= 1 }
        i += run
      } else {
        toks += ClTok(lens(i), 0, 0)
        prev = lens(i)
        var run = 0
        while (i + 1 + run < lens.length && lens(i + 1 + run) == prev &&
          run < 400) run += 1
        var left = run
        while (left >= 3) {
          val take = math.min(left, 6)
          toks += ClTok(16, take - 3, 2); left -= take
        }
        while (left > 0) { toks += ClTok(prev, 0, 0); left -= 1 }
        i += 1 + run
      }
    }
    val clFreq = new Array[Int](19)
    toks.foreach(t => clFreq(t.sym) += 1)
    if (clFreq.count(_ > 0) == 1) { // keep the CL code itself complete
      val lone = clFreq.indexWhere(_ > 0)
      clFreq(if (lone == 0) 1 else 0) = 1
    }
    val clLens = huffmanLengths(clFreq, 7)
    bw.writeBits(19 - 4, 4) // num_code_lengths = 19
    var k = 0
    while (k < 19) { bw.writeBits(clLens(CodeLengthOrder(k)), 3); k += 1 }
    bw.writeBits(0, 1) // no max_symbol shortcut
    val clCodes = canonicalCodes(clLens)
    toks.foreach { t =>
      bw.writeCode(clCodes(t.sym))
      if (t.extraBits > 0) bw.writeBits(t.extra, t.extraBits)
    }
  }

  /** Length-limited Huffman code lengths: merge-queue construction with
    * frequency-halving retries when the depth exceeds the limit. */
  private def huffmanLengths(freq: Array[Int], limit: Int): Array[Int] = {
    var f = freq
    while (true) {
      val lens = unboundedHuffman(f)
      if (lens.forall(_ <= limit)) return lens
      f = f.map(x => if (x == 0) 0 else math.max(1, x >> 1))
    }
    throw new IllegalStateException("unreachable")
  }

  private def unboundedHuffman(freq: Array[Int]): Array[Int] = {
    val used = (0 until freq.length).filter(freq(_) > 0)
    val lens = new Array[Int](freq.length)
    if (used.length == 1) { lens(used(0)) = 1; return lens }
    final case class Node(w: Long, syms: List[Int])
    val pq = scala.collection.mutable.PriorityQueue.empty[Node](
      Ordering.by[Node, Long](_.w).reverse)
    used.foreach(s => pq.enqueue(Node(freq(s), List(s))))
    while (pq.size > 1) {
      val a = pq.dequeue(); val b = pq.dequeue()
      (a.syms ++ b.syms).foreach(s => lens(s) += 1)
      pq.enqueue(Node(a.w + b.w, a.syms ++ b.syms))
    }
    lens
  }

  /** Canonical (code, length) per symbol, matching the decoder's
    * assignment. */
  private def canonicalCodes(lens: Array[Int]): Array[(Int, Int)] = {
    val maxLen = lens.max
    val count = new Array[Int](maxLen + 1)
    lens.foreach(l => if (l > 0) count(l) += 1)
    val next = new Array[Int](maxLen + 1)
    var code = 0
    var len = 1
    while (len <= maxLen) {
      next(len) = code
      code = (code + count(len)) << 1
      len += 1
    }
    val codes = new Array[(Int, Int)](lens.length)
    var i = 0
    while (i < lens.length) {
      if (lens(i) > 0) { codes(i) = (next(lens(i)), lens(i)); next(lens(i)) += 1 }
      i += 1
    }
    codes
  }

  private def distinctInOrder(argb: Array[Int]): Array[Int] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[Int]
    argb.foreach(seen += _)
    seen.toArray
  }

  private def wrapRiff(payload: Array[Byte], width: Int, height: Int,
      opts: EncodeOpts): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    def ascii(s: String): Unit = s.foreach(c => out += c.toByte)
    def u32le(v: Int): Unit = {
      out += (v & 0xFF).toByte; out += ((v >> 8) & 0xFF).toByte
      out += ((v >> 16) & 0xFF).toByte; out += ((v >> 24) & 0xFF).toByte
    }
    def chunk(fc: String, data: Array[Byte]): Unit = {
      ascii(fc); u32le(data.length); out ++= data
      if ((data.length & 1) == 1) out += 0
    }
    out.clear()
    if (opts.vp8x) {
      val x = new Array[Byte](10)
      x(0) = 0 // flags (no ICC/EXIF/XMP/anim; alpha flag optional)
      val wm = width - 1; val hm = height - 1
      x(4) = (wm & 0xFF).toByte; x(5) = ((wm >> 8) & 0xFF).toByte
      x(6) = ((wm >> 16) & 0xFF).toByte
      x(7) = (hm & 0xFF).toByte; x(8) = ((hm >> 8) & 0xFF).toByte
      x(9) = ((hm >> 16) & 0xFF).toByte
      ascii("VP8X"); u32le(10); out ++= x
    }
    chunk("VP8L", payload)
    val body = out.toArray
    out.clear()
    ascii("RIFF"); u32le(4 + body.length); ascii("WEBP"); out ++= body
    out.toArray
  }

  private final class BitWriter {
    private val out = ArrayBuffer.empty[Byte]
    private var cur = 0
    private var cnt = 0
    def writeBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << cnt
        cnt += 1
        if (cnt == 8) { out += cur.toByte; cur = 0; cnt = 0 }
        i += 1
      }
    }
    /** Prefix-code bits go most-significant-first. */
    def writeCode(cl: (Int, Int)): Unit = {
      val (code, len) = cl
      var i = len - 1
      while (i >= 0) { writeBits((code >> i) & 1, 1); i -= 1 }
    }
    def result(): Array[Byte] = {
      if (cnt > 0) { out += cur.toByte; cur = 0; cnt = 0 }
      out.toArray
    }
  }
}
