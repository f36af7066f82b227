package graft.sources.grib

import java.io.ByteArrayOutputStream
import scala.collection.mutable.ArrayBuffer

/** In-repo JPEG 2000 Part-1 codec for GRIB2 data representation template
  * 5.40 — the packing ECMWF archives (ERA5, the reference's target dataset;
  * reference docs/etl_developers_manual.md:158-168) actually ship.
  *
  * Implemented from the public ITU-T T.800 / ISO 15444-1 specification:
  * codestream markers (SOC/SIZ/COD/QCD/SOT/SOD/EOC), Tier-2 packet headers
  * (tag trees, FF-stuffed bit packing, Lblock length signalling), Tier-1
  * EBCOT block coding (MQ arithmetic coder, significance-propagation /
  * magnitude-refinement / cleanup passes with run-length mode), and the
  * reversible 5/3 integer wavelet with whole-sample symmetric extension.
  * The MQ byte-level carry/stuffing arithmetic follows the spec's Annex C
  * software conventions (the same conventions OpenJPEG implements).
  *
  * Scope is the GRIB profile every operational encoder (g2clib via JasPer,
  * eccodes via OpenJPEG) emits: one tile, one unsigned component, no
  * subsampling, reversible 5/3 (lossless, compression type 0), maximal
  * precincts, default code-block style. The decoder additionally accepts
  * multiple quality layers (LRCP/RLCP) and multiple tile-parts, and
  * refuses everything outside the profile BY NAME (9/7 irreversible,
  * bypass/termall/causal block styles, POC/RGN/PPM/PPT, …) so a user sees
  * the precise unsupported feature, never wrong data.
  *
  * The encoder exists so the decoder is testable offline: fixtures and
  * ScalaCheck roundtrips drive both sides, mirroring [[Ccsds]] and [[Png]].
  */
object Jpeg2000 {

  // ---------------------------------------------------------------- MQ coder

  /** State-transition table from the spec (Table C.2): Qe, NMPS, NLPS,
    * SWITCH for the 47 states. */
  private val Qe = Array(
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601)
  private val Nmps = Array(
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46)
  private val Nlps = Array(
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14,
    15, 16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29,
    30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46)
  private val Switch = Array(
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  // Tier-1 context indices: 0-8 zero coding, 9-13 sign coding,
  // 14-16 magnitude refinement, 17 run-length, 18 uniform.
  private val CtxRl = 17
  private val CtxUni = 18
  private val NumCtx = 19

  private def initStates(i: Array[Int]): Unit = {
    java.util.Arrays.fill(i, 0)
    i(0) = 4; i(CtxRl) = 3; i(CtxUni) = 46
  }

  private val Mask32 = 0xFFFFFFFFL

  private final class MqEncoder {
    private val i = new Array[Int](NumCtx)
    private val mps = new Array[Int](NumCtx)
    initStates(i)
    private var a = 0x8000
    private var c = 0L
    private var ct = 12
    // buf(0) is the spec's B-1 carry sink (bp starts one before the data)
    private val buf = ArrayBuffer[Int](0)
    private var bp = 0

    def encode(cx: Int, d: Int): Unit = {
      val q = Qe(i(cx))
      if (d == mps(cx)) { // CODEMPS
        a -= q
        if ((a & 0x8000) == 0) {
          if (a < q) a = q else c += q
          i(cx) = Nmps(i(cx))
          renorme()
        } else c += q
      } else { // CODELPS
        a -= q
        if (a < q) c += q else a = q
        if (Switch(i(cx)) == 1) mps(cx) ^= 1
        i(cx) = Nlps(i(cx))
        renorme()
      }
    }

    private def renorme(): Unit = {
      do {
        a = (a << 1) & 0xFFFF
        c = (c << 1) & Mask32
        ct -= 1
        if (ct == 0) byteout()
      } while ((a & 0x8000) == 0)
    }

    private def put(v: Int): Unit = { bp += 1; if (bp == buf.length) buf += (v & 0xFF) else buf(bp) = v & 0xFF }

    private def byteout(): Unit = {
      if (buf(bp) == 0xFF) {
        put((c >> 20).toInt); c &= 0xFFFFF; ct = 7
      } else if ((c & 0x8000000L) == 0) {
        put((c >> 19).toInt); c &= 0x7FFFF; ct = 8
      } else {
        buf(bp) = (buf(bp) + 1) & 0xFF // carry into the previous byte
        if (buf(bp) == 0xFF) {
          c &= 0x7FFFFFF
          put((c >> 20).toInt); c &= 0xFFFFF; ct = 7
        } else {
          put((c >> 19).toInt); c &= 0x7FFFF; ct = 8
        }
      }
    }

    /** FLUSH: final bytes; returns the codeword segment. */
    def flush(): Array[Byte] = {
      val tempc = c + a // SETBITS
      c |= 0xFFFF
      if (c >= tempc) c -= 0x8000
      c = (c << ct) & Mask32; byteout()
      c = (c << ct) & Mask32; byteout()
      if (buf(bp) != 0xFF) bp += 1
      val out = new Array[Byte](bp - 1)
      var k = 1
      while (k < bp) { out(k - 1) = buf(k).toByte; k += 1 }
      out
    }
  }

  private final class MqDecoder(data: Array[Byte], start: Int, end: Int) {
    private val i = new Array[Int](NumCtx)
    private val mps = new Array[Int](NumCtx)
    initStates(i)
    private var bp = start
    private def byteAt(p: Int): Int = if (p < end) data(p) & 0xFF else 0xFF
    private var c: Long = byteAt(bp).toLong << 16
    private var ct = 0
    bytein()
    c = (c << 7) & Mask32
    ct -= 7
    private var a = 0x8000

    private def bytein(): Unit = {
      if (byteAt(bp) == 0xFF) {
        if (byteAt(bp + 1) > 0x8F) { c += 0xFF00; ct = 8 }
        else { bp += 1; c += byteAt(bp).toLong << 9; ct = 7 }
      } else { bp += 1; c += byteAt(bp).toLong << 8; ct = 8 }
    }

    def decode(cx: Int): Int = {
      val q = Qe(i(cx))
      a -= q
      var d = 0
      if (((c >> 16) & 0xFFFF) < q) {
        // LPS exchange
        if (a < q) { d = mps(cx); i(cx) = Nmps(i(cx)) }
        else {
          d = 1 - mps(cx)
          if (Switch(i(cx)) == 1) mps(cx) ^= 1
          i(cx) = Nlps(i(cx))
        }
        a = q
        renormd()
      } else {
        c -= q.toLong << 16
        if ((a & 0x8000) == 0) {
          // MPS exchange
          if (a < q) {
            d = 1 - mps(cx)
            if (Switch(i(cx)) == 1) mps(cx) ^= 1
            i(cx) = Nlps(i(cx))
          } else { d = mps(cx); i(cx) = Nmps(i(cx)) }
          renormd()
        } else d = mps(cx)
      }
      d
    }

    private def renormd(): Unit = {
      do {
        if (ct == 0) bytein()
        a = (a << 1) & 0xFFFF
        c = (c << 1) & Mask32
        ct -= 1
      } while ((a & 0x8000) == 0)
    }
  }

  // ------------------------------------------------- packet-header bit I/O

  /** MSB-first bit sink with the packet-header stuffing rule: a byte
    * following 0xFF carries only 7 payload bits (its MSB is 0), and a
    * header may not end on 0xFF. */
  private final class HdrWriter {
    val out = new ByteArrayOutputStream()
    private var bitBuf = 0
    private var nBits = 0
    private var lastWasFF = false
    def bit(b: Int): Unit = {
      val cap = if (lastWasFF) 7 else 8
      bitBuf = (bitBuf << 1) | (b & 1)
      nBits += 1
      if (nBits == cap) {
        out.write(bitBuf)
        lastWasFF = bitBuf == 0xFF
        bitBuf = 0; nBits = 0
      }
    }
    def bits(v: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) { bit((v >>> k) & 1); k -= 1 }
    }
    def flush(): Unit = {
      if (nBits > 0) {
        val cap = if (lastWasFF) 7 else 8
        bitBuf <<= (cap - nBits)
        out.write(bitBuf)
        lastWasFF = bitBuf == 0xFF
        bitBuf = 0; nBits = 0
      }
      if (lastWasFF) { out.write(0); lastWasFF = false }
    }
  }

  private final class HdrReader(data: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var avail = 0
    private var lastWasFF = false
    def bit(): Int = {
      if (avail == 0) {
        val stuffed = lastWasFF
        require(pos < data.length, "packet header truncated")
        val b = data(pos) & 0xFF
        pos += 1
        if (stuffed) {
          require((b & 0x80) == 0, "packet-header bit stuffing violated")
          avail = 7; lastWasFF = false
        } else { avail = 8; lastWasFF = b == 0xFF }
        bitBuf = b
      }
      avail -= 1
      (bitBuf >>> avail) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var k = 0
      while (k < n) { v = (v << 1) | bit(); k += 1 }
      v
    }
    /** End-of-header: drop the partial byte; consume the stuffed byte if
      * the last full byte was 0xFF. */
    def alignEnd(): Unit = {
      avail = 0; bitBuf = 0
      if (lastWasFF) {
        require(pos < data.length && (data(pos) & 0x80) == 0,
          "packet-header bit stuffing violated at header end")
        pos += 1
        lastWasFF = false
      }
    }
  }

  // ------------------------------------------------------------- tag trees

  /** Tag tree over a w x h leaf grid (T.800 B.10.2). The same node state
    * drives encode (values known upfront) and decode (lower bounds learned
    * from the bit stream). */
  private final class TagTree(w: Int, h: Int) {
    private val dims = {
      val b = ArrayBuffer[(Int, Int)]()
      var lw = math.max(w, 1); var lh = math.max(h, 1)
      b += ((lw, lh))
      while (lw > 1 || lh > 1) { lw = (lw + 1) / 2; lh = (lh + 1) / 2; b += ((lw, lh)) }
      b.toArray // level 0 = leaves … last = root (1x1)
    }
    private val offs = dims.scanLeft(0) { case (o, (dw, dh)) => o + dw * dh }
    private val nNodes = offs.last
    private val value = new Array[Int](nNodes) // encoder: subtree min
    private val low = new Array[Int](nNodes)
    private val known = new Array[Boolean](nNodes)
    private def node(level: Int, i: Int, j: Int): Int =
      offs(level) + (j >> level) * dims(level)._1 + (i >> level)

    def setLeaf(i: Int, j: Int, v: Int): Unit = value(node(0, i, j)) = v

    /** Propagate subtree minima upward (encoder, after all leaves set). */
    def finish(): Unit = {
      var lvl = 1
      while (lvl < dims.length) {
        val (dw, dh) = dims(lvl)
        var j = 0
        while (j < dh) {
          var i = 0
          while (i < dw) {
            val (cw, ch) = dims(lvl - 1)
            var m = Int.MaxValue
            var cj = j * 2
            while (cj < math.min(j * 2 + 2, ch)) {
              var ci = i * 2
              while (ci < math.min(i * 2 + 2, cw)) {
                m = math.min(m, value(offs(lvl - 1) + cj * cw + ci))
                ci += 1
              }
              cj += 1
            }
            value(offs(lvl) + j * dw + i) = m
            i += 1
          }
          j += 1
        }
        lvl += 1
      }
    }

    /** Encoder walk: emit bits so the decoder's walk at `threshold`
      * resolves identically. */
    def encodeUpTo(wr: HdrWriter, i: Int, j: Int, threshold: Int): Unit = {
      var lowBound = 0
      var lvl = dims.length - 1
      while (lvl >= 0) {
        val k = node(lvl, i, j)
        if (low(k) < lowBound) low(k) = lowBound
        while (low(k) < threshold && !known(k)) {
          if (low(k) < value(k)) { wr.bit(0); low(k) += 1 }
          else { wr.bit(1); known(k) = true }
        }
        lowBound = low(k)
        lvl -= 1
      }
    }

    /** Encode until the leaf value itself is fully signalled. */
    def encodeValue(wr: HdrWriter, i: Int, j: Int): Unit = {
      var t = 1
      while (!known(node(0, i, j))) { encodeUpTo(wr, i, j, t); t += 1 }
    }

    /** Decoder walk: true iff the leaf is known < threshold. */
    def decodeUpTo(rd: HdrReader, i: Int, j: Int, threshold: Int): Boolean = {
      var lowBound = 0
      var lvl = dims.length - 1
      while (lvl >= 0) {
        val k = node(lvl, i, j)
        if (low(k) < lowBound) low(k) = lowBound
        while (low(k) < threshold && !known(k)) {
          if (rd.bit() == 1) known(k) = true else low(k) += 1
        }
        lowBound = low(k)
        lvl -= 1
      }
      val leaf = node(0, i, j)
      known(leaf) && low(leaf) < threshold
    }

    /** Decode the exact leaf value (zero-bitplane signalling). */
    def decodeValue(rd: HdrReader, i: Int, j: Int): Int = {
      var t = 1
      while (!decodeUpTo(rd, i, j, t)) t += 1
      low(node(0, i, j))
    }
  }

  // --------------------------------------------------------- Tier-1 EBCOT

  /** Shared neighborhood/context machinery for one code block. `orient`:
    * 0 = LL, 1 = HL, 2 = LH, 3 = HH (zero-coding tables per T.800 D.3.1;
    * HL swaps the H/V sums, HH keys on the diagonal sum). */
  private final class BlockCoder(w: Int, h: Int, orient: Int) {
    val n: Int = w * h
    val sig = new Array[Boolean](n)
    val sigNew = new Array[Boolean](n)
    val visited = new Array[Boolean](n)
    val refined = new Array[Boolean](n)
    val mag = new Array[Int](n)
    val neg = new Array[Boolean](n)

    @inline private def s(x: Int, y: Int): Int =
      if (x < 0 || x >= w || y < 0 || y >= h) 0 else if (sig(y * w + x)) 1 else 0

    def zcCtx(x: Int, y: Int): Int = {
      val hh = s(x - 1, y) + s(x + 1, y)
      val vv = s(x, y - 1) + s(x, y + 1)
      val dd = s(x - 1, y - 1) + s(x + 1, y - 1) + s(x - 1, y + 1) + s(x + 1, y + 1)
      val (a, b) = if (orient == 1) (vv, hh) else (hh, vv) // HL: swap
      if (orient == 3) { // HH
        if (dd >= 3) 8
        else if (dd == 2) { if (a + b >= 1) 7 else 6 }
        else if (dd == 1) { if (a + b >= 2) 5 else if (a + b == 1) 4 else 3 }
        else { if (a + b >= 2) 2 else if (a + b == 1) 1 else 0 }
      } else {
        if (a == 2) 8
        else if (a == 1) { if (b >= 1) 7 else if (dd >= 1) 6 else 5 }
        else if (b == 2) 4
        else if (b == 1) 3
        else if (dd >= 2) 2
        else if (dd == 1) 1
        else 0
      }
    }

    @inline private def sgn(x: Int, y: Int): Int =
      if (x < 0 || x >= w || y < 0 || y >= h) 0
      else { val k = y * w + x; if (!sig(k)) 0 else if (neg(k)) -1 else 1 }

    /** Sign-coding context packed as (ctx << 1) | xorBit (T.800 D.3.2). */
    def scCtx(x: Int, y: Int): Int = {
      val hc = math.max(-1, math.min(1, sgn(x - 1, y) + sgn(x + 1, y)))
      val vc = math.max(-1, math.min(1, sgn(x, y - 1) + sgn(x, y + 1)))
      if (hc == 1) { if (vc == 1) (13 << 1) else if (vc == 0) (12 << 1) else (11 << 1) }
      else if (hc == 0) { if (vc == 1) (10 << 1) else if (vc == 0) (9 << 1) else (10 << 1) | 1 }
      else { if (vc == 1) (11 << 1) | 1 else if (vc == 0) (12 << 1) | 1 else (13 << 1) | 1 }
    }

    def mrCtx(x: Int, y: Int): Int = {
      val k = y * w + x
      if (refined(k)) 16
      else if (zcCtx(x, y) != 0) 15 // any significant neighbor
      else 14
    }

    /** Run-length eligibility: the full 4-row column is present, untouched
      * this plane, and has no significant neighborhood anywhere. */
    def rlEligible(x: Int, y0: Int): Boolean = {
      var y = y0
      while (y < y0 + 4) {
        val k = y * w + x
        if (sig(k) || visited(k) || zcCtx(x, y) != 0) return false
        y += 1
      }
      true
    }

    def nextPlane(): Unit = {
      java.util.Arrays.fill(visited, false)
      java.util.Arrays.fill(sigNew, false)
    }
  }

  /** Encode one code block; all bit-planes, all passes, one MQ segment.
    * Returns null when every coefficient is zero (block stays excluded). */
  private def encodeBlock(coeffs: Array[Int], w: Int, h: Int, orient: Int):
      (Int, Int, Array[Byte]) = {
    val bc = new BlockCoder(w, h, orient)
    var maxMag = 0
    var k = 0
    while (k < bc.n) {
      val v = coeffs(k)
      bc.mag(k) = math.abs(v)
      bc.neg(k) = v < 0
      if (bc.mag(k) > maxMag) maxMag = bc.mag(k)
      k += 1
    }
    if (maxMag == 0) return null
    val planes = 32 - Integer.numberOfLeadingZeros(maxMag)
    val mq = new MqEncoder

    def sign(x: Int, y: Int): Unit = {
      val kk = y * w + x
      val p = bc.scCtx(x, y)
      mq.encode(p >> 1, (if (bc.neg(kk)) 1 else 0) ^ (p & 1))
    }

    def spp(p: Int): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          var y = y0
          val yEnd = math.min(y0 + 4, h)
          while (y < yEnd) {
            val kk = y * w + x
            if (!bc.sig(kk)) {
              val ctx = bc.zcCtx(x, y)
              if (ctx != 0) {
                val bit = (bc.mag(kk) >>> p) & 1
                mq.encode(ctx, bit)
                if (bit == 1) { bc.sig(kk) = true; bc.sigNew(kk) = true; sign(x, y) }
                bc.visited(kk) = true
              }
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
    }

    def mrp(p: Int): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          var y = y0
          val yEnd = math.min(y0 + 4, h)
          while (y < yEnd) {
            val kk = y * w + x
            if (bc.sig(kk) && !bc.sigNew(kk)) {
              mq.encode(bc.mrCtx(x, y), (bc.mag(kk) >>> p) & 1)
              bc.refined(kk) = true
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
    }

    def cup(p: Int): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          var y = y0
          val yEnd = math.min(y0 + 4, h)
          if (y0 + 3 < h && bc.rlEligible(x, y0)) {
            var first = -1
            var yy = 0
            while (yy < 4 && first < 0) {
              if (((bc.mag((y0 + yy) * w + x) >>> p) & 1) == 1) first = yy
              yy += 1
            }
            if (first < 0) { mq.encode(CtxRl, 0); y = yEnd }
            else {
              mq.encode(CtxRl, 1)
              mq.encode(CtxUni, (first >> 1) & 1)
              mq.encode(CtxUni, first & 1)
              val kk = (y0 + first) * w + x
              bc.sig(kk) = true; bc.sigNew(kk) = true
              sign(x, y0 + first)
              y = y0 + first + 1
            }
          }
          while (y < yEnd) {
            val kk = y * w + x
            if (!bc.sig(kk) && !bc.visited(kk)) {
              val bit = (bc.mag(kk) >>> p) & 1
              mq.encode(bc.zcCtx(x, y), bit)
              if (bit == 1) { bc.sig(kk) = true; bc.sigNew(kk) = true; sign(x, y) }
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
    }

    var p = planes - 1
    cup(p)
    bc.nextPlane()
    while (p > 0) {
      p -= 1
      spp(p); mrp(p); cup(p)
      bc.nextPlane()
    }
    (planes, 3 * planes - 2, mq.flush())
  }

  /** Decode one code block from its concatenated codeword segments. */
  private def decodeBlock(data: Array[Byte], w: Int, h: Int, orient: Int,
      planes: Int, numPasses: Int): (Array[Int], Array[Boolean]) = {
    val bc = new BlockCoder(w, h, orient)
    val mq = new MqDecoder(data, 0, data.length)

    def sign(x: Int, y: Int): Unit = {
      val kk = y * w + x
      val p = bc.scCtx(x, y)
      bc.neg(kk) = (mq.decode(p >> 1) ^ (p & 1)) == 1
    }

    def spp(p: Int): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          var y = y0
          val yEnd = math.min(y0 + 4, h)
          while (y < yEnd) {
            val kk = y * w + x
            if (!bc.sig(kk)) {
              val ctx = bc.zcCtx(x, y)
              if (ctx != 0) {
                if (mq.decode(ctx) == 1) {
                  bc.sig(kk) = true; bc.sigNew(kk) = true
                  bc.mag(kk) |= 1 << p
                  sign(x, y)
                }
                bc.visited(kk) = true
              }
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
    }

    def mrp(p: Int): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          var y = y0
          val yEnd = math.min(y0 + 4, h)
          while (y < yEnd) {
            val kk = y * w + x
            if (bc.sig(kk) && !bc.sigNew(kk)) {
              if (mq.decode(bc.mrCtx(x, y)) == 1) bc.mag(kk) |= 1 << p
              bc.refined(kk) = true
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
    }

    def cup(p: Int): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          var y = y0
          val yEnd = math.min(y0 + 4, h)
          if (y0 + 3 < h && bc.rlEligible(x, y0)) {
            if (mq.decode(CtxRl) == 0) y = yEnd
            else {
              val first = (mq.decode(CtxUni) << 1) | mq.decode(CtxUni)
              val kk = (y0 + first) * w + x
              bc.sig(kk) = true; bc.sigNew(kk) = true
              bc.mag(kk) |= 1 << p
              sign(x, y0 + first)
              y = y0 + first + 1
            }
          }
          while (y < yEnd) {
            val kk = y * w + x
            if (!bc.sig(kk) && !bc.visited(kk)) {
              if (mq.decode(bc.zcCtx(x, y)) == 1) {
                bc.sig(kk) = true; bc.sigNew(kk) = true
                bc.mag(kk) |= 1 << p
                sign(x, y)
              }
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
    }

    var passIdx = 0
    var p = planes - 1
    if (passIdx < numPasses && p >= 0) { cup(p); passIdx += 1; bc.nextPlane() }
    while (p > 0 && passIdx < numPasses) {
      p -= 1
      if (passIdx < numPasses) { spp(p); passIdx += 1 }
      if (passIdx < numPasses) { mrp(p); passIdx += 1 }
      if (passIdx < numPasses) { cup(p); passIdx += 1; bc.nextPlane() }
    }
    (bc.mag, bc.neg)
  }

  // ------------------------------------------------------------ 5/3 DWT

  @inline private def mirror(i: Int, n: Int): Int =
    if (i < 0) -i else if (i >= n) 2 * (n - 1) - i else i

  /** 1D forward reversible 5/3 on an even-origin signal; output is the
    * interleaved (L at even, H at odd) sequence (T.800 F.4). */
  private def fdwt1(x: Array[Int]): Array[Int] = {
    val n = x.length
    if (n == 1) return Array(x(0))
    val y = new Array[Int](n)
    @inline def xe(i: Int) = x(mirror(i, n))
    var k = 1
    while (k < n) { y(k) = x(k) - Math.floorDiv(xe(k - 1) + xe(k + 1), 2); k += 2 }
    @inline def ye(i: Int) = y(mirror(i, n))
    k = 0
    while (k < n) { y(k) = x(k) + Math.floorDiv(ye(k - 1) + ye(k + 1) + 2, 4); k += 2 }
    y
  }

  /** 1D inverse of [[fdwt1]]. */
  private def idwt1(y: Array[Int]): Array[Int] = {
    val n = y.length
    if (n == 1) return Array(y(0))
    val x = new Array[Int](n)
    @inline def ye(i: Int) = y(mirror(i, n))
    var k = 0
    while (k < n) { x(k) = y(k) - Math.floorDiv(ye(k - 1) + ye(k + 1) + 2, 4); k += 2 }
    @inline def xe(i: Int) = x(mirror(i, n))
    k = 1
    while (k < n) { x(k) = y(k) + Math.floorDiv(xe(k - 1) + xe(k + 1), 2); k += 2 }
    x
  }

  /** One forward 2D level: columns then rows (the inverse applies rows
    * then columns), output interleaved in place of the parent. */
  private def fdwt2(cur: Array[Int], w: Int, h: Int): Array[Int] = {
    val t = new Array[Int](w * h)
    val col = new Array[Int](h)
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) { col(y) = cur(y * w + x); y += 1 }
      val c2 = fdwt1(col)
      y = 0
      while (y < h) { t(y * w + x) = c2(y); y += 1 }
      x += 1
    }
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      System.arraycopy(t, y * w, row, 0, w)
      val r2 = fdwt1(row)
      System.arraycopy(r2, 0, t, y * w, w)
      y += 1
    }
    t
  }

  private def idwt2(t: Array[Int], w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      System.arraycopy(t, y * w, row, 0, w)
      val r2 = idwt1(row)
      System.arraycopy(r2, 0, out, y * w, w)
      y += 1
    }
    val col = new Array[Int](h)
    var x = 0
    while (x < w) {
      var yy = 0
      while (yy < h) { col(yy) = out(yy * w + x); yy += 1 }
      val c2 = idwt1(col)
      yy = 0
      while (yy < h) { out(yy * w + x) = c2(yy); yy += 1 }
      x += 1
    }
    out
  }

  // ------------------------------------------------------------- geometry

  /** One subband: packet-order position, orientation, dimensions. */
  private final case class Band(orient: Int, w: Int, h: Int) {
    def gain: Int = orient match { case 0 => 0; case 3 => 2; case _ => 1 }
  }

  @inline private def ceilDiv(a: Int, b: Int): Int = (a + b - 1) / b

  /** Bands grouped by resolution (index 0 = LL only), for NL levels over
    * a w x h image anchored at the origin. */
  private def bandsByRes(w: Int, h: Int, nl: Int): Array[Array[Band]] = {
    def lw(l: Int) = ceilDiv(w, 1 << l)
    def lh(l: Int) = ceilDiv(h, 1 << l)
    val out = new Array[Array[Band]](nl + 1)
    out(0) = Array(Band(0, lw(nl), lh(nl)))
    var r = 1
    while (r <= nl) {
      val l = nl - r + 1
      val hw = lw(l - 1) - lw(l)
      val hh = lh(l - 1) - lh(l)
      out(r) = Array(Band(1, hw, lh(l)), Band(2, lw(l), hh), Band(3, hw, hh))
      r += 1
    }
    out
  }

  // -------------------------------------------------------------- encoder

  private val DefaultLevels = 5
  private val CbExp = 6 // 64 x 64 code blocks
  private val GuardBits = 2

  private def u8(o: ByteArrayOutputStream, v: Int): Unit = o.write(v & 0xFF)
  private def u16(o: ByteArrayOutputStream, v: Int): Unit = { o.write((v >> 8) & 0xFF); o.write(v & 0xFF) }
  private def u32(o: ByteArrayOutputStream, v: Long): Unit = {
    o.write(((v >> 24) & 0xFF).toInt); o.write(((v >> 16) & 0xFF).toInt)
    o.write(((v >> 8) & 0xFF).toInt); o.write((v & 0xFF).toInt)
  }

  /** Encode `samples` (row-major unsigned ints < 2^nbits) as a lossless
    * single-tile single-component JPEG 2000 codestream. */
  def encode(width: Int, height: Int, nbits: Int, samples: Array[Long]): Array[Byte] =
    encode(width, height, nbits, samples, layers = 1, prog = 0, sopEph = false)

  /** Full-control variant for decoder-path coverage: `layers` > 1 spreads
    * inclusion to the LAST layer (earlier packets carry only tag-tree
    * "not yet included" walks — the incremental-threshold path a rate-
    * controlled encoder produces), `prog` picks LRCP (0) or RLCP (1)
    * packet ordering, `sopEph` brackets packets with SOP/EPH markers. */
  private[grib] def encode(width: Int, height: Int, nbits: Int,
      samples: Array[Long], layers: Int, prog: Int,
      sopEph: Boolean): Array[Byte] = {
    require(samples.length == width.toLong * height,
      s"${samples.length} samples for $width x $height")
    require(width >= 1 && height >= 1, s"degenerate image $width x $height")
    require(nbits >= 1 && nbits <= 26, s"nbits $nbits outside [1, 26]")
    val nl = DefaultLevels
    val shift = 1 << (nbits - 1)
    var cur = new Array[Int](samples.length)
    var k = 0
    while (k < samples.length) {
      val v = samples(k)
      require(v >= 0 && v < (1L << nbits), s"sample $v exceeds $nbits bits")
      cur(k) = (v - shift).toInt
      k += 1
    }

    // forward DWT: collect HL/LH/HH per level, LL cascades
    val hlArr = new Array[Array[Int]](nl + 1)
    val lhArr = new Array[Array[Int]](nl + 1)
    val hhArr = new Array[Array[Int]](nl + 1)
    var w = width; var h = height
    var l = 1
    while (l <= nl) {
      val t = fdwt2(cur, w, h)
      val lw = (w + 1) / 2; val lh = (h + 1) / 2
      val hw = w - lw; val hh = h - lh
      val ll = new Array[Int](lw * lh)
      val hlB = new Array[Int](hw * lh)
      val lhB = new Array[Int](lw * hh)
      val hhB = new Array[Int](hw * hh)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = t(y * w + x)
          if ((x & 1) == 0 && (y & 1) == 0) ll((y >> 1) * lw + (x >> 1)) = v
          else if ((x & 1) == 1 && (y & 1) == 0) hlB((y >> 1) * hw + (x >> 1)) = v
          else if ((x & 1) == 0) lhB(((y - 1) >> 1) * lw + (x >> 1)) = v
          else hhB(((y - 1) >> 1) * hw + (x >> 1)) = v
          x += 1
        }
        y += 1
      }
      hlArr(l) = hlB; lhArr(l) = lhB; hhArr(l) = hhB
      cur = ll; w = lw; h = lh
      l += 1
    }

    val bands = bandsByRes(width, height, nl)
    // band coefficient arrays in the same (res, band) order
    def bandData(r: Int, bi: Int): Array[Int] =
      if (r == 0) cur
      else { val lev = nl - r + 1; bi match { case 0 => hlArr(lev); case 1 => lhArr(lev); case 2 => hhArr(lev) } }

    require(layers >= 1 && layers <= 100, s"$layers layers")
    require(prog == 0 || prog == 1, s"progression $prog (LRCP/RLCP only)")
    val cb = 1 << CbExp
    // Tier-1 every band's blocks once; tag trees persist across layers
    val codedAll = new Array[Array[(Int, Int, Array[Byte])]]((nl + 1) * 3)
    val incAll = new Array[TagTree]((nl + 1) * 3)
    val zeroAll = new Array[TagTree]((nl + 1) * 3)
    def sIdx(r: Int, bi: Int): Int = r * 3 + bi
    var r = 0
    while (r <= nl) {
      var bi = 0
      while (bi < bands(r).length) {
        val b = bands(r)(bi)
        if (b.w > 0 && b.h > 0) {
          val nbx = ceilDiv(b.w, cb); val nby = ceilDiv(b.h, cb)
          val mb = nbits + b.gain + 1 // guard(2) + eps(nbits + gain) - 1
          val inc = new TagTree(nbx, nby)
          val zero = new TagTree(nbx, nby)
          val data = bandData(r, bi)
          val coded = new Array[(Int, Int, Array[Byte])](nbx * nby)
          var bj = 0
          while (bj < nby) {
            var bx = 0
            while (bx < nbx) {
              val x0 = bx * cb; val y0 = bj * cb
              val bw = math.min(cb, b.w - x0); val bh = math.min(cb, b.h - y0)
              val blk = new Array[Int](bw * bh)
              var yy = 0
              while (yy < bh) {
                var xx = 0
                while (xx < bw) { blk(yy * bw + xx) = data((y0 + yy) * b.w + x0 + xx); xx += 1 }
                yy += 1
              }
              val enc = encodeBlock(blk, bw, bh, b.orient)
              coded(bj * nbx + bx) = enc
              if (enc != null) require(enc._1 <= mb,
                s"block needs ${enc._1} bit-planes, band budget is $mb")
              // included blocks land in the LAST layer; excluded never
              inc.setLeaf(bx, bj, if (enc == null) layers else layers - 1)
              zero.setLeaf(bx, bj, if (enc == null) mb else mb - enc._1)
              bx += 1
            }
            bj += 1
          }
          inc.finish(); zero.finish()
          codedAll(sIdx(r, bi)) = coded
          incAll(sIdx(r, bi)) = inc
          zeroAll(sIdx(r, bi)) = zero
        }
        bi += 1
      }
      r += 1
    }

    val tile = new ByteArrayOutputStream()
    var nsop = 0
    val order: Seq[(Int, Int)] =
      if (prog == 1) for (rr <- 0 to nl; l2 <- 0 until layers) yield (l2, rr)
      else for (l2 <- 0 until layers; rr <- 0 to nl) yield (l2, rr)
    for ((layer, rr) <- order) {
      if (sopEph) {
        tile.write(0xFF); tile.write(0x91) // SOP
        tile.write(0); tile.write(4)
        tile.write((nsop >> 8) & 0xFF); tile.write(nsop & 0xFF)
        nsop = (nsop + 1) & 0xFFFF
      }
      val hdr = new HdrWriter
      val body = new ByteArrayOutputStream()
      val rBands = bands(rr)
      var any = false
      rBands.foreach(b => if (b.w > 0 && b.h > 0) any = true)
      if (!any) { hdr.bit(0); hdr.flush() }
      else {
        hdr.bit(1)
        var bi = 0
        while (bi < rBands.length) {
          val b = rBands(bi)
          if (b.w > 0 && b.h > 0) {
            val nbx = ceilDiv(b.w, cb); val nby = ceilDiv(b.h, cb)
            val inc = incAll(sIdx(rr, bi)); val zero = zeroAll(sIdx(rr, bi))
            val coded = codedAll(sIdx(rr, bi))
            var bj = 0
            while (bj < nby) {
              var bx = 0
              while (bx < nbx) {
                val enc = coded(bj * nbx + bx)
                inc.encodeUpTo(hdr, bx, bj, layer + 1)
                if (enc != null && layer == layers - 1) {
                  zero.encodeValue(hdr, bx, bj)
                  val passes = enc._2
                  // number-of-passes code (T.800 Table B.4)
                  if (passes == 1) hdr.bit(0)
                  else if (passes == 2) hdr.bits(2, 2)
                  else if (passes <= 5) { hdr.bits(3, 2); hdr.bits(passes - 3, 2) }
                  else if (passes <= 36) { hdr.bits(0xF, 4); hdr.bits(passes - 6, 5) }
                  else { hdr.bits(0x1FF, 9); hdr.bits(passes - 37, 7) }
                  // Lblock signalling + segment length
                  val len = enc._3.length
                  val lenBitsAvail0 = 3 + (31 - Integer.numberOfLeadingZeros(passes))
                  val needed = math.max(1, 32 - Integer.numberOfLeadingZeros(len))
                  var avail = lenBitsAvail0
                  while (avail < needed) { hdr.bit(1); avail += 1 }
                  hdr.bit(0)
                  hdr.bits(len, avail)
                  body.write(enc._3)
                }
                bx += 1
              }
              bj += 1
            }
          }
          bi += 1
        }
        hdr.flush()
      }
      tile.write(hdr.out.toByteArray)
      if (sopEph) { tile.write(0xFF); tile.write(0x92) } // EPH
      tile.write(body.toByteArray)
    }

    // markers
    val out = new ByteArrayOutputStream()
    u16(out, 0xFF4F) // SOC
    u16(out, 0xFF51) // SIZ
    u16(out, 41)
    u16(out, 0) // Rsiz
    u32(out, width); u32(out, height); u32(out, 0); u32(out, 0)
    u32(out, width); u32(out, height); u32(out, 0); u32(out, 0)
    u16(out, 1) // Csiz
    u8(out, nbits - 1); u8(out, 1); u8(out, 1) // Ssiz (unsigned), XRsiz, YRsiz
    u16(out, 0xFF52) // COD
    u16(out, 12)
    u8(out, if (sopEph) 6 else 0) // Scod: no precincts listed; SOP+EPH bits
    u8(out, prog) // progression: LRCP / RLCP
    u16(out, layers)
    u8(out, 0) // no MCT
    u8(out, nl)
    u8(out, CbExp - 2); u8(out, CbExp - 2)
    u8(out, 0) // code-block style
    u8(out, 1) // 5/3 reversible
    u16(out, 0xFF5C) // QCD
    val nBands = 3 * nl + 1
    u16(out, 3 + nBands)
    u8(out, GuardBits << 5) // style 0: no quantization
    u8(out, (nbits + 0) << 3) // LL
    r = 1
    while (r <= nl) {
      u8(out, (nbits + 1) << 3); u8(out, (nbits + 1) << 3); u8(out, (nbits + 2) << 3)
      r += 1
    }
    val tileBytes = tile.toByteArray
    u16(out, 0xFF90) // SOT
    u16(out, 10)
    u16(out, 0) // Isot
    u32(out, 12L + 2L + tileBytes.length) // Psot
    u8(out, 0); u8(out, 1) // TPsot, TNsot
    u16(out, 0xFF93) // SOD
    out.write(tileBytes)
    u16(out, 0xFFD9) // EOC
    out.toByteArray
  }

  // -------------------------------------------------------------- decoder

  private final class BlockState {
    var included = false
    var lblock = 3
    var passes = 0
    var zeroPlanes = 0
    val segments = ArrayBuffer[Array[Byte]]()
  }

  /** Decode a JPEG 2000 codestream to (width, height, row-major samples).
    * Accepts the GRIB profile (see object scaladoc); anything outside it
    * is refused with the feature named.
    *
    * `expectedCells` ≥ 0 bounds the SIZ-declared raster BEFORE any
    * allocation — the GRIB caller knows the field's value count, so a few
    * hostile header bytes cannot OOM an executor with a multi-GB sample
    * array. Without an expectation, the raster is still capped against
    * the codestream length (lossless 5/3 cannot sustain > ~2¹⁵:1 on the
    * EBCOT's own signalling overhead; the cap is deliberately generous).
    * Truncated or corrupt streams surface as IllegalArgumentException
    * naming the byte position, never a raw index error. */
  def decode(cs: Array[Byte], expectedCells: Long = -1L): (Int, Int, Array[Long]) =
    try decodeImpl(cs, expectedCells)
    catch {
      // corrupt bytes can surface as any low-level arithmetic/index
      // failure deep in the tag-tree / MQ / DWT machinery; a scan failure
      // on a damaged archive file must read as a parse diagnostic
      case e @ (_: IndexOutOfBoundsException | _: NegativeArraySizeException |
                _: ArithmeticException) =>
        throw new IllegalArgumentException(
          s"truncated or corrupt JPEG 2000 codestream (${cs.length} bytes): " +
            s"${e.getClass.getSimpleName}${Option(e.getMessage).fold("")(m => s" ($m)")}", e)
    }

  private def decodeImpl(cs: Array[Byte], expectedCells: Long): (Int, Int, Array[Long]) = {
    var pos = 0
    def u16r(): Int = { val v = ((cs(pos) & 0xFF) << 8) | (cs(pos + 1) & 0xFF); pos += 2; v }
    def u32r(): Long = { var v = 0L; var k = 0; while (k < 4) { v = (v << 8) | (cs(pos) & 0xFF); pos += 1; k += 1 }; v }
    def u8r(): Int = { val v = cs(pos) & 0xFF; pos += 1; v }

    require(cs.length >= 4 && u16r() == 0xFF4F, "not a JPEG 2000 codestream (missing SOC)")
    require(u16r() == 0xFF51, "SIZ marker must follow SOC")
    val lsiz = u16r(); val sizStart = pos
    u16r() // Rsiz (capabilities; ignore)
    val xsizL = u32r(); val ysizL = u32r()
    require(xsizL >= 1 && ysizL >= 1 && xsizL * ysizL <= Int.MaxValue - 8,
      s"image $xsizL x $ysizL out of range")
    if (expectedCells >= 0)
      require(xsizL * ysizL == expectedCells,
        s"SIZ declares a $xsizL x $ysizL raster (${xsizL * ysizL} cells); " +
          s"the field carries $expectedCells values")
    else
      require(xsizL * ysizL <= math.max(1L << 20, cs.length.toLong << 15),
        s"SIZ declares ${xsizL * ysizL} cells from a ${cs.length}-byte " +
          "codestream — implausible for lossless 5/3; refusing to allocate")
    val xsiz = xsizL.toInt; val ysiz = ysizL.toInt
    val xosiz = u32r(); val yosiz = u32r()
    require(xosiz == 0 && yosiz == 0, s"image offset ($xosiz, $yosiz) unsupported (0, 0 only)")
    val xtsiz = u32r(); val ytsiz = u32r()
    val xtosiz = u32r(); val ytosiz = u32r()
    require(xtosiz == 0 && ytosiz == 0, "tile offsets unsupported")
    require(xtsiz >= xsiz && ytsiz >= ysiz,
      s"multi-tile codestream (tile $xtsiz x $ytsiz < image $xsiz x $ysiz) unsupported")
    val csiz = u16r()
    require(csiz == 1, s"$csiz components unsupported (single-component GRIB fields only)")
    val ssiz = u8r()
    require((ssiz & 0x80) == 0, "signed components unsupported (GRIB offsets are unsigned)")
    val prec = (ssiz & 0x7F) + 1
    require(prec <= 28, s"$prec-bit precision unsupported (28 max)")
    require(u8r() == 1 && u8r() == 1, "component subsampling unsupported")
    pos = sizStart + lsiz - 2

    var nl = -1; var layers = 1; var prog = 0; var scod = 0
    var sqcdExps: Array[Int] = null; var guard = 0
    var cbExpX = CbExp; var cbExpY = CbExp
    def parseCod(): Unit = {
      val lcod = u16r(); val start = pos
      scod = u8r()
      prog = u8r()
      require(prog <= 4, s"progression order $prog invalid")
      layers = u16r()
      require(u8r() == 0, "multiple-component transform unsupported")
      nl = u8r()
      require(nl >= 0 && nl <= 30,
        s"$nl decomposition levels unsupported (30 max: deeper shifts overflow)")
      val xcb = u8r() + 2; val ycb = u8r() + 2
      require(xcb >= 2 && xcb <= 10 && ycb >= 2 && ycb <= 10 &&
        xcb + ycb <= 12,
        s"code-block size 2^$xcb x 2^$ycb invalid (T.800: each in [2,10], sum <= 12)")
      cbExpX = xcb; cbExpY = ycb
      val style = u8r()
      require(style == 0, s"code-block style 0x${style.toHexString} unsupported " +
        "(selective bypass / reset / termall / vertically-causal / " +
        "predictable-termination / segmentation symbols are out of the GRIB profile)")
      val transform = u8r()
      require(transform == 1, if (transform == 0)
        "9/7 irreversible wavelet unsupported (lossy JPEG 2000; GRIB lossless uses 5/3)"
        else s"wavelet transform $transform invalid")
      if ((scod & 1) != 0) {
        // precinct sizes listed: accept only maximal (0xFF = 2^15 x 2^15)
        var k = 0
        while (pos < start + lcod - 2) {
          val pp = u8r()
          require(pp == 0xFF, s"precinct size 0x${pp.toHexString} at resolution $k " +
            "unsupported (maximal precincts only)")
          k += 1
        }
      }
      pos = start + lcod - 2
    }
    def parseQcd(): Unit = {
      val lqcd = u16r(); val start = pos
      val sqcd = u8r()
      guard = sqcd >>> 5
      require((sqcd & 0x1F) == 0,
        s"quantization style ${sqcd & 0x1F} unsupported (reversible streams carry style 0)")
      val n = lqcd - 3
      sqcdExps = new Array[Int](n)
      var k = 0
      while (k < n) { sqcdExps(k) = u8r() >>> 3; k += 1 }
      pos = start + lqcd - 2
    }

    var marker = u16r()
    while (marker != 0xFF90) { // until SOT
      marker match {
        case 0xFF52 => parseCod()
        case 0xFF5C => parseQcd()
        case 0xFF64 | 0xFF55 | 0xFF57 | 0xFF58 | 0xFF63 => // COM/TLM/PLM/PLT/CRG
          val len = u16r(); pos += len - 2
        case 0xFF5F => throw new IllegalArgumentException(
          "POC (progression order change) unsupported")
        case 0xFF5E => throw new IllegalArgumentException("RGN (ROI) unsupported")
        case 0xFF60 | 0xFF61 => throw new IllegalArgumentException(
          "PPM/PPT packed packet headers unsupported")
        case 0xFF53 | 0xFF5D => throw new IllegalArgumentException(
          "COC/QCC per-component overrides unsupported (single-component streams " +
            "carry COD/QCD only)")
        case m => throw new IllegalArgumentException(
          f"marker 0xFF${m & 0xFF}%02X unsupported in main header")
      }
      marker = u16r()
    }
    require(nl >= 0, "COD marker missing")
    require(sqcdExps != null, "QCD marker missing")
    require(layers >= 1, "zero quality layers")
    require(prog <= 1 || layers == 1,
      s"progression order $prog with $layers layers unsupported (LRCP/RLCP only)")

    // tile-parts: concatenate bodies
    val tileData = new ByteArrayOutputStream()
    while (marker == 0xFF90) {
      val tpStart = pos - 2
      require(u16r() == 10, "SOT length must be 10")
      require(u16r() == 0, "multi-tile codestream unsupported (tile index != 0)")
      val psot = u32r()
      require(psot > 0, "Psot = 0 (length-to-EOC) unsupported")
      u8r(); u8r() // TPsot, TNsot
      var m2 = u16r()
      while (m2 != 0xFF93) { // tile-part header until SOD
        m2 match {
          case 0xFF64 | 0xFF58 => val len = u16r(); pos += len - 2 // COM/PLT
          case 0xFF5F => throw new IllegalArgumentException("POC unsupported")
          case m => throw new IllegalArgumentException(
            f"marker 0xFF${m & 0xFF}%02X unsupported in tile-part header")
        }
        m2 = u16r()
      }
      val bodyEnd = tpStart + psot.toInt
      require(bodyEnd <= cs.length, "tile-part overruns codestream")
      tileData.write(cs, pos, bodyEnd - pos)
      pos = bodyEnd
      marker = u16r()
    }
    require(marker == 0xFFD9, f"expected EOC, found 0xFF${marker & 0xFF}%02X")

    // packet decode
    val bands = bandsByRes(xsiz, ysiz, nl)
    val nBands = 3 * nl + 1
    require(sqcdExps.length >= nBands,
      s"QCD carries ${sqcdExps.length} exponents, need $nBands (scalar-derived " +
        "quantization unsupported)")
    def mbOf(r: Int, bi: Int): Int = {
      val idx = if (r == 0) 0 else 1 + 3 * (r - 1) + bi
      guard + sqcdExps(idx) - 1
    }
    val cbw = 1 << cbExpX; val cbh = 1 << cbExpY
    val incTrees = new Array[TagTree]((nl + 1) * 3)
    val zeroTrees = new Array[TagTree]((nl + 1) * 3)
    val states = new Array[Array[BlockState]]((nl + 1) * 3)
    def stIdx(r: Int, bi: Int): Int = r * 3 + bi
    for (r <- 0 to nl; bi <- bands(r).indices) {
      val b = bands(r)(bi)
      if (b.w > 0 && b.h > 0) {
        val nbx = ceilDiv(b.w, cbw); val nby = ceilDiv(b.h, cbh)
        incTrees(stIdx(r, bi)) = new TagTree(nbx, nby)
        zeroTrees(stIdx(r, bi)) = new TagTree(nbx, nby)
        states(stIdx(r, bi)) = Array.fill(nbx * nby)(new BlockState)
      }
    }

    val td = tileData.toByteArray
    var tp = 0
    val sopUsed = (scod & 2) != 0
    val ephUsed = (scod & 4) != 0
    // packet iteration: LRCP = layer-major, RLCP = resolution-major; with
    // one component and one precinct everything else reduces to these
    val order: Seq[(Int, Int)] =
      if (prog == 1) for (r <- 0 to nl; l2 <- 0 until layers) yield (l2, r)
      else for (l2 <- 0 until layers; r <- 0 to nl) yield (l2, r)
    for ((layer, r) <- order) {
      if (sopUsed && tp + 1 < td.length &&
        (td(tp) & 0xFF) == 0xFF && (td(tp + 1) & 0xFF) == 0x91) tp += 6
      val rd = new HdrReader(td, tp)
      val contributions = ArrayBuffer[(BlockState, Int)]() // state, segment length
      if (rd.bit() == 1) {
        var bi = 0
        while (bi < bands(r).length) {
          val b = bands(r)(bi)
          if (b.w > 0 && b.h > 0) {
            val nbx = ceilDiv(b.w, cbw); val nby = ceilDiv(b.h, cbh)
            val inc = incTrees(stIdx(r, bi)); val zero = zeroTrees(stIdx(r, bi))
            val st = states(stIdx(r, bi))
            var bj = 0
            while (bj < nby) {
              var bx = 0
              while (bx < nbx) {
                val s = st(bj * nbx + bx)
                val contributes =
                  if (!s.included) inc.decodeUpTo(rd, bx, bj, layer + 1)
                  else rd.bit() == 1
                if (contributes) {
                  if (!s.included) {
                    s.included = true
                    s.zeroPlanes = zero.decodeValue(rd, bx, bj)
                  }
                  val np = {
                    if (rd.bit() == 0) 1
                    else if (rd.bit() == 0) 2
                    else {
                      val v = rd.bits(2)
                      if (v < 3) 3 + v
                      else {
                        val v2 = rd.bits(5)
                        if (v2 < 31) 6 + v2 else 37 + rd.bits(7)
                      }
                    }
                  }
                  while (rd.bit() == 1) s.lblock += 1
                  val lenBits = s.lblock + (31 - Integer.numberOfLeadingZeros(np))
                  val segLen = rd.bits(lenBits)
                  s.passes += np
                  contributions += ((s, segLen))
                }
                bx += 1
              }
              bj += 1
            }
          }
          bi += 1
        }
      }
      rd.alignEnd()
      tp = rd.pos
      if (ephUsed && tp + 1 < td.length &&
        (td(tp) & 0xFF) == 0xFF && (td(tp + 1) & 0xFF) == 0x92) tp += 2
      contributions.foreach { case (s, segLen) =>
        require(tp + segLen <= td.length, "packet body overruns tile data")
        s.segments += java.util.Arrays.copyOfRange(td, tp, tp + segLen)
        tp += segLen
      }
    }

    // Tier-1 + band assembly
    val bandData = new Array[Array[Int]]((nl + 1) * 3)
    for (r <- 0 to nl; bi <- bands(r).indices) {
      val b = bands(r)(bi)
      val arr = new Array[Int](b.w * b.h)
      if (b.w > 0 && b.h > 0) {
        val nbx = ceilDiv(b.w, cbw); val nby = ceilDiv(b.h, cbh)
        val st = states(stIdx(r, bi))
        val mb = mbOf(r, bi)
        var bj = 0
        while (bj < nby) {
          var bx = 0
          while (bx < nbx) {
            val s = st(bj * nbx + bx)
            if (s.included && s.passes > 0) {
              val x0 = bx * cbw; val y0 = bj * cbh
              val bw = math.min(cbw, b.w - x0); val bh = math.min(cbh, b.h - y0)
              val planes = mb - s.zeroPlanes
              require(planes >= 0, s"zero bit-planes ${s.zeroPlanes} exceed Mb $mb")
              require(planes <= 31,
                s"$planes coded bit-planes unsupported (31 max: magnitude " +
                  "bits are decoded into 32-bit integers)")
              val total = s.segments.map(_.length).sum
              val seg = new Array[Byte](total)
              var off = 0
              s.segments.foreach { sg => System.arraycopy(sg, 0, seg, off, sg.length); off += sg.length }
              val (mag, neg) = decodeBlock(seg, bw, bh, b.orient, planes, s.passes)
              var yy = 0
              while (yy < bh) {
                var xx = 0
                while (xx < bw) {
                  val m = mag(yy * bw + xx)
                  arr((y0 + yy) * b.w + x0 + xx) = if (neg(yy * bw + xx)) -m else m
                  xx += 1
                }
                yy += 1
              }
            }
            bx += 1
          }
          bj += 1
        }
      }
      bandData(stIdx(r, bi)) = arr
    }

    // inverse DWT
    def lwOf(l: Int) = ceilDiv(xsiz, 1 << l)
    def lhOf(l: Int) = ceilDiv(ysiz, 1 << l)
    var cur = bandData(stIdx(0, 0))
    var l = nl
    while (l >= 1) {
      val pw = lwOf(l - 1); val ph = lhOf(l - 1)
      val lw = lwOf(l); val lh = lhOf(l)
      val hw = pw - lw; val hh = ph - lh
      val r = nl - l + 1
      val hlB = bandData(stIdx(r, 0)); val lhB = bandData(stIdx(r, 1)); val hhB = bandData(stIdx(r, 2))
      val t = new Array[Int](pw * ph)
      var y = 0
      while (y < ph) {
        var x = 0
        while (x < pw) {
          t(y * pw + x) =
            if ((x & 1) == 0 && (y & 1) == 0) cur((y >> 1) * lw + (x >> 1))
            else if ((x & 1) == 1 && (y & 1) == 0) hlB((y >> 1) * hw + (x >> 1))
            else if ((x & 1) == 0) lhB(((y - 1) >> 1) * lw + (x >> 1))
            else hhB(((y - 1) >> 1) * hw + (x >> 1))
          x += 1
        }
        y += 1
      }
      cur = idwt2(t, pw, ph)
      l -= 1
    }

    val shift = 1L << (prec - 1)
    val out = new Array[Long](xsiz * ysiz)
    var k = 0
    while (k < out.length) { out(k) = cur(k) + shift; k += 1 }
    (xsiz, ysiz, out)
  }
}
