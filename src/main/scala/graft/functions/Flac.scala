package graft.functions

import scala.collection.mutable.ArrayBuffer

/** FLAC codec, written from the public spec (RFC 9639): STREAMINFO
  * metadata walk, frame sync + UTF-8-style coded numbers, CRC-8 /
  * CRC-16 verification, subframes CONSTANT / VERBATIM / FIXED (orders
  * 0-4) / LPC (quantized coefficients, any order), Rice residuals
  * (methods 0 and 1, escape partitions), wasted bits, and the three
  * stereo decorrelations (left/side, right/side, mid/side). FLAC is
  * LOSSLESS: decode recovers the exact PCM integers.
  *
  * The encoder exists for fixture synthesis (writer-beside-reader,
  * like [[graft.sources.tiff.TiffFormat]] / [[WebP]]): it emits real
  * frames through any of the subframe types, stereo modes, Rice
  * partition orders and escapes, so the decoder's paths are exercised
  * from independently-assembled bytes.
  *
  * Out of profile, refused BY NAME: Ogg-encapsulated FLAC, variable
  * blocking strategy, reserved header codes, CRC mismatches. */
object Flac {

  /** Decoded stream: per-channel integer PCM (exact). */
  final case class FlacAudio(sampleRate: Int, channels: Int, bits: Int,
      samples: Array[Array[Int]]) // samples(channel)(frameIdx)

  // ------------------------------------------------------------- CRCs

  private val crc8Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i
    var k = 0
    while (k < 8) { c = if ((c & 0x80) != 0) (c << 1) ^ 0x07 else c << 1; k += 1 }
    c & 0xFF
  }
  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = crc8Table((c ^ b(i)) & 0xFF); i += 1 }
    c
  }
  private val crc16Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i << 8
    var k = 0
    while (k < 8) { c = if ((c & 0x8000) != 0) (c << 1) ^ 0x8005 else c << 1; k += 1 }
    c & 0xFFFF
  }
  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = (crc16Table(((c >> 8) ^ b(i)) & 0xFF) ^ (c << 8)) & 0xFFFF; i += 1 }
    c
  }

  // ------------------------------------------------------------ decode

  private final class BitReader(val bytes: Array[Byte], var pos: Int) {
    var bit: Int = 0 // 0-7, MSB-first within a byte
    def byteAligned: Boolean = bit == 0
    def read(n: Int): Long = {
      var v = 0L
      var left = n
      while (left > 0) {
        require(pos < bytes.length, s"truncated FLAC at byte $pos")
        val avail = 8 - bit
        val take = math.min(avail, left)
        val chunk = (bytes(pos) >> (avail - take)) & ((1 << take) - 1)
        v = (v << take) | chunk
        bit += take
        if (bit == 8) { bit = 0; pos += 1 }
        left -= take
      }
      v
    }
    def readSigned(n: Int): Int = {
      val v = read(n)
      ((v << (64 - n)).toLong >> (64 - n)).toInt
    }
    def readUnary(): Int = {
      var q = 0
      while (read(1) == 0) {
        q += 1
        require(q < (1 << 24), "runaway unary code (corrupt FLAC)")
      }
      q
    }
  }

  def decode(bytes: Array[Byte]): FlacAudio =
    MediaParse.wrapCorrupt("FLAC", bytes.length)(decodeImpl(bytes))

  private def decodeImpl(bytes: Array[Byte]): FlacAudio = {
    require(bytes.length >= 42, s"FLAC of ${bytes.length} bytes has no header")
    require(!(bytes(0) == 'O' && bytes(1) == 'g' && bytes(2) == 'g'),
      "Ogg-encapsulated FLAC unsupported (native .flac only)")
    require(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C',
      s"not a FLAC stream: magic ${new String(bytes, 0, math.min(4, bytes.length), "US-ASCII")}")
    // metadata blocks
    var off = 4
    var sampleRate = -1; var channels = -1; var bits = -1; var total = -1L
    var last = false
    var sawStreamInfo = false
    while (!last) {
      require(off + 4 <= bytes.length, "truncated FLAC metadata header")
      last = (bytes(off) & 0x80) != 0
      val btype = bytes(off) & 0x7F
      val len = ((bytes(off + 1) & 0xFF) << 16) | ((bytes(off + 2) & 0xFF) << 8) |
        (bytes(off + 3) & 0xFF)
      require(off + 4 + len <= bytes.length,
        s"truncated FLAC metadata block type $btype ($len bytes)")
      if (btype == 0) {
        require(len == 34, s"STREAMINFO of $len bytes (34 required)")
        val br = new BitReader(bytes, off + 4)
        br.read(16); br.read(16) // min/max block size
        br.read(24); br.read(24) // min/max frame size
        sampleRate = br.read(20).toInt
        channels = br.read(3).toInt + 1
        bits = br.read(5).toInt + 1
        total = br.read(36)
        sawStreamInfo = true
      } // else: padding/vorbis-comment/seektable/etc — skipped
      off += 4 + len
    }
    require(sawStreamInfo, "FLAC missing STREAMINFO")
    require(sampleRate > 0, s"FLAC sample rate $sampleRate invalid")

    val out = Array.fill(channels)(new ArrayBuffer[Int](
      math.min(math.max(total, 0L), 1 << 24).toInt))
    var expectedFrame = 0L
    while (off < bytes.length) {
      off = decodeFrame(bytes, off, sampleRate, channels, bits, out,
        expectedFrame)
      expectedFrame += 1
    }
    // STREAMINFO total_samples 0 = UNKNOWN (streaming encoders)
    require(total == 0 || out(0).length.toLong == total,
      s"FLAC decoded ${out(0).length} samples, STREAMINFO claims $total")
    FlacAudio(sampleRate, channels, bits, out.map(_.toArray))
  }

  /** One frame; returns the offset just past its CRC-16. `expectedFrame`
    * is the sequential index this frame MUST carry (fixed-blocking
    * streams number frames, spec §9.1.5): frames delivered out of order
    * or duplicated — each individually CRC-valid — would otherwise
    * concatenate silently in file order, and the STREAMINFO total check
    * only catches COUNT mismatches, not reordering. */
  private def decodeFrame(bytes: Array[Byte], start: Int, rate: Int,
      channels: Int, bits: Int, out: Array[ArrayBuffer[Int]],
      expectedFrame: Long): Int = {
    val br = new BitReader(bytes, start)
    val sync = br.read(14)
    require(sync == 0x3FFE, f"bad FLAC frame sync $sync%04x at byte $start")
    require(br.read(1) == 0, "reserved bit set in frame header")
    val blockingStrategy = br.read(1)
    require(blockingStrategy == 0,
      "variable-blocksize FLAC streams unsupported (fixed blocking only)")
    val bsCode = br.read(4).toInt
    val srCode = br.read(4).toInt
    val chanAsn = br.read(4).toInt
    val ssCode = br.read(3).toInt
    require(br.read(1) == 0, "reserved bit set in frame header")
    // coded frame number (UTF-8-style); sequence-checked AFTER the
    // header CRC-8 below, so a flipped bit reports as corruption, not
    // misordering
    val frameNo = readUtf8Number(br)
    val blockSize = bsCode match {
      case 0 => throw new IllegalArgumentException("reserved block size code 0")
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 => br.read(8).toInt + 1
      case 7 => br.read(16).toInt + 1
      case c => 256 << (c - 8)
    }
    srCode match {
      case 0 => // from STREAMINFO
      case 12 => br.read(8) // kHz
      case 13 | 14 => br.read(16)
      case 15 => throw new IllegalArgumentException("invalid sample rate code 15")
      case _ => // table rates — header-only, STREAMINFO governs
    }
    val sampleBits = ssCode match {
      case 0 => bits
      case 1 => 8
      case 2 => 12
      case 3 => throw new IllegalArgumentException("reserved sample size code 3")
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
    }
    require(sampleBits == bits,
      s"frame sample size $sampleBits != STREAMINFO $bits (unsupported mix)")
    // CRC-8 covers everything up to here
    require(br.byteAligned, "frame header must be byte-aligned before CRC-8")
    val gotCrc8 = br.read(8).toInt
    val wantCrc8 = crc8(bytes, start, br.pos - 1)
    require(gotCrc8 == wantCrc8,
      f"FLAC frame header CRC-8 mismatch: stored $gotCrc8%02x computed $wantCrc8%02x")
    // fixed-blocking streams number frames sequentially (spec §9.1.5):
    // an out-of-order or duplicated frame — individually CRC-valid —
    // would otherwise concatenate silently in file order, and the
    // STREAMINFO total check only catches COUNT mismatches
    require(frameNo == expectedFrame,
      s"FLAC frame number $frameNo at byte $start, expected $expectedFrame " +
        "(out-of-order or duplicated frame)")

    val nCh = chanAsn match {
      case a if a <= 7 => a + 1
      case 8 | 9 | 10 => 2
      case a => throw new IllegalArgumentException(s"reserved channel assignment $a")
    }
    require(nCh == channels,
      s"frame has $nCh channels, STREAMINFO $channels (unsupported mix)")

    val chans = Array.tabulate(nCh) { c =>
      // side channels carry one extra bit
      val extra = chanAsn match {
        case 8 => if (c == 1) 1 else 0 // left/side
        case 9 => if (c == 0) 1 else 0 // side/right
        case 10 => if (c == 1) 1 else 0 // mid/side
        case _ => 0
      }
      decodeSubframe(br, blockSize, bits + extra)
    }
    // undo stereo decorrelation
    chanAsn match {
      case 8 => // left/side: right = left - side
        var i = 0
        while (i < blockSize) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
      case 9 => // side/right: left = side + right
        var i = 0
        while (i < blockSize) { chans(0)(i) = chans(0)(i) + chans(1)(i); i += 1 }
      case 10 => // mid/side
        var i = 0
        while (i < blockSize) {
          val side = chans(1)(i)
          val mid2 = (chans(0)(i) << 1) | (side & 1)
          chans(0)(i) = (mid2 + side) >> 1
          chans(1)(i) = (mid2 - side) >> 1
          i += 1
        }
      case _ =>
    }
    // padding to byte alignment, then CRC-16 over the whole frame
    if (!br.byteAligned) { br.read(8 - br.bit); () }
    val gotCrc16 = br.read(16).toInt
    val wantCrc16 = crc16(bytes, start, br.pos - 2)
    require(gotCrc16 == wantCrc16,
      f"FLAC frame CRC-16 mismatch: stored $gotCrc16%04x computed $wantCrc16%04x")
    var c = 0
    while (c < nCh) { out(c) ++= chans(c); c += 1 }
    br.pos
  }

  private def readUtf8Number(br: BitReader): Long = {
    val b0 = br.read(8).toInt
    if ((b0 & 0x80) == 0) b0.toLong
    else {
      var n = 0
      var mask = 0x40
      while ((b0 & mask) != 0) { n += 1; mask >>= 1 }
      require(n >= 1 && n <= 6, s"malformed coded number lead byte $b0")
      var v = (b0 & (mask - 1)).toLong
      var i = 0
      while (i < n) {
        val cont = br.read(8).toInt
        require((cont & 0xC0) == 0x80, s"malformed coded number continuation $cont")
        v = (v << 6) | (cont & 0x3F)
        i += 1
      }
      v
    }
  }

  private def decodeSubframe(br: BitReader, n: Int, bits: Int): Array[Int] = {
    require(br.read(1) == 0, "subframe padding bit set")
    val typ = br.read(6).toInt
    val wasted = if (br.read(1) == 1) br.readUnary() + 1 else 0
    val eff = bits - wasted
    require(eff >= 1 && eff <= 32,
      s"effective sample width $eff out of the 1-32 bit profile")
    val out = typ match {
      case 0 => // CONSTANT: ONE value, replicated
        val v = br.readSigned(eff)
        Array.fill(n)(v)
      case 1 => // VERBATIM: n values (fill re-evaluates the read per element)
        Array.fill(n)(br.readSigned(eff))
      case t if t >= 8 && t <= 12 => // FIXED order t-8
        val order = t - 8
        val warm = Array.fill(order)(br.readSigned(eff))
        val res = decodeResidual(br, n, order)
        val s = new Array[Int](n)
        System.arraycopy(warm, 0, s, 0, order)
        var i = order
        while (i < n) {
          s(i) = res(i - order) + (order match {
            case 0 => 0
            case 1 => s(i - 1)
            case 2 => 2 * s(i - 1) - s(i - 2)
            case 3 => 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
            case _ => 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
          })
          i += 1
        }
        s
      case t if t >= 32 => // LPC order (t&31)+1
        val order = (t & 31) + 1
        val warm = Array.fill(order)(br.readSigned(eff))
        val precision = br.read(4).toInt + 1
        require(precision <= 15, "LPC precision 16 is reserved")
        val shift = br.readSigned(5)
        require(shift >= 0, s"negative LPC shift $shift unsupported")
        val coefs = Array.fill(order)(br.readSigned(precision))
        val res = decodeResidual(br, n, order)
        val s = new Array[Int](n)
        System.arraycopy(warm, 0, s, 0, order)
        var i = order
        while (i < n) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * s(i - 1 - j); j += 1 }
          s(i) = res(i - order) + (acc >> shift).toInt
          i += 1
        }
        s
      case t => throw new IllegalArgumentException(s"reserved subframe type $t")
    }
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(i) = out(i) << wasted; i += 1 }
    }
    out
  }

  private def decodeResidual(br: BitReader, n: Int, order: Int): Array[Int] = {
    val method = br.read(2).toInt
    require(method <= 1, s"reserved residual coding method $method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val pOrder = br.read(4).toInt
    val parts = 1 << pOrder
    require(n % parts == 0, s"block size $n not divisible into $parts partitions")
    val res = new Array[Int](n - order)
    var idx = 0
    var p = 0
    while (p < parts) {
      val count = (n >> pOrder) - (if (p == 0) order else 0)
      require(count >= 0, s"partition 0 smaller than predictor order")
      val param = br.read(paramBits).toInt
      if (param == escape) {
        val raw = br.read(5).toInt
        var i = 0
        while (i < count) {
          res(idx) = if (raw == 0) 0 else br.readSigned(raw); idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) {
          val q = br.readUnary()
          val r = br.read(param)
          val u = (q.toLong << param) | r
          res(idx) = (if ((u & 1) == 0) u >> 1 else -((u >> 1) + 1)).toInt
          idx += 1; i += 1
        }
      }
      p += 1
    }
    res
  }

  // ------------------------------------------------------------ encode

  private final class BitWriter {
    val out = new ArrayBuffer[Byte](1 << 12)
    private var acc = 0L
    private var nAcc = 0
    def write(v: Long, n: Int): Unit = {
      var left = n
      while (left > 0) {
        val take = math.min(8 - nAcc, left)
        val chunk = (v >> (left - take)) & ((1L << take) - 1)
        acc = (acc << take) | chunk
        nAcc += take
        if (nAcc == 8) { out += (acc & 0xFF).toByte; acc = 0; nAcc = 0 }
        left -= take
      }
    }
    def alignByte(): Unit = if (nAcc > 0) write(0, 8 - nAcc)
    def bytes: Array[Byte] = { require(nAcc == 0, "unaligned"); out.toArray }
  }

  /** Per-frame encoder strategy. */
  sealed trait Strategy
  case object Verbatim extends Strategy
  /** Fixed predictor of the given order (0-4) with Rice partitions. */
  final case class Fixed(order: Int, partitionOrder: Int = 0,
      method: Int = 0) extends Strategy
  /** LPC with explicit quantized coefficients. */
  final case class Lpc(coefs: Array[Int], shift: Int, precision: Int = 12,
      partitionOrder: Int = 0) extends Strategy

  /** Stereo decorrelation mode for 2-channel input. */
  sealed trait StereoMode
  case object Independent extends StereoMode
  case object LeftSide extends StereoMode
  case object RightSide extends StereoMode
  case object MidSide extends StereoMode

  /** Encode PCM channels (equal length) as a native FLAC stream.
    * Constant runs are auto-detected per subframe. */
  def encode(channels: Array[Array[Int]], sampleRate: Int, bits: Int = 16,
      blockSize: Int = 256, strategy: Strategy = Fixed(2),
      stereo: StereoMode = Independent, wastedBits: Int = 0): Array[Byte] = {
    val nCh = channels.length
    require(nCh >= 1 && nCh <= 8, s"$nCh channels")
    require(channels.forall(_.length == channels(0).length), "unequal channel lengths")
    require(nCh == 2 || stereo == Independent, "stereo modes need 2 channels")
    val total = channels(0).length
    val out = new java.io.ByteArrayOutputStream(total * 2)
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO, last-metadata flag set
    val si = new BitWriter
    si.write(blockSize, 16); si.write(blockSize, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(sampleRate, 20)
    si.write(nCh - 1, 3)
    si.write(bits - 1, 5)
    si.write(total, 36)
    (0 until 16).foreach(_ => si.write(0, 8)) // MD5 unset (spec-legal zeros)
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(si.bytes, 0, 34)

    var frameIdx = 0L
    var off = 0
    while (off < total) {
      val n = math.min(blockSize, total - off)
      val fw = new BitWriter
      fw.write(0x3FFE, 14); fw.write(0, 1); fw.write(0, 1)
      fw.write(7, 4) // block size: 16-bit field
      fw.write(0, 4) // sample rate: from STREAMINFO
      val chanAsn = stereo match {
        case Independent => nCh - 1
        case LeftSide => 8
        case RightSide => 9
        case MidSide => 10
      }
      fw.write(chanAsn, 4)
      val ssCode = bits match {
        case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5; case 24 => 6
        case 32 => 7
        case _ => 0
      }
      fw.write(ssCode, 3); fw.write(0, 1)
      writeUtf8Number(fw, frameIdx)
      fw.write(n - 1, 16)
      fw.alignByte()
      val headerBytes = fw.out.toArray
      fw.write(crc8(headerBytes, 0, headerBytes.length), 8)

      // per-channel payloads after decorrelation
      val payload: Array[(Array[Int], Int)] = stereo match {
        case Independent =>
          Array.tabulate(nCh)(c =>
            (channels(c).slice(off, off + n), bits))
        case LeftSide =>
          val l = channels(0).slice(off, off + n)
          val r = channels(1).slice(off, off + n)
          Array((l, bits), (Array.tabulate(n)(i => l(i) - r(i)), bits + 1))
        case RightSide =>
          val l = channels(0).slice(off, off + n)
          val r = channels(1).slice(off, off + n)
          Array((Array.tabulate(n)(i => l(i) - r(i)), bits + 1), (r, bits))
        case MidSide =>
          val l = channels(0).slice(off, off + n)
          val r = channels(1).slice(off, off + n)
          Array((Array.tabulate(n)(i => (l(i) + r(i)) >> 1), bits),
            (Array.tabulate(n)(i => l(i) - r(i)), bits + 1))
      }
      payload.foreach { case (s, b) => writeSubframe(fw, s, b, strategy, wastedBits) }
      fw.alignByte()
      val frameBytes = fw.out.toArray
      fw.write(crc16(frameBytes, 0, frameBytes.length), 16)
      val fb = fw.bytes
      out.write(fb, 0, fb.length)
      off += n
      frameIdx += 1
    }
    out.toByteArray
  }

  private def writeUtf8Number(bw: BitWriter, v: Long): Unit = {
    if (v < 0x80) bw.write(v, 8)
    else if (v < 0x800) {
      bw.write(0xC0 | (v >> 6), 8); bw.write(0x80 | (v & 0x3F), 8)
    } else {
      require(v < 0x10000, "frame index beyond encoder profile")
      bw.write(0xE0 | (v >> 12), 8)
      bw.write(0x80 | ((v >> 6) & 0x3F), 8)
      bw.write(0x80 | (v & 0x3F), 8)
    }
  }

  private def writeSubframe(bw: BitWriter, samples0: Array[Int], bits: Int,
      strategy: Strategy, wastedBits: Int): Unit = {
    bw.write(0, 1)
    val wasted =
      if (wastedBits > 0 && samples0.forall(s => (s & ((1 << wastedBits) - 1)) == 0))
        wastedBits
      else 0
    val samples = if (wasted > 0) samples0.map(_ >> wasted) else samples0
    val eff = bits - wasted
    def writeWasted(): Unit =
      if (wasted > 0) { bw.write(1, 1); (1 until wasted).foreach(_ => bw.write(0, 1)); bw.write(1, 1) }
      else bw.write(0, 1)
    if (samples.forall(_ == samples(0))) { // CONSTANT
      bw.write(0, 6); writeWasted()
      bw.write(samples(0).toLong & ((1L << eff) - 1), eff)
      return
    }
    strategy match {
      case Verbatim =>
        bw.write(1, 6); writeWasted()
        samples.foreach(s => bw.write(s.toLong & ((1L << eff) - 1), eff))
      case Fixed(order, pOrder, method) =>
        require(order <= 4 && samples.length > order, s"fixed order $order")
        bw.write(8 + order, 6); writeWasted()
        samples.take(order).foreach(s => bw.write(s.toLong & ((1L << eff) - 1), eff))
        val res = Array.tabulate(samples.length - order) { k =>
          val i = k + order
          samples(i) - (order match {
            case 0 => 0
            case 1 => samples(i - 1)
            case 2 => 2 * samples(i - 1) - samples(i - 2)
            case 3 => 3 * samples(i - 1) - 3 * samples(i - 2) + samples(i - 3)
            case _ => 4 * samples(i - 1) - 6 * samples(i - 2) + 4 * samples(i - 3) - samples(i - 4)
          })
        }
        writeResidual(bw, res, samples.length, order, pOrder, method)
      case Lpc(coefs, shift, precision, pOrder) =>
        val order = coefs.length
        require(order >= 1 && order <= 32 && samples.length > order)
        bw.write(32 + (order - 1), 6); writeWasted()
        samples.take(order).foreach(s => bw.write(s.toLong & ((1L << eff) - 1), eff))
        bw.write(precision - 1, 4)
        bw.write(shift.toLong & 0x1F, 5)
        coefs.foreach(c => bw.write(c.toLong & ((1L << precision) - 1), precision))
        val res = Array.tabulate(samples.length - order) { k =>
          val i = k + order
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * samples(i - 1 - j); j += 1 }
          samples(i) - (acc >> shift).toInt
        }
        writeResidual(bw, res, samples.length, order, pOrder, 0)
    }
  }

  /** Rice-coded residual; per-partition parameter chosen by mean
    * magnitude, falling back to the escape hatch when a residual
    * overflows the quotient budget. */
  private def writeResidual(bw: BitWriter, res: Array[Int], n: Int,
      order: Int, pOrder: Int, method: Int): Unit = {
    require(n % (1 << pOrder) == 0, s"partition order $pOrder vs block $n")
    bw.write(method, 2)
    bw.write(pOrder, 4)
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    var idx = 0
    var p = 0
    while (p < (1 << pOrder)) {
      val count = (n >> pOrder) - (if (p == 0) order else 0)
      val part = res.slice(idx, idx + count)
      // zigzag magnitudes
      val zig = part.map(v => if (v >= 0) v.toLong << 1 else ((-v.toLong) << 1) - 1)
      // smallest param whose worst-case unary stays sane
      var param = 0
      while (param < escape - 1 && zig.exists(z => (z >> param) > 30)) param += 1
      if (zig.exists(z => (z >> param) > 30)) {
        // escape: raw fixed-width
        bw.write(escape, paramBits)
        val width = math.max(1, part.map(v =>
          33 - Integer.numberOfLeadingZeros(math.abs(v))).foldLeft(1)(math.max))
        bw.write(width, 5)
        part.foreach(v => bw.write(v.toLong & ((1L << width) - 1), width))
      } else {
        bw.write(param, paramBits)
        zig.foreach { z =>
          val q = (z >> param).toInt
          var i = 0
          while (i < q) { bw.write(0, 1); i += 1 }
          bw.write(1, 1)
          if (param > 0) bw.write(z & ((1L << param) - 1), param)
        }
      }
      idx += count
      p += 1
    }
  }
}
