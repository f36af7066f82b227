package graft.sources.grib

/** CCSDS 121.0-B adaptive entropy (Rice) coding — GRIB2 data
  * representation template 5.42, the packing modern ECMWF GRIB2 archives
  * ship (ecCodes `packingType=grid_ccsds`, carried by libaec in the
  * reference's toolchain; cf. gridded_etl_tools' ERA5 target,
  * docs/etl_developers_manual.md:158-168).
  *
  * Implemented subset, chosen to cover what ecCodes emits (flags
  * MSB|preprocess, block 16-64, RSI up to 255):
  *   - sample-splitting options k = 0..bps-2 (fundamental-sequence MSB part
  *     + k raw LSBs), the uncompressed option, zero-block runs (including
  *     remainder-of-segment), and second-extension DECODE;
  *   - the unit-delay predictor with the standard non-negative mapper
  *     (`preprocess` flag), reference samples at each RSI boundary;
  *   - optional byte alignment per RSI (`pad RSI` flag).
  * Signed, 3-byte, and restricted-code modes are refused with named
  * errors (never mis-decoded). The encoder exists for fixture generation
  * and round-trip gates; it picks the cheapest of zero-block /
  * best-k-split / uncompressed per block and never emits the options the
  * decoder cannot replay (second extension in a reference block).
  */
object Ccsds {
  val FlagSigned = 1
  val Flag3Byte = 2
  val FlagMsb = 4
  val FlagPreprocess = 8
  val FlagRestricted = 16
  val FlagPadRsi = 32

  /** Template 5.42 octets 22-25: options mask, block size (J), reference
    * sample interval (in blocks). */
  final case class Params(flags: Int, blockSize: Int, rsi: Int)
      extends Serializable {
    def preprocess: Boolean = (flags & FlagPreprocess) != 0
    def padRsi: Boolean = (flags & FlagPadRsi) != 0
  }

  private def idLenOf(bps: Int): Int =
    if (bps > 16) 5 else if (bps > 8) 4 else 3

  private def checkParams(bps: Int, p: Params): Unit = {
    require(bps >= 2 && bps <= 32, s"CCSDS bits-per-sample $bps outside 2..32")
    require((p.flags & FlagSigned) == 0,
      "CCSDS signed-sample mode unsupported (GRIB offsets are unsigned)")
    require((p.flags & Flag3Byte) == 0, "CCSDS 3-byte mode unsupported")
    require((p.flags & FlagRestricted) == 0,
      "CCSDS restricted code options unsupported")
    require((p.flags & FlagMsb) != 0,
      "CCSDS LSB-first streams unsupported (GRIB uses MSB)")
    require(p.blockSize >= 2 && p.blockSize <= 64,
      s"CCSDS block size ${p.blockSize} outside 2..64")
    require(p.rsi >= 1, s"CCSDS reference sample interval ${p.rsi} < 1")
  }

  // ---------------------------------------------------------------- bits

  private final class Reader(data: Array[Byte]) {
    private var bit: Long = 0L
    def get(n: Int): Long = {
      if (n == 0) return 0L
      var acc = 0L
      var got = 0
      while (got < n) {
        val bi = (bit / 8).toInt
        val off = (bit % 8).toInt
        val take = math.min(8 - off, n - got)
        val chunk = ((data(bi) & 0xFF) >>> (8 - off - take)) & ((1 << take) - 1)
        acc = (acc << take) | chunk
        got += take
        bit += take
      }
      acc
    }
    /** Fundamental sequence: count zeros up to the terminating one. */
    def fs(): Long = { var m = 0L; while (get(1) == 0L) m += 1; m }
    def align(): Unit = bit = (bit + 7) / 8 * 8
  }

  private final class Writer {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nb = 0
    def put(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        nb += 1
        if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
        i -= 1
      }
    }
    def putFs(m: Long): Unit = {
      var i = 0L
      while (i < m) { put(0L, 1); i += 1 }
      put(1L, 1)
    }
    def align(): Unit = if (nb > 0) put(0L, 8 - nb)
    def bytes: Array[Byte] = { align(); buf.toArray }
  }

  // -------------------------------------------------- predictor mapping

  /** Standard CCSDS mapper: prediction error → non-negative integer. */
  private def mapDelta(x: Long, pred: Long, xmax: Long): Long = {
    val del = x - pred
    val theta = math.min(pred, xmax - pred)
    if (del >= 0 && del <= theta) 2 * del
    else if (del < 0 && -del <= theta) -2 * del - 1
    else theta + math.abs(del)
  }

  private def unmapDelta(d: Long, pred: Long, xmax: Long): Long = {
    val theta = math.min(pred, xmax - pred)
    if (d <= 2 * theta) {
      if ((d & 1L) == 1L) pred - ((d + 1) >> 1) else pred + (d >> 1)
    } else if (pred <= xmax - pred) pred + (d - theta)
    else pred - (d - theta)
  }

  // -------------------------------------------------------------- decode

  /** Decode `n` samples of `bps` bits from a template-7.42 data section. */
  def decode(data: Array[Byte], n: Int, bps: Int, p: Params): Array[Long] = {
    checkParams(bps, p)
    if (n == 0) return Array.emptyLongArray
    val idLen = idLenOf(bps)
    val uncompId = (1 << idLen) - 1
    val j = p.blockSize
    val xmax = (1L << bps) - 1
    val totalBlocks = (n + j - 1) / j
    val out = new Array[Long](n)
    val r = new Reader(data)

    var segFirstBlock = 0
    var written = 0
    while (segFirstBlock < totalBlocks) {
      val segBlocks = math.min(p.rsi, totalBlocks - segFirstBlock)
      val d = new Array[Long](segBlocks * j)
      var b = 0
      var zeroRun = 0
      while (b < segBlocks) {
        val isRef = p.preprocess && b == 0
        if (zeroRun > 0) { zeroRun -= 1 } // block stays all-zero
        else {
          val id = r.get(idLen).toInt
          if (id == 0) {
            if (r.get(1) == 1L) {
              // second extension: J/2 pairs via triangular unpairing
              require(!isRef,
                "CCSDS second-extension option in a reference block unsupported")
              require(j % 2 == 0,
                s"second extension needs an even block size, got $j")
              var q = 0
              while (q < j / 2) {
                val m = r.fs()
                // largest s with s(s+1)/2 <= m
                var s = ((math.sqrt(8.0 * m + 1) - 1) / 2).toLong
                while ((s + 1) * (s + 2) / 2 <= m) s += 1
                while (s * (s + 1) / 2 > m) s -= 1
                val d2 = m - s * (s + 1) / 2
                d(b * j + 2 * q) = s - d2
                d(b * j + 2 * q + 1) = d2
                q += 1
              }
            } else {
              // zero block(s): optional reference, then the FS run count
              if (isRef) d(b * j) = r.get(bps)
              val fsv = r.fs()
              var run = fsv + 1
              // CCSDS quirk: count 5 = remainder-of-(64-block)-segment;
              // counts above 5 are stored one high
              val runBlocks =
                if (run == 5) math.min(64 - (b % 64), segBlocks - b)
                else { if (run > 5) run -= 1; run.toInt }
              zeroRun = runBlocks - 1
            }
          } else if (id == uncompId) {
            var q = 0
            while (q < j) { d(b * j + q) = r.get(bps); q += 1 }
          } else {
            val k = id - 1
            require(k < bps, s"CCSDS split k $k >= bits-per-sample $bps")
            val first = if (isRef) { d(b * j) = r.get(bps); 1 } else 0
            var q = first
            while (q < j) { d(b * j + q) = r.fs() << k; q += 1 }
            q = first
            while (q < j) { d(b * j + q) |= r.get(k); q += 1 }
          }
        }
        b += 1
      }
      // inverse preprocessor: sequential unit-delay restore per segment
      val segSamples = math.min(n - written, segBlocks * j)
      if (p.preprocess) {
        var prev = d(0)
        out(written) = prev
        var q = 1
        while (q < segSamples) {
          prev = unmapDelta(d(q), prev, xmax)
          out(written + q) = prev
          q += 1
        }
      } else {
        System.arraycopy(d, 0, out, written, segSamples)
      }
      written += segSamples
      if (p.padRsi) r.align()
      segFirstBlock += segBlocks
    }
    out
  }

  // -------------------------------------------------------------- encode

  /** Encode non-negative samples (< 2^bps) as a template-7.42 stream. */
  def encode(samples: Array[Long], bps: Int, p: Params): Array[Byte] = {
    checkParams(bps, p)
    val n = samples.length
    if (n == 0) return Array.emptyByteArray
    val idLen = idLenOf(bps)
    val uncompId = (1 << idLen) - 1
    val maxK = math.min(uncompId - 2, bps - 1)
    val j = p.blockSize
    val xmax = (1L << bps) - 1
    samples.foreach(v => require(v >= 0 && v <= xmax,
      s"sample $v outside 0..$xmax for $bps bits"))
    val totalBlocks = (n + j - 1) / j
    val w = new Writer

    var segFirstBlock = 0
    var done = 0
    while (segFirstBlock < totalBlocks) {
      val segBlocks = math.min(p.rsi, totalBlocks - segFirstBlock)
      val segSamples = math.min(n - done, segBlocks * j)
      // mapped-domain segment, padded to whole blocks with 0 (= repeat of
      // the last sample under the predictor; harmless raw zeros otherwise)
      val d = new Array[Long](segBlocks * j)
      if (p.preprocess) {
        d(0) = samples(done)
        var q = 1
        while (q < segSamples) {
          d(q) = mapDelta(samples(done + q), samples(done + q - 1), xmax)
          q += 1
        }
      } else {
        var q = 0
        while (q < segSamples) { d(q) = samples(done + q); q += 1 }
      }
      var b = 0
      while (b < segBlocks) {
        val isRef = p.preprocess && b == 0
        val first = if (isRef) 1 else 0
        var allZero = true
        var q = first
        while (q < j && allZero) { allZero = d(b * j + q) == 0L; q += 1 }
        if (allZero) {
          // single zero block (runs are legal; the encoder keeps it simple)
          w.put(0L, idLen); w.put(0L, 1)
          if (isRef) w.put(d(b * j), bps)
          w.putFs(0L) // run of 1
        } else {
          // cheapest of best-k split vs uncompressed
          var bestK = 0
          var bestCost = Long.MaxValue
          var k = 0
          while (k <= maxK) {
            var cost = 0L
            var i = first
            while (i < j) { cost += (d(b * j + i) >>> k) + 1 + k; i += 1 }
            if (cost < bestCost) { bestCost = cost; bestK = k }
            k += 1
          }
          val refBits = if (isRef) bps else 0
          if (bestCost + refBits < j.toLong * bps) {
            w.put((bestK + 1).toLong, idLen)
            if (isRef) w.put(d(b * j), bps)
            var i = first
            while (i < j) { w.putFs(d(b * j + i) >>> bestK); i += 1 }
            i = first
            while (i < j) { w.put(d(b * j + i), bestK); i += 1 }
          } else {
            w.put(uncompId.toLong, idLen)
            var i = 0
            while (i < j) { w.put(d(b * j + i), bps); i += 1 }
          }
        }
        b += 1
      }
      done += segSamples
      if (p.padRsi) w.align()
      segFirstBlock += segBlocks
    }
    w.bytes
  }
}
