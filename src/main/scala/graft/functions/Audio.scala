package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL audio decode for the multimodal pack: WAV/RIFF integer PCM,
  * G.711 μ-law/A-law (formats 7/6), IMA-ADPCM (17) and MS-ADPCM (2)
  * block codecs, and FLAC (magic-dispatched to the in-repo [[Flac]]
  * codec) — all parsed in-repo from their public byte-level specs, the
  * way [[Multimodal.PngDecoder]] serves images. Everything else (MP3,
  * AAC, Ogg, float WAV) is refused BY NAME; a JNI decoder drops into
  * the same per-partition shape.
  *
  * Features are computed batched per partition (decoder plumbing shared
  * with Multimodal.decodeResize): samples never leave the partition —
  * only the per-clip feature row shuffles, which is what makes audio
  * curation over a 100 TB crawl the same shape as text curation. */
object Audio {

  /** Decoded WAV: normalized mono samples in [-1, 1] (channels averaged
    * in integer space), original sample rate and channel count. */
  final case class DecodedAudio(
      id: Long, sampleRate: Int, channels: Int, samples: Array[Float])

  /** Parse a WAV/RIFF PCM payload. Layout (public RIFF/WAVE spec):
    * "RIFF" u32size "WAVE", then chunks — "fmt " (u16 audioFormat,
    * u16 channels, u32 sampleRate, u32 byteRate, u16 blockAlign,
    * u16 bitsPerSample), "data" (packed LE frames). PCM 8-bit is
    * UNSIGNED (0..255, midpoint 128); 16/24/32-bit are signed LE. */
  def decodeWav(id: Long, bytes: Array[Byte]): DecodedAudio = {
    def u16(off: Int) = ((bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8))
    def u32(off: Int) = (bytes(off) & 0xFFL) | ((bytes(off + 1) & 0xFFL) << 8) |
      ((bytes(off + 2) & 0xFFL) << 16) | ((bytes(off + 3) & 0xFFL) << 24)
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    require(bytes.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE", {
      val fmt =
        if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0x49 && (bytes(1) & 0xFF) == 0x44) "mp3(id3)"
        else if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xE0) == 0xE0) "mp3"
        else if (bytes.length >= 4 && tag(0) == "fLaC") "flac"
        else if (bytes.length >= 4 && tag(0) == "OggS") "ogg"
        else "unknown"
      s"audio $id: no in-repo codec for format '$fmt' (WAV/PCM only); " +
        "plug a production decoder for compressed audio"
    })
    var off = 12
    var fmtOff = -1
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= bytes.length && (fmtOff < 0 || dataOff < 0)) {
      val t = tag(off); val len = u32(off + 4).toInt
      require(len >= 0 && off + 8 + len <= bytes.length,
        s"audio $id: truncated RIFF chunk '$t' ($len bytes at $off)")
      if (t == "fmt ") {
        require(len >= 16, s"audio $id: 'fmt ' chunk of $len bytes (16 needed)")
        fmtOff = off + 8
      }
      else if (t == "data") { dataOff = off + 8; dataLen = len }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(fmtOff >= 0 && dataOff >= 0, s"audio $id: missing fmt/data chunk")
    val audioFormat = u16(fmtOff)
    require(audioFormat == 1 || audioFormat == 2 || audioFormat == 6 ||
      audioFormat == 7 || audioFormat == 17,
      s"audio $id: WAV audio format $audioFormat unsupported " +
        "(1 = integer PCM, 2 = MS-ADPCM, 6 = A-law, 7 = μ-law, " +
        "17 = IMA-ADPCM; float needs a plugged decoder)")
    val channels = u16(fmtOff + 2)
    val sampleRate = u32(fmtOff + 4).toInt
    val blockAlign = u16(fmtOff + 12)
    val bits = u16(fmtOff + 14)
    require(channels >= 1 && channels <= 8, s"audio $id: $channels channels")
    // ADPCM WAV (telephony/games archives): block-structured 4-bit
    // codes expand to 16-bit linear through the public IMA / Microsoft
    // state machines; mono only in profile (the telephony shape)
    if (audioFormat == 17 || audioFormat == 2) {
      require(channels == 1,
        s"audio $id: $channels-channel ADPCM out of profile (mono only)")
      require(bits == 4, s"audio $id: ADPCM frames are 4-bit, got $bits")
      val linear =
        if (audioFormat == 17) imaAdpcmDecodeMono(id, bytes, dataOff, dataLen, blockAlign)
        else msAdpcmDecodeMono(id, bytes, dataOff, dataLen, blockAlign)
      val outA = new Array[Float](linear.length)
      var i = 0
      while (i < linear.length) { outA(i) = linear(i) / 32768f; i += 1 }
      return DecodedAudio(id, sampleRate, 1, outA)
    }
    require(audioFormat == 1 || bits == 8,
      s"audio $id: G.711 frames are 8-bit, got $bits")
    require(bits == 8 || bits == 16 || bits == 24 || bits == 32,
      s"audio $id: $bits-bit PCM unsupported (8/16/24/32)")
    val bytesPer = bits / 8
    val frameBytes = bytesPer * channels
    val nFrames = dataLen / frameBytes
    val out = new Array[Float](nFrames)
    val half = (1L << (bits - 1)).toFloat
    var f = 0
    while (f < nFrames) {
      var acc = 0L
      var c = 0
      while (c < channels) {
        val o = dataOff + f * frameBytes + c * bytesPer
        val v =
          if (audioFormat == 7) muLawDecode(bytes(o))
          else if (audioFormat == 6) aLawDecode(bytes(o))
          else bits match {
            case 8 => (bytes(o) & 0xFF) - 128 // unsigned with midpoint 128
            case 16 => ((bytes(o) & 0xFF) | (bytes(o + 1) << 8)).toShort.toInt
            case 24 => (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
              (bytes(o + 2) << 16)
            case 32 => (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
              ((bytes(o + 2) & 0xFF) << 16) | (bytes(o + 3) << 24)
          }
        acc += v
        c += 1
      }
      // G.711 expands to 13/14-bit linear: normalize on the 16-bit scale
      val denom = if (audioFormat == 1) half else 32768f
      out(f) = (acc.toDouble / channels / denom).toFloat
      f += 1
    }
    DecodedAudio(id, sampleRate, channels, out)
  }

  // ---------------------------------------------------------- ADPCM
  // Both state machines are fully printed in their public specs (the
  // IMA "Recommended Practices for Enhancing Digital Audio
  // Compatibility" step/index tables; Microsoft's WAVE format docs'
  // coefficient/adaptation tables) — unlike VP8's ~3000-entry
  // probability tables, these are small enough to transcribe safely,
  // and the q175 bound gate catches structural (nibble-order/table)
  // slips because they turn reconstruction error from ~1 step into
  // full-amplitude garbage.

  /** IMA step-size table (89 entries, spec-printed). */
  private[functions] val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767)

  /** IMA index-adjust table (per 4-bit code). */
  private[functions] val ImaIndexTable: Array[Int] = Array(
    -1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  private def clamp16(v: Int): Int =
    if (v > 32767) 32767 else if (v < -32768) -32768 else v

  /** One IMA code step: (newPred, newIndex). The reconstruction form
    * `diff = (step>>3) + conditional step/2^k` is the spec's
    * integer-exact expansion (not the float (code+0.5)·step/4). */
  private def imaStep(pred: Int, index: Int, code: Int): (Int, Int) = {
    val step = ImaStepTable(index)
    var diff = step >> 3
    if ((code & 1) != 0) diff += step >> 2
    if ((code & 2) != 0) diff += step >> 1
    if ((code & 4) != 0) diff += step
    val p = clamp16(if ((code & 8) != 0) pred - diff else pred + diff)
    val i2 = math.max(0, math.min(88, index + ImaIndexTable(code)))
    (p, i2)
  }

  /** IMA-ADPCM (WAV format 17) mono block decode: each block is a
    * 4-byte header (i16 initial sample, u8 step index, u8 reserved)
    * followed by packed 4-bit codes, LOW nibble first; the header
    * sample is emitted as the block's first sample. A short final
    * block decodes the codes it actually carries. */
  private def imaAdpcmDecodeMono(id: Long, bytes: Array[Byte],
      dataOff: Int, dataLen: Int, blockAlign: Int): Array[Int] = {
    require(blockAlign >= 5, s"audio $id: IMA-ADPCM blockAlign $blockAlign")
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var blk = dataOff
    val end = dataOff + dataLen
    while (blk + 4 <= end) {
      val blkEnd = math.min(blk + blockAlign, end)
      var pred = ((bytes(blk) & 0xFF) | (bytes(blk + 1) << 8)).toShort.toInt
      var index = bytes(blk + 2) & 0xFF
      require(index <= 88, s"audio $id: IMA step index $index > 88")
      out += pred
      var o = blk + 4
      while (o < blkEnd) {
        val b = bytes(o) & 0xFF
        val (p1, i1) = imaStep(pred, index, b & 0xF) // LOW nibble first
        out += p1
        val (p2, i2) = imaStep(p1, i1, b >> 4)
        out += p2
        pred = p2; index = i2
        o += 1
      }
      blk += blockAlign
    }
    out.toArray
  }

  /** IMA-ADPCM mono encoder (writer-beside-reader): standard
    * quantization (sign + successive step halvings), state updated with
    * the DECODER's own reconstruction so encode∘decode is exactly the
    * encoder's simulated signal. */
  def encodeImaAdpcm(samples: Array[Int], sampleRate: Int,
      blockAlign: Int = 256): Array[Byte] = {
    require(blockAlign >= 5, s"blockAlign $blockAlign")
    val spb = (blockAlign - 4) * 2 + 1
    val nBlocks = (samples.length + spb - 1) / spb
    val data = new java.io.ByteArrayOutputStream(nBlocks * blockAlign)
    var s = 0
    while (s < samples.length) {
      val n = math.min(spb, samples.length - s)
      var pred = clamp16(samples(s))
      // seed the block's step index at the block's own slope — the
      // header carries it on the wire, and starting at step 7 makes the
      // attack transient overshoot by several steps before adapting
      var maxDelta = 0
      for (i <- 1 until n)
        maxDelta = math.max(maxDelta, math.abs(samples(s + i) - samples(s + i - 1)))
      var index = 0
      while (index < 88 && ImaStepTable(index) < maxDelta) index += 1
      data.write(pred & 0xFF); data.write((pred >> 8) & 0xFF)
      data.write(index); data.write(0)
      var i = 1
      var k = 0
      while (k < blockAlign - 4) {
        var byte = 0
        for (half <- 0 to 1) {
          val target = if (i < n) samples(s + i) else pred // pad tail codes
          val step = ImaStepTable(index)
          var diff = target - pred
          var code = 0
          if (diff < 0) { code = 8; diff = -diff }
          if (diff >= step) { code |= 4; diff -= step }
          if (diff >= (step >> 1)) { code |= 2; diff -= step >> 1 }
          if (diff >= (step >> 2)) code |= 1
          val (p2, i2) = imaStep(pred, index, code)
          pred = p2; index = i2
          byte |= (code & 0xF) << (half * 4) // LOW nibble first
          i += 1
        }
        data.write(byte)
        k += 1
      }
      s += spb
    }
    val payload = data.toByteArray
    val out = new java.io.ByteArrayOutputStream(60 + payload.length)
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    out.write("RIFF".getBytes("US-ASCII")); w32(40 + payload.length)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(20)
    w16(17); w16(1); w32(sampleRate)
    w32(sampleRate * blockAlign / spb) // nominal byte rate
    w16(blockAlign); w16(4)
    w16(2); w16(spb) // cbSize, samplesPerBlock
    out.write("data".getBytes("US-ASCII")); w32(payload.length)
    out.write(payload)
    out.toByteArray
  }

  /** MS-ADPCM coefficient pairs (the 7 standard predictors). */
  private[functions] val MsCoefs: Array[(Int, Int)] = Array(
    (256, 0), (512, -256), (0, 0), (192, 64), (240, 0), (460, -208),
    (392, -232))

  /** MS-ADPCM delta-adaptation table (per 4-bit code). */
  private[functions] val MsAdaptTable: Array[Int] = Array(
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230)

  /** MS-ADPCM (WAV format 2) mono block decode: 7-byte header
    * (u8 predictor index, i16 delta, i16 sample1, i16 sample2), then
    * 4-bit codes HIGH nibble first; sample2 and sample1 are emitted
    * first (they are the two warm-up samples). */
  private def msAdpcmDecodeMono(id: Long, bytes: Array[Byte],
      dataOff: Int, dataLen: Int, blockAlign: Int): Array[Int] = {
    require(blockAlign >= 7, s"audio $id: MS-ADPCM blockAlign $blockAlign")
    def i16(off: Int) = ((bytes(off) & 0xFF) | (bytes(off + 1) << 8)).toShort.toInt
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var blk = dataOff
    val end = dataOff + dataLen
    while (blk + 7 <= end) {
      val blkEnd = math.min(blk + blockAlign, end)
      val predIdx = bytes(blk) & 0xFF
      require(predIdx < MsCoefs.length,
        s"audio $id: MS-ADPCM predictor $predIdx out of range")
      val (c1, c2) = MsCoefs(predIdx)
      var delta = i16(blk + 1)
      var s1 = i16(blk + 3)
      var s2 = i16(blk + 5)
      out += s2; out += s1
      var o = blk + 7
      while (o < blkEnd) {
        val b = bytes(o) & 0xFF
        for (nib <- Seq(b >> 4, b & 0xF)) { // HIGH nibble first
          val signed = if (nib >= 8) nib - 16 else nib
          // the spec's /256 is C division (toward zero), not a shift
          val pred = clamp16((s1 * c1 + s2 * c2) / 256 + signed * delta)
          s2 = s1; s1 = pred
          out += pred
          delta = math.max(16, MsAdaptTable(nib) * delta / 256)
        }
        o += 1
      }
      blk += blockAlign
    }
    out.toArray
  }

  /** MS-ADPCM mono encoder (writer-beside-reader): predictor 0
    * (c1=256, c2=0), greedy code = clamped err/delta, state updated via
    * the decoder's own arithmetic. */
  def encodeMsAdpcm(samples: Array[Int], sampleRate: Int,
      blockAlign: Int = 256): Array[Byte] = {
    require(blockAlign >= 8, s"blockAlign $blockAlign")
    val spb = (blockAlign - 7) * 2 + 2
    val data = new java.io.ByteArrayOutputStream()
    var s = 0
    while (s < samples.length) {
      def at(i: Int): Int = if (s + i < samples.length) clamp16(samples(s + i)) else 0
      var delta = 128
      var s2 = at(0)
      var s1 = at(1)
      data.write(0) // predictor index 0: c1=256, c2=0
      data.write(delta & 0xFF); data.write((delta >> 8) & 0xFF)
      data.write(s1 & 0xFF); data.write((s1 >> 8) & 0xFF)
      data.write(s2 & 0xFF); data.write((s2 >> 8) & 0xFF)
      var i = 2
      var k = 0
      while (k < blockAlign - 7) {
        var byte = 0
        for (half <- 0 to 1) {
          val target = at(i)
          val pred0 = (s1 * 256 + s2 * 0) / 256
          var code = (target - pred0) / delta
          if (code > 7) code = 7
          if (code < -8) code = -8
          val nib = code & 0xF
          val pred = clamp16(pred0 + code * delta)
          s2 = s1; s1 = pred
          delta = math.max(16, MsAdaptTable(nib) * delta / 256)
          byte |= nib << ((1 - half) * 4) // HIGH nibble first
          i += 1
        }
        data.write(byte)
        k += 1
      }
      s += spb
    }
    val payload = data.toByteArray
    val out = new java.io.ByteArrayOutputStream(80 + payload.length)
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    val fmtLen = 18 + 4 + MsCoefs.length * 4 // base + cb + spb/numcoef + pairs
    out.write("RIFF".getBytes("US-ASCII")); w32(20 + fmtLen + 8 + payload.length)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(fmtLen)
    w16(2); w16(1); w32(sampleRate)
    w32(sampleRate * blockAlign / spb)
    w16(blockAlign); w16(4)
    w16(4 + MsCoefs.length * 4) // cbSize
    w16(spb); w16(MsCoefs.length)
    MsCoefs.foreach { case (c1, c2) => w16(c1 & 0xFFFF); w16(c2 & 0xFFFF) }
    out.write("data".getBytes("US-ASCII")); w32(payload.length)
    out.write(payload)
    out.toByteArray
  }

  /** G.711 μ-law expansion (the telephony/call-center crawl shape):
    * 8-bit code → 14-bit linear, the standard bias-0x84 segment form. */
  def muLawDecode(code: Byte): Int = {
    val u = ~code & 0xFF
    val exp = (u >> 4) & 0x7
    val mant = u & 0xF
    val mag = (((mant << 3) + 0x84) << exp) - 0x84
    if ((u & 0x80) != 0) -mag else mag
  }

  /** G.711 μ-law compression — fixture/writer side, the exact inverse
    * search over the segment table. */
  def muLawEncode(linear: Int): Byte = {
    val sign = if (linear < 0) 0x80 else 0
    var mag = math.min(math.abs(linear), 32635) + 0x84
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (mag & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (mag >> (exp + 3)) & 0xF
    (~(sign | (exp << 4) | mant) & 0xFF).toByte
  }

  /** G.711 A-law expansion: 8-bit code → 13-bit linear. */
  def aLawDecode(code: Byte): Int = {
    val a = (code ^ 0x55) & 0xFF
    val exp = (a >> 4) & 0x7
    val mant = a & 0xF
    val mag =
      if (exp == 0) (mant << 4) + 8
      else ((mant << 4) + 0x108) << (exp - 1)
    if ((a & 0x80) != 0) mag else -mag
  }

  /** G.711 A-law compression (fixture/writer side). */
  def aLawEncode(linear: Int): Byte = {
    val sign = if (linear >= 0) 0x80 else 0
    var mag = math.min(math.abs(linear), 32767)
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (mag & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = if (exp == 0) (mag >> 4) & 0xF else (mag >> (exp + 3)) & 0xF
    (((sign | (exp << 4) | mant) ^ 0x55) & 0xFF).toByte
  }

  /** Encode mono 16-bit-linear samples as a G.711 WAV (format 6 A-law /
    * 7 μ-law, 8-bit frames) — writer-beside-reader for the decode path. */
  def encodeG711(samples: Array[Int], sampleRate: Int, aLaw: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(44 + samples.length)
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    out.write("RIFF".getBytes, 0, 4); w32(36 + samples.length)
    out.write("WAVE".getBytes, 0, 4)
    out.write("fmt ".getBytes, 0, 4); w32(16)
    w16(if (aLaw) 6 else 7); w16(1); w32(sampleRate)
    w32(sampleRate); w16(1); w16(8)
    out.write("data".getBytes, 0, 4); w32(samples.length)
    samples.foreach(s => out.write(
      (if (aLaw) aLawEncode(s) else muLawEncode(s)) & 0xFF))
    out.toByteArray
  }

  /** Decode FLAC through the in-repo [[Flac]] codec, then normalize to
    * mono [-1, 1] with the SAME integer-space channel averaging as the
    * WAV path — one downstream feature contract for both formats. */
  def decodeFlac(id: Long, bytes: Array[Byte]): DecodedAudio = {
    val f = Flac.decode(bytes)
    val half = (1L << (f.bits - 1)).toFloat
    val n = f.samples(0).length
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      var acc = 0L
      var c = 0
      while (c < f.channels) { acc += f.samples(c)(i); c += 1 }
      out(i) = (acc.toDouble / f.channels / half).toFloat
      i += 1
    }
    DecodedAudio(id, f.sampleRate, f.channels, out)
  }

  /** Magic-dispatched audio decode: FLAC and WAV/PCM route to their
    * in-repo codecs; anything else falls through to the WAV path's
    * NAMED refusal (mp3/ogg/unknown). */
  def decodeAuto(id: Long, bytes: Array[Byte]): DecodedAudio =
    if (bytes.length >= 4 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C') decodeFlac(id, bytes)
    else decodeWav(id, bytes)

  /** Encode mono PCM to WAV (fixture/writer side; integer samples in the
    * bit-depth's signed range, 8-bit unsigned per the spec). */
  def encodeWav(samples: Array[Int], sampleRate: Int, bits: Int = 16): Array[Byte] = {
    require(bits == 8 || bits == 16, s"writer supports 8/16-bit, got $bits")
    val bytesPer = bits / 8
    val dataLen = samples.length * bytesPer
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    out.write("RIFF".getBytes("US-ASCII")); w32(36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16)
    w16(1); w16(1); w32(sampleRate); w32(sampleRate * bytesPer)
    w16(bytesPer); w16(bits)
    out.write("data".getBytes("US-ASCII")); w32(dataLen)
    samples.foreach { s =>
      if (bits == 8) out.write((s + 128) & 0xFF)
      else w16(s & 0xFFFF)
    }
    out.toByteArray
  }

  /** Per-clip audio features over REAL decoded samples, batched per
    * partition: duration, RMS energy, peak, zero-crossing count — the
    * audio analogs of text quality scoring (length/punct ratios), used
    * the same way for corpus curation gates. Output:
    * (id, sample_rate, n_samples, duration_ms, rms, peak, zero_crossings). */
  def audioFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("duration_ms", LongType, nullable = false),
      StructField("rms", DoubleType, nullable = false),
      StructField("peak", DoubleType, nullable = false),
      StructField("zero_crossings", LongType, nullable = false)))
    df.select(col(idCol).cast(LongType), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val d = decodeAuto(id, bytes)
          var sq = 0.0; var peak = 0.0; var zc = 0L
          var prevSign = 0
          var i = 0
          while (i < d.samples.length) {
            val v = d.samples(i).toDouble
            sq += v * v
            if (math.abs(v) > peak) peak = math.abs(v)
            val sign = if (v > 0) 1 else if (v < 0) -1 else 0
            if (sign != 0 && prevSign != 0 && sign != prevSign) zc += 1
            if (sign != 0) prevSign = sign
            i += 1
          }
          val n = d.samples.length.toLong
          org.apache.spark.sql.Row(id, d.sampleRate, n,
            n * 1000L / math.max(d.sampleRate, 1),
            if (n == 0) 0.0 else math.sqrt(sq / n), peak, zc)
        }
      }(Encoders.row(schema))
  }
}
