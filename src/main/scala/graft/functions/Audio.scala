package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL audio decode for the multimodal pack: WAV/RIFF PCM — the one
  * audio container with a public byte-level spec and no codec dependency
  * (RIFF framing + little-endian integer samples) — parsed in-repo, the
  * way [[Multimodal.PngDecoder]] serves images. Compressed audio (MP3,
  * AAC, FLAC, or non-PCM WAV like μ-law) is refused BY NAME; a JNI
  * decoder drops into the same per-partition shape.
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
    require(audioFormat == 1 || audioFormat == 6 || audioFormat == 7,
      s"audio $id: WAV audio format $audioFormat unsupported " +
        "(1 = integer PCM, 6 = A-law, 7 = μ-law; float/ADPCM need a plugged decoder)")
    val channels = u16(fmtOff + 2)
    val sampleRate = u32(fmtOff + 4).toInt
    val bits = u16(fmtOff + 14)
    require(channels >= 1 && channels <= 8, s"audio $id: $channels channels")
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
