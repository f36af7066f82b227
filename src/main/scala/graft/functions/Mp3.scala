package graft.functions

import scala.collection.mutable.ArrayBuffer

/** MPEG audio (MP3) frame-HEADER scan — metadata only, NO audio
  * decode. The 4-byte frame header carries everything a curation pass
  * needs (duration, bitrate profile, sample rate, channel mode, frame
  * cadence, VBR-ness) via two small, universally-published tables
  * (bitrate and sample-rate indices) — the same codec-agnostic stance
  * as the [[Mp4]]/[[Mkv]]/[[Ogg]] sample-table walks. Full Layer III
  * DECODE stays refused by name: its Annex-B Huffman tables cannot be
  * transcribed safely in this environment (the lossy-VP8 rationale —
  * a mirrored mistranscription would roundtrip green), and the README
  * validation table names the ffprobe diff to run where available.
  *
  * In profile: MPEG 1/2/2.5, Layers I/II/III, an ID3v2 prefix
  * (syncsafe size, footer flag) and trailing ID3v1 (128-byte 'TAG')
  * skipped, optional CRC-16 region skipped per the protection bit.
  * Out of profile and refused BY NAME: free-format bitrate (index 0),
  * bad bitrate/sample-rate indices, reserved version/layer codes, sync
  * loss mid-stream, truncated final frames. */
object Mp3 {

  /** One frame's header facts. */
  final case class Mp3Frame(
      offset: Long,
      byteSize: Int,
      version: String, // "1", "2", "2.5"
      layer: Int, // 1, 2, 3
      bitrateKbps: Int,
      sampleRate: Int,
      channels: Int, // 1 or 2
      samplesPerFrame: Int)

  // bitrate tables (kbps) by [version-group][layer][index 1-14]; index 0
  // is free-format (refused), 15 is invalid
  private val BitrateV1: Array[Array[Int]] = Array(
    Array(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448), // L1
    Array(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384), // L2
    Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)) // L3
  private val BitrateV2: Array[Array[Int]] = Array(
    Array(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256), // L1
    Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160), // L2
    Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)) // L3

  private val SampleRateV1 = Array(44100, 48000, 32000)
  private val SampleRateV2 = Array(22050, 24000, 16000)
  private val SampleRateV25 = Array(11025, 12000, 8000)

  /** Frame byte length from the header fields (ISO 11172-3 §2.4.3.1 /
    * 13818-3): slots = SamplesPerFrame/8 · bitrate/samplerate (+pad),
    * Layer I slots are 4 bytes wide. */
  private def frameLen(layer: Int, mpeg1: Boolean, bitrateBps: Long,
      sampleRate: Int, padding: Int): Int =
    if (layer == 1)
      ((12 * bitrateBps / sampleRate).toInt + padding) * 4
    else {
      val spf = samplesPerFrame(layer, mpeg1)
      (spf / 8 * bitrateBps / sampleRate).toInt + padding
    }

  private def samplesPerFrame(layer: Int, mpeg1: Boolean): Int = layer match {
    case 1 => 384
    case 2 => 1152
    case 3 => if (mpeg1) 1152 else 576
  }

  /** Walk every frame header of an MP3 payload. */
  def frames(id: Long, bytes: Array[Byte]): Seq[Mp3Frame] = {
    var off = 0
    // ID3v2 prefix: "ID3" ver(2) flags(1) syncsafe-size(4)
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
      bytes(2) == '3') {
      val flags = bytes(5) & 0xFF
      val size = (0 until 4).foldLeft(0)((acc, i) =>
        (acc << 7) | (bytes(6 + i) & 0x7F))
      off = 10 + size + (if ((flags & 0x10) != 0) 10 else 0) // footer
    }
    var end = bytes.length
    // trailing ID3v1: fixed 128-byte 'TAG' block
    if (end - off >= 128 && bytes(end - 128) == 'T' &&
      bytes(end - 127) == 'A' && bytes(end - 126) == 'G') end -= 128
    require(off + 4 <= end && (bytes(off) & 0xFF) == 0xFF &&
      (bytes(off + 1) & 0xE0) == 0xE0, {
      val fmt =
        if (bytes.length >= 4 && bytes(0) == 'O' && bytes(1) == 'g')
          "ogg — use Ogg.packets"
        else if (bytes.length >= 4 && bytes(0) == 'f' && bytes(1) == 'L') "flac"
        else "unknown"
      s"mp3 $id: no frame sync at $off (looks like '$fmt')"
    })
    val out = ArrayBuffer.empty[Mp3Frame]
    while (off + 4 <= end) {
      require((bytes(off) & 0xFF) == 0xFF && (bytes(off + 1) & 0xE0) == 0xE0,
        s"mp3 $id: lost frame sync at $off after ${out.length} frames")
      val b1 = bytes(off + 1) & 0xFF
      val b2 = bytes(off + 2) & 0xFF
      val b3 = bytes(off + 3) & 0xFF
      val verCode = (b1 >> 3) & 0x3 // 0=2.5, 1=reserved, 2=2, 3=1
      require(verCode != 1, s"mp3 $id: reserved MPEG version at $off")
      val layerCode = (b1 >> 1) & 0x3 // 1=III, 2=II, 3=I
      require(layerCode != 0, s"mp3 $id: reserved layer code at $off")
      val layer = 4 - layerCode
      val brIdx = (b2 >> 4) & 0xF
      require(brIdx != 0, s"mp3 $id: free-format bitrate out of profile at $off")
      require(brIdx != 15, s"mp3 $id: invalid bitrate index 15 at $off")
      val srIdx = (b2 >> 2) & 0x3
      require(srIdx != 3, s"mp3 $id: reserved sample-rate index at $off")
      val padding = (b2 >> 1) & 0x1
      val mode = (b3 >> 6) & 0x3 // 3 = single channel
      val mpeg1 = verCode == 3
      val kbps = (if (mpeg1) BitrateV1 else BitrateV2)(layer - 1)(brIdx - 1)
      val rate = (verCode match {
        case 3 => SampleRateV1
        case 2 => SampleRateV2
        case _ => SampleRateV25
      })(srIdx)
      val len = frameLen(layer, mpeg1, kbps * 1000L, rate, padding)
      require(off + len <= end,
        s"mp3 $id: frame at $off claims $len bytes past end $end")
      out += Mp3Frame(off, len,
        if (verCode == 3) "1" else if (verCode == 2) "2" else "2.5",
        layer, kbps, rate, if (mode == 3) 1 else 2,
        samplesPerFrame(layer, mpeg1))
      off += len
    }
    // 1-3 residual bytes are a cut-off next header, not silence-able
    require(off == end,
      s"mp3 $id: ${end - off} trailing bytes after the last frame " +
        s"(truncated next header at $off)")
    out.toSeq
  }

  /** [[frames]] as a relational stage: one row per frame — the
    * crawl-audio curation shape (duration, bitrate histograms, VBR
    * detection) with zero Huffman decode. */
  def frameTable(df: org.apache.spark.sql.DataFrame, idCol: String,
      binCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("byte_offset", LongType, nullable = false),
      StructField("byte_size", IntegerType, nullable = false),
      StructField("mpeg_version", StringType, nullable = false),
      StructField("layer", IntegerType, nullable = false),
      StructField("bitrate_kbps", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("samples_per_frame", IntegerType, nullable = false)))
    df.select(col(idCol).cast(LongType), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          frames(id, bytes).zipWithIndex.map { case (f, i) =>
            Row(id, i, f.offset, f.byteSize, f.version, f.layer,
              f.bitrateKbps, f.sampleRate, f.channels, f.samplesPerFrame)
          }
        }
      }(Encoders.row(schema))
  }

  // ------------------------------------------------------------- write

  /** Writer-side frame spec (header fields; payload bytes are a
    * deterministic pattern to the computed frame length). */
  final case class WFrame(
      verCode: Int = 3, // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
      layer: Int = 3,
      bitrateIdx: Int, // 1-14
      srIdx: Int = 0,
      padding: Int = 0,
      mono: Boolean = false)

  /** Emit headers + patterned payloads, optionally wrapped in ID3v2 /
    * ID3v1 tags (writer-beside-reader for the scan). */
  def encode(frames: Seq[WFrame], id3v2Bytes: Int = 0,
      id3v1: Boolean = false, seed: Long = 7): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    if (id3v2Bytes > 0) {
      out ++= "ID3".getBytes("US-ASCII")
      out += 4; out += 0; out += 0 // v2.4, no flags
      (3 to 0 by -1).foreach(i => out += ((id3v2Bytes >> (7 * i)) & 0x7F).toByte)
      (0 until id3v2Bytes).foreach(i => out += ((seed + i) % 251).toByte)
    }
    frames.zipWithIndex.foreach { case (f, fi) =>
      require(f.bitrateIdx >= 1 && f.bitrateIdx <= 14, s"bitrateIdx ${f.bitrateIdx}")
      require(f.verCode == 3 || f.verCode == 2 || f.verCode == 0, s"verCode ${f.verCode}")
      val layerCode = 4 - f.layer
      val mpeg1 = f.verCode == 3
      val kbps = (if (mpeg1) BitrateV1 else BitrateV2)(f.layer - 1)(f.bitrateIdx - 1)
      val rate = (f.verCode match {
        case 3 => SampleRateV1
        case 2 => SampleRateV2
        case _ => SampleRateV25
      })(f.srIdx)
      val len = frameLen(f.layer, mpeg1, kbps * 1000L, rate, f.padding)
      out += 0xFF.toByte
      out += (0xE0 | (f.verCode << 3) | (layerCode << 1) | 1).toByte // no CRC
      out += ((f.bitrateIdx << 4) | (f.srIdx << 2) | (f.padding << 1)).toByte
      out += (if (f.mono) 0xC0 else 0x00).toByte
      (4 until len).foreach(j => out += ((seed + fi * 31 + j) % 251).toByte)
    }
    if (id3v1) {
      out ++= "TAG".getBytes("US-ASCII")
      (0 until 125).foreach(_ => out += 0)
    }
    out.toArray
  }
}
