package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Ogg container (RFC 3533) demuxer + writer — the transport of Opus
  * (RFC 7845) and Vorbis audio in web crawls, podcast archives, and
  * Wikimedia media dumps. Pages carry a 27-byte header ("OggS", version
  * 0, type flags, granule position, stream serial, page sequence,
  * CRC-32, segment count) plus a lacing table; PACKETS are reassembled
  * from segments (a packet ends on a lacing value < 255, spans pages
  * via the continued-page flag). Codec-agnostic like [[Mp4]]/[[Mkv]]:
  * packet sizes, granule positions, and stream serials are the
  * curation statistics (duration, packet cadence, codec id) — no audio
  * decode.
  *
  * Page CRCs are VERIFIED (polynomial 0x04C11DB7, unreflected, zero
  * init/xorout — Ogg's own variant; the JDK's java.util.zip.CRC32 is
  * the reflected form and cannot be reused), so bit rot surfaces as a
  * named error, not silent garbage. In profile: single and chained/
  * concatenated streams, packets spanning pages, nil packets,
  * continued-page reassembly. Out of profile and refused BY NAME:
  * version != 0, CRC mismatches, a continued page whose predecessor
  * ended cleanly, truncated pages. */
object Ogg {

  /** One logical stream's packet table. `granule` is the granule
    * position of the page on which the packet COMPLETES (-1 when that
    * page carries the "no packet ends here" sentinel). */
  final case class OggStream(
      serial: Long,
      codec: String, // opus / vorbis / flac / theora / unknown
      sizes: Array[Long],
      offsets: Array[Long], // absolute offset of each packet's first byte
      granules: Array[Long],
      eosSeen: Boolean)

  /** Ogg CRC-32: forward (unreflected) 0x04C11DB7, init 0, xorout 0. */
  private val CrcTable: Array[Int] = Array.tabulate(256) { i =>
    var r = i << 24
    var k = 0
    while (k < 8) {
      r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04C11DB7 else r << 1
      k += 1
    }
    r
  }
  private def crcUpdate(c0: Int, bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = c0
    var i = from
    while (i < until) {
      c = (c << 8) ^ CrcTable(((c >>> 24) ^ bytes(i)) & 0xFF)
      i += 1
    }
    c
  }
  private val Zero4 = new Array[Byte](4)
  private[functions] def crc(bytes: Array[Byte], from: Int, until: Int): Int =
    crcUpdate(0, bytes, from, until)

  private def sniffCodec(first: Array[Byte]): String = {
    def at(s: String, off: Int = 0): Boolean =
      first.length >= off + s.length &&
        s.indices.forall(i => first(off + i) == s.charAt(i).toByte)
    if (at("OpusHead")) "opus"
    else if (first.length >= 7 && first(0) == 1 && at("vorbis", 1)) "vorbis"
    else if (first.length >= 5 && (first(0) & 0xFF) == 0x7F && at("FLAC", 1)) "flac"
    else if (first.length >= 7 && (first(0) & 0xFF) == 0x80 && at("theora", 1)) "theora"
    else "unknown"
  }

  private final class StreamAcc(val serial: Long) {
    var codec = "unknown"
    var firstPacket = true
    val sizes = ArrayBuffer.empty[Long]
    val offsets = ArrayBuffer.empty[Long]
    val granules = ArrayBuffer.empty[Long]
    var eosSeen = false
    // packet under assembly across pages
    var pendingSize = 0L
    var pendingOffset = -1L
    var pendingHead: Array[Byte] = Array.emptyByteArray
    def open: Boolean = pendingOffset >= 0
    def complete(granule: Long): Unit = {
      if (firstPacket) { codec = sniffCodec(pendingHead); firstPacket = false }
      sizes += pendingSize
      offsets += pendingOffset
      granules += granule
      pendingSize = 0; pendingOffset = -1; pendingHead = Array.emptyByteArray
    }
  }

  /** Parse every page and return the packet table per logical stream,
    * in first-appearance order. */
  def demux(id: Long, bytes: Array[Byte]): Seq[OggStream] = {
    require(bytes.length >= 4 && bytes(0) == 'O' && bytes(1) == 'g' &&
      bytes(2) == 'g' && bytes(3) == 'S', {
      val fmt =
        if (bytes.length >= 12 && new String(bytes, 4, 4, "US-ASCII") == "ftyp")
          "mp4/mov — use Mp4.demux"
        else if (bytes.length >= 4 && bytes(0) == 'f' && bytes(1) == 'L') "flac"
        else "unknown"
      s"ogg $id: not an Ogg stream (looks like '$fmt')"
    })
    def u32le(o: Int): Long = (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
      ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
    def u64le(o: Int): Long = u32le(o) | (u32le(o + 4) << 32)
    val streams = scala.collection.mutable.LinkedHashMap.empty[Long, StreamAcc]
    var off = 0
    while (off < bytes.length) {
      require(off + 27 <= bytes.length, s"ogg $id: truncated page header at $off")
      require(bytes(off) == 'O' && bytes(off + 1) == 'g' &&
        bytes(off + 2) == 'g' && bytes(off + 3) == 'S',
        s"ogg $id: lost page sync at $off")
      require(bytes(off + 4) == 0,
        s"ogg $id: Ogg version ${bytes(off + 4)} out of profile (0 only)")
      val flags = bytes(off + 5) & 0xFF
      val granule = u64le(off + 6)
      val serial = u32le(off + 14)
      val storedCrc = u32le(off + 22).toInt
      val nSegs = bytes(off + 26) & 0xFF
      require(off + 27 + nSegs <= bytes.length,
        s"ogg $id: truncated lacing table at $off")
      val lacing = Array.tabulate(nSegs)(i => bytes(off + 27 + i) & 0xFF)
      val bodyLen = lacing.sum
      val pageEnd = off + 27 + nSegs + bodyLen
      require(pageEnd <= bytes.length,
        s"ogg $id: page at $off claims $bodyLen body bytes past end")
      // CRC over the whole page with the CRC field read as zeros —
      // computed piecewise so the input bytes are never mutated
      val computed = crcUpdate(
        crcUpdate(crcUpdate(0, bytes, off, off + 22), Zero4, 0, 4),
        bytes, off + 26, pageEnd)
      require(computed == storedCrc,
        f"ogg $id: page CRC mismatch at $off (stored $storedCrc%08x, " +
          f"computed $computed%08x)")
      val acc = streams.getOrElseUpdate(serial, new StreamAcc(serial))
      val continued = (flags & 0x1) != 0
      require(continued == acc.open,
        if (continued) s"ogg $id: continued page at $off but no packet is open"
        else s"ogg $id: page at $off drops an unfinished packet")
      if ((flags & 0x4) != 0) acc.eosSeen = true
      var p = off + 27 + nSegs
      lacing.foreach { lace =>
        if (!acc.open) acc.pendingOffset = p
        if (acc.pendingHead.length < 8 && lace > 0) {
          val take = math.min(8 - acc.pendingHead.length, lace)
          acc.pendingHead = acc.pendingHead ++
            java.util.Arrays.copyOfRange(bytes, p, p + take)
        }
        acc.pendingSize += lace
        p += lace
        if (lace < 255) acc.complete(granule)
      }
      off = pageEnd
    }
    streams.valuesIterator.foreach { acc =>
      require(!acc.open,
        s"ogg $id: stream ${acc.serial} ends mid-packet (truncated file)")
    }
    streams.valuesIterator.map(a => OggStream(a.serial, a.codec,
      a.sizes.toArray, a.offsets.toArray, a.granules.toArray, a.eosSeen)).toSeq
  }

  /** [[demux]] as a relational stage: one row per packet across all
    * logical streams — the demuxMp4/demuxMkv shape for Ogg payloads. */
  def packets(df: org.apache.spark.sql.DataFrame, idCol: String,
      binCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("serial", LongType, nullable = false),
      StructField("packet_idx", IntegerType, nullable = false),
      StructField("byte_size", LongType, nullable = false),
      StructField("byte_offset", LongType, nullable = false),
      StructField("granule", LongType, nullable = false),
      StructField("codec", StringType, nullable = false)))
    df.select(col(idCol).cast(LongType), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          demux(id, bytes).iterator.flatMap { s =>
            (0 until s.sizes.length).iterator.map { i =>
              Row(id, s.serial, i, s.sizes(i), s.offsets(i), s.granules(i),
                s.codec)
            }
          }
        }
      }(Encoders.row(schema))
  }

  // ------------------------------------------------------------- write

  /** One stream to write: packets + the granule stamped on each page
    * (granuleOf(last packet COMPLETING on the page) — granules are
    * page-level in Ogg). `maxPacketsPerPage = 1` gives every packet its
    * own page, making per-packet granules exact; small
    * `maxSegsPerPage` forces packets to span pages. */
  final case class WStream(
      serial: Long,
      packets: Seq[Array[Byte]],
      granuleOf: Int => Long = _.toLong,
      maxSegsPerPage: Int = 255,
      maxPacketsPerPage: Int = Int.MaxValue)

  /** Emit streams as concatenated (chained) logical bitstreams: each
    * stream's packets packed into pages of at most `maxSegsPerPage`
    * segments — a small cap forces packets to SPAN pages via the
    * continued flag, the reassembly path real Opus files exercise. */
  def encode(streams: Seq[WStream]): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    streams.foreach { s =>
      require(s.maxSegsPerPage >= 1 && s.maxSegsPerPage <= 255,
        s"maxSegsPerPage ${s.maxSegsPerPage}")
      // lacing values for every packet, flattened, with packet index of
      // the segment that COMPLETES each packet
      final case class Seg(lace: Int, completesPacket: Int, data: Array[Byte])
      val segs = ArrayBuffer.empty[Seg]
      s.packets.zipWithIndex.foreach { case (pk, pi) =>
        var rem = pk.length
        var at = 0
        var done = false
        while (!done) {
          val lace = math.min(rem, 255)
          val data = java.util.Arrays.copyOfRange(pk, at, at + lace)
          at += lace; rem -= lace
          val completes = lace < 255
          segs += Seg(lace, if (completes) pi else -1, data)
          if (completes) done = true
          else if (rem == 0) { // exact multiple of 255: nil terminator
            segs += Seg(0, pi, Array.emptyByteArray)
            done = true
          }
        }
      }
      // carve segments into pages: cut on the segment cap, or right
      // after a packet completes once the per-page packet cap is hit
      val pages = ArrayBuffer.empty[Seq[Seg]]
      locally {
        var cur = ArrayBuffer.empty[Seg]
        var completed = 0
        segs.foreach { seg =>
          cur += seg
          if (seg.completesPacket >= 0) completed += 1
          if (cur.length == s.maxSegsPerPage ||
            completed == s.maxPacketsPerPage) {
            pages += cur.toSeq; cur = ArrayBuffer.empty[Seg]; completed = 0
          }
        }
        if (cur.nonEmpty || pages.isEmpty) pages += cur.toSeq
      }
      var pageSeq = 0L
      var continuing = false
      pages.foreach { page =>
        val isLast = pageSeq == pages.length - 1
        val lastCompleted = page.reverseIterator.map(_.completesPacket)
          .find(_ >= 0)
        val granule = lastCompleted.map(s.granuleOf(_)).getOrElse(-1L)
        var flags = 0
        if (continuing) flags |= 0x1
        if (pageSeq == 0L) flags |= 0x2 // BOS
        if (isLast) flags |= 0x4 // EOS
        val hdr = ArrayBuffer.empty[Byte]
        hdr ++= "OggS".getBytes("US-ASCII")
        hdr += 0 // version
        hdr += flags.toByte
        def w32(v: Long): Unit = (0 until 4).foreach(i =>
          hdr += ((v >> (8 * i)) & 0xFF).toByte)
        def w64(v: Long): Unit = { w32(v & 0xFFFFFFFFL); w32(v >>> 32) }
        w64(granule)
        w32(s.serial)
        w32(pageSeq)
        val crcAt = hdr.length
        w32(0) // CRC placeholder
        hdr += page.length.toByte
        page.foreach(g => hdr += g.lace.toByte)
        val full = hdr.toArray ++ page.flatMap(_.data)
        val c = crc(full, 0, full.length)
        (0 until 4).foreach(i => full(crcAt + i) = ((c >> (8 * i)) & 0xFF).toByte)
        out ++= full
        continuing = page.lastOption.exists(_.completesPacket < 0)
        pageSeq += 1
      }
    }
    out.toArray
  }
}
