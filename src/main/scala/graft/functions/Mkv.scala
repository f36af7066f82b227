package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Matroska / WebM container demuxer + writer (the public EBML +
  * Matroska element specs — RFC 8794 EBML, the matroska.org element
  * registry). With MP4 ([[Mp4]]) and AVI ([[Multimodal.aviFrames]])
  * this completes the web's video-container triad; WebM is what
  * YouTube-era crawls carry for VP8/VP9/AV1 + Opus/Vorbis payloads.
  * Codec-agnostic like the MP4 walk: the cluster/block structure gives
  * per-frame sizes, timestamps, keyframe flags, and byte offsets with
  * zero codec decode.
  *
  * In profile: EBML header with DocType matroska/webm, unknown-size
  * Segment (the streaming-muxer shape — extends to end of file),
  * Info/TimestampScale, TrackEntry (number, type, CodecID, video
  * dimensions, audio sampling rate, DefaultDuration), Cluster
  * Timestamp re-basing, SimpleBlock AND BlockGroup/Block (keyframe =
  * no ReferenceBlock in the group), and ALL THREE lacing modes (Xiph
  * 255-run sizes, fixed equal-split, EBML signed-delta sizes) — laced
  * frames advance by the track's DefaultDuration when declared, else
  * share the block timestamp. Out of profile and refused BY NAME:
  * unknown-size Clusters, encrypted/compressed tracks
  * (ContentEncodings), non-Matroska EBML doctypes.
  *
  * Writer-beside-reader: [[encode]] emits the same profile so fixtures
  * exercise every lacing/keyframe/cluster path from
  * independently-assembled bytes. */
object Mkv {

  /** One demuxed track: header facts + the per-frame table. `ts` is in
    * TimestampScale units (cluster base + block relative [+ lace step
    * from DefaultDuration]). */
  final case class MkvTrack(
      number: Long,
      trackType: Int, // 1 video, 2 audio, 17 subtitle, ...
      codec: String, // CodecID: V_VP9, A_OPUS, ...
      width: Int, height: Int, // video; 0 otherwise
      defaultDurationNs: Long, // 0 = undeclared
      sizes: Array[Long],
      offsets: Array[Long], // absolute file offsets of frame bytes
      ts: Array[Long],
      keyframe: Array[Boolean])

  // Matroska element IDs (with the EBML marker bit, as they appear on
  // the wire)
  private val IdEbml = 0x1A45DFA3L
  private val IdDocType = 0x4282L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimestampScale = 0x2AD7B1L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdTrackNumber = 0xD7L
  private val IdTrackType = 0x83L
  private val IdCodecId = 0x86L
  private val IdDefaultDuration = 0x23E383L
  private val IdVideo = 0xE0L
  private val IdPixelWidth = 0xB0L
  private val IdPixelHeight = 0xBAL
  private val IdAudio = 0xE1L
  private val IdCluster = 0x1F43B675L
  private val IdTimestamp = 0xE7L
  private val IdSimpleBlock = 0xA3L
  private val IdBlockGroup = 0xA0L
  private val IdBlock = 0xA1L
  private val IdReferenceBlock = 0xFBL
  private val IdContentEncodings = 0x6D80L

  private final class Reader(val bytes: Array[Byte], val id: Long) {
    var pos: Int = 0
    def u8(): Int = { val v = bytes(pos) & 0xFF; pos += 1; v }
    /** Element ID: length from leading zeros, marker KEPT (wire form). */
    def vintId(): Long = {
      val first = bytes(pos) & 0xFF
      val len = vintLen(first)
      var v = 0L
      var i = 0
      while (i < len) { v = (v << 8) | (bytes(pos + i) & 0xFFL); i += 1 }
      pos += len
      v
    }
    /** Data size: marker bit STRIPPED; all-value-bits-set = unknown. */
    def vintSize(): Long = {
      val first = bytes(pos) & 0xFF
      val len = vintLen(first)
      var v = (first & (0xFF >>> len)).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (bytes(pos + i) & 0xFFL); i += 1 }
      pos += len
      val unknown = (1L << (7 * len)) - 1
      if (v == unknown) -1L else v
    }
    /** Signed VINT (EBML lacing deltas): size form minus the bias. */
    def vintSigned(): Long = {
      val first = bytes(pos) & 0xFF
      val len = vintLen(first)
      val raw = vintSize()
      require(raw >= 0, s"mkv $id: unknown-size signed vint")
      raw - ((1L << (7 * len - 1)) - 1)
    }
    private def vintLen(first: Int): Int = {
      require(first != 0, s"mkv $id: invalid EBML varint (zero first byte) at $pos")
      java.lang.Integer.numberOfLeadingZeros(first) - 24 + 1
    }
    def uint(len: Int): Long = {
      var v = 0L
      var i = 0
      while (i < len) { v = (v << 8) | (bytes(pos + i) & 0xFFL); i += 1 }
      pos += len
      v
    }
    def i16(): Int = { val v = ((bytes(pos) << 8) | (bytes(pos + 1) & 0xFF)).toShort.toInt; pos += 2; v }
    def str(len: Int): String = {
      val s = new String(bytes, pos, len, "US-ASCII"); pos += len; s
    }
  }

  private final class TrackAcc(val number: Long) {
    var trackType = 0
    var codec = ""
    var width = 0; var height = 0
    var defaultDurationNs = 0L
    val sizes = ArrayBuffer.empty[Long]
    val offsets = ArrayBuffer.empty[Long]
    val ts = ArrayBuffer.empty[Long]
    val keyframe = ArrayBuffer.empty[Boolean]
  }

  /** Walk an EBML/Matroska stream and return every track's frame table.
    * Non-Matroska payloads and out-of-profile structures refuse by name. */
  def demux(id: Long, bytes: Array[Byte]): Seq[MkvTrack] = {
    require(bytes.length >= 4 && (bytes(0) & 0xFF) == 0x1A &&
      (bytes(1) & 0xFF) == 0x45 && (bytes(2) & 0xFF) == 0xDF &&
      (bytes(3) & 0xFF) == 0xA3, {
      val fmt =
        if (bytes.length >= 12 && new String(bytes, 4, 4, "US-ASCII") == "ftyp")
          "mp4/mov — use Mp4.demux"
        else if (bytes.length >= 4 && new String(bytes, 0, 4, "US-ASCII") == "RIFF")
          "riff — use aviFrames/decodeWav"
        else "unknown"
      s"mkv $id: not an EBML/Matroska file (looks like '$fmt')"
    })
    val r = new Reader(bytes, id)
    val tracks = scala.collection.mutable.LinkedHashMap.empty[Long, TrackAcc]
    var timestampScale = 1000000L // spec default: 1 ms

    // EBML header: verify DocType
    locally {
      val eid = r.vintId()
      require(eid == IdEbml, s"mkv $id: first element ${eid.toHexString} is not EBML")
      val sz = r.vintSize()
      require(sz >= 0, s"mkv $id: unknown-size EBML header")
      val end = r.pos + sz.toInt
      var docType = "matroska" // spec default when DocType absent
      while (r.pos < end) {
        val cid = r.vintId(); val csz = r.vintSize().toInt
        if (cid == IdDocType) docType = r.str(csz) else r.pos += csz
      }
      require(docType == "matroska" || docType == "webm",
        s"mkv $id: EBML doctype '$docType' out of profile (matroska/webm)")
    }

    def parseTrackEntry(end: Int): Unit = {
      var number = -1L
      var tt = 0; var codec = ""; var w = 0; var h = 0; var dd = 0L
      while (r.pos < end) {
        val cid = r.vintId(); val csz = r.vintSize().toInt
        cid match {
          case IdTrackNumber => number = r.uint(csz)
          case IdTrackType => tt = r.uint(csz).toInt
          case IdCodecId => codec = r.str(csz)
          case IdDefaultDuration => dd = r.uint(csz)
          case IdContentEncodings => throw new IllegalArgumentException(
            s"mkv $id: ContentEncodings (compressed/encrypted track) out of profile")
          case IdVideo =>
            val vEnd = r.pos + csz
            while (r.pos < vEnd) {
              val vid = r.vintId(); val vsz = r.vintSize().toInt
              vid match {
                case IdPixelWidth => w = r.uint(vsz).toInt
                case IdPixelHeight => h = r.uint(vsz).toInt
                case _ => r.pos += vsz
              }
            }
          case _ => r.pos += csz
        }
      }
      require(number > 0, s"mkv $id: TrackEntry without TrackNumber")
      val acc = new TrackAcc(number)
      acc.trackType = tt; acc.codec = codec
      acc.width = w; acc.height = h; acc.defaultDurationNs = dd
      tracks(number) = acc
    }

    /** One (Simple)Block: frames appended to its track. */
    def parseBlock(end: Int, clusterTs: Long, simpleFlags: Boolean,
        groupKeyframe: Boolean): Unit = {
      val trackNum = r.vintSize() // track number is a plain (marker-stripped) vint
      require(trackNum >= 0, s"mkv $id: unknown-size block track number")
      val acc = tracks.getOrElse(trackNum,
        throw new IllegalArgumentException(
          s"mkv $id: block names track $trackNum, which Tracks never declared"))
      val rel = r.i16()
      val flags = r.u8()
      val key = if (simpleFlags) (flags & 0x80) != 0 else groupKeyframe
      val lacing = (flags >> 1) & 0x3
      val baseTs = clusterTs + rel
      // laced frames advance by DefaultDuration (converted to timestamp-
      // scale units); undeclared → all frames share the block timestamp
      val step =
        if (acc.defaultDurationNs > 0) acc.defaultDurationNs / timestampScale
        else 0L
      val frameSizes: Seq[Long] = lacing match {
        case 0 => Seq((end - r.pos).toLong)
        case 1 => // Xiph: count-1 255-run sizes, last implicit
          val nMinus1 = r.u8()
          val head = (0 until nMinus1).map { _ =>
            var sz = 0L
            var b = 255
            while (b == 255) { b = r.u8(); sz += b }
            sz
          }
          head :+ ((end - r.pos) - head.sum)
        case 2 => // fixed: equal split
          val n = r.u8() + 1
          val total = end - r.pos
          require(total % n == 0,
            s"mkv $id: fixed lacing of $total bytes over $n frames does not divide")
          Seq.fill(n)((total / n).toLong)
        case 3 => // EBML: first size a vint, then signed deltas; with a
          // SINGLE laced frame (count byte 0) NO size fields exist at
          // all — the frame is the block remainder
          val nMinus1 = r.u8()
          if (nMinus1 == 0) Seq((end - r.pos).toLong)
          else {
            var cur = r.vintSize()
            require(cur >= 0, s"mkv $id: unknown-size EBML lace")
            val out = ArrayBuffer(cur)
            for (_ <- 1 until nMinus1) { cur += r.vintSigned(); out += cur }
            out.toSeq :+ ((end - r.pos) - out.sum)
          }
      }
      frameSizes.zipWithIndex.foreach { case (sz, i) =>
        require(sz >= 0 && r.pos + sz <= end,
          s"mkv $id: lace $i claims $sz bytes past block end")
        acc.sizes += sz
        acc.offsets += r.pos
        acc.ts += baseTs + i * step
        acc.keyframe += key
        r.pos += sz.toInt
      }
      require(r.pos == end, s"mkv $id: ${end - r.pos} bytes dangle after laces")
    }

    def parseCluster(end: Int): Unit = {
      var clusterTs = 0L
      while (r.pos < end) {
        val cid = r.vintId(); val csz = r.vintSize()
        require(csz >= 0,
          s"mkv $id: unknown-size element ${cid.toHexString} inside a Cluster")
        val cEnd = r.pos + csz.toInt
        cid match {
          case IdTimestamp => clusterTs = r.uint(csz.toInt)
          case IdSimpleBlock =>
            parseBlock(cEnd, clusterTs, simpleFlags = true, groupKeyframe = false)
          case IdBlockGroup =>
            // keyframe = group carries NO ReferenceBlock; scan first
            var hasRef = false
            var blockAt = -1; var blockEnd = -1
            val save = r.pos
            while (r.pos < cEnd) {
              val gid = r.vintId(); val gsz = r.vintSize().toInt
              if (gid == IdReferenceBlock) hasRef = true
              if (gid == IdBlock) { blockAt = r.pos; blockEnd = r.pos + gsz }
              r.pos += gsz
            }
            require(blockAt >= 0, s"mkv $id: BlockGroup without Block ($save)")
            val after = r.pos
            r.pos = blockAt
            parseBlock(blockEnd, clusterTs, simpleFlags = false,
              groupKeyframe = !hasRef)
            r.pos = after
          case _ => r.pos = cEnd
        }
      }
    }

    // Segment (unknown size = to end of file, the streaming-muxer shape)
    val sid = r.vintId()
    require(sid == IdSegment, s"mkv $id: expected Segment, got ${sid.toHexString}")
    val ssz = r.vintSize()
    val segEnd = if (ssz < 0) bytes.length else r.pos + ssz.toInt
    while (r.pos < segEnd) {
      val cid = r.vintId(); val csz = r.vintSize()
      require(csz >= 0,
        if (cid == IdCluster)
          s"mkv $id: unknown-size Cluster out of profile (sized clusters only)"
        else s"mkv $id: unknown-size element ${cid.toHexString} out of profile")
      val cEnd = r.pos + csz.toInt
      cid match {
        case IdInfo =>
          while (r.pos < cEnd) {
            val iid = r.vintId(); val isz = r.vintSize().toInt
            if (iid == IdTimestampScale) timestampScale = r.uint(isz)
            else r.pos += isz
          }
        case IdTracks =>
          while (r.pos < cEnd) {
            val tid = r.vintId(); val tsz = r.vintSize().toInt
            if (tid == IdTrackEntry) parseTrackEntry(r.pos + tsz)
            else r.pos += tsz
          }
        case IdCluster => parseCluster(cEnd)
        case _ => r.pos = cEnd // SeekHead, Cues, Tags, Chapters, Void...
      }
    }
    tracks.valuesIterator.map(a => MkvTrack(a.number, a.trackType, a.codec,
      a.width, a.height, a.defaultDurationNs,
      a.sizes.toArray, a.offsets.map(_.toLong).toArray, a.ts.toArray,
      a.keyframe.toArray)).toSeq
  }

  // ------------------------------------------------------------- write

  /** One block to write: `lacing` 0 none (frames emitted as separate
    * SimpleBlocks), 1 Xiph, 2 fixed, 3 EBML (one laced block). With
    * `group = true` the (single, unlaced) frame is wrapped in a
    * BlockGroup, keyframe encoded as ReferenceBlock absence. */
  final case class WBlock(
      track: Long,
      relTs: Int,
      frames: Seq[Array[Byte]],
      keyframes: Seq[Boolean],
      lacing: Int = 0,
      group: Boolean = false)

  final case class WTrack(
      number: Long,
      trackType: Int,
      codec: String,
      width: Int = 0, height: Int = 0,
      defaultDurationNs: Long = 0)

  final case class WCluster(timestamp: Long, blocks: Seq[WBlock])

  private def vintBytes(v: Long): Array[Byte] = {
    // shortest marker-carrying form
    var len = 1
    while (len < 8 && v >= (1L << (7 * len)) - 1) len += 1
    val out = new Array[Byte](len)
    var x = v | (1L << (7 * len))
    for (i <- (len - 1) to 0 by -1) { out(i) = (x & 0xFF).toByte; x >>= 8 }
    out
  }
  private def idBytes(id: Long): Array[Byte] = {
    var len = 1
    while ((id >> (8 * len)) != 0) len += 1
    Array.tabulate(len)(i => ((id >> (8 * (len - 1 - i))) & 0xFF).toByte)
  }
  private def uintBytes(v: Long): Array[Byte] = {
    var len = 1
    while ((v >> (8 * len)) != 0) len += 1
    Array.tabulate(len)(i => ((v >> (8 * (len - 1 - i))) & 0xFF).toByte)
  }
  private def el(id: Long, payload: Array[Byte]): Array[Byte] =
    idBytes(id) ++ vintBytes(payload.length.toLong) ++ payload
  private def elU(id: Long, v: Long): Array[Byte] = el(id, uintBytes(v))
  private def elS(id: Long, s: String): Array[Byte] = el(id, s.getBytes("US-ASCII"))

  /** Emit a Matroska/WebM file: EBML header + Segment(Info, Tracks,
    * Clusters). Deterministic; frames are caller-supplied bytes. */
  def encode(docType: String, tracks: Seq[WTrack], clusters: Seq[WCluster],
      timestampScale: Long = 1000000L): Array[Byte] = {
    val header = el(IdEbml, elS(IdDocType, docType))
    val info = el(IdInfo, elU(IdTimestampScale, timestampScale))
    val trackEntries = tracks.map { t =>
      val video =
        if (t.width > 0) el(IdVideo,
          elU(IdPixelWidth, t.width.toLong) ++ elU(IdPixelHeight, t.height.toLong))
        else Array.emptyByteArray
      val dd = if (t.defaultDurationNs > 0)
        elU(IdDefaultDuration, t.defaultDurationNs) else Array.emptyByteArray
      el(IdTrackEntry,
        elU(IdTrackNumber, t.number) ++ elU(IdTrackType, t.trackType.toLong) ++
          elS(IdCodecId, t.codec) ++ dd ++ video)
    }
    val tracksEl = el(IdTracks, trackEntries.flatten.toArray)

    def blockPayload(b: WBlock, laced: Boolean): Array[Byte] = {
      val out = ArrayBuffer.empty[Byte]
      out ++= vintBytes(b.track)
      out += ((b.relTs >> 8) & 0xFF).toByte
      out += (b.relTs & 0xFF).toByte
      val keyBit = if (b.keyframes.headOption.getOrElse(true)) 0x80 else 0
      val flags = keyBit | (if (laced) b.lacing << 1 else 0)
      out += flags.toByte
      if (laced) {
        out += (b.frames.length - 1).toByte
        b.lacing match {
          case 1 => // Xiph: 255-run sizes for all but the last frame
            b.frames.dropRight(1).foreach { f =>
              var sz = f.length
              while (sz >= 255) { out += 255.toByte; sz -= 255 }
              out += sz.toByte
            }
          case 2 => // fixed: nothing — equal sizes implied
            require(b.frames.map(_.length).distinct.size == 1,
              "fixed lacing needs equal frame sizes")
          case 3 => // EBML: first size vint, then signed deltas; the LAST
            // frame's size is implicit (block remainder), so deltas run
            // only between the first n-1 frames — and a SINGLE laced
            // frame carries no size fields at all
            if (b.frames.length > 1)
              out ++= vintBytes(b.frames.head.length.toLong)
            b.frames.dropRight(1).sliding(2).foreach {
              case Seq(a, c) =>
                val delta = c.length.toLong - a.length
                // signed vint: value + bias, emitted at a width that fits
                var len = 1
                while (math.abs(delta) >= (1L << (7 * len - 1)) - 1) len += 1
                val biased = delta + ((1L << (7 * len - 1)) - 1)
                var x = biased | (1L << (7 * len))
                val bs = new Array[Byte](len)
                for (i <- (len - 1) to 0 by -1) { bs(i) = (x & 0xFF).toByte; x >>= 8 }
                out ++= bs
              case _ =>
            }
        }
      }
      b.frames.foreach(out ++= _)
      out.toArray
    }

    val clusterEls = clusters.map { cl =>
      val body = ArrayBuffer.empty[Byte]
      body ++= elU(IdTimestamp, cl.timestamp)
      cl.blocks.foreach { b =>
        if (b.lacing > 0) {
          require(b.keyframes.forall(_ == b.keyframes.head),
            "laced frames share one keyframe flag")
          body ++= el(IdSimpleBlock, blockPayload(b, laced = true))
        } else if (b.group) {
          require(b.frames.length == 1, "BlockGroup carries one Block")
          // a Block (unlike SimpleBlock) has NO keyframe flag bit —
          // keyframe-ness is the ABSENCE of a ReferenceBlock sibling
          val block = el(IdBlock, blockPayload(
            b.copy(keyframes = Seq(false)), laced = false))
          val ref = if (b.keyframes.head) Array.emptyByteArray
          else elU(IdReferenceBlock, 1L)
          body ++= el(IdBlockGroup, block ++ ref)
        } else {
          b.frames.zip(b.keyframes).zipWithIndex.foreach { case ((f, k), i) =>
            body ++= el(IdSimpleBlock, blockPayload(
              WBlock(b.track, b.relTs + i, Seq(f), Seq(k)), laced = false))
          }
        }
      }
      el(IdCluster, body.toArray)
    }
    header ++ el(IdSegment,
      info ++ tracksEl ++ clusterEls.flatten.toArray)
  }
}
