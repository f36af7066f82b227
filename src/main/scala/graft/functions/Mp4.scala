package graft.functions

import scala.collection.mutable.ArrayBuffer

/** MP4 / ISO-BMFF (ISO/IEC 14496-12) container demuxer + writer — the
  * web's dominant video container, invisible to the curation pipeline
  * until now (only AVI demuxed, Multimodal.aviFrames). This is a
  * CODEC-AGNOSTIC box walk: the `stbl` sample tables (stsz sizes, stts
  * decode times, stss sync samples, stsc/stco|co64 chunk layout) are
  * enough for the curation statistics a 100 TB crawl needs —
  * duration, fps, resolution, keyframe cadence, bitrate — with zero
  * H.264/AAC decode, exactly like the reference treats its archives as
  * opaque payloads behind typed metadata.
  *
  * In profile: unfragmented MP4/MOV (`moov` sample tables), box sizes
  * 32-bit / largesize / to-EOF, version 0 AND 1 full boxes (mvhd,
  * tkhd, mdhd), multi-run stts, multi-entry stsc, fixed and per-sample
  * stsz, stco and co64 chunk offsets, absent stss (= every sample a
  * sync sample, per spec §8.6.2), any handler/codec fourcc.
  * Out of profile and refused BY NAME: fragmented MP4 (`moof` — the
  * DASH/CMAF shape needs trun accumulation), encrypted tracks are NOT
  * detected (samples surface as opaque byte ranges either way).
  *
  * The writer emits the same profile (writer-beside-reader): `ftyp`,
  * `mdat` FIRST, then `moov` — the legal non-faststart layout — so a
  * fixture's sample byte offsets are closed-form (`ftyp` is a fixed 24
  * bytes, mdat payload starts at byte 32) and the DuckDB oracle
  * replays the whole sample table with zero MP4 code. */
object Mp4 {

  /** One track's demuxed sample table — everything per-sample, plus the
    * track header facts curation stats derive from. */
  final case class Track(
      trackId: Long,
      handler: String, // 'vide' / 'soun' / ...
      codec: String, // first stsd entry fourcc: avc1, hvc1, mp4a, ...
      timescale: Long, // mdhd: dts units per second
      duration: Long, // mdhd units
      width: Int, height: Int, // tkhd 16.16 integer part; 0 for audio
      sizes: Array[Long],
      offsets: Array[Long], // absolute file offsets (stsc x stco walk)
      dts: Array[Long], // cumulative stts deltas, first sample 0
      sync: Array[Boolean])

  private final class Cursor(val bytes: Array[Byte]) {
    def u16(off: Int): Int =
      ((bytes(off) & 0xFF) << 8) | (bytes(off + 1) & 0xFF)
    def u32(off: Int): Long =
      ((bytes(off) & 0xFFL) << 24) | ((bytes(off + 1) & 0xFFL) << 16) |
        ((bytes(off + 2) & 0xFFL) << 8) | (bytes(off + 3) & 0xFFL)
    def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
    def fourcc(off: Int): String = new String(bytes, off, 4, "US-ASCII")
  }

  /** (type, header length, payload end) for the box at `off`. */
  private def boxAt(c: Cursor, off: Long, end: Long, id: Long): (String, Int, Long) = {
    require(off + 8 <= end, s"mp4 $id: truncated box header at $off")
    val size32 = c.u32(off.toInt)
    val typ = c.fourcc(off.toInt + 4)
    val (hdr, size) =
      if (size32 == 1) {
        require(off + 16 <= end, s"mp4 $id: truncated largesize box '$typ'")
        (16, c.u64(off.toInt + 8))
      } else if (size32 == 0) (8, end - off) // last box: to end of file
      else (8, size32)
    require(size >= hdr && off + size <= end,
      s"mp4 $id: box '$typ' claims $size bytes at $off past end $end")
    (typ, hdr, off + size)
  }

  /** Walk an ISO-BMFF stream and return every track's sample table.
    * Non-MP4 payloads and fragmented files are refused by name. */
  def demux(id: Long, bytes: Array[Byte]): Seq[Track] = {
    val c = new Cursor(bytes)
    require(bytes.length >= 12 && c.fourcc(4) == "ftyp", {
      val fmt =
        if (bytes.length >= 12 && c.fourcc(0) == "RIFF") "riff/avi — use aviFrames"
        else if (bytes.length >= 4 && (bytes(0) & 0xFF) == 0x1A &&
          (bytes(1) & 0xFF) == 0x45) "matroska/webm"
        else "unknown"
      s"mp4 $id: not an ISO-BMFF file (no ftyp; looks like '$fmt')"
    })
    val tracks = ArrayBuffer.empty[Track]
    var sawMoov = false

    def walkTop(off0: Long, end: Long): Unit = {
      var off = off0
      while (off < end) {
        val (typ, hdr, next) = boxAt(c, off, end, id)
        typ match {
          case "moof" => throw new IllegalArgumentException(
            s"mp4 $id: fragmented MP4 (moof) out of profile — " +
              "unfragmented sample tables only")
          case "moov" => sawMoov = true; walkMoov(off + hdr, next)
          case _ => // ftyp, mdat, free, skip...
        }
        off = next
      }
    }

    def walkMoov(off0: Long, end: Long): Unit = {
      var off = off0
      while (off < end) {
        val (typ, hdr, next) = boxAt(c, off, end, id)
        if (typ == "trak") tracks += parseTrak(off + hdr, next)
        off = next
      }
    }

    def childBoxes(off0: Long, end: Long): Seq[(String, Long, Long)] = {
      val out = ArrayBuffer.empty[(String, Long, Long)]
      var off = off0
      while (off < end) {
        val (typ, hdr, next) = boxAt(c, off, end, id)
        out += ((typ, off + hdr, next))
        off = next
      }
      out.toSeq
    }
    def child(boxes: Seq[(String, Long, Long)], typ: String): (Long, Long) =
      boxes.find(_._1 == typ).map(b => (b._2, b._3)).getOrElse(
        throw new IllegalArgumentException(s"mp4 $id: missing box '$typ'"))

    def parseTrak(off0: Long, end: Long): Track = {
      val trakKids = childBoxes(off0, end)
      val (tkhdOff, _) = child(trakKids, "tkhd")
      val tkhdV = bytes(tkhdOff.toInt) & 0xFF
      require(tkhdV <= 1, s"mp4 $id: tkhd version $tkhdV out of profile")
      // v0: ctime u32, mtime u32, track_id u32; v1: u64, u64, u32
      val trackId = c.u32(tkhdOff.toInt + 4 + (if (tkhdV == 1) 16 else 8))
      // ... reserved u32, duration, reserved(8), layer/alt/volume/reserved
      // (8 bytes), matrix (36), width 16.16, height 16.16
      val dims = tkhdOff.toInt + 4 +
        (if (tkhdV == 1) 16 + 4 + 4 + 8 else 8 + 4 + 4 + 4) + 8 + 8 + 36
      val width = (c.u32(dims) >>> 16).toInt
      val height = (c.u32(dims + 4) >>> 16).toInt

      val (mdiaOff, mdiaEnd) = child(trakKids, "mdia")
      val mdiaKids = childBoxes(mdiaOff, mdiaEnd)
      val (mdhdOff, _) = child(mdiaKids, "mdhd")
      val mdhdV = bytes(mdhdOff.toInt) & 0xFF
      require(mdhdV <= 1, s"mp4 $id: mdhd version $mdhdV out of profile")
      val (timescale, duration) =
        if (mdhdV == 1) (c.u32(mdhdOff.toInt + 4 + 16), c.u64(mdhdOff.toInt + 4 + 20))
        else (c.u32(mdhdOff.toInt + 4 + 8), c.u32(mdhdOff.toInt + 4 + 12))
      val (hdlrOff, _) = child(mdiaKids, "hdlr")
      val handler = c.fourcc(hdlrOff.toInt + 8)

      val (minfOff, minfEnd) = child(mdiaKids, "minf")
      val (stblOff, stblEnd) = child(childBoxes(minfOff, minfEnd), "stbl")
      val stblKids = childBoxes(stblOff, stblEnd)

      // stsd: first entry's fourcc is the track codec
      val (stsdOff, _) = child(stblKids, "stsd")
      require(c.u32(stsdOff.toInt + 4) >= 1, s"mp4 $id: empty stsd")
      val codec = c.fourcc(stsdOff.toInt + 8 + 4)

      // stsz: fixed or per-sample sizes
      val (stszOff, _) = child(stblKids, "stsz")
      val fixedSize = c.u32(stszOff.toInt + 4)
      val nSamples = c.u32(stszOff.toInt + 8)
      require(nSamples <= Int.MaxValue, s"mp4 $id: $nSamples samples")
      val n = nSamples.toInt
      val sizes =
        if (fixedSize != 0) Array.fill(n)(fixedSize)
        else Array.tabulate(n)(i => c.u32(stszOff.toInt + 12 + 4 * i))

      // stts: cumulative decode deltas
      val (sttsOff, _) = child(stblKids, "stts")
      val sttsN = c.u32(sttsOff.toInt + 4).toInt
      val dts = new Array[Long](n)
      var si = 0; var t = 0L
      for (e <- 0 until sttsN) {
        val cnt = c.u32(sttsOff.toInt + 8 + 8 * e).toInt
        val delta = c.u32(sttsOff.toInt + 12 + 8 * e)
        for (_ <- 0 until cnt) {
          require(si < n, s"mp4 $id: stts covers more than $n samples")
          dts(si) = t; t += delta; si += 1
        }
      }
      require(si == n, s"mp4 $id: stts covers $si of $n samples")

      // stss: sync table; ABSENT means every sample is a sync sample
      val sync = Array.fill(n)(stblKids.forall(_._1 != "stss"))
      stblKids.find(_._1 == "stss").foreach { case (_, o, _) =>
        val cnt = c.u32(o.toInt).toInt // (version/flags consumed below)
        val stssN = c.u32(o.toInt + 4).toInt
        require(cnt >>> 24 == 0, s"mp4 $id: stss version ${cnt >>> 24}")
        for (e <- 0 until stssN) {
          val s1 = c.u32(o.toInt + 8 + 4 * e) // 1-based sample number
          require(s1 >= 1 && s1 <= n, s"mp4 $id: stss sample $s1 of $n")
          sync((s1 - 1).toInt) = true
        }
      }

      // stsc x (stco | co64): chunk walk → absolute sample offsets
      val (stscOff, _) = child(stblKids, "stsc")
      val stscN = c.u32(stscOff.toInt + 4).toInt
      val stsc = Array.tabulate(stscN)(e => (
        c.u32(stscOff.toInt + 8 + 12 * e), // first_chunk (1-based)
        c.u32(stscOff.toInt + 12 + 12 * e))) // samples_per_chunk
      val chunkOffs: Array[Long] =
        stblKids.find(_._1 == "stco").map { case (_, o, _) =>
          Array.tabulate(c.u32(o.toInt + 4).toInt)(e => c.u32(o.toInt + 8 + 4 * e))
        }.orElse(stblKids.find(_._1 == "co64").map { case (_, o, _) =>
          Array.tabulate(c.u32(o.toInt + 4).toInt)(e => c.u64(o.toInt + 8 + 8 * e))
        }).getOrElse(throw new IllegalArgumentException(
          s"mp4 $id: missing box 'stco' (or co64)"))
      val offsets = new Array[Long](n)
      var sample = 0
      for (chunk1 <- 1 to chunkOffs.length if sample < n) {
        // entry with the greatest first_chunk <= this chunk
        val perChunk = stsc.foldLeft(0L) { case (acc, (fc, spc)) =>
          if (fc <= chunk1) spc else acc
        }
        var pos = chunkOffs(chunk1 - 1)
        var k = 0L
        while (k < perChunk && sample < n) {
          offsets(sample) = pos
          pos += sizes(sample)
          sample += 1; k += 1
        }
      }
      require(sample == n,
        s"mp4 $id: stsc/stco walk places $sample of $n samples")

      Track(trackId, handler, codec, timescale, duration, width, height,
        sizes, offsets, dts, sync)
    }

    walkTop(0L, bytes.length.toLong)
    require(sawMoov, s"mp4 $id: no moov box (streamed-only or truncated file)")
    tracks.toSeq
  }

  // ------------------------------------------------------------- write

  /** Writer-side track spec: per-sample sizes (payload bytes are
    * deterministic from the seed), stts runs, 1-based sync samples
    * (None = omit stss), and the chunk layout. */
  final case class TrackSpec(
      trackId: Long,
      handler: String,
      codec: String,
      timescale: Long,
      width: Int = 0, height: Int = 0,
      sizes: Seq[Long] = Nil,
      fixedSize: Long = 0, nFixed: Int = 0, // fixedSize != 0 → stsz fixed form
      sttsRuns: Seq[(Int, Long)] = Nil, // (count, delta)
      syncSamples: Option[Seq[Int]] = None, // 1-based; None = no stss box
      samplesPerChunk: Seq[Long] = Nil, // stsc runs starting at chunk 1, 2, ...
      co64: Boolean = false,
      v1Boxes: Boolean = false) { // emit version-1 tkhd/mdhd (64-bit times)
    def n: Int = if (fixedSize != 0) nFixed else sizes.length
    def sampleSizes: Seq[Long] = if (fixedSize != 0) Seq.fill(nFixed)(fixedSize) else sizes
  }

  /** Emit ftyp + mdat + moov (mdat-first: sample offsets are closed-form
    * — ftyp is 24 bytes, mdat payload starts at 32). All tracks' samples
    * land in mdat in track order, each track one contiguous run carved
    * into chunks per its `samplesPerChunk`. Payload byte j of sample i
    * is ((seed + i*31 + j) % 251) — deterministic, never parsed back. */
  def encode(tracks: Seq[TrackSpec], seed: Long = 7): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    def u16(v: Int): Unit = { out += ((v >> 8) & 0xFF).toByte; out += (v & 0xFF).toByte }
    def u32(v: Long): Unit = { u16(((v >> 16) & 0xFFFF).toInt); u16((v & 0xFFFF).toInt) }
    def u64(v: Long): Unit = { u32(v >>> 32); u32(v & 0xFFFFFFFFL) }
    def tag(s: String): Unit = { require(s.length == 4); out ++= s.getBytes("US-ASCII") }

    // ftyp: fixed 24 bytes so fixtures have closed-form offsets
    u32(24); tag("ftyp"); tag("isom"); u32(0); tag("isom"); tag("mp41")

    // mdat: all tracks' samples back-to-back in track order
    val mdatPayload = tracks.map(_.sampleSizes.sum).sum
    u32(8 + mdatPayload); tag("mdat")
    val dataStart = out.length.toLong // = 32
    tracks.foreach { tr =>
      tr.sampleSizes.zipWithIndex.foreach { case (sz, i) =>
        var j = 0L
        while (j < sz) { out += (((seed + i * 31 + j) % 251) & 0xFF).toByte; j += 1 }
      }
    }

    // chunk offsets per track (carve each track's run into chunks)
    var cursor = dataStart
    val chunkOffsets: Seq[Seq[Long]] = tracks.map { tr =>
      val szs = tr.sampleSizes
      val offs = ArrayBuffer.empty[Long]
      var i = 0
      var chunkIdx = 0
      while (i < szs.length) {
        val spc = (if (chunkIdx < tr.samplesPerChunk.length)
          tr.samplesPerChunk(chunkIdx)
        else tr.samplesPerChunk.lastOption.getOrElse(szs.length.toLong)).toInt
        offs += cursor
        val take = math.min(spc, szs.length - i)
        cursor += szs.slice(i, i + take).sum
        i += take; chunkIdx += 1
      }
      offs.toSeq
    }

    // moov assembled via nested byte builders
    def box(typ: String)(body: ArrayBuffer[Byte] => Unit): Array[Byte] = {
      val b = ArrayBuffer.empty[Byte]
      body(b)
      val r = ArrayBuffer.empty[Byte]
      def r16(v: Int): Unit = { r += ((v >> 8) & 0xFF).toByte; r += (v & 0xFF).toByte }
      r16((((8 + b.length) >> 16) & 0xFFFF).toInt); r16(((8 + b.length) & 0xFFFF).toInt)
      r ++= typ.getBytes("US-ASCII"); r ++= b
      r.toArray
    }
    def b16(b: ArrayBuffer[Byte], v: Int): Unit = {
      b += ((v >> 8) & 0xFF).toByte; b += (v & 0xFF).toByte
    }
    def b32(b: ArrayBuffer[Byte], v: Long): Unit = {
      b16(b, ((v >> 16) & 0xFFFF).toInt); b16(b, (v & 0xFFFF).toInt)
    }
    def b64(b: ArrayBuffer[Byte], v: Long): Unit = { b32(b, v >>> 32); b32(b, v & 0xFFFFFFFFL) }
    def btag(b: ArrayBuffer[Byte], s: String): Unit = b ++= s.getBytes("US-ASCII")

    val movieTimescale = 1000L
    val trakBytes = tracks.zip(chunkOffsets).map { case (tr, chunks) =>
      val n = tr.n
      val dur = tr.sttsRuns.map { case (cnt, d) => cnt.toLong * d }.sum
      val stbl = Seq(
        box("stsd") { b =>
          b32(b, 0); b32(b, 1)
          // minimal SampleEntry: size + fourcc + 6 reserved + dref idx,
          // padded to the VisualSampleEntry width field region for video
          val entry = ArrayBuffer.empty[Byte]
          b32(entry, 0) // placeholder size (patched below)
          btag(entry, tr.codec)
          for (_ <- 0 until 6) entry += 0
          b16(entry, 1)
          if (tr.handler == "vide") {
            for (_ <- 0 until 16) entry += 0 // pre_defined/reserved
            b16(entry, tr.width); b16(entry, tr.height)
            for (_ <- 0 until 50) entry += 0 // resolution..depth tail
          }
          val sz = entry.length
          entry(0) = ((sz >> 24) & 0xFF).toByte; entry(1) = ((sz >> 16) & 0xFF).toByte
          entry(2) = ((sz >> 8) & 0xFF).toByte; entry(3) = (sz & 0xFF).toByte
          b ++= entry
        },
        box("stts") { b =>
          b32(b, 0); b32(b, tr.sttsRuns.length)
          tr.sttsRuns.foreach { case (cnt, d) => b32(b, cnt); b32(b, d) }
        },
        box("stsz") { b =>
          b32(b, 0)
          if (tr.fixedSize != 0) { b32(b, tr.fixedSize); b32(b, n) }
          else { b32(b, 0); b32(b, n); tr.sizes.foreach(s => b32(b, s)) }
        },
        box("stsc") { b =>
          b32(b, 0); b32(b, tr.samplesPerChunk.length)
          tr.samplesPerChunk.zipWithIndex.foreach { case (spc, i) =>
            b32(b, i + 1); b32(b, spc); b32(b, 1)
          }
        },
        box(if (tr.co64) "co64" else "stco") { b =>
          b32(b, 0); b32(b, chunks.length)
          chunks.foreach(o => if (tr.co64) b64(b, o) else b32(b, o))
        }) ++
        tr.syncSamples.map(ss => box("stss") { b =>
          b32(b, 0); b32(b, ss.length); ss.foreach(s => b32(b, s))
        }).toSeq
      val stblBox = box("stbl")(b => stbl.foreach(b ++= _))
      val minf = box("minf")(b => b ++= stblBox)
      val mdhd = box("mdhd") { b =>
        if (tr.v1Boxes) {
          b32(b, 0x01000000L); b64(b, 0); b64(b, 0)
          b32(b, tr.timescale); b64(b, dur)
        } else {
          b32(b, 0); b32(b, 0); b32(b, 0)
          b32(b, tr.timescale); b32(b, dur)
        }
        b16(b, 0x55C4); b16(b, 0)
      }
      val hdlr = box("hdlr") { b =>
        b32(b, 0); b32(b, 0); btag(b, tr.handler)
        for (_ <- 0 until 12) b += 0
        b += 0 // empty name
      }
      val mdia = box("mdia")(b => { b ++= mdhd; b ++= hdlr; b ++= minf })
      val tkhd = box("tkhd") { b =>
        if (tr.v1Boxes) {
          b32(b, 0x01000007L) // version 1, flags enabled|in-movie|in-preview
          b64(b, 0); b64(b, 0); b32(b, tr.trackId); b32(b, 0)
          b64(b, dur * movieTimescale / math.max(1L, tr.timescale))
        } else {
          b32(b, 7) // version 0, same flags
          b32(b, 0); b32(b, 0); b32(b, tr.trackId); b32(b, 0)
          b32(b, dur * movieTimescale / math.max(1L, tr.timescale))
        }
        b32(b, 0); b32(b, 0) // reserved
        b16(b, 0); b16(b, 0); b16(b, if (tr.handler == "soun") 0x0100 else 0); b16(b, 0)
        // identity matrix
        b32(b, 0x00010000L); b32(b, 0); b32(b, 0)
        b32(b, 0); b32(b, 0x00010000L); b32(b, 0)
        b32(b, 0); b32(b, 0); b32(b, 0x40000000L)
        b32(b, tr.width.toLong << 16); b32(b, tr.height.toLong << 16)
      }
      box("trak")(b => { b ++= tkhd; b ++= mdia })
    }
    val mvhd = box("mvhd") { b =>
      b32(b, 0); b32(b, 0); b32(b, 0); b32(b, movieTimescale)
      val movieDur = tracks.map(tr =>
        tr.sttsRuns.map { case (cnt, d) => cnt.toLong * d }.sum *
          movieTimescale / math.max(1L, tr.timescale)).maxOption.getOrElse(0L)
      b32(b, movieDur)
      b32(b, 0x00010000L); b16(b, 0x0100); b16(b, 0) // rate, volume
      b32(b, 0); b32(b, 0) // reserved
      b32(b, 0x00010000L); b32(b, 0); b32(b, 0)
      b32(b, 0); b32(b, 0x00010000L); b32(b, 0)
      b32(b, 0); b32(b, 0); b32(b, 0x40000000L)
      for (_ <- 0 until 6) b32(b, 0) // pre_defined
      b32(b, tracks.map(_.trackId).maxOption.getOrElse(0L) + 1)
    }
    val moov = box("moov")(b => { b ++= mvhd; trakBytes.foreach(b ++= _) })
    out ++= moov
    out.toArray
  }
}
