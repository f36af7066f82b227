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
  * In profile: unfragmented MP4/MOV (`moov` sample tables) AND
  * fragmented MP4 (`moof` runs — the DASH/CMAF streaming shape: mvex/
  * trex track defaults, tfhd per-fragment defaults with base-data-offset
  * or default-base-is-moof addressing, tfdt decode-time re-basing,
  * multi-trun fragments, first-sample-flags, per-sample or defaulted
  * durations/sizes/flags); box sizes 32-bit / largesize / to-EOF,
  * version 0 AND 1 full boxes (mvhd, tkhd, mdhd, tfdt), multi-run stts,
  * multi-entry stsc, fixed and per-sample stsz, stco and co64 chunk
  * offsets, absent stss (= every sample a sync sample, per spec
  * §8.6.2), any handler/codec fourcc. Out of profile and refused BY
  * NAME: a traf naming a track the moov never declared, fragment
  * samples with neither explicit nor defaulted size/duration.
  * Encrypted tracks are NOT detected (samples surface as opaque byte
  * ranges either way).
  *
  * The writer emits the same profile (writer-beside-reader): `ftyp`,
  * `mdat` FIRST, then `moov` — the legal non-faststart layout — so a
  * fixture's sample byte offsets are closed-form (`ftyp` is a fixed 24
  * bytes, mdat payload starts at byte 32) and the DuckDB oracle
  * replays the whole sample table with zero MP4 code. The fragmented
  * writer keeps the same leading-mdat trick via absolute
  * base-data-offset addressing (data may live in any mdat), and also
  * emits the real CMAF moof+mdat interleaved shape with
  * default-base-is-moof for spec coverage. */
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
      offsets: Array[Long], // absolute file offsets
      dts: Array[Long], // cumulative decode times, first sample 0
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

  /** Per-track accumulator: stbl samples first, then fragment runs. */
  private final class TrackAcc(
      val trackId: Long, val handler: String, val codec: String,
      val timescale: Long, var duration: Long,
      val width: Int, val height: Int) {
    val sizes = ArrayBuffer.empty[Long]
    val offsets = ArrayBuffer.empty[Long]
    val dts = ArrayBuffer.empty[Long]
    val sync = ArrayBuffer.empty[Boolean]
    var nextDts: Long = 0L
    def toTrack: Track = Track(trackId, handler, codec, timescale,
      math.max(duration, nextDts), width, height,
      sizes.toArray, offsets.toArray, dts.toArray, sync.toArray)
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

  /** Walk an ISO-BMFF stream and return every track's sample table —
    * moov stbl samples plus every moof fragment's runs, in file order.
    * Non-MP4 payloads are refused by name. */
  def demux(id: Long, bytes: Array[Byte]): Seq[Track] = {
    val c = new Cursor(bytes)
    require(bytes.length >= 12 && c.fourcc(4) == "ftyp", {
      val fmt =
        if (bytes.length >= 12 && c.fourcc(0) == "RIFF") "riff/avi — use aviFrames"
        else if (bytes.length >= 4 && (bytes(0) & 0xFF) == 0x1A &&
          (bytes(1) & 0xFF) == 0x45) "matroska/webm — use Mkv.demux"
        else "unknown"
      s"mp4 $id: not an ISO-BMFF file (no ftyp; looks like '$fmt')"
    })
    // track order as declared; trex defaults: id → (dur, size, flags)
    val tracks = scala.collection.mutable.LinkedHashMap.empty[Long, TrackAcc]
    val trex = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    var sawMoov = false

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

    def parseTrak(off0: Long, end: Long): TrackAcc = {
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

      val acc = new TrackAcc(trackId, handler, codec, timescale, duration,
        width, height)

      // stsz: fixed or per-sample sizes (a fragmented file's moov
      // typically declares ZERO samples here)
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
      acc.nextDts = t

      // stss: sync table; ABSENT means every sample is a sync sample
      val sync = Array.fill(n)(stblKids.forall(_._1 != "stss"))
      stblKids.find(_._1 == "stss").foreach { case (_, o, _) =>
        val vf = c.u32(o.toInt)
        require(vf >>> 24 == 0, s"mp4 $id: stss version ${vf >>> 24}")
        val stssN = c.u32(o.toInt + 4).toInt
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
        val perChunk = stsc.foldLeft(0L) { case (acc2, (fc, spc)) =>
          if (fc <= chunk1) spc else acc2
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

      acc.sizes ++= sizes
      acc.offsets ++= offsets
      acc.dts ++= dts
      acc.sync ++= sync
      acc
    }

    def walkMoov(off0: Long, end: Long): Unit =
      childBoxes(off0, end).foreach {
        case ("trak", o, e) =>
          val acc = parseTrak(o, e)
          tracks(acc.trackId) = acc
        case ("mvex", o, e) =>
          childBoxes(o, e).foreach {
            case ("trex", to, _) =>
              // version/flags, track_ID, default_sample_description_index,
              // default_sample_duration, default_sample_size,
              // default_sample_flags
              trex(c.u32(to.toInt + 4)) =
                (c.u32(to.toInt + 12), c.u32(to.toInt + 16), c.u32(to.toInt + 20))
            case _ =>
          }
        case _ =>
      }

    /** One movie fragment: every traf appends its runs to its track. */
    def walkMoof(moofStart: Long, off0: Long, end: Long): Unit =
      childBoxes(off0, end).foreach {
        case ("traf", trafOff, trafEnd) =>
          val kids = childBoxes(trafOff, trafEnd)
          val (tfhdOff, _) = child(kids, "tfhd")
          val tfFlags = (c.u32(tfhdOff.toInt) & 0xFFFFFF).toInt
          val trackId = c.u32(tfhdOff.toInt + 4)
          val acc = tracks.getOrElse(trackId,
            throw new IllegalArgumentException(
              s"mp4 $id: moof traf names track $trackId, which moov never declared"))
          var p = tfhdOff.toInt + 8
          val baseDataOffset = if ((tfFlags & 0x1) != 0) {
            val v = c.u64(p); p += 8; Some(v)
          } else None
          if ((tfFlags & 0x2) != 0) p += 4 // sample-description-index
          val (trexDur, trexSize, trexFlags) =
            trex.getOrElse(trackId, (0L, 0L, 0L))
          val defDur = if ((tfFlags & 0x8) != 0) {
            val v = c.u32(p); p += 4; v
          } else trexDur
          val defSize = if ((tfFlags & 0x10) != 0) {
            val v = c.u32(p); p += 4; v
          } else trexSize
          val defFlags = if ((tfFlags & 0x20) != 0) {
            val v = c.u32(p); p += 4; v
          } else trexFlags
          // addressing: explicit base-data-offset, else the moof's first
          // byte (default-base-is-moof — also the sane reading when
          // neither flag is set, the dominant CMAF convention)
          val base = baseDataOffset.getOrElse(moofStart)
          kids.find(_._1 == "tfdt").foreach { case (_, o, _) =>
            val v = (c.u32(o.toInt) >>> 24).toInt
            acc.nextDts = if (v == 1) c.u64(o.toInt + 4) else c.u32(o.toInt + 4)
          }
          var pos = base
          var firstTrun = true
          kids.foreach {
            case ("trun", to, _) =>
              val trFlags = (c.u32(to.toInt) & 0xFFFFFF).toInt
              val nSamples = c.u32(to.toInt + 4).toInt
              var q = to.toInt + 8
              if ((trFlags & 0x1) != 0) {
                pos = base + c.u32(q).toInt // signed 32-bit data offset
                q += 4
              } else if (firstTrun) pos = base
              // (a later trun without data-offset continues contiguously)
              val firstFlags = if ((trFlags & 0x4) != 0) {
                val v = c.u32(q); q += 4; Some(v)
              } else None
              for (i <- 0 until nSamples) {
                val dur = if ((trFlags & 0x100) != 0) {
                  val v = c.u32(q); q += 4; v
                } else {
                  require(defDur > 0, s"mp4 $id: fragment sample has no " +
                    "duration (no trun field, no tfhd/trex default)")
                  defDur
                }
                val size = if ((trFlags & 0x200) != 0) {
                  val v = c.u32(q); q += 4; v
                } else {
                  require(defSize > 0, s"mp4 $id: fragment sample has no " +
                    "size (no trun field, no tfhd/trex default)")
                  defSize
                }
                val fl = if ((trFlags & 0x400) != 0) {
                  val v = c.u32(q); q += 4; v
                } else if (i == 0 && firstFlags.isDefined) firstFlags.get
                else defFlags
                if ((trFlags & 0x800) != 0) q += 4 // composition offset
                acc.sizes += size
                acc.offsets += pos
                acc.dts += acc.nextDts
                acc.sync += (fl & 0x10000L) == 0 // sample_is_non_sync_sample
                pos += size
                acc.nextDts += dur
              }
              firstTrun = false
            case _ =>
          }
        case _ => // mfhd (sequence number) and friends
      }

    var off = 0L
    val fileEnd = bytes.length.toLong
    while (off < fileEnd) {
      val (typ, hdr, next) = boxAt(c, off, fileEnd, id)
      typ match {
        case "moov" => sawMoov = true; walkMoov(off + hdr, next)
        case "moof" =>
          require(sawMoov, s"mp4 $id: moof before moov (sidx-first streams " +
            "need the moov to resolve track defaults)")
          walkMoof(off, off + hdr, next)
        case _ => // ftyp, mdat, free, sidx, ...
      }
      off = next
    }
    require(sawMoov, s"mp4 $id: no moov box (streamed-only or truncated file)")
    tracks.valuesIterator.map(_.toTrack).toSeq
  }

  // -------------------------------------------- byte builders (writer)

  private def b16(b: ArrayBuffer[Byte], v: Int): Unit = {
    b += ((v >> 8) & 0xFF).toByte; b += (v & 0xFF).toByte
  }
  private def b32(b: ArrayBuffer[Byte], v: Long): Unit = {
    b16(b, ((v >> 16) & 0xFFFF).toInt); b16(b, (v & 0xFFFF).toInt)
  }
  private def b64(b: ArrayBuffer[Byte], v: Long): Unit = {
    b32(b, v >>> 32); b32(b, v & 0xFFFFFFFFL)
  }
  private def btag(b: ArrayBuffer[Byte], s: String): Unit = {
    require(s.length == 4); b ++= s.getBytes("US-ASCII")
  }
  private def box(typ: String)(body: ArrayBuffer[Byte] => Unit): Array[Byte] = {
    val b = ArrayBuffer.empty[Byte]
    body(b)
    val r = ArrayBuffer.empty[Byte]
    b32(r, 8L + b.length)
    btag(r, typ)
    r ++= b
    r.toArray
  }

  /** Deterministic payload byte j of (track-local) sample i. */
  private def payloadByte(seed: Long, i: Int, j: Long): Byte =
    (((seed + i * 31 + j) % 251) & 0xFF).toByte

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

  private val MovieTimescale = 1000L

  private def trakBox(tr: TrackSpec, chunks: Seq[Long]): Array[Byte] = {
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
        b64(b, dur * MovieTimescale / math.max(1L, tr.timescale))
      } else {
        b32(b, 7) // version 0, same flags
        b32(b, 0); b32(b, 0); b32(b, tr.trackId); b32(b, 0)
        b32(b, dur * MovieTimescale / math.max(1L, tr.timescale))
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

  private def mvhdBox(tracks: Seq[TrackSpec]): Array[Byte] = box("mvhd") { b =>
    b32(b, 0); b32(b, 0); b32(b, 0); b32(b, MovieTimescale)
    val movieDur = tracks.map(tr =>
      tr.sttsRuns.map { case (cnt, d) => cnt.toLong * d }.sum *
        MovieTimescale / math.max(1L, tr.timescale)).maxOption.getOrElse(0L)
    b32(b, movieDur)
    b32(b, 0x00010000L); b16(b, 0x0100); b16(b, 0) // rate, volume
    b32(b, 0); b32(b, 0) // reserved
    b32(b, 0x00010000L); b32(b, 0); b32(b, 0)
    b32(b, 0); b32(b, 0x00010000L); b32(b, 0)
    b32(b, 0); b32(b, 0); b32(b, 0x40000000L)
    for (_ <- 0 until 6) b32(b, 0) // pre_defined
    b32(b, tracks.map(_.trackId).maxOption.getOrElse(0L) + 1)
  }

  /** Emit ftyp + mdat + moov (mdat-first: sample offsets are closed-form
    * — ftyp is 24 bytes, mdat payload starts at 32). All tracks' samples
    * land in mdat in track order, each track one contiguous run carved
    * into chunks per its `samplesPerChunk`. Payload byte j of sample i
    * is ((seed + i*31 + j) % 251) — deterministic, never parsed back. */
  def encode(tracks: Seq[TrackSpec], seed: Long = 7): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    // ftyp: fixed 24 bytes so fixtures have closed-form offsets
    b32(out, 24); btag(out, "ftyp"); btag(out, "isom")
    b32(out, 0); btag(out, "isom"); btag(out, "mp41")

    // mdat: all tracks' samples back-to-back in track order
    val mdatPayload = tracks.map(_.sampleSizes.sum).sum
    b32(out, 8 + mdatPayload); btag(out, "mdat")
    val dataStart = out.length.toLong // = 32
    tracks.foreach { tr =>
      tr.sampleSizes.zipWithIndex.foreach { case (sz, i) =>
        var j = 0L
        while (j < sz) { out += payloadByte(seed, i, j); j += 1 }
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

    val moov = box("moov") { b =>
      b ++= mvhdBox(tracks)
      tracks.zip(chunkOffsets).foreach { case (tr, chunks) =>
        b ++= trakBox(tr, chunks)
      }
    }
    out ++= moov
    out.toArray
  }

  // -------------------------------------------------- fragmented write

  /** One movie fragment's runs for one track. `sizes` empty means
    * `nDefault` samples of the tfhd default size; `durations` empty
    * means the tfhd/trex default duration; non-empty `syncFlags` emits
    * per-sample trun flags (true = sync sample), empty leaves flags to
    * the defaults (trex flags; 0 = all sync). */
  final case class Fragment(
      sizes: Seq[Long] = Nil,
      nDefault: Int = 0,
      durations: Seq[Long] = Nil,
      defaultDur: Long = 0, // tfhd default-sample-duration (0 = rely on trex)
      defaultSize: Long = 0, // tfhd default-sample-size
      syncFlags: Seq[Boolean] = Nil,
      tfdt: Option[Long] = None,
      tfdtV1: Boolean = false) {
    def n: Int = if (sizes.nonEmpty) sizes.length else nDefault
    def sampleSizes: Seq[Long] =
      if (sizes.nonEmpty) sizes else Seq.fill(nDefault)(defaultSize)
  }

  /** Fragmented-MP4 track: empty moov sample tables + mvex/trex
    * defaults, samples delivered by per-fragment moof runs. */
  final case class FragTrackSpec(
      trackId: Long,
      handler: String,
      codec: String,
      timescale: Long,
      width: Int = 0, height: Int = 0,
      fragments: Seq[Fragment] = Nil,
      trexDur: Long = 0, trexSize: Long = 0, trexFlags: Long = 0)

  /** Emit a fragmented MP4. `leadingMdat = true` (fixture form): ftyp +
    * ONE mdat carrying every track's samples in (track, fragment) order
    * + moov + data-less moofs whose tfhd base-data-offset points into
    * the leading mdat — byte offsets stay the closed-form 32 + running
    * sums, so the unfragmented oracle replays verbatim (fragmentation
    * is invisible to the sample table). `leadingMdat = false` (the real
    * CMAF shape): ftyp + moov + interleaved [moof][mdat] pairs
    * addressed via default-base-is-moof + trun data-offset. */
  def encodeFragmented(tracks: Seq[FragTrackSpec], seed: Long = 7,
      leadingMdat: Boolean = true): Array[Byte] = {
    val moovTracks = tracks.map(t => TrackSpec(t.trackId, t.handler,
      t.codec, t.timescale, t.width, t.height, samplesPerChunk = Seq(1)))
    val moov = box("moov") { b =>
      b ++= mvhdBox(moovTracks)
      moovTracks.foreach(tr => b ++= trakBox(tr, Nil))
      b ++= box("mvex") { m =>
        tracks.foreach { t =>
          m ++= box("trex") { x =>
            b32(x, 0); b32(x, t.trackId); b32(x, 1)
            b32(x, t.trexDur); b32(x, t.trexSize); b32(x, t.trexFlags)
          }
        }
      }
    }

    def trunBox(f: Fragment, dataOffset: Option[Long]): Array[Byte] = {
      val perSampleDur = f.durations.nonEmpty
      val perSampleSize = f.sizes.nonEmpty
      val perSampleFlags = f.syncFlags.nonEmpty
      var flags = 0L
      if (dataOffset.isDefined) flags |= 0x1
      if (perSampleDur) flags |= 0x100
      if (perSampleSize) flags |= 0x200
      if (perSampleFlags) flags |= 0x400
      box("trun") { b =>
        b32(b, flags) // version 0 | flags
        b32(b, f.n)
        dataOffset.foreach(o => b32(b, o))
        for (i <- 0 until f.n) {
          if (perSampleDur) b32(b, f.durations(i))
          if (perSampleSize) b32(b, f.sizes(i))
          if (perSampleFlags)
            b32(b, if (f.syncFlags(i)) 0L else 0x10000L)
        }
      }
    }

    def tfhdBox(t: FragTrackSpec, f: Fragment,
        baseOffset: Option[Long]): Array[Byte] = {
      var flags = 0L
      if (baseOffset.isDefined) flags |= 0x1
      if (f.defaultDur > 0) flags |= 0x8
      if (f.defaultSize > 0 && f.sizes.isEmpty) flags |= 0x10
      if (baseOffset.isEmpty) flags |= 0x20000 // default-base-is-moof
      box("tfhd") { b =>
        b32(b, flags)
        b32(b, t.trackId)
        baseOffset.foreach(o => b64(b, o))
        if (f.defaultDur > 0) b32(b, f.defaultDur)
        if (f.defaultSize > 0 && f.sizes.isEmpty) b32(b, f.defaultSize)
      }
    }

    def tfdtBox(f: Fragment): Seq[Array[Byte]] = f.tfdt.toSeq.map { t =>
      box("tfdt") { b =>
        if (f.tfdtV1) { b32(b, 0x01000000L); b64(b, t) }
        else { b32(b, 0); b32(b, t) }
      }
    }

    val out = ArrayBuffer.empty[Byte]
    b32(out, 24); btag(out, "ftyp"); btag(out, "isom")
    b32(out, 0); btag(out, "isom"); btag(out, "mp41")

    var seqNo = 1L
    def mfhdBox(): Array[Byte] = {
      val r = box("mfhd")(b => { b32(b, 0); b32(b, seqNo) })
      seqNo += 1
      r
    }

    if (leadingMdat) {
      val mdatPayload = tracks.map(_.fragments.map(_.sampleSizes.sum).sum).sum
      b32(out, 8 + mdatPayload); btag(out, "mdat")
      var cursor = out.length.toLong // = 32
      // (track, fragment) order mirrors the unfragmented track order
      val fragOffsets: Seq[Seq[Long]] = tracks.map { t =>
        t.fragments.map { f =>
          val o = cursor
          cursor += f.sampleSizes.sum
          o
        }
      }
      tracks.foreach { t =>
        var i = 0
        t.fragments.foreach(_.sampleSizes.foreach { sz =>
          var j = 0L
          while (j < sz) { out += payloadByte(seed, i, j); j += 1 }
          i += 1
        })
      }
      out ++= moov
      tracks.zip(fragOffsets).foreach { case (t, offs) =>
        t.fragments.zip(offs).foreach { case (f, base) =>
          out ++= box("moof") { b =>
            b ++= mfhdBox()
            b ++= box("traf") { tb =>
              tb ++= tfhdBox(t, f, Some(base))
              tfdtBox(f).foreach(tb ++= _)
              tb ++= trunBox(f, None)
            }
          }
        }
      }
    } else {
      out ++= moov
      tracks.foreach { t =>
        var i = 0
        t.fragments.foreach { f =>
          // trun data-offset = moof size + mdat header (8): compute the
          // moof twice — once to size it, once for real (deterministic)
          def moofBytes(dataOff: Long): Array[Byte] = box("moof") { b =>
            b ++= box("mfhd")(x => { b32(x, 0); b32(x, seqNo) })
            b ++= box("traf") { tb =>
              tb ++= tfhdBox(t, f, None)
              tfdtBox(f).foreach(tb ++= _)
              tb ++= trunBox(f, Some(dataOff))
            }
          }
          val size = moofBytes(0).length
          out ++= moofBytes(size + 8L)
          seqNo += 1
          b32(out, 8 + f.sampleSizes.sum); btag(out, "mdat")
          f.sampleSizes.foreach { sz =>
            var j = 0L
            while (j < sz) { out += payloadByte(seed, i, j); j += 1 }
            i += 1
          }
        }
      }
    }
    out.toArray
  }
}
