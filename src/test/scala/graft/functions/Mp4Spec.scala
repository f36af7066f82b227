package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import Mp4.TrackSpec

/** MP4/ISO-BMFF demux: writer-beside-reader roundtrips over the profile
  * matrix (per-sample and fixed stsz, multi-run stts, stss vs absent,
  * multi-entry stsc, stco vs co64, version-0 vs version-1 full boxes,
  * size-0 trailing boxes, fragmented moof/tfhd/trun runs in both the
  * leading-mdat and CMAF interleaved layouts), the refusal paths, and
  * the relational demux/track-meta stages. No JDK counterpart exists
  * to interop-pin (javax has no MP4 demuxer) — the oracle gates
  * q174/q177 replay the sample tables from events instead. */
class Mp4Spec extends SparkSpec {

  private def video(n: Int, co64: Boolean = false, v1: Boolean = false) =
    TrackSpec(1, "vide", "avc1", timescale = 12800, width = 320, height = 240,
      sizes = Seq.tabulate(n)(i => (i * 37 % 120) + 1L),
      sttsRuns = Seq((math.min(4, n), 100L)) ++
        (if (n > 4) Seq((n - 4, 250L)) else Nil),
      syncSamples = Some((0 until n).filter(_ % 3 == 0).map(_ + 1)),
      samplesPerChunk = Seq(3), co64 = co64, v1Boxes = v1)

  private val audio =
    TrackSpec(2, "soun", "mp4a", timescale = 48000,
      fixedSize = 64, nFixed = 10, sttsRuns = Seq((10, 1024L)),
      syncSamples = None, samplesPerChunk = Seq(4))

  test("roundtrip: sizes, contiguous offsets, stts dts, stss keyframes") {
    val n = 7
    val bytes = Mp4.encode(Seq(video(n), audio))
    val tracks = Mp4.demux(9L, bytes)
    assert(tracks.map(_.trackId) == Seq(1L, 2L))
    val v = tracks.head
    assert(v.handler == "vide" && v.codec == "avc1")
    assert(v.width == 320 && v.height == 240 && v.timescale == 12800)
    assert(v.sizes.toSeq == Seq.tabulate(n)(i => (i * 37 % 120) + 1L))
    // mdat-first layout: first sample at byte 32, then cumulative
    assert(v.offsets.head == 32L)
    assert(v.offsets.toSeq == v.sizes.scanLeft(32L)(_ + _).init.toSeq)
    assert(v.dts.toSeq == Seq(0L, 100, 200, 300, 400, 650, 900))
    assert(v.sync.toSeq == (0 until n).map(_ % 3 == 0))
    val a = tracks(1)
    assert(a.handler == "soun" && a.codec == "mp4a")
    assert(a.sizes.forall(_ == 64L) && a.sizes.length == 10)
    // audio run starts right after the video bytes
    assert(a.offsets.head == 32L + v.sizes.sum)
    assert(a.dts.toSeq == (0 until 10).map(_ * 1024L))
    // absent stss = every sample is a sync sample (spec 8.6.2)
    assert(a.sync.forall(identity))
    assert(a.duration == 10 * 1024L)
  }

  test("co64 and version-1 tkhd/mdhd parse to the same table as stco/v0") {
    val base = Mp4.demux(1L, Mp4.encode(Seq(video(6))))
    val alt = Mp4.demux(1L, Mp4.encode(Seq(video(6, co64 = true, v1 = true))))
    assert(base.head.offsets.toSeq == alt.head.offsets.toSeq)
    assert(base.head.dts.toSeq == alt.head.dts.toSeq)
    assert(base.head.timescale == alt.head.timescale)
    assert(base.head.duration == alt.head.duration)
    assert(alt.head.trackId == 1L && alt.head.width == 320)
  }

  test("multi-entry stsc chunk walk keeps offsets contiguous") {
    val tr = video(9).copy(samplesPerChunk = Seq(2, 3))
    val t = Mp4.demux(2L, Mp4.encode(Seq(tr))).head
    assert(t.offsets.toSeq == t.sizes.scanLeft(32L)(_ + _).init.toSeq)
  }

  test("a trailing size-0 box (to end of file) is tolerated") {
    val bytes = Mp4.encode(Seq(video(5))) ++
      Array[Byte](0, 0, 0, 0, 'f', 'r', 'e', 'e', 1, 2, 3)
    assert(Mp4.demux(3L, bytes).head.sizes.length == 5)
  }

  /** Fragmented twin of [[video]]: same sizes/dts/sync split over two
    * fragments (4 samples @100, rest @250, tfdt re-basing the second). */
  private def fragVideo(n: Int) = {
    val sizes = Seq.tabulate(n)(i => (i * 37 % 120) + 1L)
    val sync = (0 until n).map(_ % 3 == 0)
    Mp4.FragTrackSpec(1, "vide", "avc1", timescale = 12800,
      width = 320, height = 240,
      fragments = Seq(
        Mp4.Fragment(sizes = sizes.take(4),
          durations = Seq.fill(math.min(4, n))(100L),
          syncFlags = sync.take(4), tfdt = Some(0L)),
        Mp4.Fragment(sizes = sizes.drop(4),
          durations = Seq.fill(math.max(0, n - 4))(250L),
          syncFlags = sync.drop(4), tfdt = Some(400L), tfdtV1 = true)))
  }

  private val fragAudio =
    Mp4.FragTrackSpec(2, "soun", "mp4a", timescale = 48000,
      fragments = Seq(Mp4.Fragment(nDefault = 10, defaultSize = 64,
        tfdt = Some(0L))),
      trexDur = 1024, trexFlags = 0)

  test("fragmentation is invisible to the sample table (leading-mdat form)") {
    val n = 7
    val plain = Mp4.demux(20L, Mp4.encode(Seq(video(n), audio)))
    val frag = Mp4.demux(20L,
      Mp4.encodeFragmented(Seq(fragVideo(n), fragAudio)))
    assert(plain.length == frag.length)
    plain.zip(frag).foreach { case (p, f) =>
      assert(p.trackId == f.trackId && p.codec == f.codec)
      assert(p.sizes.toSeq == f.sizes.toSeq, s"sizes track ${p.trackId}")
      assert(p.offsets.toSeq == f.offsets.toSeq, s"offsets track ${p.trackId}")
      assert(p.dts.toSeq == f.dts.toSeq, s"dts track ${p.trackId}")
      assert(p.sync.toSeq == f.sync.toSeq, s"sync track ${p.trackId}")
    }
  }

  test("CMAF interleaved moof+mdat with default-base-is-moof demuxes; " +
      "offsets land on the real payload bytes") {
    val n = 6
    val bytes = Mp4.encodeFragmented(Seq(fragVideo(n), fragAudio),
      leadingMdat = false)
    val tracks = Mp4.demux(21L, bytes)
    val v = tracks.head
    assert(v.sizes.toSeq == Seq.tabulate(n)(i => (i * 37 % 120) + 1L))
    assert(v.dts.toSeq == Seq(0L, 100, 200, 300, 400, 650))
    assert(v.sync.toSeq == (0 until n).map(_ % 3 == 0))
    // every sample's bytes equal the writer's deterministic payload
    // pattern ((seed + i*31 + j) % 251) — proves the default-base-is-moof
    // + trun data-offset addressing resolved to the true mdat positions
    tracks.foreach { t =>
      var i = 0
      t.sizes.zip(t.offsets).foreach { case (sz, off) =>
        var j = 0L
        while (j < sz) {
          assert(bytes((off + j).toInt) == (((7 + i * 31 + j) % 251) & 0xFF).toByte,
            s"track ${t.trackId} sample $i byte $j")
          j += 1
        }
        i += 1
      }
    }
    // trex-defaulted audio: duration and all-sync flags came from trex
    val a = tracks(1)
    assert(a.dts.toSeq == (0 until 10).map(_ * 1024L))
    assert(a.sync.forall(identity))
  }

  test("a traf naming an undeclared track is refused by name; " +
      "missing size/duration defaults are refused by name") {
    val bytes = Mp4.encodeFragmented(Seq(fragVideo(5)))
    // patch the tfhd track id (track 1 → 9): find the tfhd box
    val idx = (0 until bytes.length - 4).find(o =>
      bytes(o) == 't' && bytes(o + 1) == 'f' && bytes(o + 2) == 'h' &&
        bytes(o + 3) == 'd').get
    val patched = bytes.clone()
    patched(idx + 4 + 4 + 3) = 9 // track_id low byte
    val e = intercept[IllegalArgumentException](Mp4.demux(22L, patched))
    assert(e.getMessage.contains("never declared"), e.getMessage)
    // a fragment relying on defaults that nothing supplies
    val noDur = Mp4.FragTrackSpec(1, "soun", "mp4a", 48000,
      fragments = Seq(Mp4.Fragment(nDefault = 3, defaultSize = 8)))
    val e2 = intercept[IllegalArgumentException](
      Mp4.demux(23L, Mp4.encodeFragmented(Seq(noDur))))
    assert(e2.getMessage.contains("no duration"), e2.getMessage)
  }

  test("moof before moov is refused by name") {
    val frag = Mp4.encodeFragmented(Seq(fragVideo(5)), leadingMdat = false)
    // locate the top-level moov and first moof, swap their order
    def boxesAt(b: Array[Byte]): Seq[(String, Int, Int)] = {
      var off = 0
      val out = Seq.newBuilder[(String, Int, Int)]
      while (off < b.length) {
        val sz = ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
          ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)
        out += ((new String(b, off + 4, 4, "US-ASCII"), off, sz))
        off += sz
      }
      out.result()
    }
    val boxes = boxesAt(frag)
    val moov = boxes.find(_._1 == "moov").get
    val moof = boxes.find(_._1 == "moof").get
    val reordered =
      frag.slice(0, moov._2) ++ // ftyp
        frag.slice(moof._2, moof._2 + moof._3) ++ // first moof
        frag.slice(moov._2, moov._2 + moov._3) // moov
    val e = intercept[IllegalArgumentException](Mp4.demux(24L, reordered))
    assert(e.getMessage.contains("moof before moov"), e.getMessage)
  }

  test("non-BMFF payloads are refused by name") {
    val avi = Multimodal.encodeAvi(Seq(Array[Byte](1, 2, 3)))
    val e = intercept[IllegalArgumentException](Mp4.demux(5L, avi))
    assert(e.getMessage.contains("not an ISO-BMFF"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Mp4.demux(6L, Array.fill[Byte](32)(0x42)))
    assert(e2.getMessage.contains("not an ISO-BMFF"), e2.getMessage)
  }

  test("truncated box claims are refused, not over-read") {
    val bytes = Mp4.encode(Seq(video(5)))
    val cut = java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 10)
    val e = intercept[Exception](Mp4.demux(7L, cut))
    assert(e.getMessage.contains("mp4 7"), e.getMessage)
  }

  test("demuxMp4 relational stage emits one row per sample, both tracks") {
    val sp = spark; import sp.implicits._
    val df = Seq((11L, Mp4.encode(Seq(video(6), audio)))).toDF("id", "mp4")
    val rows = Multimodal.demuxMp4(df, "id", "mp4")
      .orderBy("track_id", "sample_idx").collect()
    assert(rows.length == 16)
    assert(rows.count(_.getAs[Boolean]("keyframe")) == 2 + 10) // v: 0,3; a: all
    assert(rows.map(_.getAs[String]("codec")).distinct.sorted.toSeq ==
      Seq("avc1", "mp4a"))
  }

  test("mp4Tracks meta gives the curation-stat shape") {
    val sp = spark; import sp.implicits._
    val df = Seq((12L, Mp4.encode(Seq(video(7), audio)))).toDF("id", "mp4")
    val m = Multimodal.mp4Tracks(df, "id", "mp4")
      .orderBy("track_id").collect()
    assert(m.length == 2)
    val v = m.head
    assert(v.getAs[String]("handler") == "vide")
    assert(v.getAs[Int]("n_samples") == 7 && v.getAs[Int]("n_keyframes") == 3)
    assert(v.getAs[Long]("duration") == 4 * 100L + 3 * 250L)
    assert(v.getAs[Int]("width") == 320 && v.getAs[Int]("height") == 240)
    assert(v.getAs[Long]("total_bytes") ==
      Seq.tabulate(7)(i => (i * 37 % 120) + 1L).sum)
  }
}
