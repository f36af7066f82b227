package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import Mp4.TrackSpec

/** MP4/ISO-BMFF demux: writer-beside-reader roundtrips over the profile
  * matrix (per-sample and fixed stsz, multi-run stts, stss vs absent,
  * multi-entry stsc, stco vs co64, version-0 vs version-1 full boxes,
  * size-0 trailing boxes), the refusal paths (fragmented, non-BMFF),
  * and the relational demux/track-meta stages. No JDK counterpart
  * exists to interop-pin (javax has no MP4 demuxer) — the oracle gate
  * q174 replays the sample tables from events instead. */
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

  test("fragmented MP4 (moof) is refused by name") {
    val bytes = Mp4.encode(Seq(video(5))) ++
      Array[Byte](0, 0, 0, 8, 'm', 'o', 'o', 'f')
    val e = intercept[IllegalArgumentException](Mp4.demux(4L, bytes))
    assert(e.getMessage.contains("fragmented"), e.getMessage)
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
