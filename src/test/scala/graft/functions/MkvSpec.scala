package graft.functions

import graft.SparkSpec
import Mkv.{WBlock, WCluster, WTrack}

/** Matroska/WebM demux: writer-beside-reader roundtrips over the EBML
  * profile (SimpleBlock vs BlockGroup keyframes, cluster timestamp
  * re-basing, all three lacing modes, DefaultDuration lace stepping,
  * unknown-size Segment), refusals by name, and the relational stage.
  * No JDK counterpart exists to interop-pin — q178 replays the frame
  * table from events instead. */
class MkvSpec extends SparkSpec {

  private def frame(n: Int, tag: Int): Array[Byte] =
    Array.tabulate(n)(j => ((tag * 31 + j) % 251).toByte)

  private val videoTrack = WTrack(1, 1, "V_VP9", width = 640, height = 360)
  private val audioTrack = WTrack(2, 2, "A_OPUS", defaultDurationNs = 20000000)

  test("SimpleBlocks across clusters: sizes, rebased timestamps, keyframes, " +
      "offsets land on the true frame bytes") {
    val sizes = Seq(9, 4, 7, 5, 12, 3)
    val blocks0 = WBlock(1, 0, sizes.take(3).zipWithIndex.map { case (n, i) =>
      frame(n, i) }, Seq(true, false, false))
    val blocks1 = WBlock(1, 0, sizes.drop(3).zipWithIndex.map { case (n, i) =>
      frame(n, i + 3) }, Seq(true, false, false))
    val bytes = Mkv.encode("matroska", Seq(videoTrack), Seq(
      WCluster(0, Seq(blocks0)), WCluster(300, Seq(blocks1))))
    val t = Mkv.demux(1L, bytes) match { case Seq(v) => v }
    assert(t.number == 1 && t.codec == "V_VP9")
    assert(t.width == 640 && t.height == 360)
    assert(t.sizes.toSeq == sizes.map(_.toLong))
    // writer emits consecutive relTs per unlaced frame
    assert(t.ts.toSeq == Seq(0L, 1, 2, 300, 301, 302))
    assert(t.keyframe.toSeq == Seq(true, false, false, true, false, false))
    t.sizes.zip(t.offsets).zipWithIndex.foreach { case ((sz, off), i) =>
      val expect = frame(sz.toInt, i)
      (0 until sz.toInt).foreach { j =>
        assert(bytes((off + j).toInt) == expect(j), s"frame $i byte $j")
      }
    }
  }

  test("BlockGroup keyframes are ReferenceBlock ABSENCE, not a flag bit") {
    val bytes = Mkv.encode("matroska", Seq(videoTrack), Seq(WCluster(0, Seq(
      WBlock(1, 0, Seq(frame(6, 0)), Seq(true), group = true),
      WBlock(1, 5, Seq(frame(6, 1)), Seq(false), group = true)))))
    val t = Mkv.demux(2L, bytes).head
    assert(t.keyframe.toSeq == Seq(true, false))
    assert(t.ts.toSeq == Seq(0L, 5L))
  }

  test("all three lacing modes recover per-frame sizes; DefaultDuration " +
      "steps laced timestamps") {
    // Xiph with a >=255-byte frame (multi-byte 255-run), EBML with
    // growing/shrinking sizes, fixed with equal sizes
    val xiph = WBlock(2, 0, Seq(frame(300, 0), frame(2, 1), frame(9, 2)),
      Seq(true, true, true), lacing = 1)
    val ebml = WBlock(2, 100, Seq(frame(10, 3), frame(200, 4), frame(3, 5),
      frame(60, 6)), Seq(true, true, true, true), lacing = 3)
    val fixed = WBlock(2, 500, Seq(frame(16, 7), frame(16, 8), frame(16, 9)),
      Seq(true, true, true), lacing = 2)
    val bytes = Mkv.encode("webm", Seq(audioTrack),
      Seq(WCluster(0, Seq(xiph, ebml, fixed))))
    val t = Mkv.demux(3L, bytes).head
    assert(t.sizes.toSeq == Seq(300L, 2, 9, 10, 200, 3, 60, 16, 16, 16))
    // DefaultDuration 20ms at the default 1ms timestamp scale = 20 units
    assert(t.ts.toSeq == Seq(0L, 20, 40, 100, 120, 140, 160, 500, 520, 540))
    assert(t.keyframe.forall(identity))
    // frame bytes land exactly (lace size bookkeeping is wire-true)
    t.sizes.zip(t.offsets).zipWithIndex.foreach { case ((sz, off), i) =>
      val expect = frame(sz.toInt, i)
      (0 until sz.toInt).foreach { j =>
        assert(bytes((off + j).toInt) == expect(j), s"lace $i byte $j")
      }
    }
  }

  test("EBML lacing with a SINGLE frame carries no size fields (count 0)") {
    // regression: the decoder used to read a phantom first-size vint and
    // emit a spurious remainder frame
    val one = WBlock(2, 0, Seq(frame(37, 0)), Seq(true), lacing = 3)
    val t = Mkv.demux(10L, Mkv.encode("webm", Seq(audioTrack),
      Seq(WCluster(0, Seq(one))))).head
    assert(t.sizes.toSeq == Seq(37L))
    val expect = frame(37, 0)
    val bytes = Mkv.encode("webm", Seq(audioTrack), Seq(WCluster(0, Seq(one))))
    val t2 = Mkv.demux(11L, bytes).head
    (0 until 37).foreach { j =>
      assert(bytes((t2.offsets(0) + j).toInt) == expect(j), s"byte $j")
    }
  }

  test("unknown-size Segment (streaming muxer) extends to end of file") {
    val bytes = Mkv.encode("webm", Seq(videoTrack), Seq(
      WCluster(0, Seq(WBlock(1, 0, Seq(frame(5, 0)), Seq(true))))))
    // Segment id is 4 bytes; rewrite its size as the 1-byte unknown 0xFF
    val segAt = {
      var off = 0
      // skip EBML header: 4-byte id + size vint + payload
      off += 4
      val first = bytes(off) & 0xFF
      val len = java.lang.Integer.numberOfLeadingZeros(first) - 24 + 1
      var sz = (first & (0xFF >>> len)).toLong
      (1 until len).foreach(i => sz = (sz << 8) | (bytes(off + i) & 0xFF))
      off + len + sz.toInt
    }
    val sizeAt = segAt + 4
    val first = bytes(sizeAt) & 0xFF
    val sizeLen = java.lang.Integer.numberOfLeadingZeros(first) - 24 + 1
    val unknown = bytes.take(sizeAt) ++ Array(0xFF.toByte) ++
      bytes.drop(sizeAt + sizeLen)
    val t = Mkv.demux(4L, unknown).head
    assert(t.sizes.toSeq == Seq(5L))
  }

  test("refusals are by name: non-EBML, wrong doctype, undeclared track, " +
      "encrypted track, unknown-size cluster") {
    val e1 = intercept[IllegalArgumentException](
      Mkv.demux(5L, Mp4.encode(Seq(Mp4.TrackSpec(1, "vide", "avc1", 1000,
        sizes = Seq(3), sttsRuns = Seq((1, 1L)), samplesPerChunk = Seq(1))))))
    assert(e1.getMessage.contains("not an EBML"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Mkv.demux(6L, Mkv.encode("ebmlthing", Seq(videoTrack), Nil)))
    assert(e2.getMessage.contains("doctype"), e2.getMessage)
    val undeclared = Mkv.encode("webm", Seq(videoTrack), Seq(
      WCluster(0, Seq(WBlock(9, 0, Seq(frame(3, 0)), Seq(true))))))
    val e3 = intercept[IllegalArgumentException](Mkv.demux(7L, undeclared))
    assert(e3.getMessage.contains("never declared"), e3.getMessage)
  }

  test("demuxMkv relational stage emits one row per frame") {
    val sp = spark; import sp.implicits._
    val bytes = Mkv.encode("webm", Seq(videoTrack, audioTrack), Seq(
      WCluster(0, Seq(
        WBlock(1, 0, Seq(frame(8, 0), frame(6, 1)), Seq(true, false)),
        WBlock(2, 0, Seq(frame(4, 2), frame(4, 3)), Seq(true, true),
          lacing = 2)))))
    val df = Seq((31L, bytes)).toDF("id", "mkv")
    val rows = Multimodal.demuxMkv(df, "id", "mkv")
      .orderBy("track_id", "sample_idx").collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[String]("codec")).toSeq ==
      Seq("V_VP9", "V_VP9", "A_OPUS", "A_OPUS"))
    assert(rows.count(_.getAs[Boolean]("keyframe")) == 3)
  }
}
