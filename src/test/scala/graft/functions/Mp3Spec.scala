package graft.functions

import graft.SparkSpec
import Mp3.WFrame

/** MP3 frame-header scan (metadata only, decode refused by design):
  * hand-computed frame lengths pin the slot arithmetic and both table
  * families; ID3 wrappers skip; refusals by name. */
class Mp3Spec extends SparkSpec {

  test("frame lengths match hand-computed slot arithmetic") {
    // the textbook value: MPEG1 L3 128 kbps @ 44100 -> 144*128000/44100 = 417
    val f = Mp3.frames(1L, Mp3.encode(Seq(
      WFrame(bitrateIdx = 9), // 128 kbps
      WFrame(bitrateIdx = 9, padding = 1),
      WFrame(bitrateIdx = 14)))) // 320 kbps -> 1044
    assert(f.map(_.byteSize) == Seq(417, 418, 1044))
    assert(f.map(_.bitrateKbps) == Seq(128, 128, 320))
    assert(f.forall(_.sampleRate == 44100))
    assert(f.forall(_.samplesPerFrame == 1152))
    assert(f.map(_.offset) == Seq(0L, 417, 835))
    // Layer I slots are 4 bytes: MPEG1 L1 32 kbps @ 32000 -> 48 bytes
    val l1 = Mp3.frames(2L, Mp3.encode(Seq(
      WFrame(layer = 1, bitrateIdx = 1, srIdx = 2))))
    assert(l1.head.byteSize == 48 && l1.head.samplesPerFrame == 384)
    // MPEG2 L3 has 576 samples: 64 kbps @ 22050 -> 72*64000/22050 = 208
    val v2 = Mp3.frames(3L, Mp3.encode(Seq(
      WFrame(verCode = 2, bitrateIdx = 8)))) // V2 L3 idx8 = 64 kbps
    assert(v2.head.byteSize == 208 && v2.head.samplesPerFrame == 576)
    assert(v2.head.version == "2" && v2.head.sampleRate == 22050)
    // MPEG2.5 at 11025
    val v25 = Mp3.frames(4L, Mp3.encode(Seq(
      WFrame(verCode = 0, bitrateIdx = 1, mono = true))))
    assert(v25.head.version == "2.5" && v25.head.sampleRate == 11025)
    assert(v25.head.channels == 1)
  }

  test("ID3v2 prefix and trailing ID3v1 are skipped") {
    val bytes = Mp3.encode(Seq(WFrame(bitrateIdx = 9)),
      id3v2Bytes = 300, id3v1 = true)
    val f = Mp3.frames(5L, bytes)
    assert(f.length == 1 && f.head.offset == 310L && f.head.byteSize == 417)
  }

  test("VBR streams report per-frame bitrates") {
    val f = Mp3.frames(6L, Mp3.encode(
      Seq(9, 11, 14, 5).map(i => WFrame(bitrateIdx = i))))
    assert(f.map(_.bitrateKbps) == Seq(128, 192, 320, 64))
  }

  test("refusals are by name: free format, reserved codes, sync loss, " +
      "truncation, non-MP3") {
    val good = Mp3.encode(Seq(WFrame(bitrateIdx = 9)))
    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    val eFree = intercept[IllegalArgumentException](
      Mp3.frames(7L, patched(c => c(2) = (c(2) & 0x0F).toByte)))
    assert(eFree.getMessage.contains("free-format"), eFree.getMessage)
    val eVer = intercept[IllegalArgumentException](
      Mp3.frames(8L, patched(c => c(1) = 0xEB.toByte)))
    assert(eVer.getMessage.contains("reserved MPEG version"), eVer.getMessage)
    val eTrunc = intercept[IllegalArgumentException](
      Mp3.frames(9L, good.dropRight(10)))
    assert(eTrunc.getMessage.contains("past end"), eTrunc.getMessage)
    val two = Mp3.encode(Seq(WFrame(bitrateIdx = 9), WFrame(bitrateIdx = 9)))
    val eSync = intercept[IllegalArgumentException](
      Mp3.frames(10L, patched(_ => ()) ++ Array[Byte](0, 0, 0, 0, 0)))
    assert(eSync.getMessage.contains("lost frame sync"), eSync.getMessage)
    assert(Mp3.frames(11L, two).length == 2)
    val eFmt = intercept[IllegalArgumentException](
      Mp3.frames(12L, "OggSxxxxxxxxxxxx".getBytes("US-ASCII")))
    assert(eFmt.getMessage.contains("no frame sync"), eFmt.getMessage)
    // 1-3 residual bytes after the last frame = a cut-off next header
    val eTail = intercept[IllegalArgumentException](
      Mp3.frames(13L, good ++ Array[Byte](0xFF.toByte, 0xFB.toByte)))
    assert(eTail.getMessage.contains("trailing bytes"), eTail.getMessage)
  }

  test("frameTable relational stage: one row per frame") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, Mp3.encode(Seq(WFrame(bitrateIdx = 9), WFrame(bitrateIdx = 14)))),
      (2L, Mp3.encode(Seq(WFrame(verCode = 2, bitrateIdx = 8))))
    ).toDF("id", "mp3")
    val rows = Mp3.frameTable(df, "id", "mp3").orderBy("id", "frame_idx").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Int]("bitrate_kbps")).toSeq == Seq(128, 320, 64))
    assert(rows.map(_.getAs[String]("mpeg_version")).toSeq == Seq("1", "1", "2"))
  }
}
