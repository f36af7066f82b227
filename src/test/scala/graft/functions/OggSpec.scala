package graft.functions

import graft.SparkSpec
import Ogg.WStream

/** Ogg demux: writer-beside-reader roundtrips (page-spanning packets,
  * nil terminators for exact-255 multiples, chained streams, BOS/EOS,
  * codec sniffing), CRC verification, refusals by name, and the
  * relational stage. */
class OggSpec extends SparkSpec {

  private def packet(n: Int, tag: Int): Array[Byte] =
    Array.tabulate(n)(j => ((tag * 17 + j) % 251).toByte)

  private def opusStream(serial: Long, sizes: Seq[Int],
      maxSegs: Int = 255): WStream = {
    val pks = "OpusHead-fixture".getBytes("US-ASCII") +:
      sizes.zipWithIndex.map { case (n, i) => packet(n, i) }
    WStream(serial, pks, granuleOf = i => i * 960L, maxSegsPerPage = maxSegs)
  }

  test("packets reassemble across pages; granules stamp completion pages") {
    // 600-byte packet = laces 255+255+90; maxSegs 2 forces page spans
    val s = opusStream(7, Seq(600, 3, 510), maxSegs = 2)
    val bytes = Ogg.encode(Seq(s))
    val out = Ogg.demux(1L, bytes) match { case Seq(one) => one }
    assert(out.serial == 7 && out.codec == "opus" && out.eosSeen)
    assert(out.sizes.toSeq == Seq(16L, 600, 3, 510))
    assert(out.granules.toSeq == Seq(0L, 960, 1920, 2880))
    // packet bytes land at the demuxed offsets — but SPANNING packets
    // are split by page headers, so only verify the contiguous head
    out.sizes.zip(out.offsets).zipWithIndex.drop(1).foreach {
      case ((sz, off), i) =>
        val expect = packet(sz.toInt, i - 1)
        val head = math.min(sz.toInt, 255)
        (0 until head).foreach { j =>
          assert(bytes((off + j).toInt) == expect(j), s"packet $i byte $j")
        }
    }
  }

  test("exact-255-multiple packets terminate with a nil lace") {
    val s = opusStream(3, Seq(255, 510, 4))
    val out = Ogg.demux(2L, Ogg.encode(Seq(s))).head
    assert(out.sizes.toSeq == Seq(16L, 255, 510, 4))
  }

  test("chained streams demux separately with their own codecs") {
    val vorbis = WStream(11,
      Seq(Array[Byte](1) ++ "vorbis-hdr".getBytes("US-ASCII"), packet(40, 9)))
    val bytes = Ogg.encode(Seq(opusStream(10, Seq(20)), vorbis))
    val out = Ogg.demux(3L, bytes)
    assert(out.map(_.serial) == Seq(10L, 11L))
    assert(out.map(_.codec) == Seq("opus", "vorbis"))
    assert(out.forall(_.eosSeen))
  }

  test("granules are PAGE-level: packets completing on one page share " +
      "the granule of the last completer") {
    // default caps: all four packets (header + 3 data) complete on ONE
    // page, so every packet carries that page's granule — granuleOf of
    // the LAST completer (packet 3) = 2880
    val one = Ogg.demux(8L, Ogg.encode(Seq(opusStream(6, Seq(5, 6, 7)))))
      .head
    assert(one.granules.toSeq == Seq(2880L, 2880, 2880, 2880))
    // one packet per page -> per-packet granules exact
    val per = Ogg.demux(9L, Ogg.encode(Seq(
      opusStream(6, Seq(5, 6, 7)).copy(maxPacketsPerPage = 1)))).head
    assert(per.granules.toSeq == Seq(0L, 960, 1920, 2880))
  }

  test("CRC mismatches and structural damage are refused by name") {
    val bytes = Ogg.encode(Seq(opusStream(5, Seq(100))))
    val bad = bytes.clone()
    bad(bytes.length - 1) = (bad(bytes.length - 1) ^ 0x55).toByte
    val e = intercept[IllegalArgumentException](Ogg.demux(4L, bad))
    assert(e.getMessage.contains("CRC mismatch"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Ogg.demux(5L, bytes.dropRight(3)))
    assert(e2.getMessage.toLowerCase.matches(".*(truncated|past end|mid-packet).*"),
      e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      Ogg.demux(6L, "RIFFxxxxWAVE".getBytes("US-ASCII")))
    assert(e3.getMessage.contains("not an Ogg"), e3.getMessage)
    val badVer = bytes.clone(); badVer(4) = 1
    val e4 = intercept[IllegalArgumentException](Ogg.demux(7L, badVer))
    assert(e4.getMessage.contains("version"), e4.getMessage)
  }

  test("packets() relational stage emits one row per packet") {
    val sp = spark; import sp.implicits._
    val df = Seq((41L, Ogg.encode(Seq(opusStream(9, Seq(30, 700), maxSegs = 3)))))
      .toDF("id", "ogg")
    val rows = Ogg.packets(df, "id", "ogg").orderBy("packet_idx").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("byte_size")).toSeq == Seq(16L, 30, 700))
    assert(rows.forall(_.getAs[String]("codec") == "opus"))
  }
}
