package graft.functions

import graft.SparkSpec

/** ustar/WebDataset reader: roundtrips (plain + .tar.gz), checksum
  * verification, GNU base-256 sizes, padding math, WebDataset key
  * grouping, refusals by name. */
class TarSpec extends SparkSpec {

  private val files = Seq(
    "0001.txt" -> "hello world".getBytes("US-ASCII"),
    "0001.cls" -> "3".getBytes("US-ASCII"),
    "0002.txt" -> Array.tabulate(700)(i => (i % 251).toByte), // spans blocks
    "0002.json" -> """{"a":1}""".getBytes("US-ASCII"))

  test("plain and gzipped archives roundtrip with verified checksums") {
    for (gz <- Seq(false, true)) {
      val out = Tar.entries(1L, Tar.encode(files, gzip = gz))
      assert(out.map(_.name) == files.map(_._1))
      assert(out.map(_.size) == files.map(_._2.length.toLong))
      out.zip(files).foreach { case (e, (_, data)) =>
        assert(e.data.sameElements(data), e.name)
      }
    }
  }

  test("data offsets are block-aligned and padding is honored") {
    val bytes = Tar.encode(files)
    val out = Tar.entries(2L, bytes)
    out.foreach { e =>
      assert(e.offset % 512 == 0, s"${e.name} at ${e.offset}")
      // bytes at the offset ARE the member data
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, e.offset.toInt,
          (e.offset + e.size).toInt), e.data), e.name)
    }
    // 700-byte member consumes 2 data blocks: next header 1024 past it
    assert(out(3).offset == out(2).offset + 1024 + 512)
  }

  test("GNU base-256 size fields parse") {
    val bytes = Tar.encode(Seq("big.bin" -> Array.fill[Byte](600)(7)))
    // rewrite the size field as base-256 and fix the checksum
    bytes(124) = 0x80.toByte
    (125 until 134).foreach(i => bytes(i) = 0)
    bytes(134) = ((600 >> 8) & 0xFF).toByte
    bytes(135) = (600 & 0xFF).toByte
    (148 until 156).foreach(i => bytes(i) = ' ')
    val sum = (0 until 512).map(i => bytes(i) & 0xFF).sum
    f"$sum%06o".getBytes("US-ASCII").copyToArray(bytes, 148)
    bytes(154) = 0; bytes(155) = ' '
    val out = Tar.entries(3L, bytes)
    assert(out.head.size == 600 && out.head.data.length == 600)
  }

  test("refusals are by name: checksum, PAX, GNU longname, v7, truncation") {
    val good = Tar.encode(files)
    val bad = good.clone(); bad(0) = 'x'
    val e1 = intercept[IllegalArgumentException](Tar.entries(4L, bad))
    assert(e1.getMessage.contains("checksum mismatch"), e1.getMessage)
    def withType(t: Char): Array[Byte] = {
      val c = good.clone()
      c(156) = t.toByte
      (148 until 156).foreach(i => c(i) = ' ')
      val sum = (0 until 512).map(i => c(i) & 0xFF).sum
      f"$sum%06o".getBytes("US-ASCII").copyToArray(c, 148)
      c(154) = 0; c(155) = ' '
      c
    }
    val e2 = intercept[IllegalArgumentException](Tar.entries(5L, withType('x')))
    assert(e2.getMessage.contains("PAX"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](Tar.entries(6L, withType('L')))
    assert(e3.getMessage.contains("long-name"), e3.getMessage)
    val v7 = good.clone(); (257 until 263).foreach(i => v7(i) = 0)
    val e4 = intercept[IllegalArgumentException](Tar.entries(7L, v7))
    assert(e4.getMessage.contains("ustar"), e4.getMessage)
    val e5 = intercept[IllegalArgumentException](
      Tar.entries(8L, good.take(700)))
    assert(e5.getMessage.toLowerCase.matches(".*(truncated|past end).*"),
      e5.getMessage)
    // regression: a shard cut 100 bytes INTO the second member's header
    // must refuse, not silently return only the first member
    val out = Tar.entries(9L, good)
    val secondHdr = (out(1).offset - 512).toInt
    val eMid = intercept[IllegalArgumentException](
      Tar.entries(10L, good.take(secondHdr + 100)))
    assert(eMid.getMessage.contains("truncated mid-entry"), eMid.getMessage)
  }

  test("webdatasetSamples groups by basename-to-first-dot") {
    val sp = spark; import sp.implicits._
    val wds = Tar.encode(Seq(
      "shard/0001.jpg" -> Array[Byte](1, 2, 3),
      "shard/0001.cls" -> "7".getBytes("US-ASCII"),
      "shard/0001.seg.json" -> "{}".getBytes("US-ASCII"),
      "shard/0002.jpg" -> Array[Byte](4)))
    val df = Seq((9L, wds)).toDF("id", "tar")
    val rows = Tar.webdatasetSamples(df, "id", "tar")
      .orderBy("sample_key", "ext").collect()
    assert(rows.map(r => (r.getAs[String]("sample_key"),
      r.getAs[String]("ext"))).toSeq == Seq(
      ("shard/0001", "cls"), ("shard/0001", "jpg"), ("shard/0001", "seg.json"),
      ("shard/0002", "jpg")))
    assert(rows.map(_.getAs[Long]("byte_size")).toSeq == Seq(1L, 3, 2, 1))
  }
}
