package graft.functions

import graft.SparkSpec

/** TFRecord framing: roundtrips (plain + gzip), the masked-CRC32C
  * formula against a hand-computed vector, refusals by name, and the
  * relational stage. */
class TfRecordSpec extends SparkSpec {

  private val payloads = Seq(
    "first record".getBytes("US-ASCII"),
    Array.emptyByteArray, // zero-length records are legal
    Array.tabulate(1000)(i => (i % 251).toByte))

  test("plain and gzipped shards roundtrip with verified CRCs") {
    for (gz <- Seq(false, true)) {
      val out = TfRecord.records(1L, TfRecord.encode(payloads, gzip = gz))
      assert(out.length == 3)
      out.zip(payloads).foreach { case (r, p) =>
        assert(r.data.sameElements(p))
      }
    }
  }

  test("record offsets walk the 12-byte header + payload + 4-byte footer") {
    val out = TfRecord.records(2L, TfRecord.encode(payloads))
    assert(out.map(_.offset) == Seq(0L, 12 + 12 + 4, 12 + 12 + 4 + 12 + 0 + 4))
  }

  test("masked CRC32C matches the TensorFlow formula on a known vector") {
    // crc32c("123456789") = 0xE3069283 (the Castagnoli check value);
    // masked = ((c >> 15) | (c << 17)) + 0xa282ead8 (mod 2^32)
    val c = new java.util.zip.CRC32C
    c.update("123456789".getBytes("US-ASCII"))
    assert(c.getValue == 0xE3069283L)
    val masked = (((c.getValue >>> 15) | (c.getValue << 17)) + 0xA282EAD8L) & 0xFFFFFFFFL
    // our writer stamps exactly this value for a one-record file
    val rec = TfRecord.encode(Seq("123456789".getBytes("US-ASCII")))
    def u32le(b: Array[Byte], o: Int): Long =
      (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
        ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
    assert(u32le(rec, 12 + 9) == masked)
  }

  test("refusals are by name: length CRC, data CRC, truncation") {
    val good = TfRecord.encode(payloads)
    val badLen = good.clone(); badLen(8) = (badLen(8) ^ 0x1).toByte
    val e1 = intercept[IllegalArgumentException](TfRecord.records(3L, badLen))
    assert(e1.getMessage.contains("length CRC"), e1.getMessage)
    val badData = good.clone(); badData(14) = (badData(14) ^ 0x1).toByte
    val e2 = intercept[IllegalArgumentException](TfRecord.records(4L, badData))
    assert(e2.getMessage.contains("data CRC"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      TfRecord.records(5L, good.dropRight(3)))
    assert(e3.getMessage.toLowerCase.matches(".*(truncated|past end).*"),
      e3.getMessage)
  }

  test("recordTable relational stage: one row per record") {
    val sp = spark; import sp.implicits._
    val df = Seq((6L, TfRecord.encode(payloads, gzip = true))).toDF("id", "tfr")
    val rows = TfRecord.recordTable(df, "id", "tfr").orderBy("rec_idx").collect()
    assert(rows.map(_.getAs[Long]("byte_size")).toSeq == Seq(12L, 0, 1000))
  }
}
