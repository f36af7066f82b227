package graft.functions

import graft.SparkSpec
import Warc.WRecord

/** WARC reader: writer-beside-reader roundtrips (plain and per-record
  * gzip members — the Common Crawl layout), HTTP envelope splitting,
  * offset semantics, dirty-byte tolerance, refusals by name, and the
  * relational stage. The q179 gate replays record tables from events. */
class WarcSpec extends SparkSpec {

  private val recs = Seq(
    WRecord("warcinfo", body = "crawler=graft\n"),
    WRecord("response", targetUri = "https://example.com/a",
      httpStatus = Some(200), body = "<html><body>hello</body></html>"),
    WRecord("response", targetUri = "https://example.com/b",
      httpStatus = Some(404), body = "gone"),
    WRecord("conversion", targetUri = "https://example.com/a",
      body = "hello"))

  test("plain WARC roundtrips: types, uris, envelope split, lengths") {
    val out = Warc.parse(1L, Warc.encode(recs))
    assert(out.map(_.warcType) == Seq("warcinfo", "response", "response",
      "conversion"))
    assert(out(1).targetUri == "https://example.com/a")
    assert(out(1).httpStatus == 200)
    assert(out(1).payloadText == "<html><body>hello</body></html>")
    assert(out(2).httpStatus == 404 && out(2).payloadText == "gone")
    // non-http records carry the raw block and no status
    assert(out(0).httpStatus == -1 && out(0).payloadText == "crawler=graft\n")
    assert(out(3).httpStatus == -1 && out(3).payloadText == "hello")
    // WARC Content-Length covers the HTTP envelope + body
    assert(out(1).contentLength ==
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n".length +
        out(1).payloadText.length)
  }

  test("per-record gzip members (the Common Crawl layout) parse identically") {
    val plain = Warc.parse(2L, Warc.encode(recs))
    val gz = Warc.parse(2L, Warc.encode(recs, gzipPerRecord = true))
    assert(gz.map(r => (r.warcType, r.targetUri, r.httpStatus, r.payloadText)) ==
      plain.map(r => (r.warcType, r.targetUri, r.httpStatus, r.payloadText)))
  }

  test("rec_offset re-parses: the record at its offset is itself") {
    val bytes = Warc.encode(recs)
    val out = Warc.parse(3L, bytes)
    out.foreach { r =>
      val re = Warc.parse(3L, bytes.drop(r.offset.toInt)).head
      assert(re.warcType == r.warcType && re.payloadText == r.payloadText)
    }
  }

  test("dirty payload bytes decode with replacement, never throw") {
    // hand-build a record whose body is invalid UTF-8
    val body = Array[Byte](0x68, 0xFF.toByte, 0xFE.toByte, 0x69)
    val header = ("WARC/1.0\r\nWARC-Type: resource\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII")
    val rec = header ++ body ++ "\r\n\r\n".getBytes("US-ASCII")
    val out = Warc.parse(4L, rec)
    assert(out.head.payloadText.startsWith("h") &&
      out.head.payloadText.endsWith("i"))
  }

  test("refusals are by name: no Content-Length, truncation, bad version") {
    val noLen = ("WARC/1.0\r\nWARC-Type: resource\r\n\r\n" +
      "xx\r\n\r\n").getBytes("US-ASCII")
    val e1 = intercept[IllegalArgumentException](Warc.parse(5L, noLen))
    assert(e1.getMessage.contains("no Content-Length"), e1.getMessage)
    val good = Warc.encode(recs)
    val e2 = intercept[IllegalArgumentException](
      Warc.parse(6L, good.dropRight(12)))
    assert(e2.getMessage.toLowerCase.matches(".*(past end|content-length).*"),
      e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      Warc.parse(7L, "HTTP/1.1 200 OK\r\n\r\n".getBytes("US-ASCII")))
    assert(e3.getMessage.contains("version line"), e3.getMessage)
  }

  test("chunked and gzip HTTP bodies DECODE (the warcio content_stream " +
      "contract); encoded lengths match the closed forms") {
    val body = "<p>" + ("x" * 100) + " events=7</p>" // 3 full chunks + rem
    val encoded = Seq(
      WRecord("response", targetUri = "https://example.com/c",
        httpStatus = Some(200), chunked = true, body = body),
      WRecord("response", targetUri = "https://example.com/g",
        httpStatus = Some(200), gzipBody = true, body = body),
      WRecord("response", targetUri = "https://example.com/cg",
        httpStatus = Some(200), chunked = true, gzipBody = true, body = body))
    for (gz <- Seq(false, true)) {
      val out = Warc.parse(10L, Warc.encode(encoded, gzipPerRecord = gz))
      assert(out.forall(_.payloadText == body), out.map(_.payloadText))
    }
    val out = Warc.parse(11L, Warc.encode(encoded))
    val len = body.length
    // chunked: 38/full 32-byte chunk, hexdigits(rem)+rem+4, 5 terminator
    val rem = len % 32
    val chunkedLen = (len / 32) * 38 +
      (if (rem > 0) Integer.toHexString(rem).length + rem + 4 else 0) + 5
    val env = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n".length
    assert(out(0).contentLength == env + 28 + chunkedLen)
    // stored-block gzip: len + 23
    assert(out(1).contentLength == env + 24 + (len + 23))
  }

  test("foreign transfer/content codings refuse BY NAME (br, deflate, " +
      "non-chunked TE); truncated chunk framing refuses") {
    def httpRec(hdrs: String, body: Array[Byte]): Array[Byte] = {
      val block = s"HTTP/1.1 200 OK\r\n$hdrs\r\n".getBytes("US-ASCII") ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${block.length}\r\n\r\n").getBytes("US-ASCII") ++
        block ++ "\r\n\r\n".getBytes("US-ASCII")
    }
    val eBr = intercept[IllegalArgumentException](Warc.parse(12L,
      httpRec("Content-Encoding: br\r\n", "xx".getBytes)))
    assert(eBr.getMessage.contains("'br'"), eBr.getMessage)
    val eDf = intercept[IllegalArgumentException](Warc.parse(13L,
      httpRec("Content-Encoding: deflate\r\n", "xx".getBytes)))
    assert(eDf.getMessage.contains("'deflate'"), eDf.getMessage)
    val eTe = intercept[IllegalArgumentException](Warc.parse(14L,
      httpRec("Transfer-Encoding: gzip, chunked\r\n", "xx".getBytes)))
    assert(eTe.getMessage.contains("Transfer-Encoding"), eTe.getMessage)
    // gzip content-coding whose body is not gzip
    val eMagic = intercept[IllegalArgumentException](Warc.parse(15L,
      httpRec("Content-Encoding: gzip\r\n", "xx".getBytes)))
    assert(eMagic.getMessage.contains("gzip magic"), eMagic.getMessage)
    // truncated chunk framing
    val eTrunc = intercept[IllegalArgumentException](Warc.parse(16L,
      httpRec("Transfer-Encoding: chunked\r\n",
        "20\r\nonly-a-few-bytes".getBytes("US-ASCII"))))
    assert(eTrunc.getMessage.contains("chunk"), eTrunc.getMessage)
    // garbage chunk size line
    val eSize = intercept[IllegalArgumentException](Warc.parse(17L,
      httpRec("Transfer-Encoding: chunked\r\n",
        "zz\r\nxx\r\n0\r\n\r\n".getBytes("US-ASCII"))))
    assert(eSize.getMessage.contains("chunk size"), eSize.getMessage)
    // adversarial hex sizes: max-Long overflows `p + size + 2`, and a
    // negative size would reach out.write — both take the NAMED refusal,
    // never an IndexOutOfBounds
    val eHuge = intercept[IllegalArgumentException](Warc.parse(18L,
      httpRec("Transfer-Encoding: chunked\r\n",
        "7fffffffffffffff\r\nxx\r\n0\r\n\r\n".getBytes("US-ASCII"))))
    assert(eHuge.getMessage.contains("runs past end"), eHuge.getMessage)
    val eNeg = intercept[IllegalArgumentException](Warc.parse(19L,
      httpRec("Transfer-Encoding: chunked\r\n",
        "-5\r\nxx\r\n0\r\n\r\n".getBytes("US-ASCII"))))
    assert(eNeg.getMessage.contains("runs past end"), eNeg.getMessage)
    // non-numeric Content-Length: a NAMED refusal with file/offset
    // context, never a bare NumberFormatException (parity with the
    // DSv2 reader's headerBlockOf)
    val eClen = intercept[IllegalArgumentException](Warc.parse(20L,
      ("WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: NaN\r\n\r\n")
        .getBytes("US-ASCII")))
    assert(eClen.getMessage.contains("non-numeric Content-Length"),
      eClen.getMessage)
  }

  test("writeWetSegments: byte-deterministic across input partitionings, " +
      "re-ingests through format(\"warc\"), duplicate URIs refuse") {
    val sp = spark; import sp.implicits._
    val rows = (0 until 40).map(i => (s"https://x.test/$i", s"text $i"))
    def export(df: org.apache.spark.sql.DataFrame): String = {
      val dir = java.nio.file.Files.createTempDirectory("wetout").toString
      Warc.writeWetSegments(df, "uri", "text", dir, nShards = 4)
      dir
    }
    val d1 = export(rows.toDF("uri", "text"))
    val d2 = export(rows.toDF("uri", "text").repartition(7))
    val files = new java.io.File(d1).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted
    assert(files.nonEmpty && files.forall(_.matches("segment-\\d+\\.warc\\.gz")))
    files.foreach { f =>
      val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$d1/$f"))
      val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$d2/$f"))
      assert(java.util.Arrays.equals(a, b), s"$f differs across partitionings")
    }
    val back = spark.read.format("warc").load(d1)
      .select("target_uri", "warc_type", "payload_text").collect()
    assert(back.length == 40)
    assert(back.forall(_.getAs[String]("warc_type") == "conversion"))
    assert(back.map(_.getAs[String]("target_uri")).toSet ==
      rows.map(_._1).toSet)
    val e = intercept[org.apache.spark.SparkException](export(
      (rows :+ (("https://x.test/0", "twin"))).toDF("uri", "text")))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("duplicate identity")), e.getMessage)
  }

  test("charset sniffing: BOM > header charset= > meta prescan > UTF-8; " +
      "unknown charsets and malformed bytes never throw") {
    def rec(hdrCt: String, body: Array[Byte]): Array[Byte] = {
      val block = s"HTTP/1.1 200 OK\r\n$hdrCt\r\n".getBytes("US-ASCII") ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${block.length}\r\n\r\n").getBytes("US-ASCII") ++
        block ++ "\r\n\r\n".getBytes("US-ASCII")
    }
    def text(hdrCt: String, body: Array[Byte]): String =
      Warc.parse(30L, rec(hdrCt, body)).head.payloadText
    // header charset: windows-1252 smart quotes + e-acute
    assert(text("Content-Type: text/html; charset=windows-1252\r\n",
      Array(0x93, 0x94, 0xE9).map(_.toByte)) == "“”é")
    // meta prescan (no header param), iso-8859-1 degree sign
    assert(text("Content-Type: text/html\r\n",
      "<meta charset='iso-8859-1'>x°".getBytes("ISO-8859-1")) ==
      "<meta charset='iso-8859-1'>x°")
    // BOM wins over a LYING header
    assert(text("Content-Type: text/html; charset=windows-1252\r\n",
      Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
        "é".getBytes("UTF-8")) == "é")
    // UTF-16 BOMs (both endiannesses), BOM stripped
    assert(text("Content-Type: text/html\r\n",
      "﻿hi".getBytes("UTF-16BE")) == "hi")
    assert(text("Content-Type: text/html\r\n",
      "﻿hi".getBytes("UTF-16LE")) == "hi")
    // header wins over meta
    assert(text("Content-Type: text/html; charset=iso-8859-1\r\n",
      "<meta charset=\"utf-8\">é".getBytes("ISO-8859-1")) ==
      "<meta charset=\"utf-8\">é")
    // unknown charset name → UTF-8 fallback; malformed bytes replace
    assert(text("Content-Type: text/html; charset=klingon-9\r\n",
      Array(0x41, 0xFF, 0x42).map(_.toByte)) == "A�B")
    // quoted charset value parses
    assert(text("Content-Type: text/html; charset=\"windows-1252\"\r\n",
      Array(0x85.toByte)) == "…")
    // prose mentioning 'charset' BEFORE the real meta must not end the
    // scan (the reviewed first-occurrence bailout)
    assert(text("Content-Type: text/html\r\n",
      ("<p>how to set the charset in HTML</p>" +
        "<meta charset=\"windows-1252\">x").getBytes("US-ASCII") ++
        Array(0x93.toByte)) ==
      "<p>how to set the charset in HTML</p>" +
        "<meta charset=\"windows-1252\">x“")
  }

  test("resolveRevisits: refers_to and digest modes resolve to the " +
      "original payload; dangling refs keep nulls; duplicate-key " +
      "originals pick deterministically (min file order)") {
    import java.nio.file.{Files, Paths}
    val recs = Seq(
      Warc.WRecord("response", targetUri = "https://x/0", httpStatus = Some(200),
        body = "original zero", recordId = "<urn:0>", payloadDigest = "sha1:Z"),
      // a DUPLICATE record id with different content: the earlier
      // (path, rec_offset) must win, deterministically
      Warc.WRecord("response", targetUri = "https://x/0b", httpStatus = Some(200),
        body = "duplicate id impostor", recordId = "<urn:0>",
        payloadDigest = "sha1:ZZ"),
      Warc.WRecord("response", targetUri = "https://x/1", httpStatus = Some(200),
        body = "original one", recordId = "<urn:1>", payloadDigest = "sha1:Y"),
      Warc.WRecord("revisit", targetUri = "https://x/0?again",
        refersTo = "<urn:0>", payloadDigest = "sha1:Z"),
      Warc.WRecord("revisit", targetUri = "https://x/1?again",
        refersTo = "<urn:1>", payloadDigest = "sha1:Y"),
      Warc.WRecord("revisit", targetUri = "https://x/ghost",
        refersTo = "<urn:404>", payloadDigest = "sha1:NOPE"))
    val dir = Files.createTempDirectory("warcrev").toString
    Files.write(Paths.get(s"$dir/seg.warc.gz"),
      Warc.encode(recs, gzipPerRecord = true))
    val scan = spark.read.format("warc").load(dir)
    val byRef = Warc.resolveRevisits(scan)
      .select("target_uri", "orig_uri", "resolved_text")
      .orderBy("target_uri").collect()
    assert(byRef.map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSeq == Seq(
        ("https://x/0?again", "https://x/0", "original zero"),
        ("https://x/1?again", "https://x/1", "original one"),
        ("https://x/ghost", null, null)))
    val byDigest = Warc.resolveRevisits(scan, by = "digest")
      .select("target_uri", "resolved_text")
      .orderBy("target_uri").collect()
    assert(byDigest.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(
      ("https://x/0?again", "original zero"),
      ("https://x/1?again", "original one"),
      ("https://x/ghost", null)))
    val e = intercept[IllegalArgumentException](
      Warc.resolveRevisits(scan, by = "uri"))
    assert(e.getMessage.contains("refers_to or digest"))
  }

  test("records() relational stage: one row per record, both layouts") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, Warc.encode(recs)),
      (2L, Warc.encode(recs, gzipPerRecord = true))).toDF("id", "warc")
    val rows = Warc.records(df, "id", "warc")
      .orderBy("id", "rec_idx").collect()
    assert(rows.length == 8)
    assert(rows.map(_.getAs[String]("warc_type")).distinct.sorted.toSeq ==
      Seq("conversion", "response", "warcinfo"))
    assert(rows.count(_.getAs[Int]("http_status") == 200) == 2)
  }

  test("sniffCharset: x-user-defined aliases to windows-1252 (WHATWG " +
      "document-decode rule) in header AND meta positions") {
    val bytes = "café".getBytes("windows-1252") // é = 0xE9
    val viaHeader = Warc.decodeText(
      "text/html; charset=x-user-defined", bytes)
    assert(viaHeader == "café", viaHeader)
    val metaBody = ("<meta charset='X-User-Defined'>café")
      .getBytes("windows-1252")
    assert(Warc.decodeText("text/html", metaBody) ==
      "<meta charset='X-User-Defined'>café")
  }
}
