package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{Tar, Warc}

/** Splittable archive DSv2 (`format("warc")` / `format("webdataset")`)
  * — the 100 TB ingest shape: member-granular intra-file parallelism
  * with results INVARIANT across split sizes, pinned against the
  * in-memory reference parsers (binaryFile path) on identical files. */
class ArchiveSplitSpec extends SparkSpec {

  private def warcRecs(n: Int): Seq[Warc.WRecord] =
    Warc.WRecord("warcinfo", body = "crawler=graft\n") +:
      (0 until n).map { i =>
        Warc.WRecord("response", targetUri = s"https://x.test/$i",
          httpStatus = Some(if (i % 7 == 0) 404 else 200),
          chunked = i % 3 == 1, gzipBody = i % 3 == 2,
          body = s"<html><body><p>doc $i " + ("pad " * (i % 50)) +
            "&amp; text</p></body></html>")
      }

  private def warcDir(gz: Boolean, n: Int = 80): String = {
    val dir = Files.createTempDirectory("warcsplit").toString
    val bytes = Warc.encode(warcRecs(n), gzipPerRecord = gz)
    Files.write(Paths.get(s"$dir/seg-1.warc${if (gz) ".gz" else ""}"), bytes)
    dir
  }

  private def collectWarc(dir: String, split: Long) = {
    val df = spark.read.format("warc")
      .option("maxSplitBytes", split.toString).load(dir)
    (df.rdd.getNumPartitions,
      df.select("rec_offset", "rec_seq", "warc_type", "target_uri",
          "content_length", "http_status", "payload_text")
        .orderBy("rec_offset", "rec_seq").collect().toSeq)
  }

  test("warc gz: >1 partition per archive; rows invariant across split " +
      "sizes and EQUAL to the in-memory reference parser") {
    val dir = warcDir(gz = true)
    val (nWhole, whole) = collectWarc(dir, 10L << 20)
    val (nSplit, split) = collectWarc(dir, 2048)
    assert(nWhole == 1)
    assert(nSplit > 3, s"expected member-granular partitions, got $nSplit")
    assert(whole == split)
    // parity with the reference parser on the same bytes
    val raw = Files.readAllBytes(
      Paths.get(new java.io.File(dir).listFiles().head.toString))
    val ref = Warc.parse(1L, raw)
    assert(split.map(r => (r.getAs[String]("warc_type"),
      r.getAs[String]("target_uri"), r.getAs[Int]("http_status"),
      r.getAs[String]("payload_text"))) ==
      ref.map(r => (r.warcType, r.targetUri, r.httpStatus, r.payloadText)))
    // every record decoded (chunked/gzip days in the fixture): no chunk
    // framing hex lines or gzip binary leaked into the text
    assert(split.filter(_.getAs[String]("warc_type") == "response")
      .forall(_.getAs[String]("payload_text").startsWith("<html>")))
  }

  test("warc zst: per-record zstd frames split like gzip members") {
    val dir = Files.createTempDirectory("warczst").toString
    val bytes = Warc.encode(warcRecs(60), zstdPerRecord = true)
    Files.write(Paths.get(s"$dir/seg-1.warc.zst"), bytes)
    val (nWhole, whole) = collectWarc(dir, 10L << 20)
    val (nSplit, split) = collectWarc(dir, 2048)
    assert(nWhole == 1 && nSplit > 3, s"$nWhole/$nSplit")
    assert(whole == split)
    val ref = Warc.parse(1L, bytes) // Gunzip sniffs zstd multi-frame
    assert(split.map(r => (r.getAs[String]("target_uri"),
      r.getAs[String]("payload_text"))) ==
      ref.map(r => (r.targetUri, r.payloadText)))
    // a NON-dictionary skippable frame mid-chain (legal zstd) skips at
    // the validated walk position and never produces rows
    val skip = Array[Byte](0x52, 0x2A, 0x4D, 0x18, 4, 0, 0, 0, 1, 2, 3, 4)
    val firstFrameEnd = com.github.luben.zstd.Zstd
      .findFrameCompressedSize(bytes).toInt
    val dir2 = Files.createTempDirectory("warczsk").toString
    Files.write(Paths.get(s"$dir2/seg.warc.zst"),
      bytes.take(firstFrameEnd) ++ skip ++ bytes.drop(firstFrameEnd))
    val (_, withSkip) = collectWarc(dir2, 10L << 20)
    assert(withSkip.map(r => (r.getAs[String]("target_uri"),
      r.getAs[String]("payload_text"))) ==
      ref.map(r => (r.targetUri, r.payloadText)))
  }

  test("warc zst: IIPC shared-dictionary archives (leading 0x184D2A5D " +
      "skippable frame, raw AND zstd-wrapped payload) decode with " +
      "split-size invariance") {
    val recs = warcRecs(60)
    // a raw-content dictionary: the common boilerplate of the fixture
    // bodies, so dictionary-compressed frames really DO back-reference it
    val dict = ("<html><body><p>doc NNN " + ("pad " * 50) +
      "&amp; text</p></body></html>HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html\r\n").getBytes("UTF-8")
    val expect = Warc.parse(1L,
      Warc.encode(recs, zstdPerRecord = true)) // sans dictionary
    for (wrapped <- Seq(false, true)) {
      val dir = Files.createTempDirectory(s"warcdict$wrapped").toString
      val bytes = Warc.encode(recs, zstdPerRecord = true,
        zstdDictionary = Some(dict), zstdDictCompressed = wrapped)
      Files.write(Paths.get(s"$dir/seg.warc.zst"), bytes)
      val (nWhole, whole) = collectWarc(dir, 10L << 20)
      val (nSplit, split) = collectWarc(dir, 2048)
      assert(nWhole == 1 && nSplit > 3, s"wrapped=$wrapped: $nWhole/$nSplit")
      assert(whole == split, s"wrapped=$wrapped")
      assert(whole.map(r => (r.getAs[String]("target_uri"),
        r.getAs[String]("payload_text"))) ==
        expect.map(r => (r.targetUri, r.payloadText)), s"wrapped=$wrapped")
    }
  }

  test("warc zst: frames crossing the slab growth boundary (~4 MiB) size " +
      "correctly — synced walk AND resync probe (the r13 defect)") {
    // ~6 MiB of ~200 KiB low-redundancy bodies: several frames straddle
    // the 4 MiB GrowableSlab growth step in the whole-file partition
    val rnd = new scala.util.Random(42)
    val recs = (0 until 36).map { i =>
      Warc.WRecord("resource", targetUri = s"https://big.test/$i",
        body = new String(Array.fill(200 * 1024)(
          (33 + rnd.nextInt(94)).toChar)))
    }
    val dir = Files.createTempDirectory("warcbound4m").toString
    val bytes = Warc.encode(recs, zstdPerRecord = true)
    assert(bytes.length > (5 << 20), s"fixture too small: ${bytes.length}")
    Files.write(Paths.get(s"$dir/seg.warc.zst"), bytes)
    // whole-file: the synced walk must size every frame, including the
    // boundary-crossing ones (r13 refused these as 'truncated or corrupt')
    val (n1, whole) = collectWarc(dir, 32L << 20)
    assert(n1 == 1)
    assert(whole.length == 36)
    // split mid-file: resync probes must also survive boundary crossings
    // (r13 silently skipped members there)
    val (n2, split) = collectWarc(dir, 1L << 20)
    assert(n2 > 3, s"$n2")
    assert(split == whole)
    // one member BIGGER than a whole growth step: sizing must keep
    // growing the window until the full frame is loaded
    val big = Seq(Warc.WRecord("resource", targetUri = "https://huge.test/0",
      body = new String(Array.fill(5 * 1024 * 1024)(
        (33 + rnd.nextInt(94)).toChar)))) ++ warcRecs(3)
    val dir2 = Files.createTempDirectory("warcjumbo").toString
    Files.write(Paths.get(s"$dir2/seg.warc.zst"),
      Warc.encode(big, zstdPerRecord = true))
    val (_, rows) = collectWarc(dir2, 2L << 20)
    assert(rows.length == 5) // jumbo + warcinfo + 3 responses
    assert(rows.count(_.getAs[String]("target_uri") == "https://huge.test/0") == 1)
  }

  test("warc plain: line-start resync; split-size invariance and " +
      "reference parity") {
    val dir = warcDir(gz = false)
    val (nWhole, whole) = collectWarc(dir, 10L << 20)
    val (nSplit, split) = collectWarc(dir, 4096)
    assert(nWhole == 1 && nSplit > 2, s"$nWhole/$nSplit")
    assert(whole == split)
    val ref = Warc.parse(1L, Files.readAllBytes(
      Paths.get(new java.io.File(dir).listFiles().head.toString)))
    assert(split.length == ref.length)
    // plain rec_offset IS the reference decompressed-stream offset
    assert(split.map(_.getAs[Long]("rec_offset")) == ref.map(_.offset))
  }

  test("warc: column pruning reaches the reader (no payload decode when " +
      "payload_text is not required)") {
    val dir = warcDir(gz = true, n = 10)
    val df = spark.read.format("warc").load(dir)
      .select("warc_type", "http_status")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("payload_text"), plan)
    assert(df.count() == 11)
  }

  private def wdsFiles(n: Int): Seq[(String, Array[Byte])] =
    (0 until n).flatMap { i =>
      // every 5th sample gets a URL-length key → PAX chain in the shard
      val key = if (i % 5 == 0) f"d/${"u" * 120}%s-$i%04d" else f"d/$i%04d"
      Seq(s"$key.txt" -> s"text $i ${"filler " * (i % 20)}".getBytes("UTF-8"),
        s"$key.cls" -> s"${i % 3}".getBytes("UTF-8"))
    }

  private def collectWds(dir: String, split: Long)
      : (Int, Seq[org.apache.spark.sql.Row]) = {
    val df = spark.read.format("webdataset")
      .option("maxSplitBytes", split.toString).load(dir)
    (df.rdd.getNumPartitions,
      df.select(col("sample_key"), col("ext"), col("byte_size"),
          col("payload").cast("string").as("p"))
        .orderBy("sample_key", "ext").collect().toSeq)
  }

  test("webdataset plain tar: 512-aligned resync with PAX chains crossing " +
      "split boundaries; >1 partition; split-size invariance") {
    val dir = Files.createTempDirectory("wdssplit").toString
    Files.write(Paths.get(s"$dir/shard-0.tar"), Tar.encode(wdsFiles(120)))
    val (n1, whole) = collectWds(dir, 10L << 20)
    assert(n1 == 1)
    // sweep several split sizes so PAX chains land on boundaries in at
    // least one of them (headers are 512-aligned, chains span 2-3 blocks)
    for (split <- Seq(1024L, 1536L, 2048L, 4096L, 8192L)) {
      val (n, rows) = collectWds(dir, split)
      assert(n > 2, s"split=$split gave $n partitions")
      assert(rows == whole, s"split=$split differs")
    }
    // parity with the in-memory reference
    val ref = Tar.webdatasetSamples(
      {
        val sp = spark; import sp.implicits._
        Seq((0L, Files.readAllBytes(Paths.get(s"$dir/shard-0.tar"))))
          .toDF("id", "tar")
      }, "id", "tar")
      .select("sample_key", "ext", "byte_size")
      .orderBy("sample_key", "ext").collect().toSeq
    assert(whole.map(r => (r.getString(0), r.getString(1), r.getLong(2))) ==
      ref.map(r => (r.getString(0), r.getString(1), r.getLong(2))))
  }

  test("webdataset .tar.gz: single STREAMING partition, reference parity") {
    val dir = Files.createTempDirectory("wdsgz").toString
    Files.write(Paths.get(s"$dir/shard-0.tar.gz"),
      Tar.encode(wdsFiles(40), gzip = true))
    val df = spark.read.format("webdataset")
      .option("maxSplitBytes", "1024").load(dir)
    assert(df.rdd.getNumPartitions == 1) // one deflate stream: not seekable
    val rows = df.select(col("sample_key"), col("ext"),
        col("payload").cast("string").as("p"))
      .orderBy("sample_key", "ext").collect()
    assert(rows.length == 80)
    assert(rows.count(_.getAs[String]("sample_key").length > 100) == 16)
  }

  test("webdataset: global PAX ('g') refuses by name in a SPLIT scan, " +
      "applies in a whole-file scan") {
    val dir = Files.createTempDirectory("wdsg").toString
    val bo = new java.io.ByteArrayOutputStream()
    // 'g' entry + two regular members, hand-framed via the public writer
    // pieces: encode a normal shard, then splice a 'g' header in front
    val gRec = Tar.paxRecord("comment", "global state")
    val hdr = new Array[Byte](512)
    "pax-g".getBytes.copyToArray(hdr, 0)
    def put(off: Int, v: String): Unit =
      v.getBytes("US-ASCII").copyToArray(hdr, off)
    put(100, "0000644"); put(108, "0000000"); put(116, "0000000")
    put(124, f"${gRec.length}%011o"); put(136, "00000000000")
    hdr(156) = 'g'
    put(257, "ustar"); put(263, "00")
    (148 until 156).foreach(i => hdr(i) = ' ')
    val sum = hdr.map(_ & 0xFF).sum
    put(148, f"$sum%06o"); hdr(154) = 0; hdr(155) = ' '
    bo.write(hdr); bo.write(gRec)
    bo.write(new Array[Byte]((512 - gRec.length % 512) % 512))
    val body = Tar.encode(wdsFiles(40))
    bo.write(body)
    Files.write(Paths.get(s"$dir/shard-0.tar"), bo.toByteArray)
    // whole-file: fine
    val whole = spark.read.format("webdataset")
      .option("maxSplitBytes", (10L << 20).toString).load(dir)
    assert(whole.count() == 80)
    // split: named refusal
    val e = intercept[org.apache.spark.SparkException](
      spark.read.format("webdataset").option("maxSplitBytes", "2048")
        .load(dir).count())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("global PAX")), e.getMessage)
  }

  test("warc: corruption in a SYNCED sequential walk refuses by name " +
      "(never silently resync-skips records)") {
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    // gz: flip a byte inside the second member's deflate data
    val gzDir = Files.createTempDirectory("warccorr").toString
    val gz = Warc.encode(warcRecs(5), gzipPerRecord = true)
    val m2 = { // second member start = first 1F 8B after offset 3
      var p = 3
      while (!((gz(p) & 0xFF) == 0x1F && (gz(p + 1) & 0xFF) == 0x8B)) p += 1
      p
    }
    gz(m2 + 20) = (gz(m2 + 20) ^ 0x55).toByte
    Files.write(Paths.get(s"$gzDir/seg.warc.gz"), gz)
    val e1 = intercept[org.apache.spark.SparkException](
      spark.read.format("warc").load(gzDir).count())
    assert(msgs(e1).exists(m => m.contains("corrupt deflate") ||
      m.contains("CRC/ISIZE") || m.contains("truncated")), e1.getMessage)
    // plain: overwrite the second record's version line with junk
    val plDir = Files.createTempDirectory("warccorr2").toString
    val pl = Warc.encode(warcRecs(5))
    val second = Warc.parse(1L, pl)(1).offset.toInt
    "JUNK!".getBytes("US-ASCII").copyToArray(pl, second)
    Files.write(Paths.get(s"$plDir/seg.warc"), pl)
    val e2 = intercept[org.apache.spark.SparkException](
      spark.read.format("warc").load(plDir).count())
    assert(msgs(e2).exists(_.contains("version line")), e2.getMessage)
  }

  test("warc plain: a truncated or over-bound record refuses by name at " +
      "EVERY split size — resync must never silently drop real records") {
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    // cut the file mid-final-record payload: the split owning that
    // record's start (even one with no earlier record — the probe path)
    // must refuse, not skip
    val dir = Files.createTempDirectory("warctrunc").toString
    val pl = Warc.encode(warcRecs(10))
    val last = Warc.parse(1L, pl).last
    Files.write(Paths.get(s"$dir/seg.warc"),
      pl.take(last.offset.toInt + 60)) // inside the last record's headers/payload
    for (split <- Seq(100000L, 4096L, 1024L)) {
      val e = intercept[org.apache.spark.SparkException](
        spark.read.format("warc").option("maxSplitBytes", split.toString)
          .load(dir).count())
      assert(msgs(e).exists(m => m.contains("past end") ||
        m.contains("runs past end")), s"split=$split: ${e.getMessage}")
    }
    // a record over maxMemberBytes refuses even when the probe path
    // (mid-file split start) is the one that finds it
    val dir2 = Files.createTempDirectory("warcbound").toString
    Files.write(Paths.get(s"$dir2/seg.warc"), Warc.encode(
      Warc.WRecord("resource", body = "x" * 9000) +: warcRecs(3)))
    val e2 = intercept[org.apache.spark.SparkException](
      spark.read.format("warc").option("maxSplitBytes", "2048")
        .option("maxMemberBytes", "4096").load(dir2).count())
    assert(msgs(e2).exists(_.contains("maxMemberBytes")), e2.getMessage)
  }

  test("warc plain: a payload-embedded fake record header with NON-NUMERIC " +
      "Content-Length is a shape failure during resync, not a task crash") {
    // the fake "WARC/" sits at a line start inside a payload; a split
    // starting before it probes it and must treat it as not-a-record
    val fake = "WARC/1.0\r\nWARC-Type: junk\r\nContent-Length: NaN\r\n\r\n"
    val recs = Warc.WRecord("resource",
      body = ("filler line\n" * 40) + "\n" + fake + ("more\n" * 40)) +:
      warcRecs(6)
    val dir = Files.createTempDirectory("warcfake").toString
    Files.write(Paths.get(s"$dir/seg.warc"), Warc.encode(recs))
    val (_, whole) = collectWarc(dir, 10L << 20)
    for (split <- Seq(256L, 512L, 1024L)) {
      val (_, rows) = collectWarc(dir, split)
      assert(rows == whole, s"split=$split")
    }
    assert(whole.length == recs.length)
  }

  test("warc: a member inflating past maxMemberBytes refuses by name") {
    val dir = Files.createTempDirectory("warcbig").toString
    val big = Warc.encode(Seq(Warc.WRecord("resource",
      body = "x" * 100000)), gzipPerRecord = true)
    Files.write(Paths.get(s"$dir/seg.warc.gz"), big)
    val e = intercept[org.apache.spark.SparkException](
      spark.read.format("warc").option("maxMemberBytes", "4096")
        .load(dir).count())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("maxMemberBytes")), e.getMessage)
  }
}
