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

  test(".tar.zst archives inflate by magic (zstd, incl. multi-frame)") {
    val tar = Tar.encode(files)
    val half = tar.length / 2
    // two concatenated zstd frames — the seekable/chunked archive shape
    val zst = com.github.luben.zstd.Zstd.compress(tar.take(half), 3) ++
      com.github.luben.zstd.Zstd.compress(tar.drop(half), 3)
    val out = Tar.entries(11L, zst)
    assert(out.map(_.name) == files.map(_._1))
    out.zip(files).foreach { case (e, (_, data)) =>
      assert(e.data.sameElements(data), e.name)
    }
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

  test("writeWebdatasetShards: members co-shard by key, output is " +
      "byte-deterministic, gzip shards re-ingest") {
    val sp = spark; import sp.implicits._
    val members = (0 until 40).flatMap { k =>
      Seq((f"s$k%03d", "txt", s"text $k".getBytes("UTF-8")),
        (f"s$k%03d", "cls", s"${k % 3}".getBytes("UTF-8")))
    }.toDF("key", "ext", "payload")
    val dir = java.nio.file.Files.createTempDirectory("wdsout").toString
    Tar.writeWebdatasetShards(members, "key", "ext", "payload", dir,
      nShards = 4, gzip = true)
    // (Hadoop's local FS also writes hidden .crc side files — skip them,
    // exactly as binaryFile does on re-ingest)
    val shardFiles = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted
    assert(shardFiles.nonEmpty &&
      shardFiles.forall(_.matches("shard-\\d+\\.tar\\.gz")), shardFiles.toSeq)
    // re-ingest: every member comes back, and each sample's two members
    // sit in the SAME shard file
    val bin = spark.read.format("binaryFile").load(dir)
      .select(org.apache.spark.sql.functions.col("path"),
        org.apache.spark.sql.functions.col("content"))
      .collect()
    val byShard = bin.flatMap { r =>
      Tar.entries(1L, r.getAs[Array[Byte]]("content"))
        .map(e => (r.getAs[String]("path"), e.name))
    }
    assert(byShard.length == 80)
    byShard.groupBy(_._2.split("\\.")(0)).foreach { case (key, ms) =>
      assert(ms.map(_._1).distinct.length == 1, s"$key split across shards")
    }
    // byte-determinism: a second run produces identical shard bytes
    val dir2 = java.nio.file.Files.createTempDirectory("wdsout2").toString
    Tar.writeWebdatasetShards(members.repartition(7), "key", "ext", "payload",
      dir2, nShards = 4, gzip = true)
    shardFiles.foreach { f =>
      val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/$f"))
      val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir2/$f"))
      assert(java.util.Arrays.equals(a, b), s"$f differs across runs")
    }
  }

  test("writeWebdatasetShards refuses duplicate (key, ext) rows by name " +
      "(duplicate identity would break byte-determinism across attempts)") {
    val sp = spark; import sp.implicits._
    val members = Seq(
      ("s001", "txt", "one".getBytes("UTF-8")),
      ("s001", "txt", "two".getBytes("UTF-8")), // same identity, different bytes
      ("s002", "txt", "ok".getBytes("UTF-8"))).toDF("key", "ext", "payload")
    val dir = java.nio.file.Files.createTempDirectory("wdsdup").toString
    val e = intercept[org.apache.spark.SparkException](
      Tar.writeWebdatasetShards(members, "key", "ext", "payload", dir, nShards = 2))
    assert(e.getMessage.contains("duplicate sample member") ||
      Option(e.getCause).exists(_.getMessage.contains("duplicate sample member")),
      e.getMessage)
  }

  test("non-ASCII member names roundtrip as UTF-8 bytes") {
    val files2 = Seq("caf\u00e9.txt" -> "x".getBytes("UTF-8"),
      "caf\u00e4.txt" -> "y".getBytes("UTF-8"))
    val out = Tar.entries(12L, Tar.encode(files2))
    assert(out.map(_.name) == files2.map(_._1)) // distinct, not 'caf?'
  }

  test("truncated zstd archives refuse by name (no silent partial prefix)") {
    val tar = Tar.encode(files)
    val zst = com.github.luben.zstd.Zstd.compress(tar, 3)
    val e = intercept[IllegalArgumentException](
      Tar.entries(13L, zst.dropRight(7)))
    assert(e.getMessage.toLowerCase.contains("zstd"), e.getMessage)
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
