package graft.functions

import graft.SparkSpec

/** ZIP reader/writer with JDK interop pins BOTH directions (the
  * TiffInteropSpec discipline — java.util.zip is an independent
  * implementation): our reader consumes ZipOutputStream archives
  * (which use data-descriptor members, exercising the
  * central-directory-is-authoritative path), and ZipInputStream
  * consumes our writer's output. Plus CRC verification and refusals
  * by name. */
class ZipSpec extends SparkSpec {

  private val files = Seq(
    ("docs/a.txt", "hello zip world".getBytes("US-ASCII"), false),
    ("docs/b.txt", Array.tabulate(5000)(i => (i % 61 + 32).toByte), true),
    ("c.bin", Array.tabulate(256)(_.toByte), true))

  test("own writer roundtrips store + deflate with verified CRCs") {
    val out = Zip.entries(1L, Zip.encode(files))
    assert(out.map(_.name) == files.map(_._1))
    assert(out.map(_.method) == Seq(0, 8, 8))
    out.zip(files).foreach { case (e, (_, data, _)) =>
      assert(e.data.sameElements(data), e.name)
      assert(e.size == data.length)
    }
    // deflate genuinely compressed the low-entropy member
    assert(out(1).compressedSize < out(1).size)
  }

  test("INTEROP: JDK ZipOutputStream archives (data-descriptor members) parse") {
    val bo = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bo)
    files.foreach { case (name, data, _) =>
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(data)
      z.closeEntry()
    }
    z.close()
    val out = Zip.entries(2L, bo.toByteArray)
    assert(out.map(_.name) == files.map(_._1))
    out.zip(files).foreach { case (e, (_, data, _)) =>
      assert(e.data.sameElements(data), e.name)
    }
  }

  test("INTEROP: the JDK ZipInputStream reads our writer's output") {
    val zi = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(Zip.encode(files)))
    files.foreach { case (name, data, _) =>
      val entry = zi.getNextEntry
      assert(entry.getName == name)
      val got = zi.readAllBytes()
      assert(got.sameElements(data), name)
    }
    assert(zi.getNextEntry == null)
  }

  test("refusals are by name: encrypted, foreign methods, CRC, ZIP64, junk") {
    val good = Zip.encode(files)
    // central directory starts after the members; find first PK\1\2
    val cd = (0 until good.length - 3).find(o =>
      good(o) == 'P' && good(o + 1) == 'K' && good(o + 2) == 1 &&
        good(o + 3) == 2).get
    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    val eEnc = intercept[IllegalArgumentException](
      Zip.entries(3L, patched(c => c(cd + 8) = 1)))
    assert(eEnc.getMessage.contains("encrypted"), eEnc.getMessage)
    val eMeth = intercept[IllegalArgumentException](
      Zip.entries(4L, patched(c => c(cd + 10) = 93)))
    assert(eMeth.getMessage.contains("zstd"), eMeth.getMessage)
    val eCrc = intercept[IllegalArgumentException](
      Zip.entries(5L, patched(c => c(cd + 16) = (c(cd + 16) ^ 0x3C).toByte)))
    assert(eCrc.getMessage.contains("CRC mismatch"), eCrc.getMessage)
    val eZip64 = intercept[IllegalArgumentException](
      Zip.entries(6L, patched { c =>
        (0 until 4).foreach(i => c(cd + 20 + i) = 0xFF.toByte)
      }))
    assert(eZip64.getMessage.contains("ZIP64"), eZip64.getMessage)
    val eJunk = intercept[IllegalArgumentException](
      Zip.entries(7L, Array.fill[Byte](100)(0x41)))
    assert(eJunk.getMessage.contains("not a zip"), eJunk.getMessage)
  }

  test("ZIP64 layout roundtrips: saturated fields + 0x0001 extras + " +
      "EOCD64 record/locator; JDK ZipFile reads our zip64 output") {
    val bytes = Zip.encode(files, zip64 = true)
    val out = Zip.entries(30L, bytes)
    assert(out.map(_.name) == files.map(_._1))
    out.zip(files).foreach { case (e, (_, data, _)) =>
      assert(e.data.sameElements(data), e.name)
      assert(e.size == data.length)
    }
    // INTEROP: the JDK's ZipFile (independent ZIP64 implementation)
    val f = java.io.File.createTempFile("z64", ".zip")
    java.nio.file.Files.write(f.toPath, bytes)
    val zf = new java.util.zip.ZipFile(f)
    try {
      val names = scala.jdk.CollectionConverters.EnumerationHasAsScala(
        zf.entries()).asScala.map(_.getName).toSeq
      assert(names == files.map(_._1))
      val e = zf.getEntry(files(1)._1)
      val got = zf.getInputStream(e).readAllBytes()
      assert(got.sameElements(files(1)._2))
    } finally { zf.close(); f.delete() }
  }

  test("INTEROP: a JDK archive with >65535 entries (ZIP64 EOCD) parses " +
      "with every member accounted for") {
    val bo = new java.io.ByteArrayOutputStream(1 << 23)
    val zo = new java.util.zip.ZipOutputStream(bo)
    zo.setLevel(java.util.zip.Deflater.NO_COMPRESSION)
    val n = 65600 // past the 16-bit count: JDK switches to ZIP64
    var i = 0
    while (i < n) {
      zo.putNextEntry(new java.util.zip.ZipEntry(f"m$i%06d"))
      if (i % 5000 == 0) zo.write(i.toString.getBytes("US-ASCII"))
      zo.closeEntry()
      i += 1
    }
    zo.close()
    val out = Zip.entries(31L, bo.toByteArray)
    assert(out.length == n)
    assert(out.head.name == "m000000" && out.last.name == f"m${n - 1}%06d")
    assert(new String(out(5000).data, "US-ASCII") == "5000")
  }

  test("garbled u32 offsets/sizes refuse by name, never wrap toInt " +
      "(cdOff past 2 GiB, localOff past end, bomb-sized usize)") {
    val good = Zip.encode(files)
    val eocd = good.length - 22 // writer emits no comment
    val cd = (0 until good.length - 3).find(o =>
      good(o) == 'P' && good(o + 1) == 'K' && good(o + 2) == 1 &&
        good(o + 3) == 2).get
    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    def putU32(c: Array[Byte], o: Int, v: Long): Unit =
      (0 until 4).foreach(i => c(o + i) = ((v >> (8 * i)) & 0xFF).toByte)
    // EOCD central-directory offset > 2 GiB: would wrap negative toInt
    val eCd = intercept[IllegalArgumentException](
      Zip.entries(20L, patched(c => putU32(c, eocd + 16, 0x80000010L))))
    assert(eCd.getMessage.contains("central directory offset"), eCd.getMessage)
    // central entry's local-header offset past end
    val eLo = intercept[IllegalArgumentException](
      Zip.entries(21L, patched(c => putU32(c, cd + 42, 0x80000010L))))
    assert(eLo.getMessage.contains("local header offset"), eLo.getMessage)
    // uncompressed size near 2^32 on a deflate member: must refuse before
    // allocating (NegativeArraySizeException is exactly the unnamed crash)
    val deflCd = { // files(1) is the deflate member; walk one entry forward
      val nameLen = (good(cd + 28) & 0xFF) | ((good(cd + 29) & 0xFF) << 8)
      cd + 46 + nameLen
    }
    val eBomb = intercept[IllegalArgumentException](
      Zip.entries(22L, patched(c => putU32(c, deflCd + 24, 0xFFFFFFF0L))))
    assert(eBomb.getMessage.contains("bomb"), eBomb.getMessage)
  }

  test("EMPTY archives (EOCD only) parse to zero entries — legal, not " +
      "a refusal") {
    assert(Zip.entries(40L, Zip.encode(Seq.empty)).isEmpty)
  }

  test("an archive with exactly 65535 members and NO ZIP64 structures " +
      "parses with the literal EOCD values (0xFFFF is a legal count)") {
    val many = (0 until 65535).map(i => (f"$i%05d", Array.empty[Byte], false))
    val out = Zip.entries(41L, Zip.encode(many))
    assert(out.length == 65535)
    assert(out.head.name == "00000" && out.last.name == "65534")
  }

  test("members() relational stage: one row per member") {
    val sp = spark; import sp.implicits._
    val df = Seq((8L, Zip.encode(files))).toDF("id", "zip")
    val rows = Zip.members(df, "id", "zip").orderBy("entry_idx").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("byte_size")).toSeq ==
      files.map(_._2.length.toLong))
  }
}
