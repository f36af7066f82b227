package graft.functions

import scala.collection.mutable.ArrayBuffer

/** ZIP archive reader + writer (the PKWARE APPNOTE layout) — the
  * container of EPUB books, DOCX/ODT documents, JAR/APK artifacts, and
  * site-export archives in web crawls. Reading goes the correct way
  * round: find the end-of-central-directory record (backward scan over
  * the bounded comment region), walk the CENTRAL directory (the
  * authoritative index), then read each member through its local
  * header with the data descriptor irrelevant — the streaming-writer
  * local sizes may be zero, the central ones never are. Member CRC-32s
  * are verified on extraction (java.util.zip.CRC32 — ZIP uses the
  * standard reflected polynomial, so the JDK implementation IS the
  * interop pin here).
  *
  * In profile: methods 0 (store) and 8 (deflate, raw/nowrap streams),
  * data-descriptor members (flag bit 3), directory entries, and ZIP64
  * archives (EOCD64 locator + record, 0x0001 extra-field overrides for
  * sizes/offsets) — large EPUB/site exports and >65535-member archives
  * are routine in crawls, and the JDK itself writes ZIP64 past that
  * count (the interop pin). Out of profile and refused BY NAME:
  * encrypted members (flag bit 0), compression methods other than
  * store/deflate, multi-disk archives, CRC mismatches, missing/garbled
  * EOCD. */
object Zip {

  final case class ZipEntry(
      name: String,
      method: Int, // 0 store, 8 deflate
      compressedSize: Long,
      size: Long, // uncompressed
      crc32: Long,
      data: Array[Byte]) {
    def isDirectory: Boolean = name.endsWith("/")
  }

  /** One central-directory entry — the archive's own INDEX of a member
    * (`localOff` is the member's local header's absolute file offset),
    * which is what makes ZIP the cheaply-splittable archive format: no
    * resync needed, planning reads the directory and partitions
    * members by exact offsets ([[graft.sources.archive.ZipTable]]). */
  private[graft] final case class Central(
      idx: Int, name: String, method: Int, crc: Long,
      csize: Long, usize: Long, localOff: Long)

  private def u16At(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def u32At(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
  private def u64At(b: Array[Byte], o: Int): Long =
    u32At(b, o) | (u32At(b, o + 4) << 32)

  /** Locate the central directory from the file TAIL: EOCD backward
    * scan (bounded by the 65535-byte comment), ZIP64 locator + EOCD64
    * record when saturated. `readAt(off, len)` supplies extra bytes for
    * an EOCD64 record outside the tail window (absolute offsets) — the
    * whole-buffer path passes a slicer, the DSv2 planner a positioned
    * read. Returns (entry count, cd absolute offset). */
  private[graft] def locateDirectory(id: Long, tail: Array[Byte],
      tailBase: Long, fileLen: Long,
      readAt: (Long, Int) => Array[Byte]): (Int, Long) = {
    require(fileLen >= 22 && tail.length >= math.min(fileLen, 22L).toInt,
      s"zip $id: $fileLen bytes is no zip")
    val eocd = {
      var o = tail.length - 22
      val floor = math.max(0, tail.length - 22 - 65535)
      while (o >= floor && !(tail(o) == 'P' && tail(o + 1) == 'K' &&
        tail(o + 2) == 5 && tail(o + 3) == 6)) o -= 1
      require(o >= floor, {
        val fmt =
          if (tail.length >= 4 && tailBase > 0)
            "zip with no end-of-central-directory in the tail window"
          else if (tail.length >= 4 && tail(0) == 'P' && tail(1) == 'K')
            "zip with no end-of-central-directory (truncated?)"
          else "not a zip at all"
        s"zip $id: $fmt"
      })
      o
    }
    val nEntries16 = u16At(tail, eocd + 10)
    require(u16At(tail, eocd + 8) == nEntries16, // this-disk vs total
      s"zip $id: multi-disk archives out of profile")
    val cdOff32 = u32At(tail, eocd + 16)
    // ZIP64: saturated EOCD fields defer to the EOCD64 record, found
    // via the 20-byte locator that sits immediately before the EOCD.
    // The branch is taken only when the locator is ACTUALLY present
    // (the java.util.zip behavior): 0xFFFF is a legal literal entry
    // count, and an archive with exactly 65535 members and no ZIP64
    // structures must parse with the literal values
    val loc = eocd - 20
    val locatorPresent = loc >= 0 && tail(loc) == 'P' &&
      tail(loc + 1) == 'K' && tail(loc + 2) == 6 && tail(loc + 3) == 7
    if ((cdOff32 == 0xFFFFFFFFL || nEntries16 == 0xFFFF) && locatorPresent) {
      require(u32At(tail, loc + 16) == 1,
        s"zip $id: multi-disk archives out of profile")
      val e64 = u64At(tail, loc + 8)
      require(e64 >= 0 && e64 + 56 <= fileLen,
        s"zip $id: ZIP64 EOCD offset $e64 past end $fileLen")
      val rec =
        if (e64 >= tailBase)
          java.util.Arrays.copyOfRange(tail, (e64 - tailBase).toInt,
            math.min(tail.length.toLong, e64 - tailBase + 56).toInt)
        else readAt(e64, 56)
      require(rec.length >= 56 && rec(0) == 'P' && rec(1) == 'K' &&
        rec(2) == 6 && rec(3) == 6,
        s"zip $id: ZIP64 EOCD record missing at $e64")
      val n64 = u64At(rec, 32)
      require(n64 == u64At(rec, 24),
        s"zip $id: multi-disk archives out of profile")
      require(n64 <= Int.MaxValue, s"zip $id: $n64 entries")
      (n64.toInt, u64At(rec, 48))
    } else (nEntries16, cdOff32)
  }

  /** Walk `nEntries` central-directory entries in `bytes` starting at
    * index `cdStart` — ZIP64 0x0001 extras applied, encrypted/foreign-
    * method/bomb entries refused by name at this (planning) stage. */
  private[graft] def parseCentral(id: Long, bytes: Array[Byte],
      cdStart: Int, nEntries: Int): Seq[Central] = {
    val out = ArrayBuffer.empty[Central]
    var p = cdStart
    for (idx <- 0 until nEntries) {
      require(p + 46 <= bytes.length &&
        bytes(p) == 'P' && bytes(p + 1) == 'K' &&
        bytes(p + 2) == 1 && bytes(p + 3) == 2,
        s"zip $id: central directory lost sync at $p")
      val flags = u16At(bytes, p + 8)
      require((flags & 0x1) == 0,
        s"zip $id: encrypted member out of profile")
      val method = u16At(bytes, p + 10)
      require(method == 0 || method == 8, {
        val name = method match {
          case 1 => "shrink"; case 6 => "implode"; case 9 => "deflate64"
          case 12 => "bzip2"; case 14 => "lzma"; case 93 => "zstd"
          case 95 => "xz"; case 99 => "AES-encrypted"; case m => s"method $m"
        }
        s"zip $id: compression '$name' out of profile (store/deflate only)"
      })
      val crc = u32At(bytes, p + 16)
      val csize32 = u32At(bytes, p + 20)
      val usize32 = u32At(bytes, p + 24)
      val nameLen = u16At(bytes, p + 28); val extraLen = u16At(bytes, p + 30)
      val commentLen = u16At(bytes, p + 32)
      val localOff32 = u32At(bytes, p + 42)
      // ZIP64 extra field (id 0x0001): 8-byte overrides appear in the
      // fixed order usize, csize, localOff, disk — but ONLY for the
      // fields whose 32-bit form is saturated to 0xFFFFFFFF
      var usize = usize32
      var csize = csize32
      var localOff = localOff32
      if (usize32 == 0xFFFFFFFFL || csize32 == 0xFFFFFFFFL ||
          localOff32 == 0xFFFFFFFFL) {
        val extraStart = p + 46 + nameLen
        require(extraStart + extraLen <= bytes.length,
          s"zip $id: central entry extras at $p run past end")
        var q = extraStart
        var found = false
        while (!found && q + 4 <= extraStart + extraLen) {
          val fid = u16At(bytes, q); val flen = u16At(bytes, q + 2)
          require(q + 4 + flen <= extraStart + extraLen,
            s"zip $id: extra field 0x${fid.toHexString} overruns at $q")
          if (fid == 0x0001) {
            found = true
            var r = q + 4
            def take(saturated: Boolean, name: String): Long =
              if (!saturated) -1L
              else {
                require(r + 8 <= q + 4 + flen,
                  s"zip $id: ZIP64 extra too short for $name at $q")
                val v = u64At(bytes, r); r += 8; v
              }
            val u = take(usize32 == 0xFFFFFFFFL, "usize")
            val c = take(csize32 == 0xFFFFFFFFL, "csize")
            val l = take(localOff32 == 0xFFFFFFFFL, "localOff")
            if (u >= 0) usize = u
            if (c >= 0) csize = c
            if (l >= 0) localOff = l
          }
          q += 4 + flen
        }
        require(found,
          s"zip $id: saturated member fields but no ZIP64 extra at $p")
      }
      require(p + 46 + nameLen <= bytes.length,
        s"zip $id: central entry name at $p runs past end")
      val name = new String(bytes, p + 46, nameLen,
        java.nio.charset.StandardCharsets.UTF_8)
      // deflate's theoretical ceiling is 1032:1 — an uncompressed size
      // claiming more is a garbled directory (or a crafted bomb), and
      // must refuse by name BEFORE the allocation (a u32 near 2^32
      // would otherwise wrap toInt negative in `new Array`)
      require(usize <= Int.MaxValue - 8 &&
        (method == 0 || usize <= csize * 1100L + 64),
        s"zip $id: member '$name' claims $usize uncompressed from $csize " +
          "compressed bytes — garbled directory or decompression bomb")
      require(csize >= 0 && csize <= Int.MaxValue - 8,
        s"zip $id: member '$name' claims $csize compressed bytes — " +
          "garbled directory")
      require(localOff >= 0,
        s"zip $id: member '$name' has negative local offset $localOff")
      out += Central(idx, name, method, crc, csize, usize, localOff)
      p += 46 + nameLen + extraLen + commentLen
    }
    out.toSeq
  }

  /** The data offset inside a member slice starting at its local
    * header: PK\3\4 verified, then 30 + the LOCAL name/extra lengths
    * (they may differ from the central ones). */
  private[graft] def localDataOffset(id: Long, c: Central,
      local: Array[Byte], at: Int): Int = {
    require(at + 30 <= local.length && local(at) == 'P' && local(at + 1) == 'K' &&
      local(at + 2) == 3 && local(at + 3) == 4,
      s"zip $id: member '${c.name}' local header missing at ${c.localOff}")
    at + 30 + u16At(local, at + 26) + u16At(local, at + 28)
  }

  /** Inflate (or pass through) + CRC-verify one member's raw bytes. */
  private[graft] def inflateVerify(id: Long, c: Central,
      raw: Array[Byte]): Array[Byte] = {
    val data = c.method match {
      case 0 =>
        require(c.csize == c.usize,
          s"zip $id: stored member '${c.name}' sizes disagree " +
            s"(${c.csize} vs ${c.usize})")
        raw
      case 8 =>
        val inf = new java.util.zip.Inflater(true) // raw deflate
        inf.setInput(raw)
        val buf = new Array[Byte](c.usize.toInt)
        var got = 0
        try {
          while (got < c.usize && !inf.finished()) {
            val n = inf.inflate(buf, got, c.usize.toInt - got)
            if (n == 0 && inf.needsInput())
              throw new IllegalArgumentException(
                s"zip $id: member '${c.name}' deflate stream truncated")
            got += n
          }
        } catch {
          case e: java.util.zip.DataFormatException =>
            throw new IllegalArgumentException(
              s"zip $id: member '${c.name}' corrupt deflate: ${e.getMessage}")
        } finally inf.end()
        require(got == c.usize,
          s"zip $id: member '${c.name}' inflated to $got of ${c.usize} bytes")
        buf
    }
    val check = new java.util.zip.CRC32
    check.update(data)
    require(check.getValue == c.crc,
      f"zip $id: member '${c.name}' CRC mismatch (stored ${c.crc}%08x, " +
        f"computed ${check.getValue}%08x)")
    data
  }

  /** Parse every member via the central directory; CRCs verified. */
  def entries(id: Long, bytes: Array[Byte]): Seq[ZipEntry] = {
    val (nEntries, cdOff) = locateDirectory(id, bytes, 0L, bytes.length,
      (off, len) => java.util.Arrays.copyOfRange(bytes, off.toInt,
        math.min(bytes.length.toLong, off + len).toInt))
    // validated as LONGS before any toInt (garbled-EOCD hardening);
    // an EMPTY archive (0 members, EOCD only) is legal and yields no
    // entries — the 46-byte bound applies only when entries exist
    require(cdOff >= 0 && (nEntries == 0 || cdOff + 46 <= bytes.length),
      s"zip $id: central directory offset $cdOff past end ${bytes.length}")
    parseCentral(id, bytes, cdOff.toInt, nEntries).map { c =>
      require(c.localOff + 30 <= bytes.length,
        s"zip $id: local header offset ${c.localOff} past end ${bytes.length}")
      val dataOff = localDataOffset(id, c, bytes, c.localOff.toInt)
      require(dataOff + c.csize <= bytes.length,
        s"zip $id: member '${c.name}' claims ${c.csize} bytes past end")
      val raw = java.util.Arrays.copyOfRange(bytes, dataOff,
        (dataOff + c.csize).toInt)
      ZipEntry(c.name, c.method, c.csize, c.usize, c.crc,
        inflateVerify(id, c, raw))
    }
  }

  /** [[entries]] as a relational stage: one row per member. */
  def members(df: org.apache.spark.sql.DataFrame, idCol: String,
      binCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("entry_idx", IntegerType, nullable = false),
      StructField("name", StringType, nullable = false),
      StructField("method", IntegerType, nullable = false),
      StructField("byte_size", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    df.select(col(idCol).cast(LongType), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          entries(id, bytes).zipWithIndex.map { case (e, i) =>
            Row(id, i, e.name, e.method, e.size, e.data)
          }
        }
      }(Encoders.row(schema))
  }

  // ------------------------------------------------------------- write

  /** Emit a zip of (name, data, deflate?) members — local headers, the
    * central directory, EOCD. Writer-beside-reader for fixtures.
    * `zip64 = true` writes the ZIP64 layout unconditionally (saturated
    * 32-bit fields + 0x0001 extras + EOCD64 record and locator) — legal
    * per APPNOTE regardless of size, which is what lets small fixtures
    * exercise the large-archive code path byte-for-byte. */
  def encode(files: Seq[(String, Array[Byte], Boolean)],
      zip64: Boolean = false): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    def w16(v: Int): Unit = { out += (v & 0xFF).toByte; out += ((v >> 8) & 0xFF).toByte }
    def w32(v: Long): Unit = { w16((v & 0xFFFF).toInt); w16(((v >> 16) & 0xFFFF).toInt) }
    def w64(v: Long): Unit = { w32(v & 0xFFFFFFFFL); w32((v >>> 32) & 0xFFFFFFFFL) }
    val version = if (zip64) 45 else 20
    final case class Central(name: Array[Byte], method: Int, crc: Long,
      csize: Int, usize: Int, localOff: Int)
    val centrals = ArrayBuffer.empty[Central]
    files.foreach { case (name, data, deflate) =>
      val nameBytes = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val crc = { val c = new java.util.zip.CRC32; c.update(data); c.getValue }
      val packed = if (!deflate) data else {
        val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
        d.setInput(data); d.finish()
        val buf = new java.io.ByteArrayOutputStream(data.length + 32)
        val tmp = new Array[Byte](1 << 14)
        while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
        d.end()
        buf.toByteArray
      }
      val localOff = out.length
      w32(0x04034B50L); w16(version); w16(0); w16(if (deflate) 8 else 0)
      w16(0); w16(0) // time, date
      w32(crc)
      if (zip64) {
        w32(0xFFFFFFFFL); w32(0xFFFFFFFFL)
        w16(nameBytes.length); w16(20) // ZIP64 extra: usize + csize
        out ++= nameBytes
        w16(0x0001); w16(16); w64(data.length.toLong); w64(packed.length.toLong)
      } else {
        w32(packed.length.toLong); w32(data.length.toLong)
        w16(nameBytes.length); w16(0)
        out ++= nameBytes
      }
      out ++= packed
      centrals += Central(nameBytes, if (deflate) 8 else 0, crc,
        packed.length, data.length, localOff)
    }
    val cdStart = out.length
    centrals.foreach { c =>
      w32(0x02014B50L); w16(version); w16(version); w16(0); w16(c.method)
      w16(0); w16(0)
      w32(c.crc)
      if (zip64) {
        w32(0xFFFFFFFFL); w32(0xFFFFFFFFL)
        w16(c.name.length); w16(28); w16(0) // ZIP64 extra: u, c, off
        w16(0); w16(0); w32(0)
        w32(0xFFFFFFFFL)
        out ++= c.name
        w16(0x0001); w16(24)
        w64(c.usize.toLong); w64(c.csize.toLong); w64(c.localOff.toLong)
      } else {
        w32(c.csize.toLong); w32(c.usize.toLong)
        w16(c.name.length); w16(0); w16(0)
        w16(0); w16(0); w32(0)
        w32(c.localOff.toLong)
        out ++= c.name
      }
    }
    val cdSize = out.length - cdStart
    if (zip64) {
      val e64Off = out.length
      // ZIP64 EOCD record (56 bytes, no extensible data)
      w32(0x06064B50L); w64(44L); w16(45); w16(45)
      w32(0); w32(0)
      w64(centrals.length.toLong); w64(centrals.length.toLong)
      w64(cdSize.toLong); w64(cdStart.toLong)
      // locator
      w32(0x07064B50L); w32(0); w64(e64Off.toLong); w32(1)
      // saturated EOCD
      w32(0x06054B50L); w16(0); w16(0)
      w16(0xFFFF); w16(0xFFFF)
      w32(0xFFFFFFFFL); w32(0xFFFFFFFFL); w16(0)
    } else {
      w32(0x06054B50L); w16(0); w16(0)
      w16(centrals.length); w16(centrals.length)
      w32(cdSize.toLong); w32(cdStart.toLong); w16(0)
    }
    out.toArray
  }
}
