package graft.functions

import scala.collection.mutable.ArrayBuffer

/** USTAR tar reader + writer (POSIX.1-1988 ustar, the format
  * WebDataset shards use) — tar-of-samples is THE standard multimodal
  * training-data shard layout (image.jpg + image.cls + image.json per
  * sample key, thousands of samples per shard, shards streamed
  * sequentially), so reading it IS the ingestion front door for
  * image/audio-text corpora, the way [[Warc]] is for text crawls.
  *
  * In profile: ustar headers (both the POSIX "ustar\0" and GNU
  * "ustar  " magics), octal and GNU base-256 sizes, checksum
  * verification, prefix-field name joining, regular files and
  * directories, gzip-wrapped archives (.tar.gz sniffed by magic), and
  * end-of-archive zero blocks. Out of profile and refused BY NAME:
  * GNU long-name/long-link entries ('L'/'K'), PAX extended headers
  * ('x'/'g'), sparse files, checksum mismatches, truncated data.
  *
  * [[webdatasetSamples]] applies the WebDataset convention on top: a
  * sample is every member sharing the basename up to the FIRST dot
  * (`dir/abc.seg.txt` → key `dir/abc`, extension `seg.txt`). */
object Tar {

  final case class TarEntry(
      name: String,
      typeflag: Char, // '0' file, '5' directory
      size: Long,
      offset: Long, // absolute offset of the entry's data
      data: Array[Byte])

  private def str(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    while (end < off + len && b(end) != 0) end += 1
    new String(b, off, end - off, "US-ASCII")
  }

  /** Octal field, or GNU base-256 when the top bit of the first byte is
    * set (sizes past 8 GiB). */
  private def numeric(id: Long, b: Array[Byte], off: Int, len: Int): Long =
    if ((b(off) & 0x80) != 0) {
      var v = (b(off) & 0x7FL)
      for (i <- 1 until len) v = (v << 8) | (b(off + i) & 0xFFL)
      v
    } else {
      val s = str(b, off, len).trim
      if (s.isEmpty) 0L
      else try java.lang.Long.parseLong(s, 8) catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"tar $id: unparseable octal field '$s' at $off")
      }
    }

  /** Parse every entry of a .tar / .tar.gz payload, checksums verified. */
  def entries(id: Long, bytes0: Array[Byte]): Seq[TarEntry] = {
    val bytes = Gunzip.maybeInflate(bytes0)
    require(bytes.length >= 512, s"tar $id: ${bytes.length} bytes is no tar")
    val out = ArrayBuffer.empty[TarEntry]
    var off = 0
    var done = false
    while (!done && off + 512 <= bytes.length) {
      if ((0 until 512).forall(i => bytes(off + i) == 0)) done = true // end block
      else {
        val magic = str(bytes, off + 257, 6)
        require(magic == "ustar" || magic == "ustar ",
          s"tar $id: entry at $off has magic '$magic', not ustar " +
            "(pre-POSIX v7 tar out of profile)")
        // checksum: header bytes with the chksum field read as spaces
        val stored = numeric(id, bytes, off + 148, 8)
        var sum = 0L
        for (i <- 0 until 512) {
          sum += (if (i >= 148 && i < 156) ' '.toInt else bytes(off + i) & 0xFF)
        }
        require(sum == stored,
          s"tar $id: checksum mismatch at $off (stored $stored, computed $sum)")
        val typeflag = {
          val t = bytes(off + 156).toChar
          if (t == 0) '0' else t
        }
        typeflag match {
          case 'L' | 'K' => throw new IllegalArgumentException(
            s"tar $id: GNU long-name entry ('$typeflag') out of profile")
          case 'x' | 'g' => throw new IllegalArgumentException(
            s"tar $id: PAX extended header ('$typeflag') out of profile")
          case _ =>
        }
        val prefix = if (magic == "ustar") str(bytes, off + 345, 155) else ""
        val name0 = str(bytes, off, 100)
        val name = if (prefix.nonEmpty) s"$prefix/$name0" else name0
        val size = numeric(id, bytes, off + 124, 12)
        val dataOff = off + 512
        require(dataOff + size <= bytes.length,
          s"tar $id: entry '$name' claims $size bytes past end")
        val data =
          if (typeflag == '0')
            java.util.Arrays.copyOfRange(bytes, dataOff, (dataOff + size).toInt)
          else Array.emptyByteArray
        out += TarEntry(name, typeflag, size, dataOff.toLong, data)
        off = dataOff + (((size + 511) / 512) * 512).toInt
      }
    }
    // a tar without end blocks is tolerated only when it ends EXACTLY at
    // the last entry's padded boundary — residual bytes mean a header or
    // padding was cut mid-block (a truncated shard silently losing
    // trailing samples is the failure mode this refuses)
    require(done || off == bytes.length,
      s"tar $id: archive truncated mid-entry " +
        s"(next block at $off, file ends at ${bytes.length})")
    out.toSeq
  }

  /** WebDataset view: one row per (sample key, extension) — the key is
    * the member name up to the FIRST dot after the last '/', so
    * `shard/0001.seg.txt` groups under `shard/0001` as ext `seg.txt`.
    * Directories are skipped; a file without a dot refuses by name
    * (not a WebDataset member). */
  def webdatasetSamples(df: org.apache.spark.sql.DataFrame, idCol: String,
      binCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("sample_key", StringType, nullable = false),
      StructField("ext", StringType, nullable = false),
      StructField("byte_size", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    df.select(col(idCol).cast(LongType), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          entries(id, bytes).iterator.filter(_.typeflag == '0').map { e =>
            val base = e.name.lastIndexOf('/') + 1
            val dot = e.name.indexOf('.', base)
            require(dot > base, s"tar $id: member '${e.name}' has no " +
              "extension — not a WebDataset sample member")
            Row(id, e.name.substring(0, dot), e.name.substring(dot + 1),
              e.size, e.data)
          }
        }
      }(Encoders.row(schema))
  }

  // ------------------------------------------------------------- write

  /** EXPORT a curated dataset as WebDataset shards — the output side of
    * the training pipeline (ingest is [[webdatasetSamples]]): rows of
    * (sample key, extension, payload bytes) land as `shard-<k>.tar`
    * files under `dir`, shard k = xxhash64(sample_key) mod `nShards`,
    * so a sample's members ALWAYS co-shard and a re-run over the same
    * rows is byte-deterministic (members sort by (key, ext) within the
    * shard). Each shard is assembled and written by its OWN task
    * through the Hadoop FS (the GridStore side-file discipline — no
    * driver collect, no shuffle beyond the one hash repartition); a
    * task buffers one shard, so `nShards` is the memory knob: size
    * shards to the usual 100 MB - 1 GB WebDataset convention. */
  def writeWebdatasetShards(
      df: org.apache.spark.sql.DataFrame,
      keyCol: String,
      extCol: String,
      payloadCol: String,
      dir: String,
      nShards: Int,
      gzip: Boolean = false): Unit = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.functions._
    require(nShards >= 1, s"nShards $nShards")
    val conf = new graft.sources.nc.SerializableHadoopConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val suffix = if (gzip) ".tar.gz" else ".tar"
    df.select(
        pmod(xxhash64(col(keyCol)), lit(nShards.toLong)).as("__shard"),
        col(keyCol).cast("string").as("__key"),
        col(extCol).cast("string").as("__ext"),
        col(payloadCol).cast("binary").as("__payload"))
      .repartition(nShards, col("__shard"))
      .sortWithinPartitions("__shard", "__key", "__ext")
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
        Encoders.STRING, Encoders.BINARY))
      .foreachPartition { it: Iterator[(Long, String, String, Array[Byte])] =>
        // a partition may carry several shard ids (hash collisions in
        // the repartition) — rows arrive shard-sorted, so cut on change
        val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf.value)
        // write-to-temp + rename keyed by the task ATTEMPT, so a retried
        // or speculative attempt never interleaves bytes into the final
        // file — last rename wins with identical (deterministic) content
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        var current = -1L
        val files = ArrayBuffer.empty[(String, Array[Byte])]
        def flush(): Unit = if (current >= 0 && files.nonEmpty) {
          val finalP = new org.apache.hadoop.fs.Path(s"$dir/shard-$current$suffix")
          val tmpP = new org.apache.hadoop.fs.Path(
            s"$dir/.shard-$current$suffix.attempt$attempt.tmp")
          val out = fs.create(tmpP, true)
          try out.write(Tar.encode(files.toSeq, gzip)) finally out.close()
          if (fs.exists(finalP)) fs.delete(finalP, false)
          require(fs.rename(tmpP, finalP),
            s"webdataset export: rename $tmpP -> $finalP failed")
          files.clear()
        }
        it.foreach { case (shard, key, ext, payload) =>
          if (shard != current) { flush(); current = shard }
          files += (s"$key.$ext" -> payload)
        }
        flush()
      }
  }

  /** Emit a ustar archive of (name, data) files; `gzip = true` wraps it
    * (.tar.gz). Writer-beside-reader for the scan fixtures. */
  def encode(files: Seq[(String, Array[Byte])], gzip: Boolean = false): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    files.foreach { case (name, data) =>
      require(name.length <= 100, s"name '$name' needs the prefix field")
      val hdr = new Array[Byte](512)
      def put(off: Int, s: String): Unit =
        s.getBytes("US-ASCII").copyToArray(hdr, off)
      put(0, name)
      put(100, "0000644"); put(108, "0000000"); put(116, "0000000")
      put(124, f"${data.length}%011o")
      put(136, "00000000000")
      hdr(156) = '0'
      put(257, "ustar"); put(263, "00"); put(265, "graft"); put(297, "graft")
      // checksum with the field as spaces, then write it
      (148 until 156).foreach(i => hdr(i) = ' ')
      val sum = hdr.map(_ & 0xFF).sum
      put(148, f"$sum%06o"); hdr(154) = 0; hdr(155) = ' '
      out ++= hdr
      out ++= data
      val pad = (512 - data.length % 512) % 512
      (0 until pad).foreach(_ => out += 0)
    }
    (0 until 1024).foreach(_ => out += 0) // two end blocks
    val tar = out.toArray
    if (!gzip) tar
    else {
      val bo = new java.io.ByteArrayOutputStream(tar.length)
      val gz = new java.util.zip.GZIPOutputStream(bo)
      gz.write(tar); gz.close()
      bo.toByteArray
    }
  }
}
