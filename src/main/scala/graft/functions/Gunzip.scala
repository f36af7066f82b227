package graft.functions

/** Shared compression sniff + inflate for the archive readers
  * ([[Warc]], [[Tar]], [[TfRecord]]): gzip (`GZIPInputStream` reads
  * across concatenated members — the Common Crawl per-record-member
  * layout as well as single-member .tar.gz/.tfrecord.gz) and zstd
  * (`ZstdInputStream` via the zstd-jni Spark ships, incl. multi-frame
  * streams — the .warc.zst / .tar.zst archive shapes). One copy, so a
  * future hardening (e.g. a decompression-bomb bound) lands once. */
private[graft] object Gunzip {

  def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B

  /** Standard frame magic 28 B5 2F FD, or a skippable frame
    * 5x 2A 4D 18 — real .warc.zst archives often LEAD with a skippable
    * frame (dictionary/index conventions). */
  def isZstd(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && (
      ((bytes(0) & 0xFF) == 0x28 && (bytes(1) & 0xFF) == 0xB5 &&
        (bytes(2) & 0xFF) == 0x2F && (bytes(3) & 0xFF) == 0xFD) ||
      ((bytes(0) & 0xF0) == 0x50 && (bytes(1) & 0xFF) == 0x2A &&
        (bytes(2) & 0xFF) == 0x4D && (bytes(3) & 0xFF) == 0x18))

  /** Inflate all members/frames; input returned untouched when neither
    * magic matches. TRUNCATION refuses by name on both paths: gzip's
    * stream throws EOFException itself, but ZstdInputStream silently
    * returns a partial prefix on a cut-off frame (verified against the
    * shipped zstd-jni), so the zstd path first walks the frame index —
    * every frame's compressed size must land inside the input. */
  def maybeInflate(bytes: Array[Byte]): Array[Byte] =
    if (isGzip(bytes)) drain(new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes)), bytes.length)
    else if (isZstd(bytes)) {
      var off = 0L
      while (off < bytes.length) {
        val csize =
          try com.github.luben.zstd.Zstd.findFrameCompressedSize(bytes, off.toInt)
          catch {
            case e: com.github.luben.zstd.ZstdException =>
              throw new IllegalArgumentException(
                s"truncated or corrupt zstd frame at offset $off: ${e.getMessage}")
          }
        require(csize > 0 && off + csize <= bytes.length,
          s"zstd frame at offset $off claims $csize bytes past end ${bytes.length}")
        off += csize
      }
      val in = new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(bytes))
      in.setContinuous(true)
      drain(in, bytes.length)
    } else bytes

  private def drain(in: java.io.InputStream, hint: Int): Array[Byte] = {
    // initial capacity only (the buffer grows): cap so a large shard's
    // hint cannot overflow Int or eagerly burn 4x its compressed size
    val initial = math.max(1 << 16, math.min(hint.toLong * 4, 1L << 26).toInt)
    val out = new java.io.ByteArrayOutputStream(initial)
    val buf = new Array[Byte](1 << 16)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }
}
