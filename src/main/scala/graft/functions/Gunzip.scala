package graft.functions

/** Shared compression sniff + inflate for the archive readers
  * ([[Warc]], [[Tar]], [[TfRecord]]): gzip (`GZIPInputStream` reads
  * across concatenated members — the Common Crawl per-record-member
  * layout as well as single-member .tar.gz/.tfrecord.gz) and zstd
  * (`ZstdInputStream` via the zstd-jni Spark ships, incl. multi-frame
  * streams — the .warc.zst / .tar.zst archive shapes). One copy, so a
  * future hardening (e.g. a decompression-bomb bound) lands once. */
private[functions] object Gunzip {

  def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B

  def isZstd(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && (bytes(0) & 0xFF) == 0x28 && (bytes(1) & 0xFF) == 0xB5 &&
      (bytes(2) & 0xFF) == 0x2F && (bytes(3) & 0xFF) == 0xFD

  /** Inflate all members/frames; input returned untouched when neither
    * magic matches. */
  def maybeInflate(bytes: Array[Byte]): Array[Byte] =
    if (isGzip(bytes)) drain(new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes)), bytes.length)
    else if (isZstd(bytes)) {
      val in = new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(bytes))
      in.setContinuous(true) // read across concatenated frames
      drain(in, bytes.length)
    } else bytes

  private def drain(in: java.io.InputStream, hint: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(hint * 4)
    val buf = new Array[Byte](1 << 16)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }
}
