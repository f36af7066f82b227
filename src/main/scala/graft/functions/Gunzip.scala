package graft.functions

/** Shared gzip sniff + inflate for the archive readers ([[Warc]],
  * [[Tar]], [[TfRecord]]): `GZIPInputStream` reads across concatenated
  * members, which is exactly the Common Crawl per-record-member layout
  * as well as the single-member .tar.gz/.tfrecord.gz shapes. One copy,
  * so a future hardening (e.g. a decompression-bomb bound) lands once. */
private[functions] object Gunzip {

  def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B

  /** Inflate all members; input returned untouched when not gzip. */
  def maybeInflate(bytes: Array[Byte]): Array[Byte] =
    if (!isGzip(bytes)) bytes
    else {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    }
}
