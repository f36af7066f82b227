package graft.functions

import scala.collection.mutable.ArrayBuffer

/** TFRecord reader + writer — the TensorFlow training-shard framing
  * (documented in the TensorFlow source: `tensorflow/core/lib/io/
  * record_writer`): each record is [u64-LE length][u32-LE masked
  * CRC32C of the length bytes][payload][u32-LE masked CRC32C of the
  * payload], with mask(crc) = ((crc >> 15) | (crc << 17)) + 0xa282ead8.
  * With [[Warc]] (text crawls) and [[Tar.webdatasetSamples]]
  * (multimodal shards) this completes the training-shard ingestion
  * triad. Payloads are opaque bytes (usually tf.Example protos —
  * downstream's concern, the [[Mp4]] codec-agnostic stance).
  *
  * Both CRCs are VERIFIED per record (java.util.zip.CRC32C is the
  * Castagnoli polynomial TFRecord uses — the JDK is the interop pin);
  * .tfrecord.gz payloads inflate by magic. Mismatches and truncation
  * refuse by name. */
object TfRecord {

  final case class Record(offset: Long, data: Array[Byte])

  private def maskedCrc(bytes: Array[Byte], from: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32C
    c.update(bytes, from, len)
    val crc = c.getValue
    (((crc >>> 15) | (crc << 17)) + 0xa282ead8L) & 0xFFFFFFFFL
  }

  /** Parse every record of a .tfrecord / .tfrecord.gz payload. */
  def records(id: Long, bytes0: Array[Byte]): Seq[Record] = {
    val bytes = Gunzip.maybeInflate(bytes0)
    def u32le(o: Int): Long = (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
      ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
    def u64le(o: Int): Long = u32le(o) | (u32le(o + 4) << 32)
    val out = ArrayBuffer.empty[Record]
    var off = 0
    while (off < bytes.length) {
      require(off + 12 <= bytes.length,
        s"tfrecord $id: truncated length header at $off")
      val len = u64le(off)
      require(len >= 0 && off + 12 + len + 4 <= bytes.length,
        s"tfrecord $id: record at $off claims $len bytes past end")
      val wantLenCrc = maskedCrc(bytes, off, 8)
      require(u32le(off + 8) == wantLenCrc,
        f"tfrecord $id: length CRC mismatch at $off " +
          f"(stored ${u32le(off + 8)}%08x, computed $wantLenCrc%08x)")
      val dataOff = off + 12
      val wantDataCrc = maskedCrc(bytes, dataOff, len.toInt)
      require(u32le(dataOff + len.toInt) == wantDataCrc,
        f"tfrecord $id: data CRC mismatch at $off " +
          f"(stored ${u32le(dataOff + len.toInt)}%08x, computed $wantDataCrc%08x)")
      out += Record(off.toLong,
        java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + len.toInt))
      off = dataOff + len.toInt + 4
    }
    out.toSeq
  }

  /** [[records]] as a relational stage: one row per record. */
  def recordTable(df: org.apache.spark.sql.DataFrame, idCol: String,
      binCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("rec_idx", IntegerType, nullable = false),
      StructField("byte_offset", LongType, nullable = false),
      StructField("byte_size", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    df.select(col(idCol).cast(LongType), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          records(id, bytes).zipWithIndex.map { case (r, i) =>
            Row(id, i, r.offset, r.data.length.toLong, r.data)
          }
        }
      }(Encoders.row(schema))
  }

  // ------------------------------------------------------------- write

  /** Emit records with both masked CRCs; `gzip = true` wraps the file. */
  def encode(payloads: Seq[Array[Byte]], gzip: Boolean = false): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    def w32(v: Long): Unit = (0 until 4).foreach(i =>
      out += ((v >> (8 * i)) & 0xFF).toByte)
    payloads.foreach { p =>
      val lenBytes = new Array[Byte](8)
      (0 until 8).foreach(i => lenBytes(i) = ((p.length.toLong >> (8 * i)) & 0xFF).toByte)
      out ++= lenBytes
      w32(maskedCrc(lenBytes, 0, 8))
      out ++= p
      w32(maskedCrc(p, 0, p.length))
    }
    val raw = out.toArray
    if (!gzip) raw
    else {
      val bo = new java.io.ByteArrayOutputStream(raw.length)
      val gz = new java.util.zip.GZIPOutputStream(bo)
      gz.write(raw); gz.close()
      bo.toByteArray
    }
  }
}
