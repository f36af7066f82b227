package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, 1, 2)
  private val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 9, 9)

  test("sniffFormat recognizes magic bytes without decoding") {
    val df = Seq((1L, png), (2L, jpeg), (3L, "plain text".getBytes)).toDF("id", "media")
    val out = df.select(col("id"), Multimodal.sniffFormat(col("media")))
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L) == Some("png") && out(2L) == Some("jpeg") && out(3L).isEmpty)
  }

  test("mediaMeta carries byte length, content hash, format") {
    val df = Seq((1L, png), (2L, png)).toDF("id", "media")
    val rows = df.select(Multimodal.mediaMeta(col("media")).as("m"))
      .select("m.byte_len", "m.content_hash", "m.format").collect()
    assert(rows(0).getLong(0) == png.length.toLong)
    assert(rows(0).getLong(1) == rows(1).getLong(1)) // same bytes, same hash
    assert(rows(0).getString(2) == "png")
  }

  test("mediaFingerprint: identical bytes equal, different bytes differ") {
    val df = Seq((1L, png), (2L, png), (3L, jpeg)).toDF("id", "media")
    val fp = df.select(Multimodal.mediaFingerprint(col("media"))).as[Long].collect()
    assert(fp(0) == fp(1) && fp(0) != fp(2))
  }

  test("frameSample splits payload into n contiguous windows covering all bytes") {
    val bytes = (0 until 100).map(_.toByte).toArray
    val df = Seq((7L, bytes)).toDF("id", "media")
    val frames = Multimodal.frameSample(df, "id", "media", 4)
      .orderBy("frame_idx").collect()
    assert(frames.length == 4)
    val joined = frames.flatMap(_.getAs[Array[Byte]]("frame_bytes"))
    assert(joined.toSeq == bytes.toSeq) // lossless partition of the stream
  }

  test("decodeResize: stub decoder runs per-partition with fixed output shape") {
    val df = Seq((1L, "abc".getBytes), (2L, "xyz".getBytes)).toDF("id", "media")
    val decoded = Multimodal.decodeResize(df, "id", "media", 8, 4).collect()
    assert(decoded.length == 2)
    decoded.foreach { d =>
      assert(d.width == 8 && d.height == 4 && d.pixels.length == 32)
      assert(d.pixels.forall(p => p >= 0.0f && p <= 1.0f))
    }
    // determinism: same bytes → same pixels
    val again = Multimodal.decodeResize(df, "id", "media", 8, 4).collect()
    assert(decoded.map(_.pixels.toSeq).toSeq == again.map(_.pixels.toSeq).toSeq)
  }

  test("pooledEmbedding produces dim-length mean pools in [0,1]") {
    val df = Seq((1L, "hello world".getBytes)).toDF("id", "media")
    val emb = Multimodal.pooledEmbedding(
      Multimodal.decodeResize(df, "id", "media", 16, 16), 8)
      .select("embedding").as[Seq[Double]].head()
    assert(emb.length == 8)
    assert(emb.forall(v => v >= 0.0 && v <= 1.0))
  }
}
