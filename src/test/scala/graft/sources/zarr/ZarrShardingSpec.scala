package graft.sources.zarr

import java.nio.{ByteBuffer, ByteOrder}
import java.time.LocalDateTime

import graft.SparkSpec
import graft.meta.{JArr, JNum, JObj, JStr, JValue}

/** Zarr v3 `sharding_indexed` read path: each stored object is a shard of
  * separately-gzip'd inner chunks plus a trailing (offset, nbytes) u64-LE
  * index guarded by CRC32C — the layout zarr-python v3 writes for
  * cloud-optimized stores. The fixture is built byte-for-byte from the v3
  * sharding spec; missing inner chunks and missing whole shards must both
  * surface as fill (null), and the index CRC must be verified. */
class ZarrShardingSpec extends SparkSpec {

  private val conf = spark.sparkContext.hadoopConfiguration

  // time(10) × x(4) grid, shard (4,4), inner (2,2):
  //  - shard c/0/0 rows 0-3: inner (1,1) MISSING → rows 2-3 × cols 2-3 null
  //  - shard c/1/0 rows 4-7: all four inner chunks present
  //  - shard c/2/0 rows 8-9: whole shard object ABSENT → rows 8-9 null
  private val NT = 10
  private val NX = 4
  private def value(t: Int, x: Int): Double = t * 40.0 + x * 10.0

  private def innerChunkBytes(t0: Int, x0: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 8).order(ByteOrder.LITTLE_ENDIAN)
    for (t <- t0 until t0 + 2; x <- x0 until x0 + 2)
      bb.putDouble(if (t < NT && x < NX) value(t, x) else Double.NaN)
    ZarrCodec.GzipCodec(1).encode(bb.array())
  }

  /** Build one shard: present inner chunks (row-major inner coords) +
    * index (+ CRC32C), index at `end` unless `atStart`. */
  private def shardBytes(tShard: Int, present: Seq[(Int, Int)],
      atStart: Boolean = false): Array[Byte] = {
    val chunks = present.map { case (ci, cj) =>
      (ci, cj) -> innerChunkBytes(tShard * 4 + ci * 2, cj * 2)
    }.toMap
    val index = ByteBuffer.allocate(4 * 16 + 4).order(ByteOrder.LITTLE_ENDIAN)
    val body = new java.io.ByteArrayOutputStream()
    val headroom = if (atStart) 4 * 16 + 4 else 0
    for (ci <- 0 until 2; cj <- 0 until 2) chunks.get((ci, cj)) match {
      case Some(b) =>
        index.putLong(headroom + body.size().toLong); index.putLong(b.length.toLong)
        body.write(b)
      case None =>
        index.putLong(-1L); index.putLong(-1L)
    }
    val crc = new java.util.zip.CRC32C
    crc.update(index.array(), 0, 4 * 16)
    index.putInt(crc.getValue.toInt)
    if (atStart) index.array() ++ body.toByteArray
    else body.toByteArray ++ index.array()
  }

  private def arrayDoc(indexLocation: String): String = JObj(Seq(
    "zarr_format" -> JNum(3),
    "node_type" -> JStr("array"),
    "shape" -> JArr(Seq(JNum(NT), JNum(NX))),
    "data_type" -> JStr("float64"),
    "chunk_grid" -> JObj(Seq(
      "name" -> JStr("regular"),
      "configuration" -> JObj(Seq(
        "chunk_shape" -> JArr(Seq(JNum(4), JNum(4))))))),
    "chunk_key_encoding" -> JObj(Seq(
      "name" -> JStr("default"),
      "configuration" -> JObj(Seq("separator" -> JStr("/"))))),
    "fill_value" -> JStr("NaN"),
    "codecs" -> JArr(Seq(JObj(Seq(
      "name" -> JStr("sharding_indexed"),
      "configuration" -> JObj(Seq(
        "chunk_shape" -> JArr(Seq(JNum(2), JNum(2))),
        "codecs" -> JArr(Seq(
          JObj(Seq("name" -> JStr("bytes"),
            "configuration" -> JObj(Seq("endian" -> JStr("little"))))),
          JObj(Seq("name" -> JStr("gzip"),
            "configuration" -> JObj(Seq("level" -> JNum(1))))))),
        "index_codecs" -> JArr(Seq(
          JObj(Seq("name" -> JStr("bytes"),
            "configuration" -> JObj(Seq("endian" -> JStr("little"))))),
          JObj(Seq("name" -> JStr("crc32c"))))),
        "index_location" -> JStr(indexLocation))))))),
    "dimension_names" -> JArr(Seq(JStr("time"), JStr("x"))))).render

  private def buildStore(tag: String, indexLocation: String = "end"): String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/zarr_shard_$tag"
    graft.store.GridStore.fileSystem(spark, root)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    ZarrIO.writeUtf8(conf, s"$root/zarr.json", JObj(Seq(
      "zarr_format" -> JNum(3),
      "node_type" -> JStr("group"),
      "attributes" -> JObj(Seq("title" -> JStr("sharded fixture"))))).render)
    // coordinate arrays: plain (unsharded) v3
    val tDoc = JObj(Seq(
      "zarr_format" -> JNum(3), "node_type" -> JStr("array"),
      "shape" -> JArr(Seq(JNum(NT))), "data_type" -> JStr("int64"),
      "chunk_grid" -> JObj(Seq("name" -> JStr("regular"),
        "configuration" -> JObj(Seq("chunk_shape" -> JArr(Seq(JNum(NT))))))),
      "chunk_key_encoding" -> JObj(Seq("name" -> JStr("default"),
        "configuration" -> JObj(Seq("separator" -> JStr("/"))))),
      "fill_value" -> graft.meta.JNull,
      "codecs" -> JArr(Seq(JObj(Seq("name" -> JStr("bytes"),
        "configuration" -> JObj(Seq("endian" -> JStr("little"))))))),
      "attributes" -> JObj(Seq(
        "units" -> JStr("hours since 2024-06-01T00:00:00"))),
      "dimension_names" -> JArr(Seq(JStr("time")))))
    val xDoc = JObj(Seq(
      "zarr_format" -> JNum(3), "node_type" -> JStr("array"),
      "shape" -> JArr(Seq(JNum(NX))), "data_type" -> JStr("float64"),
      "chunk_grid" -> JObj(Seq("name" -> JStr("regular"),
        "configuration" -> JObj(Seq("chunk_shape" -> JArr(Seq(JNum(NX))))))),
      "chunk_key_encoding" -> JObj(Seq("name" -> JStr("default"),
        "configuration" -> JObj(Seq("separator" -> JStr("/"))))),
      "fill_value" -> graft.meta.JNull,
      "codecs" -> JArr(Seq(JObj(Seq("name" -> JStr("bytes"),
        "configuration" -> JObj(Seq("endian" -> JStr("little"))))))),
      "dimension_names" -> JArr(Seq(JStr("x")))))
    ZarrIO.writeArray(conf, root, "time", ZarrMeta.parseV3Array(tDoc),
      Array.tabulate(NT)(_.toDouble))
    ZarrIO.writeArray(conf, root, "x", ZarrMeta.parseV3Array(xDoc),
      Array(0.5, 1.5, 2.5, 3.5))
    // sharded data variable
    ZarrIO.writeUtf8(conf, s"$root/v/zarr.json", arrayDoc(indexLocation))
    val atStart = indexLocation == "start"
    val all = Seq((0, 0), (0, 1), (1, 0), (1, 1))
    writeBytes(s"$root/v/c/0/0", shardBytes(0, all.filterNot(_ == (1, 1)), atStart))
    writeBytes(s"$root/v/c/1/0", shardBytes(1, all, atStart))
    // shard c/2/0 intentionally absent
    root
  }

  private def writeBytes(path: String, bytes: Array[Byte]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val out = p.getFileSystem(conf).create(p, true)
    try out.write(bytes) finally out.close()
  }

  private def checkScan(root: String): Unit = {
    val rows = spark.read.format("zarr").load(root)
      .orderBy("time", "x").collect()
    assert(rows.length == NT * NX)
    rows.foreach { r =>
      val t = r.getAs[LocalDateTime]("time").getHour +
        (r.getAs[LocalDateTime]("time").getDayOfMonth - 1) * 24
      val x = ((r.getDouble(1) - 0.5)).toInt
      val expectNull = t >= 8 || (t >= 2 && t <= 3 && x >= 2)
      if (expectNull) assert(r.isNullAt(2), s"cell ($t, $x) must be fill")
      else assert(r.getDouble(2) == value(t, x), s"cell ($t, $x)")
    }
  }

  test("sharded v3 store scans: ranged inner-chunk reads, missing chunk AND missing shard → null") {
    checkScan(buildStore("end"))
  }

  test("index_location=start variant resolves the same grid") {
    checkScan(buildStore("start", indexLocation = "start"))
  }

  test("chunk pruning only touches shards overlapping the predicate") {
    val root = buildStore("prune")
    val df = spark.read.format("zarr").load(root)
      .filter(org.apache.spark.sql.functions.col("time") <
        java.sql.Timestamp.valueOf("2024-06-01 02:00:00"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("chunksRead: 2"),
      s"rows 0-1 live in 2 inner chunks of shard c/0/0:\n$plan")
    assert(df.count() == 8)
  }

  test("a corrupted shard index fails the CRC32C check loudly") {
    val root = buildStore("crc")
    val path = new org.apache.hadoop.fs.Path(s"$root/v/c/0/0")
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(path); try in.readFully(0, bytes) finally in.close()
    bytes(len.toInt - 12) = (bytes(len.toInt - 12) ^ 0x41).toByte // inside index body
    writeBytes(s"$root/v/c/0/0", bytes)
    val ex = intercept[Exception] {
      spark.read.format("zarr").load(root).collect()
    }
    def chain(e: Throwable): Seq[String] =
      if (e == null) Seq.empty else e.getMessage +: chain(e.getCause)
    assert(chain(ex).exists(m => m != null && m.contains("CRC32C")), chain(ex).mkString(" | "))
  }
}
