package graft.sources.zarr

import java.time.LocalDateTime

import graft.SparkSpec
import graft.meta.{JArr, JObj, JStr, JValue}
import graft.sources.zarr.ZarrMeta.ZArrayMeta

/** Zarr v3 metadata: `zarr.json` group/array documents (consolidated and
  * per-directory), `c/`-prefixed chunk keys, v3 codec chains — gated by
  * PARITY with an equivalent v2 store through the same scan, plus
  * ZarrStore attrs patching on a v3 store (store.py:229-262 reads/writes
  * both formats the same way). */
class ZarrV3Spec extends SparkSpec {

  private val conf = spark.sparkContext.hadoopConfiguration

  /** time(5) × x(4) grid with a fill hole at (1,2) — the ZarrScanSpec v2
    * roundtrip fixture, rebuilt as a v3 store. */
  private def v3ArrayDoc(name: String, shape: Seq[Int], chunks: Seq[Int],
      dtype: String, fill: JValue, dims: Seq[String],
      extraAttrs: Seq[(String, JValue)] = Seq.empty): JObj =
    JObj(Seq(
      "zarr_format" -> graft.meta.JNum(3),
      "node_type" -> JStr("array"),
      "shape" -> JArr(shape.map(s => graft.meta.JNum(s))),
      "data_type" -> JStr(dtype),
      "chunk_grid" -> JObj(Seq(
        "name" -> JStr("regular"),
        "configuration" -> JObj(Seq(
          "chunk_shape" -> JArr(chunks.map(c => graft.meta.JNum(c))))))),
      "chunk_key_encoding" -> JObj(Seq(
        "name" -> JStr("default"),
        "configuration" -> JObj(Seq("separator" -> JStr("/"))))),
      "fill_value" -> fill,
      "codecs" -> JArr(Seq(
        JObj(Seq("name" -> JStr("bytes"),
          "configuration" -> JObj(Seq("endian" -> JStr("little"))))),
        JObj(Seq("name" -> JStr("gzip"),
          "configuration" -> JObj(Seq("level" -> graft.meta.JNum(1))))))),
      "attributes" -> JObj(extraAttrs),
      "dimension_names" -> JArr(dims.map(JStr(_)))))

  /** Writes both stores; returns (v2 dir, v3 dir, consolidatedV3). */
  private def buildStores(tag: String, consolidated: Boolean): (String, String) = {
    val base = s"${System.getProperty("java.io.tmpdir")}/zarr_v3_$tag"
    graft.store.GridStore.fileSystem(spark, base)
      .delete(new org.apache.hadoop.fs.Path(base), true)
    val v2 = s"$base/v2"
    val v3 = s"$base/v3"
    val vals = Array.tabulate(20)(i => if (i == 6) Double.NaN else i * 10.0)

    // ---- v2 store (the proven ZarrIO path)
    val codec = ZarrCodec.GzipCodec(1)
    val tMeta2 = ZArrayMeta(Seq(5), Seq(5), ZarrMeta.parseDtype("<i8"), codec,
      None, ".", JObj(Seq("_ARRAY_DIMENSIONS" -> JArr(Seq(JStr("time"))),
        "units" -> JStr("hours since 2024-06-01T00:00:00"))))
    val xMeta2 = ZArrayMeta(Seq(4), Seq(4), ZarrMeta.parseDtype("<f8"), codec,
      None, ".", JObj(Seq("_ARRAY_DIMENSIONS" -> JArr(Seq(JStr("x"))))))
    val vMeta2 = ZArrayMeta(Seq(5, 4), Seq(2, 3), ZarrMeta.parseDtype("<f8"),
      codec, Some(Double.NaN), ".",
      JObj(Seq("_ARRAY_DIMENSIONS" -> JArr(Seq(JStr("time"), JStr("x"))))))
    ZarrIO.writeArray(conf, v2, "time", tMeta2, Array.tabulate(5)(_.toDouble))
    ZarrIO.writeArray(conf, v2, "x", xMeta2, Array(0.5, 1.5, 2.5, 3.5))
    ZarrIO.writeArray(conf, v2, "v", vMeta2, vals)
    ZarrIO.writeGroupMetadata(conf, v2, JObj(Seq.empty),
      Seq("time" -> tMeta2, "x" -> xMeta2, "v" -> vMeta2))

    // ---- v3 store: same grid, v3 documents + c/-prefixed chunk keys
    val tDoc = v3ArrayDoc("time", Seq(5), Seq(5), "int64", graft.meta.JNull,
      Seq("time"), Seq("units" -> JStr("hours since 2024-06-01T00:00:00")))
    val xDoc = v3ArrayDoc("x", Seq(4), Seq(4), "float64", graft.meta.JNull, Seq("x"))
    val vDoc = v3ArrayDoc("v", Seq(5, 4), Seq(2, 3), "float64", JStr("NaN"),
      Seq("time", "x"))
    val entries = Seq("time" -> tDoc, "x" -> xDoc, "v" -> vDoc)
    val rootDoc = JObj(Seq(
      "zarr_format" -> graft.meta.JNum(3),
      "node_type" -> JStr("group"),
      "attributes" -> JObj(Seq("title" -> JStr("v3 parity fixture")))) ++
      (if (consolidated)
        Seq("consolidated_metadata" -> (JObj(Seq(
          "metadata" -> JObj(entries.map { case (k, v) => k -> (v: JValue) }),
          "kind" -> JStr("inline"))): JValue))
      else Seq.empty))
    ZarrIO.writeUtf8(conf, s"$v3/zarr.json", rootDoc.render)
    // arrays + chunks through the SAME writer — v3 metas (keyPrefix "c")
    // route writeArray to per-array zarr.json documents and c/-keys
    def v3Meta(doc: JObj): ZArrayMeta = ZarrMeta.parseV3Array(doc)
    ZarrIO.writeArray(conf, v3, "time", v3Meta(tDoc), Array.tabulate(5)(_.toDouble))
    ZarrIO.writeArray(conf, v3, "x", v3Meta(xDoc), Array(0.5, 1.5, 2.5, 3.5))
    ZarrIO.writeArray(conf, v3, "v", v3Meta(vDoc), vals)
    (v2, v3)
  }

  private def parity(tag: String, consolidated: Boolean): Unit = {
    val (v2, v3) = buildStores(tag, consolidated)
    val a = spark.read.format("zarr").load(v2).orderBy("time", "x").collect()
    val b = spark.read.format("zarr").load(v3).orderBy("time", "x").collect()
    assert(a.length == 20 && b.length == 20)
    assert(a.toSeq == b.toSeq, "v3 scan must equal the v2 scan row-for-row")
    assert(b(6).isNullAt(2), "fill hole must surface as null in v3 too")
  }

  test("consolidated v3 store scans identically to its v2 twin") {
    parity("cons", consolidated = true)
  }

  test("unconsolidated v3 store resolves per-array zarr.json documents") {
    parity("plain", consolidated = false)
  }

  test("ZarrStore attrs read/patch work on a v3 store (W8 parity)") {
    val (_, v3) = buildStores("attrs", consolidated = true)
    val store = new graft.store.ZarrStore(spark,
      v3, graft.model.DatasetDescriptor("t", "v", spatialDims = Seq("x"),
        timeResolution = graft.model.TimeSpan.Daily))
    assert(store.hasExisting)
    assert(store.readAttrs()("title") == "v3 parity fixture")
    store.patchAttrs(Map("provenance" -> "unit-test",
      graft.store.GridStore.UpdateInProgressKey -> "true"))
    assert(store.readAttrs()("provenance") == "unit-test")
    assert(store.readAttrs()("title") == "v3 parity fixture") // preserved
    // the concurrency guard reads through the same v3 path
    intercept[IllegalStateException](store.checkNotInProgress())
    store.patchAttrs(Map(graft.store.GridStore.UpdateInProgressKey -> "false"))
    store.checkNotInProgress()
    // the rest of zarr.json survives patching: the store still scans
    assert(spark.read.format("zarr").load(v3).count() == 20)
  }

  test("region insert updates a v3 store IN PLACE, honoring its CF units") {
    // the fixture axis is "hours since 2024-06-01" int64 — the update path
    // must map it to epoch-micros before classifying insert vs append
    val (_, v3) = buildStores("update", consolidated = true)
    val store = new graft.store.ZarrStore(spark,
      v3, graft.model.DatasetDescriptor("t", "v", spatialDims = Seq("x"),
        timeResolution = graft.model.TimeSpan.Daily))
    val sp = spark; import sp.implicits._
    val upd = Seq((ts("2024-06-01T01:00:00"), 2.5, 7777.0))
      .toDF("time", "x", "v")
    store.publish(upd)
    val rows = spark.read.format("zarr").load(v3)
      .orderBy("time", "x").collect()
    assert(rows.length == 20, "grid extent unchanged by a pure insert")
    // row (t=1h, x=2.5) is linear index 6 — the NaN hole, now overwritten
    assert(rows(6).getDouble(2) == 7777.0)
    assert(rows(5).getDouble(2) == 50.0, "neighbors in the same chunk keep their values")
    assert(rows(7).getDouble(2) == 70.0)
    // marker cleared; metadata still v3 (no v2 sidecars appeared)
    store.checkNotInProgress()
    val fs = graft.store.GridStore.fileSystem(spark, v3)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$v3/.zattrs")),
      "an update must not leak v2 sidecars into a v3 store")
  }

  test("ZarrStore publishes a NEW v3 store; append butt-joins; v2 twin is row-identical") {
    val sp = spark; import sp.implicits._
    val base = s"${System.getProperty("java.io.tmpdir")}/zarr_v3_lifecycle"
    graft.store.GridStore.fileSystem(spark, base)
      .delete(new org.apache.hadoop.fs.Path(base), true)
    val desc = graft.model.DatasetDescriptor("life", "v",
      spatialDims = Seq("x"), timeResolution = graft.model.TimeSpan.Daily)
    def frame(days: Range, bump: Double) = days.flatMap { d =>
      (0 until 4).map(x => (ts(f"2024-06-${d + 1}%02dT00:00:00"), x.toDouble, d * 10.0 + x + bump))
    }.toDF("time", "x", "v")

    val stores = Seq(2, 3).map { fmt =>
      val p = s"$base/v$fmt"
      // v3 twin writes zstd — zarr-python 3's default compressor — so the
      // row-identity check also pins the zstd chunk path end-to-end
      val st = new graft.store.ZarrStore(spark, p, desc, timeChunk = 4,
        spatialChunks = Some(Seq(4)), zarrFormat = fmt,
        codec = if (fmt == 3) ZarrCodec.ZstdCodec(3) else ZarrCodec.ZlibCodec(1))
      st.publish(frame(0 until 6, 0.0)) // initial: 6 days → tail chunk half-full
      st.publish(frame(4 until 9, 0.5)) // insert days 4-5 + append 6-8 (butt-join)
      (fmt, p, st)
    }
    val Seq((_, p2, _), (_, p3, st3)) = stores
    // v3 store must be pure v3 on disk
    val fs = graft.store.GridStore.fileSystem(spark, p3)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$p3/zarr.json")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$p3/.zattrs")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$p3/v/.zarray")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$p3/v/c/1/0")),
      "v3 chunk keys are c/-prefixed")
    st3.checkNotInProgress()
    assert(st3.readAttrs()("dataset_name") == "life")
    val a = spark.read.format("zarr").load(p2).orderBy("time", "x").collect()
    val b = spark.read.format("zarr").load(p3).orderBy("time", "x").collect()
    assert(a.length == 36 && a.toSeq == b.toSeq,
      "v2 and v3 lifecycles must produce row-identical datasets")
    // the butt-joined tail chunk kept pre-update rows AND overlaid ones
    val m = b.map(r => (r.getAs[LocalDateTime](0).getDayOfMonth, r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(m((3, 1.0)) == 21.0) // untouched initial row
    assert(m((5, 2.0)) == 42.5) // insert overlaid
    assert(m((9, 3.0)) == 83.5) // appended
  }

  test("time axis decodes as CF timestamps through v3 dimension_names/attrs") {
    val (_, v3) = buildStores("time", consolidated = true)
    val rows = spark.read.format("zarr").load(v3).orderBy("time", "x").collect()
    assert(rows.head.getAs[LocalDateTime]("time") ==
      LocalDateTime.parse("2024-06-01T00:00"))
    assert(rows.last.getAs[LocalDateTime]("time") ==
      LocalDateTime.parse("2024-06-01T04:00"))
  }

  test("crc32c checksum codec: [bytes, zstd, crc32c] chain scans; corruption " +
      "fails loudly, never as wrong cells") {
    val base = s"${System.getProperty("java.io.tmpdir")}/zarr_v3_crc"
    graft.store.GridStore.fileSystem(spark, base)
      .delete(new org.apache.hadoop.fs.Path(base), true)
    def doc(name: String, shape: Seq[Int], chunks: Seq[Int], dtype: String,
        dims: Seq[String]): JObj = {
      val b = v3ArrayDoc(name, shape, chunks, dtype, graft.meta.JNull, dims)
      JObj(b.fields.map {
        case ("codecs", _) => "codecs" -> (JArr(Seq(
          JObj(Seq("name" -> JStr("bytes"),
            "configuration" -> JObj(Seq("endian" -> JStr("little"))))),
          JObj(Seq("name" -> JStr("zstd"),
            "configuration" -> JObj(Seq("level" -> graft.meta.JNum(3))))),
          JObj(Seq("name" -> JStr("crc32c"))))): JValue)
        case kv => kv
      })
    }
    val xDoc = doc("x", Seq(4), Seq(2), "float64", Seq("x"))
    val vDoc = doc("v", Seq(4), Seq(2), "float64", Seq("x"))
    ZarrIO.writeUtf8(conf, s"$base/zarr.json", JObj(Seq(
      "zarr_format" -> graft.meta.JNum(3), "node_type" -> JStr("group"),
      "attributes" -> JObj(Seq.empty))).render)
    ZarrIO.writeArray(conf, base, "x", ZarrMeta.parseV3Array(xDoc),
      Array(0.0, 1.0, 2.0, 3.0))
    ZarrIO.writeArray(conf, base, "v", ZarrMeta.parseV3Array(vDoc),
      Array(10.0, 20.0, 30.0, 40.0))
    val rows = spark.read.format("zarr").load(base).orderBy("x")
      .select("v").collect().map(_.getDouble(0)).toSeq
    assert(rows == Seq(10.0, 20.0, 30.0, 40.0))
    // flip one byte inside a chunk object: the checksum must catch it
    val fs = graft.store.GridStore.fileSystem(spark, base)
    val chunk = new org.apache.hadoop.fs.Path(s"$base/v/c/0")
    val bytes = {
      val in = fs.open(chunk)
      try in.readAllBytes() finally in.close()
    }
    bytes(0) = (bytes(0) ^ 0x41).toByte
    val out = fs.create(chunk, true)
    try out.write(bytes) finally out.close()
    val err = intercept[Throwable] {
      spark.read.format("zarr").load(base).orderBy("x").collect()
    }
    val msgs = Iterator.iterate(err)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("crc32c mismatch"), s"unexpected chain: $msgs")
  }
}
