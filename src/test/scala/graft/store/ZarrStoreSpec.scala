package graft.store

import java.time.LocalDateTime

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.{DatasetDescriptor, TimeSpan}

/** ZarrStore lifecycle: initial publish → append (tail chunk butt-join) →
  * region insert → reopen through the `zarr` DSv2 scan — `update_zarr`'s
  * machinery (publish.py:322-553) on the native format. */
class ZarrStoreSpec extends SparkSpec {

  private val desc = DatasetDescriptor("test_grid", "value",
    spatialDims = Seq("latitude", "longitude"), timeResolution = TimeSpan.Daily)

  private def freshStore(tag: String, timeChunk: Int = 8): ZarrStore = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_zarrstore_$tag"
    GridStore.fileSystem(spark, path).delete(new HPath(path), true)
    new ZarrStore(spark, path, desc, timeChunk = timeChunk)
  }

  private def listChunks(store: ZarrStore, array: String): Set[String] = {
    val fs = GridStore.fileSystem(spark, store.path)
    val dir = new HPath(s"${store.path}/$array")
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir).map(_.getPath.getName).filterNot(_.startsWith(".")).toSet
  }

  test("initial publish round-trips bit-exact through the zarr scan") {
    val store = freshStore("initial")
    val grid = dailyGrid(1, 10)
    store.publish(grid)
    assert(store.hasExisting)
    assert(collectSet(store.dataset().select("time", "latitude", "longitude", "value"))
      == collectSet(grid))
    // 10 days / chunk of 8 → time chunks 0 and 1; spatial extent is one chunk
    assert(listChunks(store, "value") == Set("0.0.0", "1.0.0"))
    // commit marker cleared
    assert(store.readAttrs()(GridStore.UpdateInProgressKey) == "false")
  }

  test("append butt-joins the partial tail chunk instead of bridging chunks") {
    val store = freshStore("append")
    store.publish(dailyGrid(1, 10)) // days 1-10 → indices 0-9, chunk 1 partial (8-9)
    val fs = GridStore.fileSystem(spark, store.path)
    val untouched = new HPath(s"${store.path}/value/0.0.0")
    val mtime0 = fs.getFileStatus(untouched).getModificationTime
    store.publish(dailyGrid(11, 10, base = 100.0)) // days 11-20 → indices 10-19
    // extended axis: chunks 1 (merged tail) and 2; chunk 0 untouched
    assert(listChunks(store, "value") == Set("0.0.0", "1.0.0", "2.0.0"))
    assert(fs.getFileStatus(untouched).getModificationTime == mtime0,
      "untouched chunk must not be rewritten")
    val expect = dailyGrid(1, 10).unionByName(dailyGrid(11, 10, base = 100.0))
    assert(collectSet(store.dataset().select("time", "latitude", "longitude", "value"))
      == collectSet(expect))
  }

  test("region insert overlays only the touched chunks and keeps other cells") {
    val store = freshStore("insert")
    store.publish(dailyGrid(1, 20))
    // overwrite days 9-11 (indices 8-10: spans the chunk 1 boundary)
    store.publish(dailyGrid(9, 3, base = 1000.0))
    val expect = dailyGrid(1, 20)
      .filter(!col("time").between(ts("2024-01-09T00:00:00"), ts("2024-01-11T00:00:00")))
      .unionByName(dailyGrid(9, 3, base = 1000.0))
    assert(collectSet(store.dataset().select("time", "latitude", "longitude", "value"))
      == collectSet(expect))
  }

  test("insert + append in one update (the q43 shape) matches combine-first semantics") {
    val store = freshStore("mixed")
    store.publish(dailyGrid(1, 20))
    store.publish(dailyGrid(15, 11, base = 1000.0)) // 15-20 insert, 21-25 append
    val expect = dailyGrid(1, 14).unionByName(dailyGrid(15, 11, base = 1000.0))
    assert(collectSet(store.dataset().select("time", "latitude", "longitude", "value"))
      == collectSet(expect))
  }

  test("sub-second timestamps survive the axis round-trip (microsecond resolution)") {
    val sp = spark; import sp.implicits._
    val store = freshStore("micros")
    val t0 = LocalDateTime.parse("2024-01-01T00:00:00.123456")
    val rows = (0 until 3).flatMap { i =>
      Seq((t0.plusSeconds(i).plusNanos(500000000L * (i % 2)), 10.0, 100.0, i * 1.0))
    }
    store.publish(rows.toDF("time", "latitude", "longitude", "value"))
    // publishing the SAME coordinates again must classify as pure insert
    // (no new axis points) — with a second-truncated axis this would throw
    store.publish(rows.toDF("time", "latitude", "longitude", "value")
      .withColumn("value", col("value") + 10.0))
    val got = store.dataset().select("time", "value").orderBy("time").collect()
    assert(got.map(_.getAs[LocalDateTime]("time")).toSeq ==
      rows.map(_._1).sorted(Ordering.fromLessThan[LocalDateTime](_ isBefore _)))
    assert(got.map(_.getAs[Double]("value")).toSeq == Seq(10.0, 11.0, 12.0))
  }

  test("non-contiguous append before the store end is refused") {
    val store = freshStore("refuse")
    store.publish(dailyGrid(5, 10)) // days 5-14
    val ex = intercept[IllegalArgumentException] {
      store.publish(dailyGrid(1, 2)) // days 1-2: before the axis start
    }
    assert(ex.getMessage.contains("neither an existing coordinate"))
  }

  test("off-grid spatial values are refused") {
    val store = freshStore("offgrid")
    store.publish(dailyGrid(1, 5))
    val sp = spark; import sp.implicits._
    val bad = Seq((ts("2024-01-03T00:00:00"), 99.0, 100.0, 1.0))
      .toDF("time", "latitude", "longitude", "value")
    val ex = intercept[IllegalArgumentException](store.publish(bad))
    assert(ex.getMessage.contains("off the existing grid"))
  }

  test("concurrency guard: update_in_progress=true blocks further updates") {
    val store = freshStore("guard")
    store.publish(dailyGrid(1, 5))
    store.patchAttrs(Map(GridStore.UpdateInProgressKey -> "true"))
    val ex = intercept[IllegalStateException](store.publish(dailyGrid(6, 2)))
    assert(ex.getMessage.contains("update_in_progress"))
  }

  test("a failed write clears the commit marker") {
    val store = freshStore("failmark")
    store.publish(dailyGrid(1, 5))
    // corrupt an existing chunk: the update's merge read then fails INSIDE
    // the distributed job, after the marker went up
    val fs = GridStore.fileSystem(spark, store.path)
    val out = fs.create(new HPath(s"${store.path}/value/0.0.0"), true)
    out.write(Array[Byte](1, 2, 3)); out.close()
    intercept[Exception](store.publish(dailyGrid(2, 1, base = 50.0)))
    assert(store.readAttrs()(GridStore.UpdateInProgressKey) == "false",
      "failed update must clear the marker")
  }

  test("rebuild wipes stale chunks so old data cannot resurface") {
    val store = freshStore("rebuild")
    store.publish(dailyGrid(1, 20)) // chunks 0,1,2
    store.publish(dailyGrid(1, 5), rebuild = true) // only chunk 0 remains
    assert(listChunks(store, "value") == Set("0.0.0"))
    assert(collectSet(store.dataset().select("time", "latitude", "longitude", "value"))
      == collectSet(dailyGrid(1, 5)))
  }

  test("metadata-only attr patch survives and consolidated doc stays in sync") {
    val store = freshStore("attrs")
    store.publish(dailyGrid(1, 3))
    store.patchAttrs(Map("provenance" -> "unit-test", "version" -> "7"))
    assert(store.readAttrs()("provenance") == "unit-test")
    // the consolidated document is what the scan's resolve reads first —
    // reopen and confirm the store still scans (metadata not corrupted)
    assert(store.dataset().count() == 12)
    val conf = spark.sparkContext.hadoopConfiguration
    val resolved = graft.sources.zarr.ZarrMeta.resolveDirectory(conf, store.path)
    assert(resolved.attrs.get("provenance").contains(graft.meta.JStr("unit-test")))
  }

  test("blosc-lz4 store (the reference's default codec) round-trips, and a " +
      "reopening writer keeps the persisted codec") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_zarrstore_blosc"
    GridStore.fileSystem(spark, path).delete(new HPath(path), true)
    val store = new ZarrStore(spark, path, desc, timeChunk = 8,
      codec = graft.sources.zarr.ZarrCodec.BloscLz4Codec(typesize = 8))
    store.publish(dailyGrid(1, 10))
    // a SECOND instance with the default (zlib) constructor codec must
    // keep writing blosc — the persisted .zarray wins for updates
    val reopened = new ZarrStore(spark, path, desc, timeChunk = 8)
    reopened.publish(dailyGrid(11, 5, base = 100.0))
    val expect = dailyGrid(1, 10).unionByName(dailyGrid(11, 5, base = 100.0))
    assert(collectSet(reopened.dataset()
      .select("time", "latitude", "longitude", "value")) == collectSet(expect))
    // chunk bytes really are blosc containers (2-byte version prefix 0x02)
    val fs = GridStore.fileSystem(spark, path)
    val in = fs.open(new HPath(s"$path/value/1.0.0"))
    val head = new Array[Byte](2)
    try in.readFully(0, head) finally in.close()
    assert(head(0) == 2, "chunk written on reopen must still be blosc")
  }

  test("time predicate on the reopened store prunes chunks") {
    val store = freshStore("prune")
    store.publish(dailyGrid(1, 20)) // chunks 0,1,2 along time
    val df = store.readRange(ts("2024-01-17T00:00:00"), ts("2024-01-20T00:00:00"))
    assert(df.count() == 16) // 4 days × 4 cells
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("chunksRead: 1"), plan) // indices 16-19 = chunk 2 only
  }
}
