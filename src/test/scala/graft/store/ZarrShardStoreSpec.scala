package graft.store

import org.apache.hadoop.fs.{Path => HPath}

import graft.SparkSpec
import graft.model.{DatasetDescriptor, TimeSpan}
import graft.sources.zarr.ZarrMeta

/** ZarrStore WRITE path for v3 `sharding_indexed` stores: the storage
  * object is the shard (timeChunk × spatial chunk), inner chunks are
  * separately encoded with a CRC32C-guarded index — the zarr v3 cloud
  * layout. The read side (ZarrShardingSpec) was validated against
  * fixture-built shards; here the engine's own writer must round-trip
  * through that reader and behave identically to an unsharded store. */
class ZarrShardStoreSpec extends SparkSpec {

  private val desc = DatasetDescriptor("test_grid", "value",
    spatialDims = Seq("latitude", "longitude"), timeResolution = TimeSpan.Daily)

  private def freshStore(tag: String, shard: Option[Seq[Int]]): ZarrStore = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_zarrshard_$tag"
    GridStore.fileSystem(spark, path).delete(new HPath(path), true)
    new ZarrStore(spark, path, desc, timeChunk = 8, zarrFormat = 3,
      shardChunks = shard)
  }

  private def shardObjects(store: ZarrStore): Seq[String] = {
    val fs = GridStore.fileSystem(spark, store.path)
    val it = fs.listFiles(new HPath(s"${store.path}/value/c"), true)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) out += it.next().getPath.toString
      .stripPrefix(s"file:${store.path}/value/")
    out.toSeq
  }

  test("sharded publish writes one object per SHARD and round-trips") {
    val store = freshStore("pub", Some(Seq(2, 2, 2)))
    val grid = dailyGrid(1, 10)
    store.publish(grid)
    // 10 days / timeChunk 8 → shards c/0/0/0 and c/1/0/0 — NOT the 4×1×1
    // inner chunks per shard
    assert(shardObjects(store).toSet == Set("c/0/0/0", "c/1/0/0"))
    assert(collectSet(store.dataset().select("time", "latitude", "longitude", "value"))
      == collectSet(grid))
    // persisted metadata declares sharding and the inner chunk shape
    val meta = store.listArrays().toMap.apply("value")
    assert(meta.chunks == Seq(2, 2, 2))
    assert(meta.sharding.map(_.shardShape).contains(Seq(8, 2, 2)))
    assert(meta.sharding.exists(_.indexCrc))
  }

  test("sharded insert+append update equals the unsharded store's result") {
    val flat = freshStore("flat", None)
    val sharded = freshStore("deep", Some(Seq(4, 1, 2)))
    for (store <- Seq(flat, sharded)) {
      store.publish(dailyGrid(1, 10))
      // overlaps days 7-10 (insert, +100) and extends to 14 (append)
      store.publish(dailyGrid(7, 8, base = 100.0))
    }
    val a = collectSet(flat.dataset().select("time", "latitude", "longitude", "value"))
    val b = collectSet(sharded.dataset().select("time", "latitude", "longitude", "value"))
    assert(a == b)
    assert(b.nonEmpty)
  }

  test("append leaves fully-interior shards untouched") {
    val store = freshStore("tail", Some(Seq(2, 2, 2)))
    store.publish(dailyGrid(1, 10))
    val fs = GridStore.fileSystem(spark, store.path)
    val interior = new HPath(s"${store.path}/value/c/0/0/0")
    val m0 = fs.getFileStatus(interior).getModificationTime
    store.publish(dailyGrid(11, 4, base = 50.0)) // extends into shards 1, (2 if needed)
    assert(fs.getFileStatus(interior).getModificationTime == m0,
      "interior shard must not be rewritten by a tail append")
    assert(store.dataset().count() == 14 * 4)
  }

  test("sharded array document survives a render → parse round-trip") {
    val store = freshStore("meta", Some(Seq(2, 1, 1)))
    store.publish(dailyGrid(1, 9))
    val meta = store.listArrays().toMap.apply("value")
    val reparsed = ZarrMeta.parseV3Array(
      graft.meta.JValue.parse(meta.renderV3).asInstanceOf[graft.meta.JObj])
    assert(reparsed.chunks == meta.chunks)
    assert(reparsed.sharding == meta.sharding)
    assert(reparsed.dtype.render == meta.dtype.render)
  }
}
