package graft.store

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.{DatasetDescriptor, TimeSpan}
import graft.sources.zarr.ZarrCodec

/** StoreConvert: zarr rechunk (layout/codec/format change, the rechunker
  * job) and parquet ↔ zarr migration — all differential against the source
  * store's scan. */
class StoreConvertSpec extends SparkSpec {

  private val desc = DatasetDescriptor("conv_grid", "value",
    spatialDims = Seq("latitude", "longitude"), timeResolution = TimeSpan.Daily)

  private def tmp(tag: String): String = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_conv_$tag"
    GridStore.fileSystem(spark, path).delete(new HPath(path), true)
    path
  }

  private def srcStore(tag: String): ZarrStore = {
    val store = new ZarrStore(spark, tmp(tag), desc, timeChunk = 4)
    store.publish(dailyGrid(1, 10))
    store.publish(dailyGrid(8, 5, base = 1000.0)) // insert 8-10, append 11-12
    store
  }

  private def cols(s: ZarrStore) =
    s.dataset().select("time", "latitude", "longitude", "value")

  test("rechunkZarr: new layout + codec + v3 shards, values bit-identical") {
    val src = srcStore("rck_src")
    val dst = StoreConvert.rechunkZarr(src, tmp("rck_dst"),
      timeChunk = 6, spatialChunks = Some(Seq(1, 2)),
      codec = ZarrCodec.ZstdCodec(3), zarrFormat = 3,
      shardChunks = Some(Seq(3, 1, 2)))
    assert(collectSet(cols(dst)) == collectSet(cols(src)))
    // physically a different store: v3 metadata + shard objects
    val fs = GridStore.fileSystem(spark, dst.path)
    assert(fs.exists(new HPath(s"${dst.path}/zarr.json")))
    assert(fs.listStatus(new HPath(s"${dst.path}/value/c"))
      .exists(_.isDirectory)) // v3 c/-prefixed chunk tree
  }

  test("rechunkZarr to a crc32c-checksummed v3 layout: scan, update, reopen") {
    val src = srcStore("rck_crc_src")
    val dst = StoreConvert.rechunkZarr(src, tmp("rck_crc_dst"),
      timeChunk = 6, codec = ZarrCodec.Crc32cCodec(ZarrCodec.ZstdCodec(3)),
      zarrFormat = 3)
    assert(collectSet(cols(dst)) == collectSet(cols(src)))
    // the persisted chain declares the checksum…
    val fs = GridStore.fileSystem(spark, dst.path)
    val doc = {
      val in = fs.open(new HPath(s"${dst.path}/value/zarr.json"))
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    assert(doc.contains("crc32c"), doc)
    // …and an UPDATE through the store honours it (writeCodec must keep
    // the wrapper): reopened values stay bit-identical
    dst.publish(dailyGrid(13, 2, base = 7000.0)) // days 13-14: pure append
    val reread = new ZarrStore(spark, dst.path, desc)
    assert(reread.dataset().count() == src.dataset().count() + 2 * 4)
  }

  test("rechunkZarr preserves explicit-null (fill) cells") {
    val src = new ZarrStore(spark, tmp("rcknull_src"), desc, timeChunk = 4)
    // day 2 carries nulls in two cells; days 1-6 present
    val grid = dailyGrid(1, 6).withColumn("value",
      when(col("time") === ts("2024-01-02T00:00:00") && col("latitude") === 10.0,
        lit(null)).otherwise(col("value")))
    src.publish(grid)
    val dst = StoreConvert.rechunkZarr(src, tmp("rcknull_dst"), timeChunk = 2)
    assert(collectSet(cols(dst)) == collectSet(cols(src)))
    assert(cols(dst).filter(col("value").isNull).count() == 2)
  }

  test("rechunkZarr refuses an occupied destination") {
    val src = srcStore("rckbusy_src")
    val dstPath = tmp("rckbusy_dst")
    StoreConvert.rechunkZarr(src, dstPath, timeChunk = 6)
    intercept[IllegalArgumentException] {
      StoreConvert.rechunkZarr(src, dstPath, timeChunk = 2)
    }
  }

  test("parquetToZarr and zarrToParquet round-trip bit-identically") {
    val pq = new GridStore(spark, tmp("mig_pq"), desc)
    pq.publish(dailyGrid(1, 12))
    val z = StoreConvert.parquetToZarr(pq,
      new ZarrStore(spark, tmp("mig_z"), desc, timeChunk = 5))
    assert(collectSet(cols(z)) ==
      collectSet(pq.dataset().select("time", "latitude", "longitude", "value")))
    val back = StoreConvert.zarrToParquet(z, new GridStore(spark, tmp("mig_back"), desc))
    assert(collectSet(back.dataset().select("time", "latitude", "longitude", "value"))
      == collectSet(cols(z)))
  }
}
