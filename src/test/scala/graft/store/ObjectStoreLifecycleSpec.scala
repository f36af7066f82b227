package graft.store

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.{DatasetDescriptor, TimeSpan, TimeUnitKind}

/** The gate behind SURVEY §2's S6/S7/S12-remote N/A rationale ("subsumed by
  * `s3a://` direct reads"): the ENTIRE store lifecycle — publish → classify
  * → insert+append → commit marker → reopen through the scan — run over a
  * Hadoop `FileSystem` with OBJECT-STORE semantics (flat keys, PUT-on-close
  * visibility, copy-then-delete non-atomic rename, no append; see
  * [[MockObjectStoreFileSystem]]). The reference's store layer is half S3
  * (store.py:398-500); this proves ours is scheme-agnostic in fact, not by
  * assertion — on a real cluster `s3a://` is the same `FileSystem` contract
  * served by hadoop-aws (which this zero-egress image doesn't ship). */
class ObjectStoreLifecycleSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  spark.sparkContext.hadoopConfiguration
    .set("fs.mock3a.impl", classOf[MockObjectStoreFileSystem].getName)

  private val desc = DatasetDescriptor("object_store_test", "value",
    spatialDims = Seq("latitude", "longitude"), timeResolution = TimeSpan.Daily)

  test("GridStore: publish → mixed insert+append → reopen, all over mock3a://") {
    val path = "mock3a://bucket-grid/stores/unit"
    val store = new GridStore(spark, path, desc, bucketSpan = TimeUnitKind.Days)
    assert(!store.hasExisting)
    store.publish(dailyGrid(1, 6))
    assert(store.hasExisting)
    assert(store.dataset().count() == 24)

    // days 5-6 are inserts, 7-8 appends — both write paths over the object FS
    store.publish(dailyGrid(5, 4, base = 50.0))
    val ds = store.dataset()
    assert(ds.count() == 32)
    val inserted = ds.filter(col("time") === lit(ts("2024-01-05T00:00:00")) &&
      col("latitude") === 10.0 && col("longitude") === 100.0)
      .select("value").as[Double].head()
    assert(inserted == 50.0 + 0 + 10.0 + 100.0)
    val appended = ds.filter(col("time") === lit(ts("2024-01-08T00:00:00")) &&
      col("latitude") === 10.25 && col("longitude") === 100.25)
      .select("value").as[Double].head()
    assert(appended == 50.0 + 3 + 10.25 + 100.25)

    // commit-marker protocol landed and cleared over non-atomic renames
    val attrs = store.readAttrs()
    assert(attrs(GridStore.UpdateInProgressKey) == "false")
    assert(attrs("date_range_end") == "2024010800")
  }

  test("ZarrStore: publish → tail-chunk append → reopen through the zarr scan over mock3a://") {
    val path = "mock3a://bucket-zarr/stores/unit"
    val store = new ZarrStore(spark, path, desc, timeChunk = 8)
    store.publish(dailyGrid(1, 10))
    assert(store.hasExisting)
    assert(collectSet(store.dataset().select("time", "latitude", "longitude", "value"))
      == collectSet(dailyGrid(1, 10)))

    store.publish(dailyGrid(11, 5, base = 100.0))
    val expect = dailyGrid(1, 10).unionByName(dailyGrid(11, 5, base = 100.0))
    assert(collectSet(store.dataset().select("time", "latitude", "longitude", "value"))
      == collectSet(expect))
    assert(store.readAttrs()(GridStore.UpdateInProgressKey) == "false")

    // chunk objects live under flat keys, not directories-with-files
    val fs = GridStore.fileSystem(spark, path)
    assert(fs.exists(new HPath(s"$path/value/0.0.0")))
  }

  test("object-store semantics hold: no append, PUT-on-close, non-atomic rename") {
    val fs = GridStore.fileSystem(spark, "mock3a://bucket-sem/x")
    val p = new HPath("mock3a://bucket-sem/sem/probe.bin")
    val out = fs.create(p, true)
    out.write(Array[Byte](1, 2, 3))
    // not visible until close — PUT semantics
    assert(!fs.exists(p))
    out.close()
    assert(fs.exists(p) && fs.getFileStatus(p).getLen == 3)
    intercept[java.io.IOException] { fs.append(p) }
    val q = new HPath("mock3a://bucket-sem/sem/renamed.bin")
    assert(fs.rename(p, q))
    assert(!fs.exists(p) && fs.exists(q))
  }
}
