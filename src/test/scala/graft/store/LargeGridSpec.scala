package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.{DatasetDescriptor, TimeSpan, TimeUnitKind}

/** Large-grid stress mirroring the reference's 1000×1000 fixture tier
  * (tests/unit/conftest.py:72-85): a million-cell-per-day grid through the
  * full publish → insert/append → point-lookup cycle, generated in the
  * engine (spark.range cross join), never on the driver. */
class LargeGridSpec extends SparkSpec {

  test("1M-cells/day grid: publish, mixed update, point lookups stay exact") {
    val days = 4
    val side = 500 // 500×500 = 250k cells/day, 1M rows total
    val root = Files.createTempDirectory("large_grid").toString
    val desc = DatasetDescriptor("large", "value",
      spatialDims = Seq("latitude", "longitude"), timeResolution = TimeSpan.Daily)
    val store = new GridStore(spark, s"$root/store", desc,
      bucketSpan = TimeUnitKind.Days)

    def grid(startDay: Int, nDays: Int, base: Double) = {
      val sp = spark
      import sp.implicits._
      spark.range(nDays.toLong * side * side).select(
        (expr(s"timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,CAST(id / ${side * side} AS INT) + ${startDay - 1},0,0,0)"))
          .cast("timestamp_ntz").as("time"),
        ((col("id") % (side * side)) / side).cast("int").cast("double").as("latitude"),
        (col("id") % side).cast("double").as("longitude"),
        (lit(base) + col("id") % 1000).cast("double").as("value"))
    }

    store.publish(grid(1, days, 0.0))
    assert(store.dataset().count() == days.toLong * side * side)

    // update: correct day 2 (+1e6) and append day 5
    val update = grid(2, 1, 1e6).unionByName(grid(5, 1, 0.0))
    // day-2 ids restart at 0 within the generated frame, so recompute the
    // expected value independently below
    store.publish(update)
    val ds = store.dataset()
    assert(ds.count() == (days + 1).toLong * side * side)

    def cell(day: Int, lat: Double, lon: Double): Double =
      ds.filter(col("time") === lit(java.time.LocalDateTime.parse(f"2024-01-0${day}T00:00:00")) &&
          col("latitude") === lat && col("longitude") === lon)
        .select("value").head().getDouble(0)

    // day 2 overwritten: id within its own frame = lat*side + lon; value = 1e6 + id%1000
    assert(cell(2, 123.0, 45.0) == 1e6 + (123 * side + 45) % 1000)
    // day 3 untouched: original id = 2*side*side + lat*side + lon
    assert(cell(3, 7.0, 9.0) == (2L * side * side + 7 * side + 9) % 1000)
    // day 5 appended
    assert(cell(5, 0.0, 1.0) == 1.0)
  }

  test("native ZarrStore at the same tier: chunked distributed write, pruned lookups") {
    val days = 4
    val side = 250 // 62.5k cells/day, 312.5k rows total incl. append
    val root = Files.createTempDirectory("large_zarr").toString
    val desc = DatasetDescriptor("largez", "value",
      spatialDims = Seq("latitude", "longitude"), timeResolution = TimeSpan.Daily)
    // spatial chunks 64×64 → each day spans 16 chunks; timeChunk 2 → the
    // data path fans out across (days/2)×16 chunk tasks
    val store = new ZarrStore(spark, s"$root/zstore", desc,
      timeChunk = 2, spatialChunks = Some(Seq(64, 64)),
      codec = graft.sources.zarr.ZarrCodec.BloscLz4Codec(typesize = 8))

    def grid(startDay: Int, nDays: Int, base: Double) = {
      spark.range(nDays.toLong * side * side).select(
        (expr(s"timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,CAST(id / ${side * side} AS INT) + ${startDay - 1},0,0,0)"))
          .cast("timestamp_ntz").as("time"),
        ((col("id") % (side * side)) / side).cast("int").cast("double").as("latitude"),
        (col("id") % side).cast("double").as("longitude"),
        (lit(base) + col("id") % 1000).cast("double").as("value"))
    }

    store.publish(grid(1, days, 0.0))
    val update = grid(2, 1, 1e6).unionByName(grid(5, 1, 0.0))
    store.publish(update)
    val ds = store.dataset()
    assert(ds.count() == (days + 1).toLong * side * side)

    // pruned range read: 1 day = 1 time index → only chunks of one time
    // chunk row are fetched
    val day3 = store.readRange(ts("2024-01-03T00:00:00"), ts("2024-01-03T00:00:00"))
    assert(day3.count() == side.toLong * side)

    def cell(day: Int, lat: Double, lon: Double): Double =
      ds.filter(col("time") === lit(java.time.LocalDateTime.parse(f"2024-01-0${day}T00:00:00")) &&
          col("latitude") === lat && col("longitude") === lon)
        .select("value").head().getDouble(0)
    assert(cell(2, 123.0, 45.0) == 1e6 + (123 * side + 45) % 1000)
    assert(cell(3, 7.0, 9.0) == (2L * side * side + 7 * side + 9) % 1000)
    assert(cell(5, 0.0, 1.0) == 1.0)
  }

  test("SHARDED v3 ZarrStore at the same tier: shard-unit write, inner-chunk-pruned reads") {
    val days = 4
    val side = 250
    val root = Files.createTempDirectory("large_zarr_shard").toString
    val desc = DatasetDescriptor("largezs", "value",
      spatialDims = Seq("latitude", "longitude"), timeResolution = TimeSpan.Daily)
    // storage shards of (2 time × 128 × 128) carrying (1 × 64 × 64) inner
    // chunks → 8 inner chunks per shard; the write fans out per SHARD,
    // reads prune to inner chunks via the shard index
    val store = new ZarrStore(spark, s"$root/zstore", desc,
      timeChunk = 2, spatialChunks = Some(Seq(128, 128)), zarrFormat = 3,
      shardChunks = Some(Seq(1, 64, 64)),
      codec = graft.sources.zarr.ZarrCodec.BloscLz4Codec(typesize = 8))

    def grid(startDay: Int, nDays: Int, base: Double) = {
      spark.range(nDays.toLong * side * side).select(
        (expr(s"timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,CAST(id / ${side * side} AS INT) + ${startDay - 1},0,0,0)"))
          .cast("timestamp_ntz").as("time"),
        ((col("id") % (side * side)) / side).cast("int").cast("double").as("latitude"),
        (col("id") % side).cast("double").as("longitude"),
        (lit(base) + col("id") % 1000).cast("double").as("value"))
    }

    store.publish(grid(1, days, 0.0))
    store.publish(grid(2, 1, 1e6).unionByName(grid(5, 1, 0.0)))
    val ds = store.dataset()
    assert(ds.count() == (days + 1).toLong * side * side)
    val day3 = store.readRange(ts("2024-01-03T00:00:00"), ts("2024-01-03T00:00:00"))
    assert(day3.count() == side.toLong * side)

    def cell(day: Int, lat: Double, lon: Double): Double =
      ds.filter(col("time") === lit(java.time.LocalDateTime.parse(f"2024-01-0${day}T00:00:00")) &&
          col("latitude") === lat && col("longitude") === lon)
        .select("value").head().getDouble(0)
    assert(cell(2, 123.0, 45.0) == 1e6 + (123 * side + 45) % 1000)
    assert(cell(3, 7.0, 9.0) == (2L * side * side + 7 * side + 9) % 1000)
    assert(cell(5, 0.0, 1.0) == 1.0)
  }

  test("rechunk at the stress tier: v2 blosc 64×64 → v3 sharded zstd " +
      "128×128, contents and point lookups identical") {
    val days = 3
    val side = 250 // 62.5k cells/day
    val root = Files.createTempDirectory("large_rechunk").toString
    val desc = DatasetDescriptor("largerck", "value",
      spatialDims = Seq("latitude", "longitude"), timeResolution = TimeSpan.Daily)
    val src = new ZarrStore(spark, s"$root/src", desc,
      timeChunk = 2, spatialChunks = Some(Seq(64, 64)),
      codec = graft.sources.zarr.ZarrCodec.BloscLz4Codec(typesize = 8))

    def grid(startDay: Int, nDays: Int) = {
      spark.range(nDays.toLong * side * side).select(
        (expr(s"timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,CAST(id / ${side * side} AS INT) + ${startDay - 1},0,0,0)"))
          .cast("timestamp_ntz").as("time"),
        ((col("id") % (side * side)) / side).cast("int").cast("double").as("latitude"),
        (col("id") % side).cast("double").as("longitude"),
        (col("id") % 1000).cast("double").as("value"))
    }

    src.publish(grid(1, days))
    val dst = StoreConvert.rechunkZarr(src, s"$root/dst",
      timeChunk = 3, spatialChunks = Some(Seq(128, 128)),
      codec = graft.sources.zarr.ZarrCodec.ZstdCodec(3),
      zarrFormat = 3, shardChunks = Some(Seq(1, 64, 64)))
    val ds = dst.dataset()
    assert(ds.count() == days.toLong * side * side)
    // the pruned range read works against the NEW shard layout
    val day2 = dst.readRange(ts("2024-01-02T00:00:00"), ts("2024-01-02T00:00:00"))
    assert(day2.count() == side.toLong * side)
    // spot cells survive the layout change bit-exactly
    def cell(day: Int, lat: Double, lon: Double): Double =
      ds.filter(col("time") === lit(java.time.LocalDateTime.parse(f"2024-01-0${day}T00:00:00")) &&
          col("latitude") === lat && col("longitude") === lon)
        .select("value").head().getDouble(0)
    assert(cell(2, 123.0, 45.0) == (1L * side * side + 123 * side + 45) % 1000)
    assert(cell(3, 7.0, 9.0) == (2L * side * side + 7 * side + 9) % 1000)
  }
}
