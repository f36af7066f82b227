package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.{DatasetCategory, DatasetDescriptor, TimeSpan, TimeUnitKind}

/** 6-D hindcast grid end-to-end (SURVEY §7 stretch item (d)): the hindcast
  * category carries 4 leading dims + 2 spatial — just more key columns in
  * the long-form model, but exercised explicitly through normalize, publish,
  * insert-update, and point lookup (mirrors the reference's 6-D fixture,
  * tests/unit/conftest.py:107-134). */
class HindcastGridSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private val desc = DatasetDescriptor("hindcast6d", "value",
    category = DatasetCategory.Hindcast,
    spatialDims = Seq("latitude", "longitude"),
    timeResolution = TimeSpan.Daily)

  private def grid(startDay: Int, nDays: Int, base: Double = 0.0) = {
    val rows = for {
      d <- 0 until nDays
      offset <- Seq(0L, 1L)         // forecast_reference_offset
      step <- Seq(6L, 12L)          // hours
      ens <- Seq(1, 2)              // ensemble member
      lat <- Seq(10.0, 10.25)
      lon <- Seq(100.0, 100.25)
    } yield (ts(f"2024-01-${startDay + d}%02dT00:00:00"), offset, step, ens,
      lat, lon, base + d + offset * 10 + step + ens + lat + lon)
    rows.toDF("hindcast_reference_time", "forecast_reference_offset", "step",
      "ensemble", "latitude", "longitude", "value")
  }

  test("standard dims order for the hindcast category") {
    assert(desc.standardDims == Seq("hindcast_reference_time",
      "forecast_reference_offset", "step", "ensemble", "latitude", "longitude"))
  }

  test("6-D publish → insert update → point lookup golden values") {
    val root = Files.createTempDirectory("hind6d").toString
    val store = new GridStore(spark, s"$root/store", desc,
      bucketSpan = TimeUnitKind.Days)
    store.publish(grid(1, 4)) // 4 days × 2×2×2×2×2 = 128 cells
    assert(store.dataset().count() == 128)

    // insert-correct day 2 (+1000) and append day 5 in one update
    val update = grid(2, 1, base = 1000.0).unionByName(grid(5, 1))
    store.publish(update)
    val ds = store.dataset()
    assert(ds.count() == 160)

    // point lookup at full 6-D key: corrected cell
    def cell(day: Int, offset: Long, step: Long, ens: Int, lat: Double, lon: Double) =
      ds.filter(col("hindcast_reference_time") === lit(ts(f"2024-01-0${day}T00:00:00")) &&
          col("forecast_reference_offset") === offset && col("step") === step &&
          col("ensemble") === ens && col("latitude") === lat && col("longitude") === lon)
        .select("value").as[Double].head()
    // day 2 was re-based to 1000 (d=0 within its grid): 1000+0+10+12+2+10.25+100.25
    assert(cell(2, 1L, 12L, 2, 10.25, 100.25) == 1000.0 + 10 + 12 + 2 + 10.25 + 100.25)
    // day 3 untouched: base 0, d=2: 2+0+6+1+10.0+100.0
    assert(cell(3, 0L, 6L, 1, 10.0, 100.0) == 2.0 + 6 + 1 + 10.0 + 100.0)
  }

  test("6-D publish → update through the NATIVE ZarrStore matches the parquet store") {
    // the zarr grid is dense and the fixture covers the full product space,
    // so the two stores must agree cell-for-cell
    val root = Files.createTempDirectory("hind6dz").toString
    val store = new ZarrStore(spark, s"$root/zstore", desc, timeChunk = 2)
    store.publish(grid(1, 4))
    val update = grid(2, 1, base = 1000.0).unionByName(grid(5, 1))
    store.publish(update) // insert day 2 + append day 5 (butt-join on chunk 1)
    val ds = store.dataset()
    assert(ds.schema.fieldNames.toSeq == desc.standardDims :+ "value")
    assert(ds.count() == 160)
    val expect = grid(1, 4)
      .filter(col("hindcast_reference_time") =!= lit(ts("2024-01-02T00:00:00")))
      .unionByName(update)
    assert(collectSet(ds.select(desc.columns.map(col): _*))
      == collectSet(expect.select(desc.columns.map(col): _*)))
  }
}
