package graft.sources.h5

import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** netCDF-4/HDF5 scan against the reference repo's REAL system-test data
  * (CHIRPS precipitation over Nevada, written by netCDF-C: superblock v2,
  * v2 object headers, dense attributes, chunked + contiguous layouts,
  * DIMENSION_LIST references) — independent ground truth for the HDF5
  * chain. The subset file was produced independently by xarray, so
  * full-vs-subset agreement is a real differential, not a self-check. */
class H5ReaderSpec extends SparkSpec {

  private val dir = "/root/reference/tests/system/data"
  private val full = s"$dir/CHIRPS25_2024-12_Nevada.nc"
  private def have: Boolean = new java.io.File(full).isFile

  test("netcdf format auto-routes HDF5 files and decodes the CHIRPS grid") {
    assume(have)
    val df = spark.read.format("netcdf").load(full)
    assert(df.schema.fieldNames.toSeq ==
      Seq("time", "latitude", "longitude", "precip"))
    // "days since 1980-1-1 0:0:0" (non-padded!) must decode to timestamps
    assert(df.schema("time").dataType == TimestampNTZType)
    assert(df.schema("precip").dataType == FloatType)
    assert(df.count() == 31L * 8 * 18)
    val r = df.agg(
      min("time"), max("time"), min("latitude"), max("latitude"),
      min("longitude"), max("longitude"), min("precip"), max("precip"),
      sum(when(col("precip").isNull, 1).otherwise(0))).head()
    assert(r.getAs[LocalDateTime](0) == LocalDateTime.parse("2024-12-01T00:00"))
    assert(r.getAs[LocalDateTime](1) == LocalDateTime.parse("2024-12-31T00:00"))
    assert(r.getAs[Float](2) == 35.375f && r.getAs[Float](3) == 37.125f)
    assert(r.getAs[Float](4) == -117.375f && r.getAs[Float](5) == -113.125f)
    assert(r.getAs[Float](6) == 0.0f) // precip is non-negative
    assert(r.getAs[Long](8) == 0L) // no fill cells in this extract
  }

  test("independently-written subset file agrees with the full file (differential)") {
    assume(have)
    val f = spark.read.format("netcdf").load(full)
      .withColumnRenamed("precip", "p_full")
    val s = spark.read.format("netcdf").load(s"$dir/CHIRPS25_2024-12_Nevada_subset.nc")
    assert(s.count() == 11L * 8 * 18)
    // every subset cell must match the full file exactly (join on coords)
    val joined = s.join(f, Seq("time", "latitude", "longitude"), "left")
    val bad = joined.filter(
      col("p_full").isNull || abs(col("precip") - col("p_full")) > 0f)
    assert(bad.count() == 0)
  }

  test("with-hole file scans with its missing time steps absent from the axis") {
    assume(have)
    val df = spark.read.format("netcdf").load(s"$dir/CHIRPS25_2025-01_Nevada_with_hole.nc")
    val days = df.select("time").distinct().count()
    val whole = spark.read.format("netcdf").load(s"$dir/CHIRPS25_2025-01_Nevada.nc")
      .select("time").distinct().count()
    assert(whole == 31)
    assert(days < whole) // the hole is real
  }

  test("time predicate prunes chunks through the HDF5 chunk index") {
    assume(have)
    val df = spark.read.format("netcdf").load(full)
      .filter(col("time") >= lit(LocalDateTime.parse("2024-12-30T00:00")))
    assert(df.count() == 2L * 8 * 18)
    // precip is chunked (1, 8, 18): 2 of 31 per-day chunks survive pruning
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("chunksRead: 2"), plan)
  }

  test("multi-file combine stitches both months along time (MultiZarrToZarr analog)") {
    assume(have)
    val conf = spark.sparkContext.hadoopConfiguration
    val doc = Hdf5Kerchunk.combineHdf5(conf,
      Seq(full, s"$dir/CHIRPS25_2025-01_Nevada.nc"))
    val store = graft.sources.zarr.ZarrMeta.resolveRefsDoc(doc)
    val grid = store.arrays.find(_.name == "precip").get
    assert(grid.meta.shape == Seq(62, 8, 18)) // 31 + 31 days
    // scan through the manifest written to disk
    val mPath = s"${System.getProperty("java.io.tmpdir")}/chirps_combined.json"
    graft.sources.zarr.Kerchunk.writeManifest(conf, doc, mPath)
    val df = spark.read.format("kerchunk").load(mPath)
    assert(df.count() == 62L * 8 * 18)
    val r = df.agg(min("time"), max("time")).head()
    assert(r.getAs[LocalDateTime](0) == LocalDateTime.parse("2024-12-01T00:00"))
    assert(r.getAs[LocalDateTime](1) == LocalDateTime.parse("2025-01-31T00:00"))
    // December slice through the combined view equals the single-file scan
    val dec = df.filter(col("time") < lit(LocalDateTime.parse("2025-01-01T00:00")))
      .withColumnRenamed("precip", "p_comb")
    val single = spark.read.format("netcdf").load(full)
    val bad = single.join(dec, Seq("time", "latitude", "longitude"), "full")
      .filter(col("p_comb").isNull =!= col("precip").isNull ||
        abs(col("precip") - col("p_comb")) > 0f)
    assert(bad.count() == 0)
  }

  test("dense attributes and CF metadata surface in the manifest") {
    assume(have)
    val conf = spark.sparkContext.hadoopConfiguration
    val doc = Hdf5Kerchunk.fromHdf5(conf, full)
    val refs = doc.get("refs").get.asInstanceOf[graft.meta.JObj]
    val zattrs = graft.meta.JValue.parse(
      refs.get("precip/.zattrs").get.asInstanceOf[graft.meta.JStr].s)
      .asInstanceOf[graft.meta.JObj]
    assert(zattrs.get("units").contains(graft.meta.JStr("mm/day")))
    assert(zattrs.get("_FillValue").contains(graft.meta.JNum(-9999.0)))
    assert(zattrs.get("_ARRAY_DIMENSIONS").contains(graft.meta.JArr(
      Seq(graft.meta.JStr("time"), graft.meta.JStr("latitude"),
        graft.meta.JStr("longitude")))))
    // netCDF-4 bookkeeping must not leak
    assert(zattrs.get("DIMENSION_LIST").isEmpty)
    assert(zattrs.get("_Netcdf4Coordinates").isEmpty)
  }

  private def groupedFixture(path: String): Unit = {
    def vars(tag: String, scale: Double) = Seq(
      H5Write.WriteVar(s"${tag}_t", Seq(s"${tag}_t"), "i4",
        Array(0.0, 1.0, 2.0),
        attrs = Seq("units" -> "days since 2020-01-01")),
      H5Write.WriteVar(s"${tag}_v", Seq(s"${tag}_t"), "f8",
        Array(1.0, 2.0, 3.0).map(_ * scale)))
    H5Write.writeTree(spark, path, Seq(
      H5Write.GroupSpec("obs", Seq(s"obs_t" -> 3), vars("obs", 10.0)),
      H5Write.GroupSpec("fc", Seq(s"fc_t" -> 3), vars("fc", 100.0))))
  }

  test("grouped netCDF-4: each group scans as its own dataset via " +
      "option(\"group\"), with distinct variables per group") {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_h5grp/g.nc"
    new java.io.File(p).getParentFile.mkdirs()
    groupedFixture(p)
    val obs = spark.read.format("netcdf").option("group", "obs").load(p)
    assert(obs.schema.fieldNames.toSeq == Seq("obs_t", "obs_v"))
    assert(obs.select(sum("obs_v")).head().getDouble(0) == 60.0)
    val fc = spark.read.format("netcdf").option("group", "fc").load(p)
    assert(fc.schema.fieldNames.toSeq == Seq("fc_t", "fc_v"))
    assert(fc.select(sum("fc_v")).head().getDouble(0) == 600.0)
    // time decode works inside a group too
    assert(obs.schema("obs_t").dataType == TimestampNTZType)
  }

  test("an unselected grouped file refuses by name, listing the groups; " +
      "a wrong group path refuses listing the children") {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_h5grp/g2.nc"
    new java.io.File(p).getParentFile.mkdirs()
    groupedFixture(p)
    val e = intercept[Exception] {
      spark.read.format("netcdf").load(p).collect()
    }
    assert(e.getMessage.contains("'obs'") && e.getMessage.contains("'fc'") &&
      e.getMessage.contains("group"),
      s"expected the group refusal, got: ${e.getMessage}")
    val e2 = intercept[Exception] {
      spark.read.format("netcdf").option("group", "nope").load(p).collect()
    }
    assert(e2.getMessage.contains("'nope' not found") &&
      e2.getMessage.contains("obs"), s"got: ${e2.getMessage}")
    // selecting a DATASET as a group refuses too
    val e3 = intercept[Exception] {
      spark.read.format("netcdf").option("group", "obs/obs_v").load(p).collect()
    }
    assert(e3.getMessage.contains("is a dataset"), s"got: ${e3.getMessage}")
  }
}
