package graft.sources.zarr

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.nc.NcFormat

/** Kerchunk manifest generation + the `kerchunk` DSv2 scan, gated
  * DIFFERENTIALLY against the `netcdf` scan over the same files: both views
  * of the bytes must agree row-for-row (the reference's kerchunkify +
  * MultiZarrToZarr pipeline, transform.py:84-279, reads what the NC reader
  * reads). */
class KerchunkSpec extends SparkSpec {

  /** Two NC files split along the record dim, CF-packed with fills —
    * the same shape as SparkEntry's ncEventsFixture. */
  private def writeFixture(tag: String): String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_kerchunk_$tag"
    graft.store.GridStore.fileSystem(spark, dir)
      .delete(new org.apache.hadoop.fs.Path(dir), true)
    val fillRaw = -999.0
    Seq((0, 6), (6, 10)).zipWithIndex.foreach { case ((lo, hi), i) =>
      val n = hi - lo
      val data = Array.tabulate(n * 4) { j =>
        val t = lo + j / 4
        val x = j % 4
        if (t == 3 && x == 2) fillRaw else (t * 10 + x) * 2.0 // raw = 2× (scale .5)
      }
      NcFormat.writeFile(spark, s"$dir/part_$i.nc",
        dims = Seq("time" -> n, "x" -> 4),
        vars = Seq(
          NcFormat.WriteVar("time", Seq("time"), NcFormat.NcInt,
            Array.tabulate(n)(j => (lo + j).toDouble),
            attrs = Seq("units" -> "hours since 2024-03-01", "calendar" -> "standard")),
          NcFormat.WriteVar("x", Seq("x"), NcFormat.NcInt,
            Array.tabulate(4)(_.toDouble)),
          NcFormat.WriteVar("v", Seq("time", "x"), NcFormat.NcInt,
            data,
            nattrs = Seq(
              ("scale_factor", NcFormat.NcDouble, Array(0.5)),
              ("_FillValue", NcFormat.NcInt, Array(fillRaw))))),
        recordDim = Some("time"))
    }
    dir
  }

  test("single-file manifest scan equals the netcdf scan of the same file") {
    val dir = writeFixture("single")
    val conf = spark.sparkContext.hadoopConfiguration
    val manifest = Kerchunk.fromNetcdf(conf, s"$dir/part_0.nc")
    Kerchunk.writeManifest(conf, manifest, s"$dir/single.json")
    val viaKerchunk = spark.read.format("kerchunk").load(s"$dir/single.json")
      .orderBy("time", "x").collect()
    val viaNc = spark.read.format("netcdf").load(s"$dir/part_0.nc")
      .orderBy("time", "x").collect()
    assert(viaKerchunk.toSeq == viaNc.toSeq)
    assert(viaKerchunk.length == 24)
  }

  test("multi-file combine equals the netcdf directory scan (S10/S11)") {
    val dir = writeFixture("combine")
    val conf = spark.sparkContext.hadoopConfiguration
    val manifest = Kerchunk.combineNetcdf(conf,
      Seq(s"$dir/part_0.nc", s"$dir/part_1.nc"))
    Kerchunk.writeManifest(conf, manifest, s"$dir/combined.json")
    val viaKerchunk = spark.read.format("kerchunk").load(s"$dir/combined.json")
      .orderBy("time", "x").collect()
    val viaNc = spark.read.format("netcdf").load(dir)
      .orderBy("time", "x").collect()
    assert(viaKerchunk.toSeq == viaNc.toSeq)
    assert(viaKerchunk.length == 40)
    // the fill cell surfaces as null through BOTH paths
    val nulls = viaKerchunk.filter(_.isNullAt(2))
    assert(nulls.length == 1)
    assert(nulls.head.getAs[java.time.LocalDateTime]("time") ==
      java.time.LocalDateTime.parse("2024-03-01T03:00"))
  }

  test("manifest byte ranges point into the ORIGINAL file (no data copied)") {
    val dir = writeFixture("ranges")
    val conf = spark.sparkContext.hadoopConfiguration
    val manifest = Kerchunk.fromNetcdf(conf, s"$dir/part_0.nc")
    val refs = manifest.get("refs").get.asInstanceOf[graft.meta.JObj]
    // record var v: one chunk per record, all referencing part_0.nc
    val chunkKeys = refs.fields.map(_._1).filter(k =>
      k.startsWith("v/") && !k.startsWith("v/."))
    assert(chunkKeys.toSet == (0 until 6).map(r => s"v/$r.0").toSet)
    chunkKeys.foreach { k =>
      refs.get(k).get match {
        case graft.meta.JArr(Seq(graft.meta.JStr(url), _, graft.meta.JNum(len))) =>
          assert(url.endsWith("part_0.nc"))
          assert(len.toInt == 16) // 4 cells × NC_INT
        case other => fail(s"$k: $other")
      }
    }
  }

  test("time predicate prunes non-overlapping record chunks through the manifest") {
    val dir = writeFixture("prune")
    val conf = spark.sparkContext.hadoopConfiguration
    Kerchunk.writeManifest(conf,
      Kerchunk.combineNetcdf(conf, Seq(s"$dir/part_0.nc", s"$dir/part_1.nc")),
      s"$dir/combined.json")
    val df = spark.read.format("kerchunk").load(s"$dir/combined.json")
      .filter(col("time") >= lit(java.time.LocalDateTime.parse("2024-03-01T08:00")))
    assert(df.count() == 8) // hours 8,9 × 4 cells
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("time[8..9]"), plan)
  }

  test("combine refuses mismatched fixed dims (identical-dims assertion)") {
    val dir = writeFixture("mismatch")
    NcFormat.writeFile(spark, s"$dir/bad.nc",
      dims = Seq("time" -> 2, "x" -> 5), // x differs: 5 vs 4
      vars = Seq(
        NcFormat.WriteVar("time", Seq("time"), NcFormat.NcInt, Array(0.0, 1.0),
          attrs = Seq("units" -> "hours since 2024-03-01")),
        NcFormat.WriteVar("v", Seq("time", "x"), NcFormat.NcInt,
          Array.fill(10)(1.0))),
      recordDim = Some("time"))
    val conf = spark.sparkContext.hadoopConfiguration
    val ex = intercept[IllegalArgumentException] {
      Kerchunk.combineNetcdf(conf, Seq(s"$dir/part_0.nc", s"$dir/bad.nc"))
    }
    assert(ex.getMessage.contains("identical-dims"))
  }
}
