package graft.sources.h5

import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** H5Write → `format("netcdf")` roundtrip: chunked + shuffled + deflated
  * data, CF packing (scale/offset), _FillValue → null, time decode, and
  * chunk pruning through the written file's B-tree index. (The reader
  * itself is independently pinned against netCDF-C-written CHIRPS files in
  * H5ReaderSpec — this spec gates the writer and the filtered-chunk
  * decode path the real fixture doesn't exercise.) */
class H5WriteSpec extends SparkSpec {

  private val fillRaw = -999999.0

  private def writeFixture(tag: String, compress: Boolean,
      codec: String = "deflate"): String = {
    val path = s"${System.getProperty("java.io.tmpdir")}/h5write_$tag.nc"
    // v raw = 4 × (t*100 + y*10 + x), scale 0.25 → decoded = t*100 + y*10 + x
    val data = Array.tabulate(10 * 3 * 4) { i =>
      val (t, y, x) = (i / 12, (i / 4) % 3, i % 4)
      if (t == 2 && y == 1 && x == 3) fillRaw else (t * 100 + y * 10 + x) * 4.0
    }
    H5Write.writeFile(spark, path,
      dims = Seq("time" -> 10, "y" -> 3, "x" -> 4),
      vars = Seq(
        H5Write.WriteVar("time", Seq("time"), "i4",
          Array.tabulate(10)(_.toDouble),
          attrs = Seq("units" -> "hours since 2024-05-01", "calendar" -> "standard")),
        H5Write.WriteVar("y", Seq("y"), "f8", Array(10.0, 10.5, 11.0)),
        H5Write.WriteVar("x", Seq("x"), "f8", Array(0.25, 0.5, 0.75, 1.0)),
        H5Write.WriteVar("v", Seq("time", "y", "x"), "f4", data,
          attrs = Seq("units" -> "mm"),
          numAttrs = Seq(
            ("scale_factor", "f8", Array(0.25)),
            ("_FillValue", "f4", Array(fillRaw))))),
      chunkLead = 4, compress = compress, codec = codec)
    path
  }

  private def checkScan(path: String): Unit = {
    val df = spark.read.format("netcdf").load(path)
    assert(df.schema.fieldNames.toSeq == Seq("time", "y", "x", "v"))
    assert(df.schema("time").dataType == TimestampNTZType)
    assert(df.schema("v").dataType == DoubleType) // unpacked (scale_factor)
    val rows = df.orderBy("time", "y", "x").collect()
    assert(rows.length == 120)
    rows.zipWithIndex.foreach { case (r, i) =>
      val (t, y, x) = (i / 12, (i / 4) % 3, i % 4)
      assert(r.getAs[LocalDateTime]("time") ==
        LocalDateTime.parse("2024-05-01T00:00").plusHours(t))
      assert(r.getAs[Double]("y") == 10.0 + y * 0.5)
      assert(r.getAs[Double]("x") == 0.25 + x * 0.25)
      if (t == 2 && y == 1 && x == 3) assert(r.isNullAt(3), s"cell $i must be fill")
      else assert(r.getAs[Double]("v") == t * 100.0 + y * 10.0 + x, s"cell $i")
    }
  }

  test("shuffle+deflate chunked roundtrip (incl. padded tail chunk)") {
    checkScan(writeFixture("deflate", compress = true))
  }

  test("uncompressed chunked roundtrip") {
    checkScan(writeFixture("rawchunks", compress = false))
  }

  test("shuffle+zstd (plugin 32015) chunked roundtrip") {
    checkScan(writeFixture("zstd", compress = true, codec = "zstd"))
  }

  test("fletcher32+shuffle+deflate chunked roundtrip (nc_def_var_fletcher32)") {
    val path = s"${System.getProperty("java.io.tmpdir")}/h5write_fletcher.nc"
    val data = Array.tabulate(10 * 3 * 4) { i =>
      val (t, y, x) = (i / 12, (i / 4) % 3, i % 4)
      if (t == 2 && y == 1 && x == 3) fillRaw else (t * 100 + y * 10 + x) * 4.0
    }
    H5Write.writeFile(spark, path,
      dims = Seq("time" -> 10, "y" -> 3, "x" -> 4),
      vars = Seq(
        H5Write.WriteVar("time", Seq("time"), "i4",
          Array.tabulate(10)(_.toDouble),
          attrs = Seq("units" -> "hours since 2024-05-01", "calendar" -> "standard")),
        H5Write.WriteVar("y", Seq("y"), "f8", Array(10.0, 10.5, 11.0)),
        H5Write.WriteVar("x", Seq("x"), "f8", Array(0.25, 0.5, 0.75, 1.0)),
        H5Write.WriteVar("v", Seq("time", "y", "x"), "f4", data,
          attrs = Seq("units" -> "mm"),
          numAttrs = Seq(
            ("scale_factor", "f8", Array(0.25)),
            ("_FillValue", "f4", Array(fillRaw))))),
      chunkLead = 4, compress = true, fletcher = true)
    checkScan(path)
  }

  test("time predicate prunes written chunks") {
    val path = writeFixture("prune", compress = true)
    val df = spark.read.format("netcdf").load(path)
      .filter(col("time") >= lit(LocalDateTime.parse("2024-05-01T08:00")))
    assert(df.count() == 2L * 3 * 4) // hours 8,9
    // chunkLead=4 → time chunks [0-3][4-7][8-9]; only the last survives
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("chunksRead: 1"), plan)
  }

  test("two written files combine along time through format(\"netcdf\") on a directory") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/h5write_multi"
    graft.store.GridStore.fileSystem(spark, dir)
      .delete(new org.apache.hadoop.fs.Path(dir), true)
    Seq((0, "a"), (1, "b")).foreach { case (i, tag) =>
      H5Write.writeFile(spark, s"$dir/part_$tag.nc",
        dims = Seq("time" -> 4, "x" -> 3),
        vars = Seq(
          H5Write.WriteVar("time", Seq("time"), "i4",
            Array.tabulate(4)(j => (i * 4 + j).toDouble),
            attrs = Seq("units" -> "days since 2024-06-01")),
          H5Write.WriteVar("x", Seq("x"), "f8", Array(1.0, 2.0, 3.0)),
          H5Write.WriteVar("v", Seq("time", "x"), "f8",
            Array.tabulate(12)(j => (i * 1000 + j).toDouble))),
        chunkLead = 1, compress = true)
    }
    val df = spark.read.format("netcdf").load(dir).orderBy("time", "x")
    val rows = df.collect()
    assert(rows.length == 24)
    assert(rows.head.getAs[LocalDateTime]("time") == LocalDateTime.parse("2024-06-01T00:00"))
    assert(rows.last.getAs[LocalDateTime]("time") == LocalDateTime.parse("2024-06-08T00:00"))
    assert(rows.map(_.getAs[Double]("v")).take(12).toSeq ==
      (0 until 12).map(_.toDouble))
    assert(rows.map(_.getAs[Double]("v")).drop(12).toSeq ==
      (0 until 12).map(j => 1000.0 + j))
  }
}
