package graft.sources.nc

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, IntegerType, ShortType}

import graft.SparkSpec

/** CDF-5 (PnetCDF 64-bit data format): wide header integers, version
  * byte 5, and the new unsigned/64-bit nc_types — roundtrip against a
  * CDF-1 twin, type mapping into Spark, int64 fill masking, and the named
  * NC_UINT64 refusal. */
class NcCdf5Spec extends SparkSpec {

  private def writeTwin(dir: String, version: Option[Int],
      cntType: Int = NcFormat.NcInt64): String = {
    val path = s"$dir/grid_v${version.getOrElse(0)}.nc"
    NcFormat.writeFile(spark, path,
      dims = Seq("time" -> 4, "y" -> 3),
      vars = Seq(
        NcFormat.WriteVar("time", Seq("time"), NcFormat.NcInt,
          Array(0.0, 1.0, 2.0, 3.0),
          attrs = Seq("units" -> "days since 2024-05-01")),
        NcFormat.WriteVar("y", Seq("y"), NcFormat.NcDouble, Array(1.0, 2.0, 3.0)),
        NcFormat.WriteVar("v", Seq("time", "y"), cntType,
          Array.tabulate(12)(i => if (i == 5) -7.0 else i * 1000000.0),
          nattrs = Seq(("_FillValue", cntType, Array(-7.0))))),
      recordDim = Some("time"), forceVersion = version)
    path
  }

  test("CDF-5 scans cell-identical to its CDF-1 twin; int64 maps to LongType") {
    val dir = Files.createTempDirectory("cdf5").toString
    val v5 = writeTwin(dir, Some(5))
    val v1 = writeTwin(dir, None, cntType = NcFormat.NcInt)
    // version byte pinned on disk
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(v5))
    assert(bytes(3) == 5, s"magic version byte ${bytes(3)}")
    val df5 = spark.read.format("netcdf").load(v5)
    assert(df5.schema("v").dataType == LongType)
    val df1 = spark.read.format("netcdf").load(v1)
    // same cells (modulo the int/long type), same fill → null cell
    assert(collectSet(df5.select(col("time"), col("y"), col("v").cast("long")))
      == collectSet(df1.select(col("time"), col("y"), col("v").cast("long"))))
    assert(df5.filter(col("v").isNull).count() == 1)
    // a value only int64 can hold survives exactly
    val dir2 = Files.createTempDirectory("cdf5big").toString
    val big = s"$dir2/big.nc"
    NcFormat.writeFile(spark, big,
      dims = Seq("x" -> 2),
      vars = Seq(NcFormat.WriteVar("v", Seq("x"), NcFormat.NcInt64,
        Array(9.007199254740992e15, -9.007199254740992e15))), // ±2^53
      forceVersion = Some(5))
    val got = spark.read.format("netcdf").load(big)
      .select("v").orderBy(desc("v")).collect().map(_.getLong(0))
    assert(got.sameElements(Array(9007199254740992L, -9007199254740992L)))
  }

  test("CDF-5 unsigned types widen to the next signed Spark type") {
    val dir = Files.createTempDirectory("cdf5u").toString
    val path = s"$dir/u.nc"
    NcFormat.writeFile(spark, path,
      dims = Seq("x" -> 3),
      vars = Seq(
        NcFormat.WriteVar("ub", Seq("x"), NcFormat.NcUByte, Array(0.0, 127.0, 255.0)),
        NcFormat.WriteVar("us", Seq("x"), NcFormat.NcUShort, Array(0.0, 40000.0, 65535.0)),
        NcFormat.WriteVar("ui", Seq("x"), NcFormat.NcUInt, Array(0.0, 3.0e9, 4294967295.0))),
      forceVersion = Some(5))
    val df = spark.read.format("netcdf").load(path)
    assert(df.schema("ub").dataType == ShortType)
    assert(df.schema("us").dataType == IntegerType)
    assert(df.schema("ui").dataType == LongType)
    val r = df.orderBy(desc("ui")).collect()
    assert(r(0).getAs[Short]("ub") == 255 || r(0).getAs[Long]("ui") == 4294967295L)
    assert(df.agg(max("ui")).head().getLong(0) == 4294967295L)
    assert(df.agg(max("us")).head().getInt(0) == 65535)
    assert(df.agg(max("ub")).head().getShort(0) == 255)
  }

  test("NC_UINT64 is refused by name, never narrowed") {
    val dir = Files.createTempDirectory("cdf5u64").toString
    val path = s"$dir/u64.nc"
    val src = s"$dir/i64.nc"
    // the writer has no UINT64 (nothing can produce it losslessly from
    // doubles); patch an INT64 file's nc_type tag 10 → 11 to simulate a
    // foreign PnetCDF writer
    NcFormat.writeFile(spark, src,
      dims = Seq("x" -> 2),
      vars = Seq(NcFormat.WriteVar("v", Seq("x"), NcFormat.NcInt64,
        Array(1.0, 2.0))),
      forceVersion = Some(5))
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(src))
    val sig = Array[Byte](0, 0, 0, 10)
    val at = bytes.indices.dropRight(3).filter(i =>
      bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 0 && bytes(i + 3) == 10).last
    bytes(at + 3) = 11
    Files.write(java.nio.file.Paths.get(path), bytes)
    val e = intercept[Throwable] {
      spark.read.format("netcdf").load(path).collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("NC_UINT64"), msgs)
  }

  test("a hostile CDF-5 header field beyond Int range is refused, not truncated") {
    val dir = Files.createTempDirectory("cdf5host").toString
    val path = s"$dir/h.nc"
    writeTwin(dir, Some(5))
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(s"$dir/grid_v5.nc"))
    // numrecs is the 8 bytes after the magic: claim 2^40 records
    bytes(4) = 0; bytes(5) = 0; bytes(6) = 1; bytes(7) = 0
    bytes(8) = 0; bytes(9) = 0; bytes(10) = 0; bytes(11) = 0
    Files.write(java.nio.file.Paths.get(path), bytes)
    val e = intercept[Throwable] {
      spark.read.format("netcdf").load(path).collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("exceeds Int"), msgs)
  }
}
