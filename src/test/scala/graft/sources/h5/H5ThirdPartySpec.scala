package graft.sources.h5

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hostile-file hardening beyond [[H5ReaderSpec]]'s third-party CHIRPS
  * gates: cell-level agreement between the two independently-written
  * 2025-01 variants, and the guarantee that an UNKNOWN filter id fails
  * with a clean, named error — never silently-wrong data. */
class H5ThirdPartySpec extends SparkSpec {

  private val dir = "/root/reference/tests/system/data"
  private def have: Boolean =
    new java.io.File(s"$dir/CHIRPS25_2025-01_Nevada.nc").isFile

  test("with-hole variant matches the full 2025-01 file cell-for-cell outside the hole") {
    assume(have)
    val full = spark.read.format("netcdf").load(s"$dir/CHIRPS25_2025-01_Nevada.nc")
      .withColumnRenamed("precip", "p_full")
    val holed = spark.read.format("netcdf")
      .load(s"$dir/CHIRPS25_2025-01_Nevada_with_hole.nc")
    val joined = holed.join(full, Seq("time", "latitude", "longitude"), "left")
    assert(joined.filter(col("p_full").isNull).count() == 0,
      "every non-hole cell must exist in the full file")
    val mismatch = joined.filter(!(col("precip") === col("p_full") ||
      (col("precip").isNull && col("p_full").isNull))).count()
    assert(mismatch == 0, s"$mismatch cells differ between independent writers")
  }

  test("an unsupported HDF5 filter id fails with a clean, named error — not wrong data") {
    // write a shuffle+deflate file with OUR writer, then patch the deflate
    // entry's filter id (v1 pipeline-message signature: id=1, nameLen=0,
    // flags=0, nclient=1, client=6) to the unregistered id 999
    val tmp = Files.createTempDirectory("h5hostile")
    val src = tmp.resolve("ok.nc").toString
    H5Write.writeFile(spark, src,
      dims = Seq("time" -> 4, "y" -> 2),
      vars = Seq(
        H5Write.WriteVar("time", Seq("time"), "i4",
          Array.tabulate(4)(_.toDouble),
          attrs = Seq("units" -> "hours since 2024-05-01")),
        H5Write.WriteVar("y", Seq("y"), "f8", Array(1.0, 2.0)),
        H5Write.WriteVar("v", Seq("time", "y"), "f4",
          Array.tabulate(8)(_.toDouble))))
    val bytes = Files.readAllBytes(Paths.get(src))
    val sig = Array[Byte](1, 0, 0, 0, 0, 0, 1, 0, 6, 0, 0, 0)
    val at = bytes.sliding(sig.length).indexWhere(_.sameElements(sig))
    assert(at >= 0, "deflate filter entry not found in written file")
    bytes(at) = (999 & 0xff).toByte
    bytes(at + 1) = ((999 >> 8) & 0xff).toByte
    val hostile = tmp.resolve("hostile.nc").toString
    Files.write(Paths.get(hostile), bytes)
    val err = intercept[Throwable] {
      spark.read.format("netcdf").load(hostile).count()
    }
    val msgs = Iterator.iterate(err)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("999") && msgs.toLowerCase.contains("unsupported"),
      s"expected a named unsupported-filter error, got: $msgs")
  }
}
