package graft.sources.h5

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.zarr.ZarrCodec.SzipCodec

/** HDF5 szip (filter id 4) through the in-repo CCSDS/AEC coder: codec
  * roundtrips across the HDF5 profile (8/16/32 bpp, LSB/MSB sample order,
  * NN on/off), the stored-size header layout from H5Zszip.c, end-to-end
  * netCDF-4 scan agreement with a deflate twin, and named refusal of the
  * modes outside the profile (raw, odd widths, ambiguous byte order). */
class H5SzipSpec extends SparkSpec {

  private val MaskLsbNnEc = 8 | 32 | 4
  private val MaskMsbNnEc = 16 | 32 | 4
  private val MaskLsbEc = 8 | 4

  test("codec roundtrips across bpp, byte order, and preprocessing") {
    val rnd = new scala.util.Random(42)
    for {
      bpp <- Seq(8, 16, 32)
      mask <- Seq(MaskLsbNnEc, MaskMsbNnEc, MaskLsbEc)
      n <- Seq(1, 10, 64, 257) // partial blocks, partial scanlines
    } {
      val codec = SzipCodec(mask, pixelsPerBlock = 16, bitsPerPixel = bpp,
        pixelsPerScanline = 32)
      val es = bpp / 8
      val raw = new Array[Byte](n * es)
      // low-entropy ramp + noise: exercises zero blocks, k-splits, refs
      for (i <- 0 until n; k <- 0 until es)
        raw(i * es + k) = (((i / 7) + (if (k == 0) rnd.nextInt(3) else 0)) & 0xFF).toByte
      val enc = codec.encode(raw)
      assert(codec.decode(enc, raw.length).sameElements(raw),
        s"roundtrip bpp=$bpp mask=$mask n=$n")
    }
  }

  test("stored chunk leads with the H5Zszip little-endian byte count") {
    val codec = SzipCodec(MaskLsbNnEc, 16, 32, 16)
    val raw = Array.tabulate[Byte](64)(i => (i * 3).toByte)
    val enc = codec.encode(raw)
    val stored = (enc(0) & 0xFF) | ((enc(1) & 0xFF) << 8) |
      ((enc(2) & 0xFF) << 16) | ((enc(3) & 0xFF) << 24)
    assert(stored == raw.length)
  }

  test("LSB and MSB masks assemble samples in opposite byte order") {
    // one 16-bit sample 0x0102: LSB (LE data) reads 0x0102 from bytes
    // [02,01]; MSB reads it from [01,02] — the streams must agree on the
    // decoded SAMPLE, so cross-decoding the bytes flips them
    val lsb = SzipCodec(MaskLsbEc, 2, 16, 2)
    val msb = SzipCodec(16 | 4, 2, 16, 2)
    val leBytes = Array[Byte](0x02, 0x01, 0x04, 0x03)
    val beBytes = Array[Byte](0x01, 0x02, 0x03, 0x04)
    assert(msb.decode(lsb.encode(leBytes), 4).sameElements(beBytes))
  }

  test("modes outside the HDF5 profile are refused by name") {
    val raw = intercept[IllegalArgumentException] {
      SzipCodec(MaskLsbNnEc | 128, 16, 32, 16)
    }
    assert(raw.getMessage.contains("raw"))
    val width = intercept[IllegalArgumentException] {
      SzipCodec(MaskLsbNnEc, 16, 24, 16)
    }
    assert(width.getMessage.contains("24"))
    val order = intercept[IllegalArgumentException] {
      SzipCodec(4 | 32, 16, 32, 16) // neither LSB nor MSB
    }
    assert(order.getMessage.contains("LSB"))
    val both = intercept[IllegalArgumentException] {
      SzipCodec(4 | 8 | 16, 16, 32, 16) // both
    }
    assert(both.getMessage.contains("LSB"))
  }

  test("szip netCDF-4 file scans cell-identical to its deflate twin") {
    val tmp = Files.createTempDirectory("h5szip")
    def write(path: String, codec: String): Unit =
      H5Write.writeFile(spark, path,
        dims = Seq("time" -> 6, "y" -> 32),
        vars = Seq(
          H5Write.WriteVar("time", Seq("time"), "i4",
            Array.tabulate(6)(_.toDouble),
            attrs = Seq("units" -> "days since 2024-05-01")),
          H5Write.WriteVar("y", Seq("y"), "f8",
            Array.tabulate(32)(_ * 0.25)),
          H5Write.WriteVar("v", Seq("time", "y"), "i4",
            Array.tabulate(6 * 32)(i => ((i * 13) % 97).toDouble),
            numAttrs = Seq(("scale_factor", "f8", Array(0.5))))),
        chunkLead = 2, compress = true, codec = codec)
    write(tmp.resolve("sz.nc").toString, "szip")
    write(tmp.resolve("df.nc").toString, "deflate")
    val sz = spark.read.format("netcdf").load(tmp.resolve("sz.nc").toString)
    val df = spark.read.format("netcdf").load(tmp.resolve("df.nc").toString)
    assert(sz.count() == 6 * 32)
    assert(collectSet(sz) == collectSet(df))
    // the szip bytes really are a different pipeline (filter id 4 present)
    val bytes = Files.readAllBytes(tmp.resolve("sz.nc"))
    val sig = Array[Byte](4, 0, 0, 0, 0, 0, 4, 0) // id=4, nameLen=0, flags=0, nclient=4
    assert(bytes.sliding(sig.length).exists(_.sameElements(sig)),
      "szip filter entry must be declared in the pipeline message")
  }

  test("a szip stream with out-of-profile client values is refused by name") {
    val tmp = Files.createTempDirectory("h5szipbad")
    val src = tmp.resolve("ok.nc").toString
    H5Write.writeFile(spark, src,
      dims = Seq("time" -> 4, "y" -> 16),
      vars = Seq(
        H5Write.WriteVar("time", Seq("time"), "i4",
          Array.tabulate(4)(_.toDouble),
          attrs = Seq("units" -> "days since 2024-05-01")),
        H5Write.WriteVar("y", Seq("y"), "f8", Array.tabulate(16)(_.toDouble)),
        H5Write.WriteVar("v", Seq("time", "y"), "i4",
          Array.tabulate(64)(_.toDouble))),
      chunkLead = 1, compress = true, codec = "szip")
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(src))
    // patch the options mask client value (44 = LSB|NN|EC) to RAW|LSB|EC
    val sig = Array[Byte](4, 0, 0, 0, 0, 0, 4, 0, 44, 0, 0, 0)
    val at = bytes.sliding(sig.length).indexWhere(_.sameElements(sig))
    assert(at >= 0, "szip filter entry with mask 44 not found")
    bytes(at + 8) = (44 | 128).toByte
    val hostile = tmp.resolve("hostile.nc").toString
    Files.write(java.nio.file.Paths.get(hostile), bytes)
    val err = intercept[Throwable] {
      spark.read.format("netcdf").load(hostile).count()
    }
    val msgs = Iterator.iterate(err)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("raw"), s"expected named szip raw-mode refusal, got: $msgs")
  }
}
