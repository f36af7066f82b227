package graft.sources.h5

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Generative differential test of the netCDF-4 writer→scanner pair
  * (NcFuzzSpec's shape for the HDF5 route): random grids — dim counts and
  * sizes, dtypes, chunk lengths (incl. ragged tails), compression on/off,
  * packing, fills — written by H5Write and scanned through
  * `format("netcdf")`, each decoded cell compared against the generating
  * array. Binary-offset bugs hide in the configurations a hand-written
  * spec skips. */
class H5FuzzSpec extends SparkSpec {

  private val dtypes = Seq("f8", "f4", "i4")

  private def rawValue(rnd: Random, t: String): Double = t match {
    case "i4" => (rnd.nextInt(200000) - 100000).toDouble
    case "f4" => math.round(rnd.nextFloat() * 1000) / 4.0 // exact in float
    case "f8" => math.floor(rnd.nextDouble() * 1e9) / 1000.0
  }

  test("random netCDF-4 grids round-trip bit-exactly through write → scan (16 seeds)") {
    for (seed <- 0 until 16) {
      val rnd = new Random(seed * 104729 + 17)
      val nDims = 1 + rnd.nextInt(3)
      val dimSizes = Seq.fill(nDims)(1 + rnd.nextInt(5))
      val dimNames = (0 until nDims).map(i => s"d$i")
      val cells = dimSizes.product
      val dtype = dtypes(rnd.nextInt(dtypes.length))
      val compress = rnd.nextBoolean()
      val chunkLead = 1 + rnd.nextInt(dimSizes.head + 1) // may exceed → clamped
      val packed = dtype == "i4" && rnd.nextBoolean()
      val hasFill = rnd.nextBoolean()
      val fillRaw = -888888.0
      val data = Array.tabulate(cells) { k =>
        if (hasFill && k % 7 == 3) fillRaw else rawValue(rnd, dtype)
      }
      val coords = dimNames.zip(dimSizes).map { case (d, n) =>
        H5Write.WriteVar(d, Seq(d), "f8",
          Array.tabulate(n)(i => i * 2.0 + 0.5))
      }
      val dataVar = H5Write.WriteVar("v", dimNames, dtype, data,
        numAttrs =
          (if (packed) Seq(("scale_factor", "f8", Array(0.5))) else Seq.empty) ++
          (if (hasFill) Seq(("_FillValue", dtype, Array(fillRaw))) else Seq.empty))
      val path = s"${System.getProperty("java.io.tmpdir")}/h5fuzz_$seed.nc"
      H5Write.writeFile(spark, path, dimNames.zip(dimSizes), coords :+ dataVar,
        chunkLead = chunkLead, compress = compress,
        codec = if (rnd.nextBoolean()) "zstd" else "deflate")

      val df = spark.read.format("netcdf").load(path)
      val rows = df.orderBy(dimNames.map(col): _*).collect()
      assert(rows.length == cells, s"seed $seed: ${rows.length} of $cells rows")
      rows.zipWithIndex.foreach { case (r, k) =>
        // row-major cell index from the sorted coords
        dimNames.zipWithIndex.foreach { case (d, j) =>
          val idx = (k / dimSizes.drop(j + 1).product) % dimSizes(j)
          assert(r.getAs[Double](d) == idx * 2.0 + 0.5, s"seed $seed row $k dim $d")
        }
        val vIdx = r.fieldIndex("v")
        if (hasFill && k % 7 == 3) assert(r.isNullAt(vIdx), s"seed $seed cell $k fill")
        else {
          val expect = if (packed) data(k) * 0.5 else data(k)
          val got: Double = r.get(vIdx) match {
            case d: Double => d
            case f: Float => f.toDouble
            case i: Int => i.toDouble
            case other => fail(s"seed $seed: unexpected cell type $other")
          }
          assert(got == (dtype match {
            case "f4" if !packed => data(k).toFloat.toDouble
            case _ => expect
          }), s"seed $seed cell $k")
        }
      }
    }
  }

  test("multi-file combine refuses chunk-misaligned leading extents") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/h5fuzz_misalign"
    graft.store.GridStore.fileSystem(spark, dir)
      .delete(new org.apache.hadoop.fs.Path(dir), true)
    Seq(("a", 5), ("b", 4)).foreach { case (tag, n) =>
      H5Write.writeFile(spark, s"$dir/part_$tag.nc",
        dims = Seq("time" -> n, "x" -> 2),
        vars = Seq(
          H5Write.WriteVar("time", Seq("time"), "i4",
            Array.tabulate(n)(_.toDouble),
            attrs = Seq("units" -> "days since 2024-01-01")),
          H5Write.WriteVar("x", Seq("x"), "f8", Array(1.0, 2.0)),
          H5Write.WriteVar("v", Seq("time", "x"), "f8",
            Array.tabulate(n * 2)(_.toDouble))),
        chunkLead = 2, compress = false) // 5 % 2 != 0 in the first file
    }
    val conf = spark.sparkContext.hadoopConfiguration
    val ex = intercept[IllegalArgumentException] {
      Hdf5Kerchunk.combineHdf5(conf,
        Seq(s"$dir/part_a.nc", s"$dir/part_b.nc"))
    }
    assert(ex.getMessage.contains("not aligned"))
  }
}
