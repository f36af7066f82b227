package graft.sources

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.nc.NcFormat
import graft.sources.nc.NcFormat._

/** Generative differential test of the classic-NetCDF writer→scanner pair:
  * random grids (dim counts/sizes, record dim or not, variable types,
  * packing, fills, byte/short padding paths, single- vs multi-record-var
  * recSize rules) are written and scanned, and every decoded cell is
  * compared against the generating array. Offset/padding bugs in a binary
  * format hide exactly in the configurations a hand-written spec skips. */
class NcFuzzSpec extends SparkSpec {

  private val types = Seq(NcByte, NcShort, NcInt, NcFloat, NcDouble)

  /** In-range deterministic raw value for a cell. */
  private def rawValue(rnd: Random, t: Int): Double = t match {
    case NcByte => (rnd.nextInt(200) - 100).toDouble
    case NcShort => (rnd.nextInt(2000) - 1000).toDouble
    case NcInt => (rnd.nextInt(200000) - 100000).toDouble
    case NcFloat => math.round(rnd.nextFloat() * 1000) / 4.0 // exact in float
    case NcDouble => rnd.nextDouble() * 1000
  }

  test("random grids round-trip bit-exactly through write → scan (24 seeds)") {
    for (seed <- 0 until 24) {
      val rnd = new Random(seed * 7919 + 13)
      val nDims = 1 + rnd.nextInt(3)
      val dimSizes = Seq.fill(nDims)(1 + rnd.nextInt(4))
      val dimNames = (0 until nDims).map(i => s"d$i")
      val hasRecord = rnd.nextBoolean()
      val nVars = 1 + rnd.nextInt(3)
      val cells = dimSizes.product

      // coordinate variables for every dim (typed randomly but ordered)
      val coordVars = dimNames.zip(dimSizes).map { case (dn, n) =>
        WriteVar(dn, Seq(dn), NcDouble, Array.tabulate(n)(i => i * 1.5 + 0.25))
      }
      final case class Gen(name: String, t: Int, raw: Array[Double],
          scale: Double, offset: Double, fill: Option[Double], packed: Boolean)
      val gens = (0 until nVars).map { vi =>
        val t = types(rnd.nextInt(types.length))
        val fill = if (rnd.nextBoolean()) Some(rawValue(rnd, t)) else None
        val packed = rnd.nextBoolean()
        val raw = Array.tabulate(cells) { ci =>
          // ~1/5 cells carry the fill sentinel when one is declared
          if (fill.isDefined && (ci + vi) % 5 == 0) fill.get
          else {
            var v = rawValue(rnd, t)
            while (fill.contains(v)) v = rawValue(rnd, t)
            v
          }
        }
        Gen(s"v$vi", t, raw, if (packed) 0.125 else 1.0,
          if (packed) 10.0 else 0.0, fill, packed)
      }
      val dataVars = gens.map { g =>
        WriteVar(g.name, dimNames, g.t, g.raw,
          nattrs =
            (if (g.packed) Seq(
              ("scale_factor", NcDouble, Array(g.scale)),
              ("add_offset", NcDouble, Array(g.offset))) else Nil) ++
            g.fill.map(f => ("_FillValue", g.t, Array(f))).toSeq)
      }

      val dir = Files.createTempDirectory(s"ncfuzz$seed").toString
      NcFormat.writeFile(spark, s"$dir/f.nc",
        dims = dimNames.zip(dimSizes),
        vars = coordVars ++ dataVars,
        recordDim = if (hasRecord) Some(dimNames.head) else None,
        // alternate CDF-1 / CDF-2 (64-bit offset) headers per seed
        forceVersion = Some(1 + seed % 2))

      val df = spark.read.format("netcdf").load(s"$dir/f.nc")
      val rows = df.orderBy(dimNames.map(col): _*).collect()
      assert(rows.length == cells, s"seed=$seed: ${rows.length} rows != $cells")

      // odometer over the dims in row-major order = the orderBy order
      // (coords are increasing by construction)
      val strides = dimSizes.scanRight(1)(_ * _).tail
      rows.zipWithIndex.foreach { case (row, ci) =>
        dimNames.zipWithIndex.foreach { case (dn, di) =>
          val idx = ci / strides(di) % dimSizes(di)
          assert(row.getAs[Double](dn) == idx * 1.5 + 0.25,
            s"seed=$seed cell=$ci coord $dn")
        }
        gens.foreach { g =>
          val raw = g.raw(ci)
          val expectNull = g.fill.exists(f => NcFormat.fillMatches(
            // widen raw exactly as the reader does before comparing
            g.t match {
              case NcFloat => raw.toFloat.toDouble
              case _ => raw
            }, f, g.t))
          val i = row.fieldIndex(g.name)
          if (expectNull) assert(row.isNullAt(i), s"seed=$seed cell=$ci ${g.name} null")
          else if (g.packed) {
            val got = row.getDouble(i)
            val expected = (g.t match {
              case NcFloat => raw.toFloat.toDouble
              case _ => raw
            }) * g.scale + g.offset
            assert(got == expected, s"seed=$seed cell=$ci ${g.name}: $got != $expected")
          } else {
            val got: Double = g.t match {
              case NcByte => row.getByte(i).toDouble
              case NcShort => row.getShort(i).toDouble
              case NcInt => row.getInt(i).toDouble
              case NcFloat => row.getFloat(i).toDouble
              case NcDouble => row.getDouble(i)
            }
            val expected = g.t match {
              case NcFloat => raw.toFloat.toDouble
              case _ => raw
            }
            assert(got == expected, s"seed=$seed cell=$ci ${g.name}: $got != $expected")
          }
        }
      }
    }
  }
}
