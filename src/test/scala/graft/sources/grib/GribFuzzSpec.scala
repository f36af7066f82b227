package graft.sources.grib

import java.nio.file.Files
import java.time.LocalDateTime

import scala.util.Random

import graft.SparkSpec

/** Generative differential test of the GRIB1 writer→scanner pair: random
  * grids (dims, ascending/descending axes, decimal scales, forecast leads,
  * multi-message files, constant fields) round-trip every cell exactly. */
class GribFuzzSpec extends SparkSpec {

  test("random messages round-trip bit-exactly through write → scan (20 seeds, both editions)") {
    for (seed <- 0 until 20) {
      val edition = 1 + (seed % 2) // alternate GRIB1 / GRIB2 per seed
      val rnd = new Random(seed * 104729 + 7)
      val nMsgs = 1 + rnd.nextInt(3)
      val ni = 1 + rnd.nextInt(5)
      val nj = 1 + rnd.nextInt(4)
      val decimalScale = rnd.nextInt(3)
      val d = math.pow(10.0, decimalScale)
      val latStep = if (rnd.nextBoolean()) 0.5 else -0.5
      val lats = Seq.tabulate(nj)(j => -10.0 + latStep * j)
      val lons = Seq.tabulate(ni)(i => 100.0 + 0.25 * i)
      val msgs = (0 until nMsgs).map { mi =>
        val constant = rnd.nextInt(5) == 0
        val base = rnd.nextInt(2000) - 1000
        val vals = Array.tabulate(ni * nj)(k =>
          (if (constant) base else base + rnd.nextInt(500)) / d)
        (50 + mi, LocalDateTime.of(2024, 1 + rnd.nextInt(12), 1 + rnd.nextInt(28),
          rnd.nextInt(24), 0).plusHours(0), lats, lons, vals)
      }
      val dir = Files.createTempDirectory(s"gribfuzz$seed").toString
      // GRIB2 seeds rotate packing: simple → complex (5.2) → spatial-diff
      // (5.3 order 1 or 2) → PNG (5.41); grids with < 3 cells can't
      // difference at order 2
      val (cx, sd, png) = edition match {
        case 1 => (false, 0, false)
        case _ if seed % 8 == 6 => (false, 0, true)
        case _ => (seed % 4) / 2 match {
          case 0 => (seed % 8 >= 4, 0, false)
          case _ => (true, 1 + (if (ni * nj > 2) seed % 2 else 0), false)
        }
      }
      GribFormat.writeFile(spark, s"$dir/f.grb", msgs, decimalScale, edition,
        complexPacking = cx, spatialDiffOrder = if (ni * nj > sd) sd else 0,
        pngPacking = png)

      val rows = spark.read.format("grib1").load(s"$dir/f.grb").collect()
      assert(rows.length == nMsgs * ni * nj, s"seed=$seed row count")
      msgs.foreach { case (param, t, la, lo, vals) =>
        val mine = rows.filter(_.getAs[Int]("param") == param)
        assert(mine.length == ni * nj, s"seed=$seed param=$param")
        mine.foreach { r =>
          assert(r.getAs[LocalDateTime]("time") == t, s"seed=$seed time")
          val j = la.indexOf(r.getAs[Double]("latitude"))
          val i = lo.indexOf(r.getAs[Double]("longitude"))
          assert(j >= 0 && i >= 0, s"seed=$seed coords ${r}")
          val expected = vals(j * ni + i)
          assert(r.getAs[Double]("value") == expected,
            s"seed=$seed param=$param cell($j,$i): ${r.getAs[Double]("value")} != $expected")
        }
      }
    }
  }

  test("forecast leads across unit boundaries round-trip (hours into next day/year)") {
    val dir = Files.createTempDirectory("griblead2").toString
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val out = new java.io.DataOutputStream(
      fs.create(new org.apache.hadoop.fs.Path(s"$dir/l.grb"), true))
    try {
      // Dec 31 23:00 + 5h crosses the year boundary
      GribFormat.writeMessage(out, 61, LocalDateTime.of(2023, 12, 31, 23, 0),
        Seq(0.0), Seq(0.0), Array(1.0), leadHours = 5)
    } finally out.close()
    val t = spark.read.format("grib1").load(s"$dir/l.grb")
      .head().getAs[LocalDateTime]("time")
    assert(t == LocalDateTime.of(2024, 1, 1, 4, 0))
  }
}
