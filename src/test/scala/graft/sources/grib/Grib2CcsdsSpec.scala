package graft.sources.grib

import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** GRIB2 template 5.42 — CCSDS/AEC (Rice) packing. Codec-level roundtrips
  * sweep the option space (k-split, uncompressed, zero blocks, reference
  * segments, RSI padding); the low-entropy decode paths the encoder never
  * emits (second extension, long zero runs, remainder-of-segment) are
  * pinned against hand-assembled bitstreams; writer→scan roundtrips gate
  * the GRIB integration incl. bitmaps and multi-segment grids. */
class Grib2CcsdsSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def params(pre: Boolean = true, block: Int = 16, rsi: Int = 8,
      pad: Boolean = false): Ccsds.Params =
    Ccsds.Params(
      flags = Ccsds.FlagMsb | (if (pre) Ccsds.FlagPreprocess else 0) |
        (if (pad) Ccsds.FlagPadRsi else 0),
      blockSize = block, rsi = rsi)

  test("codec roundtrip across bit widths, block sizes, RSI, lengths, data shapes") {
    def mix(i: Int, bps: Int, shape: Int): Long = {
      val xmax = (1L << bps) - 1
      shape match {
        case 0 => 0L // constant zero → zero blocks
        case 1 => xmax / 2 // constant mid → preprocess zero deltas
        case 2 => (i.toLong * 3) % (xmax + 1) // gentle ramp → small k
        case 3 => // noisy full range → uncompressed blocks appear
          val h = (i * 2654435761L) ^ (i << 7)
          java.lang.Long.remainderUnsigned(h, xmax + 1)
        case 4 => if (i % 37 < 30) 0L else xmax // zero runs + spikes
      }
    }
    for {
      bps <- Seq(2, 4, 8, 12, 16, 20, 31)
      (block, rsi) <- Seq((16, 8), (8, 2), (64, 1), (32, 255))
      pre <- Seq(true, false)
      pad <- Seq(false, true)
      n <- Seq(1, 7, 16, 129, 1000)
      shape <- 0 to 4
    } {
      val p = params(pre, block, rsi, pad)
      val xs = Array.tabulate(n)(i => mix(i, bps, shape))
      val enc = Ccsds.encode(xs, bps, p)
      val dec = Ccsds.decode(enc, n, bps, p)
      assert(dec.sameElements(xs),
        s"roundtrip bps=$bps block=$block rsi=$rsi pre=$pre pad=$pad n=$n shape=$shape: " +
          s"first diff at ${dec.indices.find(i => dec(i) != xs(i))}")
    }
  }

  test("property: arbitrary sample arrays roundtrip under arbitrary parameters") {
    import org.scalacheck.{Gen, Prop}
    val gen = for {
      bps <- Gen.choose(2, 31)
      block <- Gen.oneOf(2, 4, 8, 16, 32, 64)
      rsi <- Gen.choose(1, 64)
      pre <- Gen.oneOf(true, false)
      pad <- Gen.oneOf(true, false)
      n <- Gen.choose(0, 700)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield (bps, block, rsi, pre, pad, n, seed)
    val prop = Prop.forAll(gen) { case (bps, block, rsi, pre, pad, n, seed) =>
      val xmax = (1L << bps) - 1
      val rnd = new scala.util.Random(seed)
      // mixed texture: runs of zeros, smooth ramps, and white noise —
      // exercises zero-block, low-k split, and uncompressed selection
      val xs = Array.tabulate(n) { i =>
        rnd.nextInt(3) match {
          case 0 => 0L
          case 1 => (i.toLong * (1 + (seed & 7))) % (xmax + 1)
          case _ => (rnd.nextLong() & Long.MaxValue) % (xmax + 1)
        }
      }
      val p = params(pre, block, rsi, pad)
      Ccsds.decode(Ccsds.encode(xs, bps, p), n, bps, p).sameElements(xs)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  /** Bit-writer mirroring the codec's MSB-first conventions for
    * hand-assembling streams the encoder never produces. */
  private final class Bits {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
    def put(v: Long, n: Int): this.type = {
      (n - 1 to 0 by -1).foreach(i => buf += ((v >>> i) & 1L).toInt)
      this
    }
    def fs(m: Long): this.type = { (0L until m).foreach(_ => put(0, 1)); put(1, 1) }
    def bytes: Array[Byte] = buf.grouped(8).map { g =>
      val b = g.padTo(8, 0)
      (0 until 8).foldLeft(0)((a, i) => (a << 1) | b(i)).toByte
    }.toArray
  }

  test("second-extension blocks decode (triangular unpairing), hand-assembled") {
    // bps=8 → idLen=3; no preprocess; J=4, one block of pairs (1,2),(0,3):
    // m = (d1+d2)(d1+d2+1)/2 + d2 → 8 and 9
    val stream = new Bits().put(0, 3).put(1, 1).fs(8).fs(9).bytes
    val got = Ccsds.decode(stream, 4, 8, params(pre = false, block = 4, rsi = 4))
    assert(got.toSeq == Seq(1L, 2L, 0L, 3L))
  }

  test("zero-block runs: counts above 5 are stored one high; ROS zeroes the segment") {
    // 8 blocks of 4 samples, run stored as fs=8 → 9 → decoder subtracts → 8 blocks
    val runHigh = new Bits().put(0, 3).put(0, 1).fs(8).bytes
    assert(Ccsds.decode(runHigh, 32, 8, params(pre = false, block = 4, rsi = 16))
      .forall(_ == 0L))
    // ROS (fs=4 → count 5): rest of the 64-block segment is zero
    val ros = new Bits().put(0, 3).put(0, 1).fs(4).bytes
    assert(Ccsds.decode(ros, 64, 8, params(pre = false, block = 4, rsi = 16))
      .forall(_ == 0L))
  }

  test("unsupported CCSDS modes are refused by name") {
    val xs = Array(1L, 2L, 3L)
    for (bad <- Seq(Ccsds.FlagSigned, Ccsds.Flag3Byte, Ccsds.FlagRestricted)) {
      val e = intercept[IllegalArgumentException] {
        Ccsds.decode(Array[Byte](0), 3, 8,
          Ccsds.Params(Ccsds.FlagMsb | bad, 16, 8))
      }
      assert(e.getMessage.toLowerCase.contains("unsupported"))
    }
    val lsb = intercept[IllegalArgumentException] {
      Ccsds.encode(xs, 8, Ccsds.Params(0, 16, 8))
    }
    assert(lsb.getMessage.contains("MSB"))
  }

  test("writer → parser → scan roundtrip: negatives, decimals, bitmap holes") {
    val dir = Files.createTempDirectory("grib2ccsds").toString
    val vals = Array(1.25, -3.5, Double.NaN, 10.0, 0.0, 99.75, -0.25, 7.5, Double.NaN, 2.0)
    GribFormat.writeFile(spark, s"$dir/c.grb2", Seq(
      (61, LocalDateTime.of(2024, 3, 1, 0, 0), Seq(-45.5, -45.0),
        Seq(10.0, 10.5, 11.0, 11.5, 12.0), vals)),
      decimalScale = 2, edition = 2, ccsdsPacking = true)
    val df = spark.read.format("grib1").load(s"$dir/c.grb2")
      .orderBy("latitude", "longitude")
    val got = df.select("value").as[java.lang.Double].collect()
    assert(got.length == 10)
    vals.zip(got).foreach { case (e, g) =>
      if (e.isNaN) assert(g == null) else assert(g == e, s"$e vs $g")
    }
  }

  test("multi-segment grid (several RSI boundaries) survives the scan bit-exact") {
    // 8 x 50 = 400 samples = 25 blocks of 16 → 4 reference segments at RSI 8
    val dir = Files.createTempDirectory("grib2ccsds_seg").toString
    val lats = (0 until 8).map(j => 10.0 + j * 0.5)
    val lons = (0 until 50).map(i => 100.0 + i * 0.25)
    val vals = Array.tabulate(400)(i => ((i * 37) % 997).toDouble / 4.0)
    GribFormat.writeFile(spark, s"$dir/seg.grb2", Seq(
      (7, LocalDateTime.of(2024, 6, 1, 12, 0), lats, lons, vals)),
      decimalScale = 2, edition = 2, ccsdsPacking = true)
    val got = spark.read.format("grib1").load(s"$dir/seg.grb2")
      .orderBy(col("latitude"), col("longitude"))
      .select("value").as[Double].collect()
    assert(got.toSeq == vals.toSeq)
  }
}
