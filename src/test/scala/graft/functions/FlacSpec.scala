package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import Flac._

/** FLAC codec: exact roundtrips across subframe types (constant /
  * verbatim / fixed 0-4 / LPC), Rice partitions and escapes, stereo
  * decorrelations, wasted bits, multi-frame streams, CRC verification,
  * and the named refusals. FLAC is lossless — every compare is exact
  * integer equality. */
class FlacSpec extends AnyFunSuite {

  private def mono(n: Int)(f: Int => Int): Array[Array[Int]] =
    Array(Array.tabulate(n)(f))

  private def roundtrip(ch: Array[Array[Int]], bits: Int = 16,
      blockSize: Int = 256, strategy: Strategy = Fixed(2),
      stereo: StereoMode = Independent, wasted: Int = 0,
      label: String = ""): FlacAudio = {
    val enc = Flac.encode(ch, 8000, bits, blockSize, strategy, stereo, wasted)
    val dec = Flac.decode(enc)
    assert(dec.sampleRate == 8000 && dec.channels == ch.length &&
      dec.bits == bits, label)
    for (c <- ch.indices) {
      assert(dec.samples(c).length == ch(c).length, s"$label ch $c length")
      ch(c).zip(dec.samples(c)).zipWithIndex.foreach { case ((e, g), i) =>
        assert(e == g, s"$label ch $c sample $i: $e vs $g")
      }
    }
    dec
  }

  test("verbatim and fixed orders 0-4 roundtrip exactly, multi-frame") {
    val src = mono(1000)(i => ((i * 37) % 4001) - 2000)
    roundtrip(src, strategy = Verbatim, label = "verbatim")
    for (order <- 0 to 4)
      roundtrip(src, strategy = Fixed(order), label = s"fixed $order")
  }

  test("constant subframes auto-detect (silence compresses massively)") {
    val silence = mono(2048)(_ => 0)
    val enc = Flac.encode(silence, 8000)
    assert(enc.length < 200, s"silence should be tiny: ${enc.length}")
    val dec = Flac.decode(enc)
    assert(dec.samples(0).forall(_ == 0) && dec.samples(0).length == 2048)
    roundtrip(mono(500)(_ => -1234), label = "constant nonzero")
  }

  test("LPC subframes roundtrip (explicit quantized coefficients)") {
    val src = mono(600)(i => (math.sin(i * 0.05) * 8000).toInt)
    roundtrip(src, strategy = Lpc(Array(2, -1), 0), label = "lpc [2,-1]")
    roundtrip(src, strategy = Lpc(Array(3000, -1500, 400), 11, precision = 13),
      label = "lpc shifted")
    roundtrip(src, strategy = Lpc(Array.tabulate(8)(j => 100 - j * 20), 7),
      label = "lpc order 8")
  }

  test("Rice partitions and both coding methods roundtrip") {
    val src = mono(512)(i => ((i * 97) % 801) - 400)
    for (p <- 0 to 3; m <- 0 to 1)
      roundtrip(src, strategy = Fixed(1, partitionOrder = p, method = m),
        label = s"partitions 2^$p method $m")
  }

  test("Rice escape partitions fire on wild residuals and roundtrip") {
    // alternating extremes defeat every fixed predictor → escape hatch
    val src = mono(256)(i => if (i % 2 == 0) 30000 else -30000)
    val dec = roundtrip(src, strategy = Fixed(2), label = "escape")
    assert(dec.samples(0)(0) == 30000 && dec.samples(0)(1) == -30000)
  }

  test("stereo decorrelations roundtrip (left/side, right/side, mid/side)") {
    val l = Array.tabulate(700)(i => ((i * 31) % 2001) - 1000)
    val r = Array.tabulate(700)(i => ((i * 17 + 5) % 1801) - 900)
    for (mode <- Seq(Independent, LeftSide, RightSide, MidSide))
      roundtrip(Array(l, r), stereo = mode, label = mode.toString)
    // odd mid/side sums exercise the reconstruction low bit
    val odd = Array(Array.tabulate(300)(i => i * 2 + 1), Array.tabulate(300)(i => i * 2))
    roundtrip(odd, stereo = MidSide, label = "mid/side odd sums")
  }

  test("wasted bits encode/decode (low zero bits shifted out)") {
    val src = mono(400)(i => (((i * 13) % 500) - 250) << 3)
    val plain = Flac.encode(src, 8000)
    val shifted = Flac.encode(src, 8000, wastedBits = 3)
    assert(shifted.length < plain.length,
      s"wasted-bit stream should shrink: ${shifted.length} vs ${plain.length}")
    val dec = Flac.decode(shifted)
    src(0).zip(dec.samples(0)).foreach { case (e, g) => assert(e == g) }
  }

  test("bit depths 8/12/16/20/24 roundtrip") {
    for (bits <- Seq(8, 12, 16, 20, 24)) {
      val half = 1 << (bits - 1)
      val src = mono(300)(i => ((i * 131) % (2 * half - 1)) - (half - 1))
      roundtrip(src, bits = bits, label = s"$bits-bit")
    }
  }

  test("block sizes, partial tail frames, and frame indexing roundtrip") {
    val src = mono(777)(i => (i % 401) - 200) // 777 = 3*256 + 9: short tail
    roundtrip(src, blockSize = 256, label = "tail frame")
    roundtrip(src, blockSize = 192, label = "192")
    roundtrip(src, blockSize = 777, label = "single frame")
  }

  test("STREAMINFO total_samples 0 = unknown length is accepted") {
    val enc = Flac.encode(mono(300)(i => (i * 7) % 100), 8000)
    // total_samples lives in STREAMINFO bits 144..179 (bytes 8+4+18..):
    // header 4 + blockhdr 4 + 18 bytes in, spanning the low 4 bits of
    // byte 21 and bytes 22-25 of the block payload
    val off = 4 + 4 + 13 // byte holding (bits-1 low bits | total high 4)
    enc(off) = (enc(off) & 0xF0.toByte).toByte
    for (k <- 1 to 4) enc(off + k) = 0
    val dec = Flac.decode(enc)
    assert(dec.samples(0).length == 300, "unknown-length stream decodes fully")
  }

  test("corrupt streams and out-of-profile inputs are refused by name") {
    val good = Flac.encode(mono(300)(i => i % 100), 8000)
    // CRC-16 flip
    val bad = good.clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 0x5A).toByte
    val eCrc = intercept[IllegalArgumentException](Flac.decode(bad))
    assert(eCrc.getMessage.contains("CRC"), eCrc.getMessage)
    // header CRC-8 flip: find first frame (after 4 + 4 + 34 metadata)
    val bad8 = good.clone()
    bad8(42 + 4) = (bad8(42 + 4) ^ 0x01).toByte // inside the frame header
    val eCrc8 = intercept[IllegalArgumentException](Flac.decode(bad8))
    assert(eCrc8.getMessage.contains("CRC"), eCrc8.getMessage)
    // Ogg named
    val eOgg = intercept[IllegalArgumentException](
      Flac.decode("OggS0000000000000000000000000000000000000000000".getBytes))
    assert(eOgg.getMessage.contains("Ogg"), eOgg.getMessage)
    // wrong magic named
    val eMagic = intercept[IllegalArgumentException](
      Flac.decode(Array.fill[Byte](64)('x')))
    assert(eMagic.getMessage.contains("not a FLAC"), eMagic.getMessage)
    // truncated mid-frame
    val eTrunc = intercept[IllegalArgumentException](
      Flac.decode(good.dropRight(5)))
    assert(eTrunc.getMessage.toLowerCase.matches(".*(truncated|corrupt|crc).*"),
      eTrunc.getMessage)
  }

  test("duplicated / out-of-order frames are refused by frame number") {
    // two-block stream; locate the second frame's start (sync 0xFFF8)
    val good = Flac.encode(
      Array(Array.tabulate(512)(i => (i % 200) - 100)), 8000, 16,
      blockSize = 256)
    def isSync(b: Array[Byte], o: Int) =
      (b(o) & 0xFF) == 0xFF && (b(o + 1) & 0xF8) == 0xF8
    val first = (0 until good.length - 1).find(isSync(good, _)).get
    val second = (first + 2 until good.length - 1).find(isSync(good, _)).get
    // duplicate frame 0 in place of frame 1: both CRC-valid, numbers 0,0
    val forged = good.take(second) ++
      java.util.Arrays.copyOfRange(good, first, second)
    val e = intercept[IllegalArgumentException](Flac.decode(forged))
    assert(e.getMessage.contains("frame number"), e.getMessage)
  }
}
