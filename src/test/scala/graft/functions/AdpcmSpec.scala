package graft.functions

import graft.SparkSpec

/** ADPCM WAV decode (IMA format 17, MS format 2): hand-computed state
  * machine vectors pin the wire format (nibble order, table stepping,
  * header layout); roundtrip bounds pin tracking quality; refusals pin
  * the profile. No JDK counterpart exists to interop-pin (javax.sound
  * reads only PCM/G.711 WAV) — the q175 bound gate replays the target
  * wave instead. */
class AdpcmSpec extends SparkSpec {

  test("IMA hand vector: header sample, LOW-nibble-first codes, index walk") {
    // block: pred=1000 (LE), index=0, reserved, one code byte 0x81
    // low nibble 1: step=7, diff = 7>>2 = 1 -> 1001, index -1 -> 0
    // high nibble 8: diff = 7>>3 = 0, sign -> 1001, index -1 -> 0
    val data = Array[Byte](
      (1000 & 0xFF).toByte, ((1000 >> 8) & 0xFF).toByte, 0, 0, 0x81.toByte)
    val wav = wrapWav(17, blockAlign = 5, bits = 4, data)
    val d = Audio.decodeWav(1L, wav)
    assert(d.samples.map(v => math.round(v * 32768f)).toSeq == Seq(1000, 1001, 1001))
  }

  test("IMA step reconstruction matches the spec's integer expansion") {
    // index 20 -> step 50; code 7: diff = 6 + 12 + 25 + 50 = 93... spec
    // form is (step>>3) + (step>>2) + (step>>1) + step = 6+12+25+50 = 93
    val data = Array[Byte](0, 0, 20, 0, 0x07)
    val d = Audio.decodeWav(2L, wrapWav(17, 5, 4, data))
    // second code is nibble 0: diff = step>>3; after code 7 index 20+8=28
    // -> step 107 -> diff 13
    assert(math.round(d.samples(1) * 32768f) == 93)
    assert(math.round(d.samples(2) * 32768f) == 93 + (Audio.ImaStepTable(28) >> 3))
  }

  test("MS hand vector: warm-up order s2 then s1, HIGH-nibble-first codes") {
    // header: predictor 0, delta=16, s1=100, s2=50; one byte 0x1F
    // high nibble 1: pred = 100 + 1*16 = 116; delta = max(16, 230*16/256)=16
    // low nibble 15 (= -1): pred = 116 - 16 = 100
    val data = Array[Byte](0, 16, 0, 100, 0, 50, 0, 0x1F)
    val d = Audio.decodeWav(3L, wrapWav(2, blockAlign = 8, bits = 4, data))
    assert(d.samples.map(v => math.round(v * 32768f)).toSeq ==
      Seq(50, 100, 116, 100))
  }

  test("IMA roundtrip tracks a ramp wave within one adapted step") {
    val n = 1010 // exactly 2 blocks at blockAlign 256
    val x = Array.tabulate(n) { t =>
      val ph = t % 50
      8000 * (math.abs(ph - 25) - 12) / 13
    }
    val wav = Audio.encodeImaAdpcm(x, 8000)
    val d = Audio.decodeWav(4L, wav)
    assert(d.samples.length == n)
    assert(d.sampleRate == 8000 && d.channels == 1)
    val maxErr = x.indices.map(i =>
      math.abs(d.samples(i) * 32768f - x(i))).max
    assert(maxErr < 1000, s"IMA max error $maxErr")
    // block boundaries restart from an exact header sample
    assert(math.round(d.samples(0) * 32768f) == x(0))
    assert(math.round(d.samples(505) * 32768f) == x(505))
  }

  test("MS roundtrip tracks a ramp wave within one adapted delta") {
    val n = 1000 // exactly 2 blocks at blockAlign 256
    val x = Array.tabulate(n) { t =>
      val ph = t % 50
      8000 * (math.abs(ph - 25) - 12) / 13
    }
    val wav = Audio.encodeMsAdpcm(x, 8000)
    val d = Audio.decodeWav(5L, wav)
    assert(d.samples.length == n)
    val maxErr = x.indices.map(i =>
      math.abs(d.samples(i) * 32768f - x(i))).max
    assert(maxErr < 1000, s"MS max error $maxErr")
    // warm-up samples are verbatim
    assert(math.round(d.samples(0) * 32768f) == x(0))
    assert(math.round(d.samples(1) * 32768f) == x(1))
  }

  test("a short final IMA block decodes the codes it carries") {
    val x = Array.tabulate(505 + 101)(t => (t % 40) * 100 - 2000)
    val full = Audio.encodeImaAdpcm(x, 8000)
    // drop the tail of the second block: keep header + 50 code bytes
    val keep = 12 + 8 + 20 + 8 + 256 + 4 + 50 // riff+fmt hdr+fmt+data hdr+blk1+blk2 part
    val cut = java.util.Arrays.copyOfRange(full, 0, keep)
    // patch the RIFF and data chunk sizes
    def p32(off: Int, v: Int): Unit = {
      cut(off) = (v & 0xFF).toByte; cut(off + 1) = ((v >> 8) & 0xFF).toByte
      cut(off + 2) = ((v >> 16) & 0xFF).toByte; cut(off + 3) = ((v >>> 24) & 0xFF).toByte
    }
    p32(4, cut.length - 8)
    p32(12 + 8 + 20 + 4, 256 + 4 + 50)
    val d = Audio.decodeWav(6L, cut)
    assert(d.samples.length == 505 + 1 + 100) // header sample + 50 bytes x2
  }

  test("stereo ADPCM and non-4-bit ADPCM are refused by name") {
    val mono = Audio.encodeImaAdpcm(Array.fill(505)(0), 8000)
    val stereo = mono.clone()
    stereo(22) = 2 // channels field
    val e = intercept[IllegalArgumentException](Audio.decodeWav(7L, stereo))
    assert(e.getMessage.contains("mono only"), e.getMessage)
    val badBits = mono.clone()
    badBits(34) = 8 // bitsPerSample field
    val e2 = intercept[IllegalArgumentException](Audio.decodeWav(8L, badBits))
    assert(e2.getMessage.contains("4-bit"), e2.getMessage)
  }

  test("audioFeatures drives ADPCM through the same contract as PCM") {
    val sp = spark; import sp.implicits._
    val x = Array.tabulate(1010)(t => ((t % 50) - 25) * 300)
    val df = Seq(
      (1L, Audio.encodeImaAdpcm(x, 8000)),
      (2L, Audio.encodeMsAdpcm(java.util.Arrays.copyOfRange(x, 0, 1000), 8000))
    ).toDF("id", "wav")
    val rows = Audio.audioFeatures(df, "id", "wav").orderBy("id").collect()
    assert(rows(0).getAs[Long]("n_samples") == 1010)
    assert(rows(0).getAs[Long]("duration_ms") == 1010 * 1000 / 8000)
    assert(rows(1).getAs[Long]("n_samples") == 1000)
    assert(rows.forall(_.getAs[Int]("sample_rate") == 8000))
    assert(rows.forall(_.getAs[Long]("zero_crossings") > 10))
  }

  /** Minimal WAV wrapper for hand-crafted ADPCM payloads. */
  private def wrapWav(fmt: Int, blockAlign: Int, bits: Int,
      data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    out.write("RIFF".getBytes("US-ASCII")); w32(28 + data.length)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16)
    w16(fmt); w16(1); w32(8000); w32(8000)
    w16(blockAlign); w16(bits)
    out.write("data".getBytes("US-ASCII")); w32(data.length)
    out.write(data)
    val b = out.toByteArray
    if ((data.length & 1) == 1) b :+ 0.toByte else b
  }
}
