package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Real WAV/PCM decode: bit-exact sample recovery across depths, channel
  * averaging, named refusal of compressed/non-PCM audio, and the feature
  * extractor's closed forms. */
class AudioSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  test("16-bit roundtrip recovers every sample; 8-bit handles the unsigned midpoint") {
    val s16 = Array(0, 1, -1, 32767, -32768, 12345, -12345)
    val d16 = Audio.decodeWav(1L, Audio.encodeWav(s16, 8000))
    assert(d16.sampleRate == 8000 && d16.channels == 1)
    s16.zip(d16.samples).foreach { case (s, f) =>
      assert(f == s / 32768.0f, s"$s vs $f")
    }
    val s8 = Array(0, 127, -128, 64)
    val d8 = Audio.decodeWav(2L, Audio.encodeWav(s8, 44100, bits = 8))
    s8.zip(d8.samples).foreach { case (s, f) =>
      assert(f == s / 128.0f, s"$s vs $f")
    }
  }

  test("stereo frames average channels; extra RIFF chunks are skipped") {
    // hand-build: stereo 16-bit, one LIST chunk before data
    val frames = Seq((1000, 3000), (-2000, 2000), (0, -500))
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    val dataLen = frames.length * 4
    out.write("RIFF".getBytes); w32(36 + 12 + dataLen); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); w32(16)
    w16(1); w16(2); w32(16000); w32(16000 * 4); w16(4); w16(16)
    out.write("LIST".getBytes); w32(4); out.write("INFO".getBytes)
    out.write("data".getBytes); w32(dataLen)
    frames.foreach { case (l, r) => w16(l & 0xFFFF); w16(r & 0xFFFF) }
    val d = Audio.decodeWav(3L, out.toByteArray)
    assert(d.channels == 2 && d.sampleRate == 16000)
    frames.zip(d.samples).foreach { case ((l, r), f) =>
      assert(math.abs(f - (l + r) / 2.0 / 32768.0) < 1e-7, s"($l,$r) vs $f")
    }
  }

  test("G.711 mu-law and A-law expand exactly (known vectors + quantized roundtrip)") {
    // canonical anchors: mu-law 0xFF is +0, 0x7F is -0; A-law 0x55 is -8
    assert(Audio.muLawDecode(0xFF.toByte) == 0)
    assert(Audio.muLawDecode(0x7F.toByte) == 0)
    assert(Audio.muLawEncode(0) == 0xFF.toByte)
    assert(Audio.aLawDecode(0x55.toByte) == -8)
    assert(Audio.aLawDecode(0xD5.toByte) == 8)
    // max magnitude: MSB-set codes are POSITIVE (0xFF = +0), so 0x80 is
    // +max and 0x00 is -max of segment 7
    assert(Audio.muLawDecode(0x80.toByte) == ((0xF * 8 + 0x84) << 7) - 0x84)
    assert(Audio.muLawDecode(0x00.toByte) == -(((0xF * 8 + 0x84) << 7) - 0x84))
    // every 8-bit code roundtrips through encode(decode(code)) == code
    // (A-law excepted on the two zero-adjacent codes by sign convention)
    for (c <- 0 to 255) {
      val mu = Audio.muLawDecode(c.toByte)
      assert(Audio.muLawEncode(mu) == c.toByte || mu == 0, f"mu $c%02x")
      val al = Audio.aLawDecode(c.toByte)
      assert(Audio.aLawEncode(al) == c.toByte, f"alaw $c%02x -> $al")
    }
    // companded WAVs decode through the one audioFeatures contract
    val samples = Array.tabulate(50)(i => (i - 25) * 700)
    for (aLaw <- Seq(false, true)) {
      val d = Audio.decodeWav(9L, Audio.encodeG711(samples, 8000, aLaw))
      assert(d.sampleRate == 8000 && d.samples.length == 50)
      samples.zip(d.samples).foreach { case (e, g) =>
        // one companding quantization step of relative error
        assert(math.abs(g * 32768.0 - e) <= math.max(16, math.abs(e) / 16.0),
          s"aLaw=$aLaw: $e vs ${g * 32768.0}")
      }
    }
  }

  test("compressed and non-PCM audio is refused by name") {
    val mp3 = "ID3".getBytes ++ Array.fill[Byte](50)(0)
    val e1 = intercept[IllegalArgumentException] { Audio.decodeWav(1L, mp3) }
    assert(e1.getMessage.contains("mp3"), e1.getMessage)
    // format 3 = IEEE float WAV
    val wav = Audio.encodeWav(Array(1, 2, 3), 8000)
    wav(20) = 3
    val e2 = intercept[IllegalArgumentException] { Audio.decodeWav(2L, wav) }
    assert(e2.getMessage.contains("format 3"), e2.getMessage)
    // truncated data chunk fails named, not with an index error
    val cut = java.util.Arrays.copyOf(Audio.encodeWav(Array.fill(100)(5), 8000), 60)
    val e3 = intercept[IllegalArgumentException] { Audio.decodeWav(3L, cut) }
    assert(e3.getMessage.contains("truncated"), e3.getMessage)
  }

  test("audioFeatures closed forms: duration, zero crossings skip zeros, rms") {
    // +1000, -1000 alternating with zeros interleaved: 3 sign changes,
    // zeros never count
    val s = Array(1000, 0, -1000, 0, 1000, -1000, 0)
    val df = Seq((7L, Audio.encodeWav(s, 1000))).toDF("id", "wav")
    val r = Audio.audioFeatures(df, "id", "wav").head()
    assert(r.getAs[Int]("sample_rate") == 1000)
    assert(r.getAs[Long]("n_samples") == 7)
    assert(r.getAs[Long]("duration_ms") == 7)
    assert(r.getAs[Long]("zero_crossings") == 3)
    val amp = 1000 / 32768.0
    assert(math.abs(r.getAs[Double]("rms") - amp * math.sqrt(4.0 / 7)) < 1e-9)
    assert(math.abs(r.getAs[Double]("peak") - amp) < 1e-9)
  }
}
