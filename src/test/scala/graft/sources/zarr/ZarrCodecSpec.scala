package graft.sources.zarr

import java.util.zip.Deflater

import org.scalatest.funsuite.AnyFunSuite

/** Blosc/LZ4/zlib chunk decode against (a) the reference repo's own
  * c-blosc-written zarr fixture (tests/unit/inputs/timeseries_data.zarr —
  * real numcodecs Blosc-LZ4 + byte-shuffle output) and (b) synthetic
  * multi-block containers built straight from the c-blosc 1.x chunk format
  * spec (README_CHUNK_FORMAT.rst), covering the paths the tiny fixture
  * can't reach: multiple blocks, split streams, leftover block, per-block
  * shuffle, zlib inner codec.
  */
class ZarrCodecSpec extends AnyFunSuite {

  private val fixture = "/root/reference/tests/unit/inputs/timeseries_data.zarr"
  private def fixtureBytes(rel: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$fixture/$rel"))
  private def haveFixture: Boolean = new java.io.File(fixture).isDirectory

  private def le64(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xFFL); i -= 1 }
    v
  }

  // ------------------------------------------------ reference fixture decode

  test("fixture time chunk (LZ4 + shuffle, dont-split) decodes to 0..36") {
    assume(haveFixture)
    val raw = ZarrCodec.bloscDecode(fixtureBytes("time/0"))
    assert(raw.length == 37 * 8)
    val vals = Array.tabulate(37)(i => le64(raw, i * 8))
    // units "days since 2024-01-01": 37 daily steps
    assert(vals.toSeq == (0L until 37L))
  }

  test("fixture temperature chunks (memcpy mode) decode to their raw doubles") {
    assume(haveFixture)
    (0 to 3).foreach { c =>
      val chunk = fixtureBytes(s"temperature/$c")
      assert((chunk(2) & 0x2) != 0, s"chunk $c expected memcpy flag")
      val dec = ZarrCodec.bloscDecode(chunk)
      // memcpy'ed payload starts right after the 16-byte header
      assert(dec.toSeq == chunk.drop(16).toSeq, s"chunk $c")
      // valid cells parse as finite doubles; shape is 37 = 3×10 + 7, so
      // chunk 3's cells 7-9 are NaN fill padding past the array end
      val valid = if (c == 3) 7 else 10
      (0 until valid).foreach { i =>
        val d = java.lang.Double.longBitsToDouble(le64(dec, i * 8))
        assert(!d.isNaN && !d.isInfinite, s"chunk $c cell $i")
      }
    }
  }

  // ------------------------------------------- synthetic container builder

  /** Inverse of the decoder's per-block unshuffle. */
  private def shuffleBlock(data: Array[Byte], off: Int, len: Int, ts: Int): Unit = {
    val n = len / ts
    val tmp = new Array[Byte](n * ts)
    var b = 0
    while (b < ts) {
      var i = 0
      while (i < n) { tmp(b * n + i) = data(off + i * ts + b); i += 1 }
      b += 1
    }
    System.arraycopy(tmp, 0, data, off, n * ts)
  }

  private def zlib(src: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val d = new Deflater(6)
    d.setInput(src, off, len); d.finish()
    val out = new java.io.ByteArrayOutputStream(64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Build a c-blosc 1.x container (zlib inner codec) following the public
    * chunk format: 16-byte header, block offset table, per block
    * `nstreams × (csize | stream)`, shuffle applied PER BLOCK, leftover
    * block never split, streams stored verbatim when compression loses. */
  private def bloscContainer(raw: Array[Byte], typesize: Int, blocksize: Int,
      shuffle: Boolean, dontSplit: Boolean, codecId: Int = 3,
      compressFn: (Array[Byte], Int, Int) => Array[Byte] = zlib): Array[Byte] = {
    require(blocksize % typesize == 0)
    val nbytes = raw.length
    val nblocks = (nbytes + blocksize - 1) / blocksize
    val work = raw.clone()
    val blocks = (0 until nblocks).map { j =>
      val off = j * blocksize
      val bsize = math.min(blocksize, nbytes - off)
      if (shuffle && typesize > 1) shuffleBlock(work, off, bsize, typesize)
      val leftover = bsize < blocksize
      val nstreams = if (dontSplit || leftover || typesize <= 1) 1 else typesize
      val neblock = bsize / nstreams
      val bos = new java.io.ByteArrayOutputStream()
      (0 until nstreams).foreach { s =>
        val z = compressFn(work, off + s * neblock, neblock)
        val (csize, payload) =
          if (z.length < neblock) (z.length, z)
          else (neblock, java.util.Arrays.copyOfRange(work, off + s * neblock,
            off + (s + 1) * neblock))
        bos.write(csize & 0xFF); bos.write((csize >> 8) & 0xFF)
        bos.write((csize >> 16) & 0xFF); bos.write((csize >> 24) & 0xFF)
        bos.write(payload)
      }
      bos.toByteArray
    }
    val headerLen = 16 + 4 * nblocks
    val total = headerLen + blocks.map(_.length).sum
    val out = new java.io.ByteArrayOutputStream(total)
    def w32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    out.write(2); out.write(1) // version, versionlz
    out.write((if (shuffle) 0x1 else 0) | (if (dontSplit) 0x10 else 0) | (codecId << 5))
    out.write(typesize)
    w32(nbytes); w32(blocksize); w32(total)
    var bstart = headerLen
    blocks.foreach { b => w32(bstart); bstart += b.length }
    blocks.foreach(out.write)
    out.toByteArray
  }

  private def doubles(n: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(n * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // gentle ramp → compressible after shuffle, like real climate chunks
    (0 until n).foreach(i => buf.putDouble(i * 0.5))
    buf.array()
  }

  test("multi-block shuffled split container round-trips (the per-block unshuffle path)") {
    val raw = doubles(1000) // 8000 B = 3×2048 + 1856-B leftover block
    val enc = bloscContainer(raw, typesize = 8, blocksize = 2048,
      shuffle = true, dontSplit = false)
    assert(ZarrCodec.bloscDecode(enc).toSeq == raw.toSeq)
  }

  test("multi-block shuffled dont-split container round-trips") {
    val raw = doubles(1000)
    val enc = bloscContainer(raw, typesize = 8, blocksize = 2048,
      shuffle = true, dontSplit = true)
    assert(ZarrCodec.bloscDecode(enc).toSeq == raw.toSeq)
  }

  test("unshuffled container still splits streams (split is independent of shuffle)") {
    val raw = doubles(512) // 4096 B = 2 full blocks, no leftover
    val enc = bloscContainer(raw, typesize = 8, blocksize = 2048,
      shuffle = false, dontSplit = false)
    assert(ZarrCodec.bloscDecode(enc).toSeq == raw.toSeq)
  }

  test("int32 shuffled container with exact block fit round-trips") {
    val buf = java.nio.ByteBuffer.allocate(1024 * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 1024).foreach(buf.putInt)
    val raw = buf.array() // 4096 B = 4×1024, no leftover
    val enc = bloscContainer(raw, typesize = 4, blocksize = 1024,
      shuffle = true, dontSplit = false)
    assert(ZarrCodec.bloscDecode(enc).toSeq == raw.toSeq)
  }

  test("single short block (leftover only) round-trips") {
    val raw = doubles(37) // 296 B < any blocksize → 1 leftover block, 1 stream
    val enc = bloscContainer(raw, typesize = 8, blocksize = 2048,
      shuffle = true, dontSplit = false)
    assert(ZarrCodec.bloscDecode(enc).toSeq == raw.toSeq)
  }

  // ------------------------------------------------------------- primitives

  test("blosc-zstd and blosc-snappy containers decode (Spark-bundled codecs)") {
    val raw = doubles(1000)
    val zstdC = bloscContainer(raw, typesize = 8, blocksize = 2048,
      shuffle = true, dontSplit = false, codecId = 4,
      compressFn = (b, off, len) =>
        com.github.luben.zstd.Zstd.compress(
          java.util.Arrays.copyOfRange(b, off, off + len), 3))
    assert(ZarrCodec.bloscDecode(zstdC).toSeq == raw.toSeq)
    val snappyC = bloscContainer(raw, typesize = 8, blocksize = 2048,
      shuffle = true, dontSplit = true, codecId = 2,
      compressFn = (b, off, len) =>
        org.xerial.snappy.Snappy.rawCompress(
          java.util.Arrays.copyOfRange(b, off, off + len), len))
    assert(ZarrCodec.bloscDecode(snappyC).toSeq == raw.toSeq)
  }

  test("zstd codec round-trips and parses from both v2 and v3 documents") {
    val rnd = new scala.util.Random(11)
    Seq(1, 17, 4096, 70001).foreach { n =>
      val raw = Array.fill(n)((rnd.nextInt(7) + 64).toByte) // compressible
      val c = ZarrCodec.ZstdCodec(3)
      assert(c.decode(c.encode(raw), n).toSeq == raw.toSeq, s"n=$n")
    }
    val v2 = ZarrCodec.fromJson(graft.meta.JValue.parse(
      """{"id":"zstd","level":5}"""))
    assert(v2 == ZarrCodec.ZstdCodec(5))
  }

  test("lz4 block decompression handles literals, matches, and RLE overlap") {
    // hand-built stream: 8 literals "abcdefgh", then a match of length 8 at
    // offset 8 (copies the literals), then a match of length 12 at offset 1
    // (RLE of the last byte), then 1 closing literal.
    val lit = "abcdefgh".getBytes
    val stream = Array.concat(
      Array((8 << 4 | 4).toByte), lit, Array[Byte](8, 0),        // 8 lit, ml=4+4=8 @8
      Array[Byte]((0 << 4 | 8).toByte, 1, 0),                    // 0 lit, ml=8+4=12 @1
      Array[Byte]((1 << 4).toByte, 'z'.toByte))                  // closing literal
    val out = ZarrCodec.lz4Decompress(stream, 0, stream.length, 8 + 8 + 12 + 1)
    assert(new String(out) == "abcdefgh" + "abcdefgh" + "h" * 12 + "z")
  }

  test("zlib and gzip codecs round-trip; bare blosc refuses encode") {
    val raw = doubles(100)
    assert(ZarrCodec.ZlibCodec(1).decode(ZarrCodec.ZlibCodec(1).encode(raw), raw.length).toSeq == raw.toSeq)
    assert(ZarrCodec.GzipCodec(1).decode(ZarrCodec.GzipCodec(1).encode(raw), raw.length).toSeq == raw.toSeq)
    intercept[UnsupportedOperationException](ZarrCodec.BloscCodec.encode(raw))
  }

  // ----------------------------------------------------------- lz4 encode

  test("lz4 compressor round-trips through the c-blosc-pinned decoder (fuzz)") {
    val rnd = new scala.util.Random(42)
    (0 until 30).foreach { trial =>
      val n = 13 + rnd.nextInt(5000)
      val src = new Array[Byte](n)
      trial % 3 match {
        case 0 => rnd.nextBytes(src) // incompressible
        case 1 => (0 until n).foreach(i => src(i) = (i % 17).toByte) // periodic
        case 2 => (0 until n).foreach(i => // runs + noise
          src(i) = if (rnd.nextInt(10) == 0) rnd.nextInt(256).toByte else 7)
      }
      val packed = ZarrCodec.lz4Compress(src, 0, n)
      val back = ZarrCodec.lz4Decompress(packed, 0, packed.length, n)
      assert(back.toSeq == src.toSeq, s"trial $trial (n=$n)")
    }
  }

  test("lz4 compressor handles tiny inputs (literals-only path)") {
    (0 to 13).foreach { n =>
      val src = Array.tabulate(n)(_.toByte)
      val packed = ZarrCodec.lz4Compress(src, 0, n)
      assert(ZarrCodec.lz4Decompress(packed, 0, packed.length, n).toSeq == src.toSeq)
    }
  }

  // --------------------------------------------------------- blosc encode

  test("blosc-lz4 encode round-trips multi-block shuffled chunks") {
    // > 256 KB of f8 → multiple blocks incl. a ragged leftover
    val n = 50000
    val buf = java.nio.ByteBuffer.allocate(n * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach(i => buf.putDouble(i * 0.25))
    val raw = buf.array()
    val codec = ZarrCodec.BloscLz4Codec(typesize = 8)
    val enc = codec.encode(raw)
    assert(enc.length < raw.length / 2, s"ramp should compress (${enc.length})")
    assert(codec.decode(enc, raw.length).toSeq == raw.toSeq)
  }

  test("blosc-lz4 encode falls back to memcpy for incompressible data") {
    val rnd = new scala.util.Random(7)
    val raw = new Array[Byte](4096)
    rnd.nextBytes(raw)
    val codec = ZarrCodec.BloscLz4Codec(typesize = 8)
    val enc = codec.encode(raw)
    assert(enc.length == raw.length + 16) // header + verbatim payload
    assert((enc(2) & 0x2) != 0, "memcpy flag must be set")
    assert(codec.decode(enc, raw.length).toSeq == raw.toSeq)
  }

  test("blosc-lz4 encode fuzz across typesizes and sizes") {
    val rnd = new scala.util.Random(1234)
    Seq(1, 2, 4, 8).foreach { ts =>
      Seq(ts, 100 * ts, 4097 * ts).foreach { n =>
        val raw = new Array[Byte](n)
        if (rnd.nextBoolean()) rnd.nextBytes(raw)
        else (0 until n).foreach(i => raw(i) = ((i / ts) % 251).toByte)
        val codec = ZarrCodec.BloscLz4Codec(typesize = ts)
        assert(codec.decode(codec.encode(raw), n).toSeq == raw.toSeq,
          s"ts=$ts n=$n")
      }
    }
  }

  test("fletcher32 filter: roundtrip, corruption refusal, and checksum " +
      "parity with an independent H5checksum.c transcription") {
    import graft.sources.zarr.ZarrMeta.Fletcher32Filter
    // independent test-side transcription of H5_checksum_fletcher32
    def ref(b: Array[Byte]): Long = {
      var s1 = 0L; var s2 = 0L
      val whole = (b.length / 2) * 2
      var i = 0
      var sinceFold = 0
      while (i < whole) {
        s1 += (((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)).toLong
        s2 += s1
        i += 2
        sinceFold += 1
        if (sinceFold == 360 || i == whole) {
          s1 = (s1 & 0xFFFF) + (s1 >> 16)
          s2 = (s2 & 0xFFFF) + (s2 >> 16)
          sinceFold = 0
        }
      }
      if ((b.length & 1) != 0) {
        s1 += ((b(b.length - 1) & 0xFF).toLong << 8)
        s2 += s1
        s1 = (s1 & 0xFFFF) + (s1 >> 16)
        s2 = (s2 & 0xFFFF) + (s2 >> 16)
      }
      s1 = (s1 & 0xFFFF) + (s1 >> 16)
      s2 = (s2 & 0xFFFF) + (s2 >> 16)
      ((s2 << 16) | s1) & 0xFFFFFFFFL
    }
    val rnd = new scala.util.Random(77)
    for (n <- Seq(0, 1, 2, 5, 719, 720, 721, 4096, 10001)) {
      val raw = new Array[Byte](n)
      rnd.nextBytes(raw)
      assert(ZarrCodec.fletcher32(raw, n) == ref(raw), s"parity n=$n")
      val enc = Fletcher32Filter.encode(raw)
      assert(enc.length == n + 4)
      assert(Fletcher32Filter.decode(enc).toSeq == raw.toSeq, s"roundtrip n=$n")
      if (n > 0) {
        val bad = enc.clone()
        val at = rnd.nextInt(n)
        bad(at) = (bad(at) + 1).toByte
        val e = intercept[IllegalArgumentException] {
          Fletcher32Filter.decode(bad)
        }
        assert(e.getMessage.contains("fletcher32"), s"corruption n=$n")
      }
    }
  }
}
