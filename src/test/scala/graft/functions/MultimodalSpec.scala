package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, 1, 2)
  private val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 9, 9)

  test("sniffFormat recognizes magic bytes without decoding") {
    val df = Seq((1L, png), (2L, jpeg), (3L, "plain text".getBytes)).toDF("id", "media")
    val out = df.select(col("id"), Multimodal.sniffFormat(col("media")))
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L) == Some("png") && out(2L) == Some("jpeg") && out(3L).isEmpty)
  }

  test("mediaMeta carries byte length, content hash, format") {
    val df = Seq((1L, png), (2L, png)).toDF("id", "media")
    val rows = df.select(Multimodal.mediaMeta(col("media")).as("m"))
      .select("m.byte_len", "m.content_hash", "m.format").collect()
    assert(rows(0).getLong(0) == png.length.toLong)
    assert(rows(0).getLong(1) == rows(1).getLong(1)) // same bytes, same hash
    assert(rows(0).getString(2) == "png")
  }

  test("mediaFingerprint: identical bytes equal, different bytes differ") {
    val df = Seq((1L, png), (2L, png), (3L, jpeg)).toDF("id", "media")
    val fp = df.select(Multimodal.mediaFingerprint(col("media"))).as[Long].collect()
    assert(fp(0) == fp(1) && fp(0) != fp(2))
  }

  test("frameSample splits payload into n contiguous windows covering all bytes") {
    val bytes = (0 until 100).map(_.toByte).toArray
    val df = Seq((7L, bytes)).toDF("id", "media")
    val frames = Multimodal.frameSample(df, "id", "media", 4)
      .orderBy("frame_idx").collect()
    assert(frames.length == 4)
    val joined = frames.flatMap(_.getAs[Array[Byte]]("frame_bytes"))
    assert(joined.toSeq == bytes.toSeq) // lossless partition of the stream
  }

  test("decodeResize: stub decoder runs per-partition with fixed output shape") {
    val df = Seq((1L, "abc".getBytes), (2L, "xyz".getBytes)).toDF("id", "media")
    val decoded = Multimodal.decodeResize(df, "id", "media", 8, 4).collect()
    assert(decoded.length == 2)
    decoded.foreach { d =>
      assert(d.width == 8 && d.height == 4 && d.pixels.length == 32)
      assert(d.pixels.forall(p => p >= 0.0f && p <= 1.0f))
    }
    // determinism: same bytes → same pixels
    val again = Multimodal.decodeResize(df, "id", "media", 8, 4).collect()
    assert(decoded.map(_.pixels.toSeq).toSeq == again.map(_.pixels.toSeq).toSeq)
  }

  test("pooledEmbedding produces dim-length mean pools in [0,1]") {
    val df = Seq((1L, "hello world".getBytes)).toDF("id", "media")
    val emb = Multimodal.pooledEmbedding(
      Multimodal.decodeResize(df, "id", "media", 16, 16), 8)
      .select("embedding").as[Seq[Double]].head()
    assert(emb.length == 8)
    assert(emb.forall(v => v >= 0.0 && v <= 1.0))
  }

  // ---------------------------------------------------- REAL PNG decode

  test("PngDecoder recovers every pixel of real 8-bit and 16-bit grayscale PNGs") {
    import graft.sources.grib.Png
    val px8 = Array.tabulate[Long](8 * 8)(i => (i * 37) % 256)
    val bytes8 = Png.encode(8, 8, 8, px8)
    val d8 = Multimodal.PngDecoder(1L, bytes8, 8, 8)
    assert(d8.width == 8 && d8.height == 8)
    px8.zip(d8.pixels).foreach { case (p, f) =>
      assert(math.round(f * 255.0) == p, s"$p vs $f")
    }
    val px16 = Array.tabulate[Long](5 * 7)(i => (i * 9173) % 65536)
    val d16 = Multimodal.PngDecoder(2L, Png.encode(5, 7, 16, px16), 5, 7)
    px16.zip(d16.pixels).foreach { case (p, f) =>
      assert(math.round(f * 65535.0) == p, s"$p vs $f")
    }
  }

  test("PngDecoder area-average resize is the exact box mean") {
    import graft.sources.grib.Png
    // 4x4 image, resize to 2x2: each output cell = mean of a 2x2 box
    val px = Array.tabulate[Long](16)(i => i * 16)
    val d = Multimodal.PngDecoder(1L, Png.encode(4, 4, 8, px), 2, 2)
    def boxMean(xs: Seq[Int]): Float =
      (xs.map(i => px(i) / 255.0).sum / xs.length).toFloat
    val expect = Seq(
      boxMean(Seq(0, 1, 4, 5)), boxMean(Seq(2, 3, 6, 7)),
      boxMean(Seq(8, 9, 12, 13)), boxMean(Seq(10, 11, 14, 15)))
    d.pixels.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-6, s"$g vs $e")
    }
  }

  test("PngDecoder converts RGB to luminance and refuses non-PNG by name") {
    import graft.sources.grib.Png
    // RGB (24-bit values): pixel 0 pure red, pixel 1 pure white
    val rgb = Array[Long](0xFF0000L, 0xFFFFFFL)
    val d = Multimodal.PngDecoder(1L, Png.encode(2, 1, 24, rgb), 2, 1)
    assert(math.abs(d.pixels(0) - 1f / 3f) < 1e-6)
    assert(math.abs(d.pixels(1) - 1f) < 1e-6)
    val e = intercept[IllegalArgumentException] {
      Multimodal.PngDecoder(7L, jpeg, 2, 2)
    }
    assert(e.getMessage.contains("jpeg"), e.getMessage)
  }

  test("pngDims reads IHDR dimensions as pure expressions, null for non-PNG") {
    import graft.sources.grib.Png
    val realPng = Png.encode(12, 5, 8, Array.tabulate[Long](60)(_ % 256))
    val df = Seq((1L, realPng), (2L, jpeg)).toDF("id", "media")
    val (w, h) = Multimodal.pngDims(col("media"))
    val m = df.select(col("id"), w, h).collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(m(1L) == (Some(12L), Some(5L)))
    assert(m(2L) == (None, None))
  }

  test("averageHash over real pixels: identical images collide, different split") {
    import graft.sources.grib.Png
    def img(seed: Int): Array[Byte] =
      Png.encode(8, 8, 8, Array.tabulate[Long](64)(i => ((i * seed) % 256).toLong))
    val df = Seq((1L, img(37)), (2L, img(37)), (3L, img(91))).toDF("id", "png")
    val out = Multimodal.averageHash(df, "id", "png").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("ahash_bits")).toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(3L))
    assert(out(1L).length == 64 && out(1L).forall(c => c == '0' || c == '1'))
  }

  // ----------------------------------------------------- REAL AVI demux

  test("aviFrames walks the movi LIST and recovers every frame payload") {
    val frames = Seq(
      Array.tabulate[Byte](10)(i => (i * 3).toByte),
      Array.tabulate[Byte](7)(i => (100 - i).toByte), // odd length: padded
      Array.tabulate[Byte](4)(i => i.toByte))
    val avi = Multimodal.encodeAvi(frames)
    val got = Multimodal.aviFrames(5L, avi)
    assert(got.length == 3)
    got.zip(frames).zipWithIndex.foreach { case (((id, fi, st, kind, fb), expect), i) =>
      assert(id == 5L && fi == i && st == 0 && kind == "dc")
      assert(fb.sameElements(expect), s"frame $i")
    }
  }

  test("non-AVI containers are refused by name; truncation fails named") {
    val mp4 = Array[Byte](0, 0, 0, 24) ++ "ftypisom".getBytes ++ Array.fill[Byte](20)(0)
    val e1 = intercept[IllegalArgumentException] { Multimodal.aviFrames(1L, mp4) }
    assert(e1.getMessage.contains("mp4"), e1.getMessage)
    val wavNotAvi = Audio.encodeWav(Array(1, 2, 3), 8000)
    val e2 = intercept[IllegalArgumentException] { Multimodal.aviFrames(2L, wavNotAvi) }
    assert(e2.getMessage.contains("riff/WAVE"), e2.getMessage)
    val avi = Multimodal.encodeAvi(Seq(Array.tabulate[Byte](50)(_.toByte)))
    val cut = java.util.Arrays.copyOf(avi, avi.length - 20)
    val e3 = intercept[IllegalArgumentException] { Multimodal.aviFrames(3L, cut) }
    assert(e3.getMessage.contains("truncated"), e3.getMessage)
  }

  test("demuxAvi chains into the real PNG decoder: container -> frames -> pixels") {
    import graft.sources.grib.Png
    val pngA = Png.encode(4, 4, 8, Array.tabulate[Long](16)(i => i * 16))
    val pngB = Png.encode(4, 4, 8, Array.tabulate[Long](16)(i => 255 - i * 16))
    val df = Seq((9L, Multimodal.encodeAvi(Seq(pngA, pngB)))).toDF("id", "video")
    val frames = Multimodal.demuxAvi(df, "id", "video")
    assert(frames.count() == 2)
    // decode each demuxed frame with the REAL PNG decoder
    val decoded = Multimodal.decodeResize(
      frames.select((col("id") * 10 + col("frame_idx")).as("fid"), col("frame_bytes")),
      "fid", "frame_bytes", 4, 4, Multimodal.PngDecoder)
    val px = decoded.collect().map(d => d.id -> d.pixels).toMap
    assert(math.round(px(90L)(1) * 255) == 16)
    assert(math.round(px(91L)(1) * 255) == 255 - 16)
  }

  test("decodeAviFrames: MJPEG AVI container -> frames -> pixels in one " +
      "stage (the dominant real-world AVI payload)") {
    // two REAL baseline JPEG frames (8x8 gradient ramps) in one container
    val pxA = Array.tabulate(64)(i => i * 4 % 256)
    val pxB = Array.tabulate(64)(i => 255 - i * 4 % 256)
    val avi = Multimodal.encodeAvi(Seq(
      Jpeg.encode(8, 8, pxA), Jpeg.encode(8, 8, pxB)))
    val df = Seq((7L, avi)).toDF("id", "video")
    val dec = Multimodal.decodeAviFrames(df, "id", "video", 8, 8)
    assert(dec.columns.toSeq == Seq("id", "frame_idx", "stream", "kind",
      "width", "height", "pixels"))
    val rows = dec.orderBy("frame_idx").collect()
    assert(rows.length == 2)
    assert(rows.forall(r => r.getAs[Int]("width") == 8 &&
      r.getAs[String]("kind") == "dc"))
    // decoded pixels match the encoder inputs within the DCT bound
    def maxErr(r: org.apache.spark.sql.Row, exp: Array[Int]): Int =
      r.getAs[Seq[Float]]("pixels").zip(exp).map { case (v, e) =>
        math.abs(math.round(v * 255) - e) }.max
    assert(maxErr(rows(0), pxA) <= 2, "frame 0 outside the DCT bound")
    assert(maxErr(rows(1), pxB) <= 2, "frame 1 outside the DCT bound")
    // a frame in a codec with no in-repo decoder is refused by name
    val bogus = Multimodal.encodeAvi(Seq("notacodec".getBytes("US-ASCII")))
    val e = intercept[Exception] {
      Multimodal.decodeAviFrames(Seq((8L, bogus)).toDF("id", "video"),
        "id", "video", 8, 8).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.toLowerCase.contains("png") || msgs.contains("refus") ||
      msgs.contains("not a"), msgs)
  }

  // ----------------------------------------------------- REAL GIF decode

  test("GIF roundtrip recovers every pixel through the LZW path") {
    val rgb = Array.tabulate(8 * 6)(i => ((i * 37) % 5) * 0x050A0F)
    val gif = Gif.encode(8, 6, rgb)
    val img = Gif.decode(gif)
    assert(img.width == 8 && img.height == 6 && img.frames.length == 1)
    assert(img.frames.head.rgb.sameElements(rgb))
    // through the dispatching decoder: luminance + identity resize
    val d = Multimodal.ImageDecoder(1L, gif, 8, 6)
    rgb.zip(d.pixels).foreach { case (c, f) =>
      val lum = (((c >> 16) & 0xFF) + ((c >> 8) & 0xFF) + (c & 0xFF)) / (3f * 255f)
      assert(math.abs(f - lum) < 1e-7)
    }
  }

  test("GIF LZW with a growing dictionary decodes (real-encoder form)") {
    // hand-build an LZW stream WITHOUT per-symbol clear codes so the
    // dictionary actually grows and the KwKwK case fires: the classic
    // repeated pattern. minCode=2: literals 0-3, clear=4, end=5.
    // codes: [clear, 0, 6(KwKwK: "00"), 7("000"? no - 6 then new)...]
    // encode "0 0 0 0 0 0 0" via: clear, 0, 6, 7, end -> 0,00,000? gives
    // 1+2+3 = 6 zeros; use expect=6 on a 3x2 frame of color 0
    val bits = Seq(4, 0, 6, 7, 5) // clear, 0, KwKwK, next, end
    var acc = 0L; var n = 0
    val buf = new java.io.ByteArrayOutputStream()
    bits.foreach { c =>
      acc |= c.toLong << n; n += 3 // width 3 (minCode 2); stays 3 (<8 entries)
      while (n >= 8) { buf.write((acc & 0xFF).toInt); acc >>= 8; n -= 8 }
    }
    if (n > 0) buf.write((acc & 0xFF).toInt)
    val lzw = buf.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes); w16(3); w16(2)
    out.write(0x80 | 1); out.write(0); out.write(0) // 4-color table
    Seq(0x111111, 0x222222, 0x333333, 0x444444).foreach { c =>
      out.write((c >> 16) & 0xFF); out.write((c >> 8) & 0xFF); out.write(c & 0xFF)
    }
    out.write(0x2C); w16(0); w16(0); w16(3); w16(2); out.write(0)
    out.write(2) // min code size
    out.write(lzw.length); out.write(lzw, 0, lzw.length); out.write(0)
    out.write(0x3B)
    val img = Gif.decode(out.toByteArray)
    assert(img.frames.head.rgb.forall(_ == 0x111111))
  }

  test("GIF LZW refuses a non-literal first code after clear (ADVICE r8)") {
    // minCode=2: literals 0-3, clear=4, end=5, dictSize starts at 6. The
    // KwKwK form (code == dictSize) as the FIRST code after a clear has
    // no previous chain — a lax decoder walks the stale dictionary and
    // emits garbage; ours must refuse by name.
    val bits = Seq(4, 6, 5) // clear, KwKwK-with-no-prev, end
    var acc = 0L; var n = 0
    val buf = new java.io.ByteArrayOutputStream()
    bits.foreach { c =>
      acc |= c.toLong << n; n += 3
      while (n >= 8) { buf.write((acc & 0xFF).toInt); acc >>= 8; n -= 8 }
    }
    if (n > 0) buf.write((acc & 0xFF).toInt)
    val lzw = buf.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes); w16(3); w16(2)
    out.write(0x80 | 1); out.write(0); out.write(0)
    Seq(0x111111, 0x222222, 0x333333, 0x444444).foreach { c =>
      out.write((c >> 16) & 0xFF); out.write((c >> 8) & 0xFF); out.write(c & 0xFF)
    }
    out.write(0x2C); w16(0); w16(0); w16(3); w16(2); out.write(0)
    out.write(2)
    out.write(lzw.length); out.write(lzw, 0, lzw.length); out.write(0)
    out.write(0x3B)
    val e = intercept[IllegalArgumentException] { Gif.decode(out.toByteArray) }
    assert(e.getMessage.contains("no previous code"), e.getMessage)
  }

  test("interlaced GIF rows land in the right order") {
    // 1x8 column, distinct colors; interlaced flag set, rows stored in
    // pass order 0,4,2,6,1,3,5,7
    val colors = (1 to 8).map(_ * 0x101010).toArray
    val passOrder = Seq(0, 4, 2, 6, 1, 3, 5, 7)
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes); w16(1); w16(8)
    out.write(0x80 | 2); out.write(0); out.write(0) // 8-color table
    colors.foreach { c =>
      out.write((c >> 16) & 0xFF); out.write((c >> 8) & 0xFF); out.write(c & 0xFF)
    }
    out.write(0x2C); w16(0); w16(0); w16(1); w16(8)
    out.write(0x40) // interlaced
    out.write(3) // min code 3: literals 0-7, clear 8, end 9, width 4
    var acc = 0L; var n = 0
    val buf = new java.io.ByteArrayOutputStream()
    def put(c: Int): Unit = {
      acc |= c.toLong << n; n += 4
      while (n >= 8) { buf.write((acc & 0xFF).toInt); acc >>= 8; n -= 8 }
    }
    passOrder.foreach { row => put(8); put(row) } // clear + literal per row
    put(9)
    if (n > 0) buf.write((acc & 0xFF).toInt)
    val lzw = buf.toByteArray
    out.write(lzw.length); out.write(lzw, 0, lzw.length); out.write(0)
    out.write(0x3B)
    val img = Gif.decode(out.toByteArray)
    img.frames.head.rgb.zip(colors).foreach { case (g, e) => assert(g == e) }
  }

  test("ImageDecoder routes JPEG to its codec and refuses unknown formats by name") {
    // real baseline JPEG decodes through the dispatch
    val px = Array.tabulate(64)(i => (i * 4) & 0xFF)
    val d = Multimodal.ImageDecoder(1L, Jpeg.encode(8, 8, px), 8, 8)
    px.zip(d.pixels).foreach { case (e, f) =>
      assert(math.abs(e - math.round(f * 255)) <= 2)
    }
    // a truncated JPEG surfaces the codec's named diagnostic
    val e1 = intercept[IllegalArgumentException] {
      Multimodal.ImageDecoder(2L, jpeg, 4, 4) // 6 bytes of JPEG magic
    }
    assert(e1.getMessage.toLowerCase.contains("jpeg"), e1.getMessage)
    // a truly unknown format is refused by the dispatch fallthrough
    val e2 = intercept[IllegalArgumentException] {
      Multimodal.ImageDecoder(3L, "XX0123456789012345678901234567".getBytes, 4, 4)
    }
    assert(e2.getMessage.contains("unknown"), e2.getMessage)
  }

  // ----------------------------------------------------- REAL BMP decode

  private def buildBmp(w: Int, h: Int, rgb: Array[Int],
      topDown: Boolean = false): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataLen = rowBytes * h
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    out.write('B'); out.write('M'); w32(54 + dataLen); w32(0); w32(54)
    w32(40); w32(w); w32(if (topDown) -h else h); w16(1); w16(24)
    w32(0); w32(dataLen); w32(2835); w32(2835); w32(0); w32(0)
    for (y <- 0 until h) {
      val srcRow = if (topDown) y else h - 1 - y
      for (x <- 0 until w) {
        val c = rgb(srcRow * w + x)
        out.write(c & 0xFF); out.write((c >> 8) & 0xFF); out.write((c >> 16) & 0xFF)
      }
      (w * 3 until rowBytes).foreach(_ => out.write(0))
    }
    out.toByteArray
  }

  test("BMP 24-bit decode: bottom-up and top-down rows, padded, exact luminance") {
    val w = 5; val h = 3 // rowBytes 16 with 1 pad byte
    val rgb = Array.tabulate(w * h)(i => (i * 40 % 256) * 0x010101)
    for (td <- Seq(false, true)) {
      val d = Multimodal.ImageDecoder(1L, buildBmp(w, h, rgb, topDown = td), w, h)
      rgb.zip(d.pixels).zipWithIndex.foreach { case ((c, f), i) =>
        assert(math.round(f * 255) == (c & 0xFF), s"topDown=$td pixel $i")
      }
    }
  }

  test("BMP refusals are named: RLE compression, exotic depth") {
    val ok = buildBmp(4, 4, Array.fill(16)(0x808080))
    val rle = ok.clone(); rle(30) = 1 // BI_RLE8
    val e1 = intercept[IllegalArgumentException] {
      Multimodal.BmpDecoder(1L, rle, 4, 4)
    }
    assert(e1.getMessage.contains("compression"), e1.getMessage)
    val depth = ok.clone(); depth(28) = 16
    val e2 = intercept[IllegalArgumentException] {
      Multimodal.BmpDecoder(2L, depth, 4, 4)
    }
    assert(e2.getMessage.contains("16-bit"), e2.getMessage)
  }

  test("sniffFormat resolves RIFF families and BMP") {
    val wav = Audio.encodeWav(Array(1, 2, 3), 8000)
    val avi = Multimodal.encodeAvi(Seq(Array[Byte](1, 2, 3, 4)))
    val bmp = buildBmp(2, 2, Array.fill(4)(0x101010))
    val df = Seq((1L, wav), (2L, avi), (3L, bmp)).toDF("id", "media")
    val m = df.select(col("id"), Multimodal.sniffFormat(col("media")))
      .as[(Long, String)].collect().toMap
    assert(m(1L) == "wav" && m(2L) == "avi" && m(3L) == "bmp", m.toString)
  }
  test("animated GIF compositing: disposal 2 restores background, 3 restores previous, transparency masks") {
    import Gif.AnimFrame
    // 4x4 screen, bg color 0x050505: frame 0 full paint (keep), frame 1
    // a 2x2 overdraw at (1,1) with disposal 2 (region -> background),
    // frame 2 a 2x2 at (2,2) whose first pixel is transparent
    val base = Array.fill(16)(0x202020)
    val bytes = Gif.encodeAnimated(4, 4, 0x050505, Seq(
      AnimFrame(0, 0, 4, 4, base, delayCs = 5, disposal = 1),
      AnimFrame(1, 1, 2, 2, Array.fill(4)(0x404040), delayCs = 7, disposal = 2),
      AnimFrame(2, 2, 2, 2, Array(-1, 0x606060, 0x606060, 0x606060),
        delayCs = 9, disposal = 0)))
    val img = Gif.decode(bytes)
    assert(img.frames.map(_.delayCs) == Seq(5, 7, 9))
    assert(img.frames.map(_.disposal) == Seq(1, 2, 0))
    assert(img.background == 0x050505)
    val canvases = Gif.composite(img)
    assert(canvases(0).forall(_ == 0x202020))
    // frame 1 shown: rect at (1,1) overdrawn
    assert(canvases(1)(1 * 4 + 1) == 0x404040 && canvases(1)(0) == 0x202020)
    // frame 2: disposal 2 restored frame 1's REGION to background...
    assert(canvases(2)(1 * 4 + 1) == 0x050505)
    assert(canvases(2)(2 * 4 + 1) == 0x050505)
    // ...the transparent first pixel of frame 2 shows what is UNDER it
    // (cell (2,2) was in frame 1's disposed region -> background)
    assert(canvases(2)(2 * 4 + 2) == 0x050505)
    assert(canvases(2)(2 * 4 + 3) == 0x606060)
    // untouched cells still carry frame 0
    assert(canvases(2)(0) == 0x202020)
    // the frames op emits one full-canvas row per frame
    val sp2 = spark; import sp2.implicits._
    val df = Seq((1L, bytes)).toDF("id", "gif")
    val rows = Multimodal.decodeGifFrames(df, "id", "gif")
      .orderBy("frame_idx").collect()
    assert(rows.length == 3 && rows.forall(_.getAs[Int]("n_frames") == 3))
    assert(rows.map(_.getAs[Int]("delay_cs")).toSeq == Seq(5, 7, 9))
    assert(rows.forall(r => r.getAs[Seq[Float]]("pixels").length == 16))
  }
}
