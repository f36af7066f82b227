package graft.functions

/** JPEG codec (ITU-T T.81 / ISO 10918-1, the public specification;
  * tables from Annex K): baseline sequential (SOF0) AND progressive
  * Huffman (SOF2 — most web JPEGs). Baseline: SOI/APPn/COM/DQT/SOF0/
  * DHT/DRI/SOS marker parse, entropy-coded segment with FF00 byte
  * stuffing and restart markers, per-MCU Huffman decode (DC difference +
  * AC run/size with ZRL and EOB), dequantization, zigzag, separable
  * float IDCT, level shift, nearest-neighbor chroma upsampling for
  * 4:2:0 / 4:2:2, and JFIF full-range YCbCr→RGB. Progressive (Annex G):
  * coefficients accumulate across scans — spectral selection bands and
  * successive-approximation bit planes (DC first/refine, AC first with
  * cross-block EOB runs, AC refine with correction bits), one IDCT per
  * block at the end.
  *
  * Out of profile — refused BY NAME, never mis-decoded: extended/
  * lossless/hierarchical SOFs, arithmetic coding, 12-bit precision,
  * 16-bit quantization tables, component counts other than 1 or 3,
  * sampling grids beyond 4:4:4 / 4:2:2 / 4:2:0.
  *
  * JPEG is LOSSY: the encoder (fixture/writer side: grayscale or 4:4:4
  * color, Annex K Huffman tables) and decoder are exact inverses only
  * up to DCT rounding — with all-ones quantization tables a roundtrip
  * lands within ±2 of every sample, which the specs and the q-gate
  * bound. The same self-consistency caveat as the JPEG 2000 codec
  * applies (README "Deployment validation notes"): diff ONE real
  * camera/web JPEG against libjpeg before trusting wild archives. */
object Jpeg {

  final case class JpegImage(width: Int, height: Int, components: Int,
      /** Row-major; grayscale values for 1 component, 0xRRGGBB for 3. */
      pixels: Array[Int])

  // ------------------------------------------------------------- decode

  def decode(bytes: Array[Byte]): JpegImage =
    MediaParse.wrapCorrupt("JPEG", bytes.length)(decodeImpl(bytes))

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable: Int = 0
    var acTable: Int = 0
  }

  private def decodeImpl(bytes: Array[Byte]): JpegImage = {
    var pos = 0
    def u8(): Int = { val v = bytes(pos) & 0xFF; pos += 1; v }
    def u16(): Int = { val v = ((bytes(pos) & 0xFF) << 8) | (bytes(pos + 1) & 0xFF); pos += 2; v }
    require(bytes.length >= 4 && u16() == 0xFFD8, {
      val fmt =
        if (bytes.length >= 4 && (bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P') "png"
        else if (bytes.length >= 3 && bytes(0) == 'G' && bytes(1) == 'I') "gif"
        else "unknown"
      s"not a JPEG (missing SOI; looks like '$fmt')"
    })

    val quant = Array.ofDim[Int](4, 64) // natural order
    val huffman = new Array[HuffTable](8) // [dc0..dc3, ac0..ac3]
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var sosAt = -1

    while (sosAt < 0) {
      var marker = u8()
      require(marker == 0xFF, f"expected a marker, found 0x$marker%02x")
      var code = u8()
      while (code == 0xFF) code = u8() // fill bytes
      code match {
        case 0xD9 => throw new IllegalArgumentException("EOI before SOS: no image data")
        case 0xC0 => // SOF0 baseline
          val len = u16(); val start = pos
          val prec = u8()
          require(prec == 8, s"$prec-bit precision unsupported (baseline is 8)")
          height = u16(); width = u16()
          require(width >= 1 && height >= 1 &&
            width.toLong * height <= Int.MaxValue - 8, s"image $width x $height")
          // bound the claimed raster against the stream length BEFORE any
          // allocation: a baseline block costs >= ~4 entropy bits for 64
          // pixels, so pixels beyond bytes*256 is a hostile header (the
          // Jpeg2000 cap's reasoning; generous floor for tiny images)
          require(width.toLong * height <=
            math.max(1L << 20, bytes.length.toLong * 256),
            s"SOF0 declares ${width.toLong * height} pixels from a " +
              s"${bytes.length}-byte stream — implausible; refusing to allocate")
          val nc = u8()
          require(nc == 1 || nc == 3,
            s"$nc components unsupported (grayscale or YCbCr)")
          comps = Array.fill(nc)(null)
          for (i <- 0 until nc) {
            val id = u8(); val hv = u8(); val tq = u8()
            require(tq <= 3, s"quantization table id $tq (0-3)")
            comps(i) = Component(id, hv >> 4, hv & 15, tq)
            require(comps(i).h >= 1 && comps(i).h <= 2 &&
              comps(i).v >= 1 && comps(i).v <= 2,
              s"sampling ${comps(i).h}x${comps(i).v} unsupported (1-2 each)")
          }
          if (nc == 1) {
            // a single-component scan is NON-INTERLEAVED per T.81 (raster
            // 8x8 units, no MCU grouping); this decoder implements the
            // interleaved layout, so grayscale must be 1x1 or the blocks
            // would land scrambled — refuse, never mis-place
            require(comps(0).h == 1 && comps(0).v == 1,
              s"grayscale sampling ${comps(0).h}x${comps(0).v} unsupported " +
                "(non-interleaved single-component scans are 1x1 here)")
          }
          if (nc == 3) {
            require(comps(1).h == 1 && comps(1).v == 1 &&
              comps(2).h == 1 && comps(2).v == 1,
              "subsampled chroma must be 1x1 (luma carries the sampling factors)")
          }
          pos = start + len - 2
        case 0xC4 => // DHT
          val len = u16(); val end = pos + len - 2
          while (pos < end) {
            val tc = u8()
            val cls = tc >> 4; val id = tc & 15
            require(cls <= 1 && id <= 3, s"Huffman table class $cls id $id")
            val counts = Array.fill(16)(u8())
            val symbols = Array.fill(counts.sum)(u8())
            huffman(cls * 4 + id) = HuffTable.build(counts, symbols)
          }
        case 0xDB => // DQT
          val len = u16(); val end = pos + len - 2
          while (pos < end) {
            val pq = u8()
            require((pq >> 4) == 0, "16-bit quantization tables unsupported (baseline)")
            val id = pq & 15
            require(id <= 3, s"quantization table id $id (0-3)")
            for (k <- 0 until 64) quant(id)(Zigzag(k)) = u8()
          }
        case 0xDD => // DRI
          val len = u16(); require(len == 4, s"DRI length $len")
          restartInterval = u16()
        case 0xC2 => // progressive: its own multi-scan walk from the top
          return decodeProgressiveImpl(bytes)
        case c if c >= 0xC1 && c <= 0xCF && c != 0xC4 && c != 0xC8 && c != 0xCC =>
          throw new IllegalArgumentException(
            f"SOF marker 0x$c%02x unsupported (baseline SOF0 and " +
              "progressive SOF2 only — extended/lossless/arithmetic are " +
              "out of profile)")
        case 0xDA => // SOS
          require(comps != null, "SOS before SOF0")
          val len = u16(); val start = pos
          val ns = u8()
          require(ns == comps.length, s"scan has $ns of ${comps.length} components")
          for (_ <- 0 until ns) {
            val id = u8(); val tt = u8()
            val c = comps.find(_.id == id).getOrElse(
              throw new IllegalArgumentException(s"scan component $id not in frame"))
            c.dcTable = tt >> 4; c.acTable = tt & 15
            require(c.dcTable <= 3 && c.acTable <= 3,
              s"Huffman table selectors ${c.dcTable}/${c.acTable} (0-3)")
          }
          pos = start + len - 2
          sosAt = pos
        case _ => // APPn, COM, and anything skippable with a length
          val len = u16()
          require(len >= 2, s"marker segment length $len")
          pos += len - 2
      }
    }

    // ---- entropy-coded segment
    val nc = comps.length
    val hMax = comps.map(_.h).max; val vMax = comps.map(_.v).max
    val mcuW = 8 * hMax; val mcuH = 8 * vMax
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    // per-component plane at its own resolution
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = Array.tabulate(nc)(i => new Array[Int](planeW(i) * planeH(i)))

    val br = new BitReader(bytes, sosAt)
    val dcPred = new Array[Int](nc)
    val block = new Array[Int](64)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.restart()
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var ci = 0
      while (ci < nc) {
        val c = comps(ci)
        val dcT = huffman(c.dcTable)
        val acT = huffman(4 + c.acTable)
        require(dcT != null && acT != null,
          s"scan references an undefined Huffman table for component ${c.id}")
        val q = quant(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(block, 0)
            // DC
            val s = dcT.decode(br)
            val diff = if (s == 0) 0 else br.receiveExtend(s)
            dcPred(ci) += diff
            block(0) = dcPred(ci) * q(0)
            // AC
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = acT.decode(br)
              val r = rs >> 4; val size = rs & 15
              if (size == 0) {
                if (r == 15) k += 16 // ZRL
                else eob = true
              } else {
                k += r
                require(k < 64, s"AC run overflows the block (k=$k)")
                block(Zigzag(k)) = br.receiveExtend(size) * q(Zigzag(k))
                k += 1
              }
            }
            idct8x8(block)
            // place into the component plane
            val ox = (mx * c.h + bx) * 8
            val oy = (my * c.v + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(ci)((oy + yy) * planeW(ci) + ox + xx) = block(yy * 8 + xx)
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    reconstruct(comps, planes, planeW, width, height, hMax, vMax)
  }

  /** Shared tail of both decode paths: upsample chroma (nearest-neighbor)
    * and convert JFIF full-range YCbCr→RGB (or level-shift grayscale). */
  private def reconstruct(comps: Array[Component], planes: Array[Array[Int]],
      planeW: Array[Int], width: Int, height: Int,
      hMax: Int, vMax: Int): JpegImage = {
    val nc = comps.length
    val out = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        if (nc == 1) {
          out(y * width + x) = clamp(planes(0)(y * planeW(0) + x) + 128)
        } else {
          val yv = planes(0)(
            (y * comps(0).v / vMax) * planeW(0) + (x * comps(0).h / hMax)) + 128
          def chroma(i: Int): Int = planes(i)(
            (y * comps(i).v / vMax) * planeW(i) + (x * comps(i).h / hMax))
          val cb = chroma(1); val cr = chroma(2)
          val r = clamp(math.round(yv + 1.402 * cr).toInt)
          val g = clamp(math.round(yv - 0.344136 * cb - 0.714136 * cr).toInt)
          val b = clamp(math.round(yv + 1.772 * cb).toInt)
          out(y * width + x) = (r << 16) | (g << 8) | b
        }
        x += 1
      }
      y += 1
    }
    JpegImage(width, height, nc, out)
  }

  // --------------------------------------------- progressive (T.81 Annex G)

  /** Progressive Huffman decode (SOF2): coefficients accumulate across
    * scans — spectral selection (Ss..Se bands) and successive
    * approximation (Ah/Al bit-plane passes) both implemented per Annex G
    * (the same control flow as every public decoder of the format): DC
    * first/refine, AC first with EOB runs, AC refine with correction
    * bits. One IDCT per block at the end. Most web JPEGs are progressive,
    * so a curation run over real crawl data lives or dies on this path. */
  private def decodeProgressiveImpl(bytes: Array[Byte]): JpegImage = {
    var pos = 2 // caller verified SOI
    def u8(): Int = { val v = bytes(pos) & 0xFF; pos += 1; v }
    def u16(): Int = { val v = ((bytes(pos) & 0xFF) << 8) | (bytes(pos + 1) & 0xFF); pos += 2; v }

    val quant = Array.ofDim[Int](4, 64) // natural order
    val huffman = new Array[HuffTable](8)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var hMax = 0; var vMax = 0; var mcusX = 0; var mcusY = 0
    // per component: padded block grid (MCU multiples) of 64 coefficients
    // per block in NATURAL order; and the TRUE non-interleaved dims
    var coefs: Array[Array[Int]] = null
    var gridW: Array[Int] = null; var gridH: Array[Int] = null
    var trueBW: Array[Int] = null; var trueBH: Array[Int] = null
    val dcPred = new Array[Int](4)
    var eoi = false

    while (!eoi) {
      val marker = u8()
      require(marker == 0xFF, f"expected a marker, found 0x$marker%02x")
      var code = u8()
      while (code == 0xFF) code = u8()
      code match {
        case 0xD9 => eoi = true
        case 0xC2 =>
          require(comps == null, "second SOF2 in one stream")
          val len = u16(); val start = pos
          val prec = u8()
          require(prec == 8, s"$prec-bit precision unsupported (8 only)")
          height = u16(); width = u16()
          require(width >= 1 && height >= 1 &&
            width.toLong * height <= Int.MaxValue - 8, s"image $width x $height")
          require(width.toLong * height <=
            math.max(1L << 20, bytes.length.toLong * 256),
            s"SOF2 declares ${width.toLong * height} pixels from a " +
              s"${bytes.length}-byte stream — implausible; refusing to allocate")
          val nc = u8()
          require(nc == 1 || nc == 3,
            s"$nc components unsupported (grayscale or YCbCr)")
          comps = Array.fill(nc)(null)
          for (i <- 0 until nc) {
            val id = u8(); val hv = u8(); val tq = u8()
            require(tq <= 3, s"quantization table id $tq (0-3)")
            comps(i) = Component(id, hv >> 4, hv & 15, tq)
            require(comps(i).h >= 1 && comps(i).h <= 2 &&
              comps(i).v >= 1 && comps(i).v <= 2,
              s"sampling ${comps(i).h}x${comps(i).v} unsupported (1-2 each)")
          }
          if (nc == 3)
            require(comps(1).h == 1 && comps(1).v == 1 &&
              comps(2).h == 1 && comps(2).v == 1,
              "subsampled chroma must be 1x1 (luma carries the sampling factors)")
          hMax = comps.map(_.h).max; vMax = comps.map(_.v).max
          mcusX = (width + 8 * hMax - 1) / (8 * hMax)
          mcusY = (height + 8 * vMax - 1) / (8 * vMax)
          gridW = comps.map(c => mcusX * c.h)
          gridH = comps.map(c => mcusY * c.v)
          trueBW = comps.map(c => ((width * c.h + hMax - 1) / hMax + 7) / 8)
          trueBH = comps.map(c => ((height * c.v + vMax - 1) / vMax + 7) / 8)
          coefs = Array.tabulate(nc)(i => new Array[Int](gridW(i) * gridH(i) * 64))
          pos = start + len - 2
        case 0xC0 => throw new IllegalArgumentException(
          "SOF0 after the progressive walk started (malformed stream)")
        case 0xC4 =>
          val len = u16(); val end = pos + len - 2
          while (pos < end) {
            val tc = u8()
            val cls = tc >> 4; val id = tc & 15
            require(cls <= 1 && id <= 3, s"Huffman table class $cls id $id")
            val counts = Array.fill(16)(u8())
            val symbols = Array.fill(counts.sum)(u8())
            huffman(cls * 4 + id) = HuffTable.build(counts, symbols)
          }
        case 0xDB =>
          val len = u16(); val end = pos + len - 2
          while (pos < end) {
            val pq = u8()
            require((pq >> 4) == 0, "16-bit quantization tables unsupported")
            val id = pq & 15
            require(id <= 3, s"quantization table id $id (0-3)")
            for (k <- 0 until 64) quant(id)(Zigzag(k)) = u8()
          }
        case 0xDD =>
          val len = u16(); require(len == 4, s"DRI length $len")
          restartInterval = u16()
        case c if c >= 0xC1 && c <= 0xCF && c != 0xC4 && c != 0xC8 && c != 0xCC =>
          throw new IllegalArgumentException(
            f"SOF marker 0x$c%02x alongside SOF2 unsupported")
        case 0xDA => // one scan: header, then its entropy-coded segment
          require(comps != null, "SOS before SOF2")
          val len = u16(); val start = pos
          val ns = u8()
          require(ns >= 1 && ns <= comps.length, s"scan of $ns components")
          val scanComps = new Array[Int](ns)
          for (i <- 0 until ns) {
            val id = u8(); val tt = u8()
            val ci = comps.indexWhere(_.id == id)
            require(ci >= 0, s"scan component $id not in frame")
            scanComps(i) = ci
            comps(ci).dcTable = tt >> 4; comps(ci).acTable = tt & 15
          }
          val ss = u8(); val se = u8()
          val ahAl = u8(); val ah = ahAl >> 4; val al = ahAl & 15
          require(ss >= 0 && se <= 63 && ss <= se,
            s"spectral band $ss..$se")
          require(ss == 0 || ns == 1,
            "AC scans are single-component (T.81 interleave rule)")
          require(ss != 0 || se == 0,
            s"DC scan with Se=$se (progressive DC scans carry only coefficient 0)")
          require(al <= 13 && (ah == 0 || ah == al + 1),
            s"successive approximation Ah=$ah Al=$al")
          pos = start + len - 2
          pos = decodeScan(bytes, pos, comps, scanComps, ss, se, ah, al,
            huffman, coefs, gridW, trueBW, trueBH, mcusX, mcusY,
            restartInterval, dcPred)
        case _ =>
          val len = u16()
          require(len >= 2, s"marker segment length $len")
          pos += len - 2
      }
    }
    require(comps != null, "EOI without SOF2")

    // one dequantize + IDCT per block, into per-component planes
    val nc = comps.length
    val planeW = gridW.map(_ * 8)
    val planes = Array.tabulate(nc)(i => new Array[Int](planeW(i) * gridH(i) * 8))
    val block = new Array[Int](64)
    var ci = 0
    while (ci < nc) {
      val q = quant(comps(ci).tq)
      var b = 0
      val nBlocks = gridW(ci) * gridH(ci)
      while (b < nBlocks) {
        val base = b * 64
        var i = 0
        while (i < 64) { block(i) = coefs(ci)(base + i) * q(i); i += 1 }
        idct8x8(block)
        val ox = (b % gridW(ci)) * 8
        val oy = (b / gridW(ci)) * 8
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            planes(ci)((oy + yy) * planeW(ci) + ox + xx) = block(yy * 8 + xx)
            xx += 1
          }
          yy += 1
        }
        b += 1
      }
      ci += 1
    }
    reconstruct(comps, planes, planeW, width, height, hMax, vMax)
  }

  /** Decode ONE progressive scan's entropy-coded segment; returns the
    * stream position of the next marker's 0xFF. Annex G control flow. */
  private def decodeScan(bytes: Array[Byte], segStart: Int,
      comps: Array[Component], scanComps: Array[Int],
      ss: Int, se: Int, ah: Int, al: Int,
      huffman: Array[HuffTable], coefs: Array[Array[Int]],
      gridW: Array[Int], trueBW: Array[Int], trueBH: Array[Int],
      mcusX: Int, mcusY: Int, restartInterval: Int,
      dcPred: Array[Int]): Int = {
    val br = new BitReader(bytes, segStart, lenient = true)
    var eobrun = 0
    java.util.Arrays.fill(dcPred, 0)
    val p1 = 1 << al

    def dcFirst(ci: Int, coef: Array[Int], base: Int): Unit = {
      val dcT = huffman(comps(ci).dcTable)
      require(dcT != null, s"undefined DC table for component ${comps(ci).id}")
      val s = dcT.decode(br)
      require(s <= 15, s"DC size $s")
      val diff = if (s == 0) 0 else br.receiveExtend(s)
      dcPred(ci) += diff
      coef(base) = dcPred(ci) << al
    }
    def dcRefine(coef: Array[Int], base: Int): Unit =
      if (br.bit() == 1) coef(base) |= p1

    def acFirst(ci: Int, coef: Array[Int], base: Int): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      val acT = huffman(4 + comps(ci).acTable)
      require(acT != null, s"undefined AC table for component ${comps(ci).id}")
      var k = ss
      var done = false
      while (k <= se && !done) {
        val rs = acT.decode(br)
        val r = rs >> 4; val s = rs & 15
        if (s == 0) {
          if (r != 15) {
            eobrun = (1 << r) - 1
            if (r > 0) eobrun += br.receive(r)
            done = true
          } else k += 16 // ZRL
        } else {
          k += r
          require(k <= se, s"AC run overflows the band (k=$k, Se=$se)")
          coef(base + Zigzag(k)) = br.receiveExtend(s) << al
          k += 1
        }
      }
    }

    def acRefine(ci: Int, coef: Array[Int], base: Int): Unit = {
      def refineBit(z: Int): Unit =
        if (br.bit() == 1 && (coef(base + z) & p1) == 0)
          coef(base + z) += (if (coef(base + z) >= 0) p1 else -p1)
      var k = ss
      if (eobrun == 0) {
        val acT = huffman(4 + comps(ci).acTable)
        require(acT != null, s"undefined AC table for component ${comps(ci).id}")
        var done = false
        while (k <= se && !done) {
          val rs = acT.decode(br)
          var r = rs >> 4; val s = rs & 15
          var newVal = 0
          if (s == 0) {
            if (r != 15) {
              eobrun = 1 << r
              if (r > 0) eobrun += br.receive(r)
              done = true
            } // else ZRL: advance 16 zero-history positions below
          } else {
            require(s == 1, s"AC refinement size $s (must be 1)")
            newVal = if (br.bit() == 1) p1 else -p1
          }
          if (!done) {
            var placed = false
            while (k <= se && !placed) {
              val z = Zigzag(k)
              if (coef(base + z) != 0) refineBit(z)
              else if (r == 0) { if (newVal != 0) coef(base + z) = newVal; placed = true }
              else r -= 1
              k += 1
            }
          }
        }
      }
      if (eobrun > 0) {
        while (k <= se) {
          val z = Zigzag(k)
          if (coef(base + z) != 0) refineBit(z)
          k += 1
        }
        eobrun -= 1
      }
    }

    def decodeBlock(ci: Int, bx: Int, by: Int): Unit = {
      val base = (by * gridW(ci) + bx) * 64
      val coef = coefs(ci)
      if (ss == 0) { if (ah == 0) dcFirst(ci, coef, base) else dcRefine(coef, base) }
      else { if (ah == 0) acFirst(ci, coef, base) else acRefine(ci, coef, base) }
    }

    def restart(): Unit = {
      br.restart()
      java.util.Arrays.fill(dcPred, 0)
      eobrun = 0
    }

    if (scanComps.length == 1) {
      // non-interleaved: the component's own block raster (TRUE dims)
      val ci = scanComps(0)
      val bw = trueBW(ci); val bh = trueBH(ci)
      var b = 0
      val total = bw * bh
      while (b < total) {
        if (restartInterval > 0 && b > 0 && b % restartInterval == 0) restart()
        decodeBlock(ci, b % bw, b / bw)
        b += 1
      }
    } else {
      // interleaved (DC scans): MCU order, h*v blocks per component
      var mcu = 0
      val totalMcus = mcusX * mcusY
      while (mcu < totalMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) restart()
        val mx = mcu % mcusX; val my = mcu / mcusX
        var i = 0
        while (i < scanComps.length) {
          val ci = scanComps(i)
          val c = comps(ci)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              decodeBlock(ci, mx * c.h + bx, my * c.v + by)
              bx += 1
            }
            by += 1
          }
          i += 1
        }
        mcu += 1
      }
    }
    br.markerPos
  }

  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Canonical Huffman decode table (T.81 Annex C construction). */
  private final class HuffTable(
      val minCode: Array[Int], val maxCode: Array[Int],
      val valPtr: Array[Int], val symbols: Array[Int]) {
    def decode(br: BitReader): Int = {
      var code = br.bit()
      var l = 1
      while (l <= 16) {
        if (maxCode(l) >= 0 && code <= maxCode(l))
          return symbols(valPtr(l) + code - minCode(l))
        code = (code << 1) | br.bit()
        l += 1
      }
      throw new IllegalArgumentException("invalid Huffman code (corrupt scan)")
    }
  }
  private object HuffTable {
    def build(counts: Array[Int], symbols: Array[Int]): HuffTable = {
      val minCode = new Array[Int](17)
      val maxCode = Array.fill(17)(-1)
      val valPtr = new Array[Int](17)
      var code = 0; var k = 0
      for (l <- 1 to 16) {
        if (counts(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1); k += counts(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
      }
      new HuffTable(minCode, maxCode, valPtr, symbols.map(_ & 0xFF))
    }
  }

  /** Entropy-segment bit reader: FF00 unstuffing, restart-marker skip.
    * `lenient` (the progressive multi-scan path): ANY marker latches the
    * zero-bit supply (T.81's end-of-scan behavior) instead of throwing —
    * each scan ends at the next marker and the outer walk resumes there
    * via [[markerPos]]. */
  private final class BitReader(bytes: Array[Byte], var pos: Int,
      lenient: Boolean = false) {
    private var acc = 0
    private var nBits = 0
    private var atMarker = false
    private var mpos = -1
    def bit(): Int = {
      if (nBits == 0) {
        // T.81: once a marker is reached the decoder supplies zero bits —
        // LATCHED, so the marker byte itself (and anything after EOI) is
        // never consumed as entropy data
        if (atMarker) { acc = 0; nBits = 8 }
        else {
          var b = bytes(pos) & 0xFF; pos += 1
          if (b == 0xFF) {
            val next = bytes(pos) & 0xFF
            if (next == 0x00) pos += 1 // stuffed
            else if (next == 0xD9 || lenient) {
              pos -= 1; mpos = pos; atMarker = true; b = 0
            }
            else throw new IllegalArgumentException(
              f"marker 0x$next%02x inside the entropy-coded segment")
          }
          acc = b; nBits = 8
        }
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    /** Where the next marker's 0xFF sits after this scan's bits end. */
    def markerPos: Int =
      if (atMarker) mpos
      else {
        var p = pos
        while (p + 1 < bytes.length && !((bytes(p) & 0xFF) == 0xFF &&
          (bytes(p + 1) & 0xFF) != 0x00)) p += 1
        p
      }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def receiveExtend(s: Int): Int = {
      val v = receive(s)
      if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    }
    /** Skip to just after the next RSTn marker. */
    def restart(): Unit = {
      nBits = 0
      // byte-align, then expect FF Dn
      while (!((bytes(pos) & 0xFF) == 0xFF &&
        (bytes(pos + 1) & 0xFF) >= 0xD0 && (bytes(pos + 1) & 0xFF) <= 0xD7))
        pos += 1
      pos += 2
    }
  }

  /** Zigzag index k → natural (row-major) index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // DCT basis constants, hoisted: idct8x8 runs per 8x8 block — hundreds
  // of thousands of times per large image — and the tables never change
  private val DctC: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2) else 1.0)
  private val DctCos: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))

  /** In-place separable 8×8 float IDCT (the textbook O(8³) form — clarity
    * over an AAN fast path; per-message work is bounded). */
  private def idct8x8(block: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    val c = DctC
    val cosT = DctCos
    // rows
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) { acc += c(u) * block(y * 8 + u) * cosT(x)(u); u += 1 }
        tmp(y * 8 + x) = acc / 2
        x += 1
      }
      y += 1
    }
    // columns
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) { acc += c(v) * tmp(v * 8 + x) * cosT(yy)(v); v += 1 }
        block(yy * 8 + x) = math.round(acc / 2).toInt
        yy += 1
      }
      x += 1
    }
  }

  private def fdct8x8(block: Array[Int]): Array[Int] = {
    val tmp = new Array[Double](64)
    val c = DctC
    val cosT = DctCos
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var yy = 0
        while (yy < 8) { acc += block(yy * 8 + x) * cosT(yy)(v); yy += 1 }
        tmp(v * 8 + x) = acc
        x += 1
      }
      v += 1
    }
    val out = new Array[Int](64)
    var vv = 0
    while (vv < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var x = 0
        while (x < 8) { acc += tmp(vv * 8 + x) * cosT(x)(u); x += 1 }
        out(vv * 8 + u) = math.round(c(u) * c(vv) * acc / 4).toInt
        u += 1
      }
      vv += 1
    }
    out
  }

  // ------------------------------------------------------------- encode

  /** Annex K.3 typical Huffman tables (the tables every baseline encoder
    * ships): (counts, symbols) for luma DC/AC — used for every component
    * here (legal; chroma-optimized tables are an optimization only). */
  private val DcCounts = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcSymbols = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val AcCounts = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
  private val AcSymbols: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)

  private def encodeCodes(counts: Array[Int], symbols: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    for (l <- 1 to 16) {
      for (_ <- 0 until counts(l - 1)) {
        out(symbols(k) & 0xFF) = (code, l)
        code += 1; k += 1
      }
      code <<= 1
    }
    out.toMap
  }

  /** Encode grayscale (values 0-255) or 0xRRGGBB color (4:4:4) as a
    * baseline JPEG with all-ones quantization (near-lossless: DCT
    * rounding only — roundtrips land within ±2 per sample). */
  def encode(width: Int, height: Int, pixels: Array[Int],
      color: Boolean = false,
      /** 4:2:0 chroma subsampling (color only): luma 2×2 per MCU, chroma
        * box-averaged — exercises the decoder's subsampled-MCU path. */
      subsample420: Boolean = false,
      /** Emit DRI + RSTn markers every `restartInterval` MCUs (0 = none). */
      restartInterval: Int = 0): Array[Byte] = {
    require(pixels.length == width * height, s"${pixels.length} for ${width}x$height")
    require(!subsample420 || color, "4:2:0 needs color")
    val nc = if (color) 3 else 1
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xFF)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    w16(0xFFD8) // SOI
    w16(0xFFDB); w16(2 + 1 + 64); w8(0) // DQT table 0, all ones
    (0 until 64).foreach(_ => w8(1))
    w16(0xFFC0); w16(8 + 3 * nc); w8(8); w16(height); w16(width); w8(nc)
    for (i <- 0 until nc)
      { w8(i + 1); w8(if (subsample420 && i == 0) 0x22 else 0x11); w8(0) }
    def dht(cls: Int, id: Int, counts: Array[Int], symbols: Array[Int]): Unit = {
      w16(0xFFC4); w16(2 + 1 + 16 + symbols.length); w8((cls << 4) | id)
      counts.foreach(w8); symbols.foreach(w8)
    }
    dht(0, 0, DcCounts, DcSymbols)
    dht(1, 0, AcCounts, AcSymbols)
    if (restartInterval > 0) { w16(0xFFDD); w16(4); w16(restartInterval) }
    w16(0xFFDA); w16(6 + 2 * nc); w8(nc)
    for (i <- 0 until nc) { w8(i + 1); w8(0x00) }
    w8(0); w8(63); w8(0)

    val dc = encodeCodes(DcCounts, DcSymbols)
    val ac = encodeCodes(AcCounts, AcSymbols)
    var acc = 0L; var nBits = 0
    def putBits(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      nBits += len
      while (nBits >= 8) {
        val b = ((acc >> (nBits - 8)) & 0xFF).toInt
        w8(b); if (b == 0xFF) w8(0) // stuffing
        nBits -= 8
      }
    }
    def magnitude(v: Int): Int =
      if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))
    def putExtend(v: Int, s: Int): Unit =
      putBits(if (v < 0) v + (1 << s) - 1 else v, s)

    // component planes, level-shifted
    val planes: Array[Array[Int]] = if (!color) {
      Array(pixels.map(_ - 128))
    } else {
      val yP = new Array[Int](pixels.length)
      val cbP = new Array[Int](pixels.length)
      val crP = new Array[Int](pixels.length)
      var i = 0
      while (i < pixels.length) {
        val p = pixels(i)
        val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF; val b = p & 0xFF
        val yv = 0.299 * r + 0.587 * g + 0.114 * b
        yP(i) = math.round(yv).toInt - 128
        cbP(i) = math.round(-0.168736 * r - 0.331264 * g + 0.5 * b).toInt
        crP(i) = math.round(0.5 * r - 0.418688 * g - 0.081312 * b).toInt
        i += 1
      }
      Array(yP, cbP, crP)
    }
    // per-block encode shared by all layouts; samples gathered by (x, y)
    // with edge replication from a sampler function
    val dcPred = new Array[Int](nc)
    val block = new Array[Int](64)
    def encodeBlock(ci: Int, sample: (Int, Int) => Int, ox: Int, oy: Int): Unit = {
      var yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) {
          block(yy * 8 + xx) = sample(ox + xx, oy + yy)
          xx += 1
        }
        yy += 1
      }
      val coef = fdct8x8(block)
      val diff = coef(0) - dcPred(ci)
      dcPred(ci) = coef(0)
      val s = magnitude(diff)
      val (dcode, dlen) = dc(s)
      putBits(dcode, dlen)
      if (s > 0) putExtend(diff, s)
      var k = 1
      var run = 0
      while (k < 64) {
        val v = coef(Zigzag(k))
        if (v == 0) run += 1
        else {
          while (run >= 16) { val (zc, zl) = ac(0xF0); putBits(zc, zl); run -= 16 }
          val sz = magnitude(v)
          val (acode, alen) = ac((run << 4) | sz)
          putBits(acode, alen)
          putExtend(v, sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (ec, el) = ac(0x00); putBits(ec, el) } // EOB
    }
    def planeSample(ci: Int)(x: Int, y: Int): Int =
      planes(ci)(math.min(y, height - 1) * width + math.min(x, width - 1))
    // 4:2:0 chroma: 2x2 box mean at half resolution
    def chromaSample(ci: Int)(cx: Int, cy: Int): Int = {
      var acc = 0
      for (dy <- 0 until 2; dx <- 0 until 2)
        acc += planeSample(ci)(cx * 2 + dx, cy * 2 + dy)
      math.round(acc / 4.0).toInt
    }
    def byteAlignAndPad(): Unit =
      if (nBits > 0) putBits((1 << (8 - nBits)) - 1, 8 - nBits)
    var rstIdx = 0
    def maybeRestart(mcu: Int): Unit =
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        byteAlignAndPad()
        w16(0xFFD0 + (rstIdx % 8)); rstIdx += 1
        java.util.Arrays.fill(dcPred, 0)
      }
    if (!subsample420) {
      val mcusX = (width + 7) / 8; val mcusY = (height + 7) / 8
      for (my <- 0 until mcusY; mx <- 0 until mcusX) {
        maybeRestart(my * mcusX + mx)
        for (ci <- 0 until nc) encodeBlock(ci, planeSample(ci), mx * 8, my * 8)
      }
    } else {
      val mcusX = (width + 15) / 16; val mcusY = (height + 15) / 16
      for (my <- 0 until mcusY; mx <- 0 until mcusX) {
        maybeRestart(my * mcusX + mx)
        for (by <- 0 until 2; bx <- 0 until 2)
          encodeBlock(0, planeSample(0), mx * 16 + bx * 8, my * 16 + by * 8)
        encodeBlock(1, chromaSample(1), mx * 8, my * 8)
        encodeBlock(2, chromaSample(2), mx * 8, my * 8)
      }
    }
    byteAlignAndPad() // T.81 F.1.2.3: pad with 1-bits
    w16(0xFFD9) // EOI
    out.toByteArray
  }

  // ------------------------------------------- progressive encode (fixture)

  /** AC table for progressive scans: the Annex K baseline table carries no
    * EOBn symbols (baseline only ever emits EOB0), so progressive scans
    * use this flat table — every symbol the Annex G scans can produce
    * (EOB0..EOB14, ZRL, run/size for sizes 1-10) as 9-bit codes. Legal,
    * merely uncompressed-ish; the DECODER takes whatever the DHT says. */
  private val AcProgSymbols: Array[Int] =
    (Seq(0x00, 0xF0) ++ (1 to 14).map(_ << 4) ++
      (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)).toArray
  private val AcProgCounts: Array[Int] =
    Array.tabulate(16)(i => if (i == 8) AcProgSymbols.length else 0)

  /** Encode grayscale (0-255) or 0xRRGGBB color (4:4:4, or 4:2:0 with
    * `subsample420`) as a PROGRESSIVE JPEG (SOF2) with all-ones
    * quantization, exercising every Annex G scan kind the decoder
    * implements: interleaved DC first at Al=1 (with sampling factors
    * under 4:2:0 — the padded-MCU block grid), split-band AC first scans
    * at Al=1 (non-interleaved over each component's TRUE block dims, with
    * cross-block EOB runs), a DC refinement pass, and AC refinement
    * passes with correction bits. Successive approximation is LOSSLESS
    * across the pass pair, so a roundtrip lands within the same ±2 DCT
    * envelope as [[encode]]. */
  def encodeProgressive(width: Int, height: Int, pixels: Array[Int],
      color: Boolean = false, subsample420: Boolean = false): Array[Byte] = {
    require(pixels.length == width * height, s"${pixels.length} for ${width}x$height")
    require(!subsample420 || color, "4:2:0 needs color")
    val nc = if (color) 3 else 1
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xFF)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    w16(0xFFD8)
    w16(0xFFDB); w16(2 + 1 + 64); w8(0)
    (0 until 64).foreach(_ => w8(1))
    w16(0xFFC2); w16(8 + 3 * nc); w8(8); w16(height); w16(width); w8(nc)
    for (i <- 0 until nc)
      { w8(i + 1); w8(if (subsample420 && i == 0) 0x22 else 0x11); w8(0) }
    def dht(cls: Int, id: Int, counts: Array[Int], symbols: Array[Int]): Unit = {
      w16(0xFFC4); w16(2 + 1 + 16 + symbols.length); w8((cls << 4) | id)
      counts.foreach(w8); symbols.foreach(w8)
    }
    dht(0, 0, DcCounts, DcSymbols)
    dht(1, 0, AcProgCounts, AcProgSymbols)

    // level-shifted component planes (grayscale or YCbCr)
    val planes: Array[Array[Int]] = if (!color) Array(pixels.map(_ - 128))
    else {
      val yP = new Array[Int](pixels.length)
      val cbP = new Array[Int](pixels.length)
      val crP = new Array[Int](pixels.length)
      var i = 0
      while (i < pixels.length) {
        val p = pixels(i)
        val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF; val b = p & 0xFF
        yP(i) = math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt - 128
        cbP(i) = math.round(-0.168736 * r - 0.331264 * g + 0.5 * b).toInt
        crP(i) = math.round(0.5 * r - 0.418688 * g - 0.081312 * b).toInt
        i += 1
      }
      Array(yP, cbP, crP)
    }
    // component geometry: sampling factors, padded (MCU) block grid for
    // interleaved DC scans, TRUE block dims for non-interleaved AC scans
    val hs = Array.tabulate(nc)(i => if (subsample420 && i == 0) 2 else 1)
    val vs = hs.clone()
    val hMax = hs.max; val vMax = vs.max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val gw = Array.tabulate(nc)(i => mcusX * hs(i))
    val gh = Array.tabulate(nc)(i => mcusY * vs(i))
    val tw = Array.tabulate(nc)(i => ((width * hs(i) + hMax - 1) / hMax + 7) / 8)
    val th = Array.tabulate(nc)(i => ((height * vs(i) + vMax - 1) / vMax + 7) / 8)
    // component-space samplers with edge replication (chroma under 4:2:0
    // is the 2x2 box mean, matching [[encode]])
    def sampleAt(ci: Int, x: Int, y: Int): Int =
      if (hs(ci) == hMax && vs(ci) == vMax)
        planes(ci)(math.min(y, height - 1) * width + math.min(x, width - 1))
      else {
        var acc = 0
        var dy = 0
        while (dy < 2) {
          var dx = 0
          while (dx < 2) {
            acc += planes(ci)(math.min(y * 2 + dy, height - 1) * width +
              math.min(x * 2 + dx, width - 1))
            dx += 1
          }
          dy += 1
        }
        math.round(acc / 4.0).toInt
      }
    val blk = new Array[Int](64)
    val coefBlocks: Array[Array[Array[Int]]] = Array.tabulate(nc) { ci =>
      Array.tabulate(gw(ci) * gh(ci)) { b =>
        val ox = (b % gw(ci)) * 8; val oy = (b / gw(ci)) * 8
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            blk(yy * 8 + xx) = sampleAt(ci, ox + xx, oy + yy)
            xx += 1
          }
          yy += 1
        }
        fdct8x8(blk)
      }
    }

    val dcCodes = encodeCodes(DcCounts, DcSymbols)
    val acCodes = encodeCodes(AcProgCounts, AcProgSymbols)
    var acc = 0L; var nBits = 0
    def putBits(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      nBits += len
      while (nBits >= 8) {
        val b = ((acc >> (nBits - 8)) & 0xFF).toInt
        w8(b); if (b == 0xFF) w8(0)
        nBits -= 8
      }
    }
    def pad(): Unit = if (nBits > 0) putBits((1 << (8 - nBits)) - 1, 8 - nBits)
    def magnitude(v: Int): Int =
      if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))
    def putExtend(v: Int, s: Int): Unit =
      putBits(if (v < 0) v + (1 << s) - 1 else v, s)
    def putAc(sym: Int): Unit = { val (c, l) = acCodes(sym); putBits(c, l) }
    def sos(scanComps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      w16(0xFFDA); w16(6 + 2 * scanComps.length); w8(scanComps.length)
      scanComps.foreach { ci => w8(ci + 1); w8(0x00) }
      w8(ss); w8(se); w8((ah << 4) | al)
    }

    // MCU-ordered (mcu, comp, block) walk shared by both DC scans: the
    // interleaved layout with each component's h x v blocks per MCU
    def mcuWalk(f: (Int, Int) => Unit): Unit = // (ci, paddedBlockIdx)
      for {
        my <- 0 until mcusY; mx <- 0 until mcusX
        ci <- 0 until nc
        by <- 0 until vs(ci); bx <- 0 until hs(ci)
      } f(ci, (my * vs(ci) + by) * gw(ci) + mx * hs(ci) + bx)

    // ---- scan 1: DC first, interleaved, Al = 1 (arithmetic point shift)
    sos(0 until nc, 0, 0, 0, 1)
    val dcPred = new Array[Int](nc)
    mcuWalk { (ci, b) =>
      val v = coefBlocks(ci)(b)(0) >> 1
      val diff = v - dcPred(ci); dcPred(ci) = v
      val s = magnitude(diff)
      val (c, l) = dcCodes(s); putBits(c, l)
      if (s > 0) putExtend(diff, s)
    }
    pad()

    // ---- AC first scans, Al = 1, split bands (spectral selection) with
    // cross-block EOB-run accumulation
    var eobrun = 0
    def flushEobrun(beBits: scala.collection.mutable.ArrayBuffer[Int]): Unit = {
      if (eobrun > 0) {
        val n = 31 - Integer.numberOfLeadingZeros(eobrun)
        putAc(n << 4)
        if (n > 0) putBits(eobrun - (1 << n), n)
        eobrun = 0
        beBits.foreach(putBits(_, 1)); beBits.clear()
      }
    }
    val noBits = scala.collection.mutable.ArrayBuffer.empty[Int]
    // non-interleaved AC scans cover each component's TRUE block raster
    // (the padded MCU margin belongs to DC scans only)
    def trueBlocks(ci: Int): Seq[Int] =
      for (by <- 0 until th(ci); bx <- 0 until tw(ci))
        yield by * gw(ci) + bx

    def acFirstScan(ci: Int, ss: Int, se: Int): Unit = {
      sos(Seq(ci), ss, se, 0, 1)
      eobrun = 0
      for (b <- trueBlocks(ci)) {
        val coef = coefBlocks(ci)(b)
        def shifted(k: Int): Int = {
          val v = coef(Zigzag(k)); val av = math.abs(v) >> 1
          if (v < 0) -av else av
        }
        val kLast = (se to ss by -1).find(k => shifted(k) != 0).getOrElse(ss - 1)
        if (kLast < ss) { eobrun += 1; if (eobrun == 0x7FFF) flushEobrun(noBits) }
        else {
          flushEobrun(noBits)
          var r = 0
          for (k <- ss to kLast) {
            val v = shifted(k)
            if (v == 0) r += 1
            else {
              while (r > 15) { putAc(0xF0); r -= 16 }
              val s = magnitude(v)
              putAc((r << 4) | s); putExtend(v, s)
              r = 0
            }
          }
          if (kLast < se) { eobrun += 1; if (eobrun == 0x7FFF) flushEobrun(noBits) }
        }
      }
      flushEobrun(noBits)
      pad()
    }
    // luma's band split in two (true spectral selection); chroma whole-band
    acFirstScan(0, 1, 5)
    acFirstScan(0, 6, 63)
    for (ci <- 1 until nc) acFirstScan(ci, 1, 63)

    // ---- DC refinement: Ah = 1, Al = 0 — one raw bit per block
    sos(0 until nc, 0, 0, 1, 0)
    mcuWalk { (ci, b) => putBits(coefBlocks(ci)(b)(0) & 1, 1) }
    pad()

    // ---- AC refinement scans: Ah = 1, Al = 0 — correction bits buffered
    // across EOB runs exactly as the decoder consumes them (Annex G.1.2.3)
    def acRefineScan(ci: Int, ss: Int, se: Int): Unit = {
      sos(Seq(ci), ss, se, 1, 0)
      eobrun = 0
      // TWO buffers, as the decoder consumes them: bits riding with the
      // pending cross-block EOB run (emitted right after the EOBn symbol)
      // vs. bits since the last emitted symbol of the CURRENT block
      // (emitted after that symbol)
      val bePending = scala.collection.mutable.ArrayBuffer.empty[Int]
      val brCur = scala.collection.mutable.ArrayBuffer.empty[Int]
      for (b <- trueBlocks(ci)) {
        val coef = coefBlocks(ci)(b)
        def temp(k: Int): Int = math.abs(coef(Zigzag(k)))
        val eobPos = (se to ss by -1).find(k => temp(k) != 0).getOrElse(ss - 1)
        var r = 0
        for (k <- ss to se) {
          val t = temp(k)
          if (t == 0) r += 1
          else {
            // flush ZRLs at EVERY nonzero position (history-nonzero too):
            // the decoder consumes correction bits in position order while
            // advancing, so a run may never span an unemitted ZRL
            while (r > 15 && k <= eobPos) {
              flushEobrun(bePending)
              putAc(0xF0); r -= 16
              brCur.foreach(putBits(_, 1)); brCur.clear()
            }
            if (t > 1) brCur += (t & 1) // history-nonzero: correction bit
            else { // t == 1: newly nonzero at this precision
              flushEobrun(bePending)
              putAc((r << 4) | 1)
              putBits(if (coef(Zigzag(k)) >= 0) 1 else 0, 1)
              brCur.foreach(putBits(_, 1)); brCur.clear()
              r = 0
            }
          }
        }
        if (r > 0 || brCur.nonEmpty) { // block tail joins the EOB run
          eobrun += 1
          bePending ++= brCur; brCur.clear()
          if (eobrun == 0x7FFF || bePending.length > 900) flushEobrun(bePending)
        }
      }
      flushEobrun(bePending)
      pad()
    }
    acRefineScan(0, 1, 63)
    for (ci <- 1 until nc) acRefineScan(ci, 1, 63)

    w16(0xFFD9)
    out.toByteArray
  }
}
