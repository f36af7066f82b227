package graft.sources.tiff

import scala.collection.mutable.ArrayBuffer

/** GeoTIFF parser + writer, from the public TIFF 6.0 spec, the BigTIFF
  * extension, and the OGC GeoTIFF standard (ModelPixelScale /
  * ModelTiepoint / GeoKeyDirectory; GDAL's ASCII NODATA tag) — the
  * cloud-optimized-GeoTIFF (COG) shape CHIRPS-style rasters ship in.
  *
  * Planning reads ONLY the header and tag arrays (tile offsets /
  * byte-counts); pixel payloads are fetched per-tile by positioned
  * reads, so a scan prunes tiles without touching their bytes.
  *
  * In profile: classic AND BigTIFF, both byte orders, tiled and
  * stripped layouts, chunky (pixel-interleaved) planar config,
  * compressions none / PackBits / LZW (MSB-first, early-change) /
  * Deflate (both the 8 and legacy 32946 codes) / Zstd (code 50000,
  * GDAL's modern COG default, via the zstd-jni Spark ships) /
  * new-style JPEG (code 7, one T.81 stream per tile through the
  * in-repo [[graft.functions.Jpeg]] codec), horizontal predictor 2 AND the
  * floating-point predictor 3 (libtiff byte-plane shuffle + diff),
  * sample formats uint 8/16/32, int 8/16/32, float 32/64, multi-band,
  * COG overview IFDs (skipped by NewSubfileType), GDAL_NODATA → null,
  * palette rasters scanned as INDEX data (GDAL land-cover semantics).
  * CRS handling: GTModelType (GeoKey 1024) = 2 (geographic) scans as
  * latitude/longitude; = 1 (projected — UTM, Web-Mercator: the
  * Sentinel-2/commercial-imagery shape) scans as northing/easting with
  * the EPSG code (GeoKey 3072) surfaced, NEVER silently mislabeled as
  * degrees — [[graft.ops.Projection]] unprojects downstream.
  * Out of profile and refused BY NAME: separate planar config,
  * old-style JPEG (code 6) / CCITT / LZMA compressions, multiple
  * full-resolution pages, geocentric or user-defined GTModelType.
  *
  * The writer emits the same profile (always little-endian classic or
  * BigTIFF) and exists so fixtures and specs are built from
  * independently-assembled bytes, the repo's writer-beside-reader
  * pattern. */
object TiffFormat {

  /** One decoded raster plane descriptor — everything planning needs;
    * NO pixel bytes. Strips are normalized to tiles (tileWidth = image
    * width, tileHeight = RowsPerStrip). */
  final case class TiffRaster(
      width: Int, height: Int, bands: Int,
      sampleFormat: Int, bitsPerSample: Int,
      tileWidth: Int, tileHeight: Int,
      tileOffsets: Array[Long], tileByteCounts: Array[Long],
      compression: Int, predictor: Int,
      bigEndian: Boolean,
      // stripped layout: the LAST strip is NOT padded to full height
      // (TIFF 6.0), unlike tiles which always are
      stripped: Boolean,
      // affine geo-transform: model = origin + pixel * scale (y down)
      originX: Double, originY: Double, scaleX: Double, scaleY: Double,
      pixelIsPoint: Boolean,
      noData: Option[Double],
      // shared JPEG tables stream (tag 347) for abbreviated per-tile
      // JPEG streams — the GDAL JPEG-in-TIFF default; null = none
      jpegTables: Array[Byte] = null,
      // GTModelType (GeoKey 1024): 2 = geographic (lat/lon degrees),
      // 1 = projected (northing/easting metres); bare TIFFs default 2
      // (pixel space presented under the geographic names, the
      // pre-existing contract)
      modelType: Int = 2,
      // ProjectedCSType (GeoKey 3072) EPSG code; 0 = absent
      epsg: Int = 0) {
    def projected: Boolean = modelType == 1
    def tilesAcross: Int = (width + tileWidth - 1) / tileWidth
    def tilesDown: Int = (height + tileHeight - 1) / tileHeight
    /** Rows actually PRESENT in tile row `ty`: full tile height except
      * a stripped layout's final strip. */
    def rowsInTile(ty: Int): Int =
      if (!stripped) tileHeight
      else math.min(tileHeight, height - ty * tileHeight)
    /** Model-space X of the CENTER of pixel column x. */
    def lonOf(x: Int): Double =
      originX + (x + (if (pixelIsPoint) 0.0 else 0.5)) * scaleX
    /** Model-space Y of the CENTER of pixel row y (scaleY positive =
      * north-up raster, y decreasing down rows). */
    def latOf(y: Int): Double =
      originY - (y + (if (pixelIsPoint) 0.0 else 0.5)) * scaleY
  }

  // TIFF tag ids (6.0 §8 + GeoTIFF + GDAL)
  private val TagNewSubfileType = 254
  private val TagImageWidth = 256
  private val TagImageLength = 257
  private val TagBitsPerSample = 258
  private val TagCompression = 259
  private val TagPhotometric = 262
  private val TagStripOffsets = 273
  private val TagSamplesPerPixel = 277
  private val TagRowsPerStrip = 278
  private val TagStripByteCounts = 279
  private val TagPlanarConfig = 284
  private val TagPredictor = 317
  private val TagTileWidth = 322
  private val TagTileLength = 323
  private val TagTileOffsets = 324
  private val TagTileByteCounts = 325
  private val TagSampleFormat = 339
  private val TagModelPixelScale = 33550
  private val TagModelTiepoint = 33922
  private val TagGeoKeyDirectory = 34735
  private val TagJpegTables = 347
  private val TagGdalNoData = 42113

  // ------------------------------------------------------------- parse

  /** Parse the header + IFD chain of a GeoTIFF into the FULL-RESOLUTION
    * raster descriptor. `readAt(off, len)` is the only byte access —
    * positioned, so remote planning reads stay header-sized. */
  def parse(readAt: (Long, Int) => Array[Byte], fileLen: Long): TiffRaster =
    parse(readAt, fileLen, overview = 0)

  /** `overview` selects the reduced-resolution level: 0 = full
    * resolution, k = the k-th overview IFD in file order (the COG
    * pyramid — a preview-scale scan reads 4^-k of the bytes). The
    * geo-transform comes from the full-resolution IFD with the pixel
    * scale widened by the actual size ratio, GDAL's convention for
    * overview georeferencing. */
  def parse(readAt: (Long, Int) => Array[Byte], fileLen: Long,
      overview: Int): TiffRaster = {
    val head = readAt(0, 16)
    require(head.length >= 8, s"TIFF of ${head.length} bytes has no header")
    val be = (head(0), head(1)) match {
      case ('M', 'M') => true
      case ('I', 'I') => false
      case _ => throw new IllegalArgumentException(
        s"not a TIFF: byte-order mark ${head(0).toChar}${head(1).toChar}")
    }
    def u16(b: Array[Byte], o: Int): Int =
      if (be) ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
      else ((b(o + 1) & 0xFF) << 8) | (b(o) & 0xFF)
    def u32(b: Array[Byte], o: Int): Long = {
      val (a0, a1, a2, a3) =
        if (be) (b(o), b(o + 1), b(o + 2), b(o + 3))
        else (b(o + 3), b(o + 2), b(o + 1), b(o))
      ((a0 & 0xFFL) << 24) | ((a1 & 0xFFL) << 16) | ((a2 & 0xFFL) << 8) | (a3 & 0xFFL)
    }
    def u64(b: Array[Byte], o: Int): Long =
      if (be) (0 until 8).foldLeft(0L)((acc, i) => (acc << 8) | (b(o + i) & 0xFFL))
      else (7 to 0 by -1).foldLeft(0L)((acc, i) => (acc << 8) | (b(o + i) & 0xFFL))

    val magic = u16(head, 2)
    val big = magic match {
      case 42 => false
      case 43 =>
        require(u16(head, 4) == 8 && u16(head, 6) == 0,
          s"BigTIFF offset size ${u16(head, 4)} unsupported (8 only)")
        true
      case m => throw new IllegalArgumentException(s"not a TIFF: magic $m (42/43)")
    }
    var ifdOff = if (big) u64(head, 8) else u32(head, 4)
    val entrySize = if (big) 20 else 12
    val inlineLen = if (big) 8 else 4

    final case class Entry(tag: Int, typ: Int, count: Long, raw: Array[Byte])
    def typeSize(t: Int): Int = t match {
      case 1 | 2 | 6 | 7 => 1 // BYTE ASCII SBYTE UNDEFINED
      case 3 | 8 => 2 // SHORT SSHORT
      case 4 | 9 | 11 => 4 // LONG SLONG FLOAT
      case 5 | 10 | 12 | 16 | 17 => 8 // RATIONAL SRATIONAL DOUBLE LONG8 SLONG8
      case _ => throw new IllegalArgumentException(s"TIFF field type $t unsupported")
    }
    /** Entry payload bytes — inline if they fit, else fetched. */
    def payload(e: Entry): Array[Byte] = {
      val n = (typeSize(e.typ) * e.count).toInt
      if (n <= inlineLen) e.raw.take(n)
      else {
        val off = if (big) u64(e.raw, 0) else u32(e.raw, 0)
        require(off + n <= fileLen,
          s"truncated TIFF: tag ${e.tag} payload $n bytes at $off past end $fileLen")
        readAt(off, n)
      }
    }
    def longs(e: Entry): Array[Long] = {
      val p = payload(e)
      val sz = typeSize(e.typ)
      Array.tabulate[Long](e.count.toInt) { i =>
        e.typ match {
          case 1 => p(i) & 0xFFL
          case 3 => u16(p, i * 2).toLong
          case 4 => u32(p, i * 4)
          case 16 => u64(p, i * 8)
          case t => throw new IllegalArgumentException(
            s"TIFF tag ${e.tag}: integer field expected, got type $t")
        }
      }
    }
    def doubles(e: Entry): Array[Double] = {
      val p = payload(e)
      require(e.typ == 12, s"TIFF tag ${e.tag}: DOUBLE field expected, got type ${e.typ}")
      Array.tabulate(e.count.toInt)(i =>
        java.lang.Double.longBitsToDouble(u64(p, i * 8)))
    }
    def ascii(e: Entry): String = {
      val p = payload(e)
      new String(p.takeWhile(_ != 0), "US-ASCII")
    }

    var fullRes: Option[Map[Int, Entry]] = None
    val overviews = scala.collection.mutable.ArrayBuffer.empty[Map[Int, Entry]]
    var pages = 0
    var guard = 0
    while (ifdOff != 0) {
      guard += 1
      require(guard <= 65536, "TIFF IFD chain loops (or > 65536 IFDs)")
      require(ifdOff + (if (big) 8 else 2) <= fileLen,
        s"truncated TIFF: IFD at $ifdOff past end $fileLen")
      val nHead = readAt(ifdOff, if (big) 8 else 2)
      val n = (if (big) u64(nHead, 0) else u16(nHead, 0).toLong).toInt
      val body = readAt(ifdOff + (if (big) 8 else 2), n * entrySize + (if (big) 8 else 4))
      val entries = Map.newBuilder[Int, Entry]
      var i = 0
      while (i < n) {
        val o = i * entrySize
        val count = if (big) u64(body, o + 4) else u32(body, o + 4)
        entries += u16(body, o) -> Entry(u16(body, o), u16(body, o + 2), count,
          body.slice(o + (if (big) 12 else 8), o + entrySize))
        i += 1
      }
      val m = entries.result()
      val subType = m.get(TagNewSubfileType).map(longs(_)(0)).getOrElse(0L)
      if ((subType & 0x1L) == 0) { // bit 0 = reduced-resolution (overview)
        pages += 1
        require(pages == 1,
          "multi-page TIFF unsupported: second full-resolution IFD found " +
            "(COG overviews carry NewSubfileType bit 1 and are skipped)")
        fullRes = Some(m)
      } else overviews += m
      ifdOff = if (big) u64(body, n * entrySize) else u32(body, n * entrySize)
    }
    val ifd0 = fullRes.getOrElse(throw new IllegalArgumentException(
      "TIFF has no full-resolution IFD (overviews only)"))
    require(overview >= 0 && overview <= overviews.length,
      s"overview level $overview requested but the file carries ${overviews.length}")
    val ifd = if (overview == 0) ifd0 else overviews(overview - 1)

    def tagLongs(tag: Int): Option[Array[Long]] = ifd.get(tag).map(longs)
    def one(tag: Int, default: => Long): Long =
      tagLongs(tag).map(_(0)).getOrElse(default)
    def req(tag: Int, name: String): Array[Long] =
      tagLongs(tag).getOrElse(throw new IllegalArgumentException(
        s"TIFF missing required tag $name ($tag)"))

    val width = req(TagImageWidth, "ImageWidth")(0).toInt
    val height = req(TagImageLength, "ImageLength")(0).toInt
    require(width > 0 && height > 0 && width.toLong * height <= Int.MaxValue,
      s"TIFF raster ${width}x$height out of range")
    val bands = one(TagSamplesPerPixel, 1).toInt
    val bits = tagLongs(TagBitsPerSample).getOrElse(Array(1L))
    require(bits.distinct.length == 1,
      s"per-band BitsPerSample differ (${bits.mkString(",")}): unsupported")
    val bitsPerSample = bits(0).toInt
    require(Set(8, 16, 32, 64).contains(bitsPerSample),
      s"BitsPerSample $bitsPerSample unsupported (8/16/32/64)")
    val sfArr = tagLongs(TagSampleFormat).getOrElse(Array(1L))
    require(sfArr.distinct.length == 1,
      s"per-band SampleFormat differ (${sfArr.mkString(",")}): unsupported")
    val sampleFormat = sfArr(0).toInt
    require(sampleFormat >= 1 && sampleFormat <= 3,
      s"SampleFormat $sampleFormat unsupported (1 uint / 2 int / 3 float)")
    require(sampleFormat != 3 || bitsPerSample >= 32,
      s"float samples need 32/64 bits, got $bitsPerSample")
    require(bitsPerSample != 64 || sampleFormat == 3,
      "64-bit integer samples unsupported (float64 only)")
    val compression = one(TagCompression, 1).toInt
    require(Set(1, 5, 7, 8, 32773, 32946, 50000).contains(compression), {
      val name = compression match {
        case 2 | 3 | 4 => "CCITT fax"
        case 6 => "old-style JPEG (code 6)"
        case 34712 => "JPEG 2000"
        case 14 | 34925 => "LZMA"
        case c => s"code $c"
      }
      s"TIFF compression $name unsupported (none/LZW/Deflate/PackBits/JPEG-7/Zstd)"
    })
    val planar = one(TagPlanarConfig, 1).toInt
    require(planar == 1,
      "separate (band-sequential) PlanarConfiguration unsupported (chunky only)")
    val predictor = one(TagPredictor, 1).toInt
    require(predictor >= 1 && predictor <= 3,
      s"TIFF predictor $predictor unsupported")
    require(predictor != 3 || sampleFormat == 3,
      "floating-point predictor (3) on integer samples unsupported")
    require(compression != 7 || (sampleFormat == 1 && bitsPerSample == 8),
      "JPEG-in-TIFF carries 8-bit unsigned samples only")
    val photometric = one(TagPhotometric, 1).toInt
    // 3 = palette: for data rasters (GDAL land-cover) the INDEX is the
    // value — the ColorMap is display metadata and is ignored here.
    // 6 = YCbCr, the usual JPEG-in-TIFF labeling; the JPEG codec emits RGB
    require(photometric <= 3 || (photometric == 6 && compression == 7),
      s"photometric $photometric unsupported (alpha-profile rasters)")
    require(photometric != 3 || (bands == 1 && sampleFormat == 1),
      "palette rasters carry one unsigned index band")

    val (tw, th, offs, counts, stripped) =
      if (ifd.contains(TagTileOffsets)) {
        val tw = req(TagTileWidth, "TileWidth")(0).toInt
        val th = req(TagTileLength, "TileLength")(0).toInt
        require(tw % 16 == 0 && th % 16 == 0, s"tile ${tw}x$th not multiple of 16")
        (tw, th, req(TagTileOffsets, "TileOffsets"),
          req(TagTileByteCounts, "TileByteCounts"), false)
      } else {
        val rps = math.min(one(TagRowsPerStrip, height), height.toLong).toInt
        (width, rps, req(TagStripOffsets, "StripOffsets"),
          req(TagStripByteCounts, "StripByteCounts"), true)
      }
    val expectTiles = ((width + tw - 1) / tw) * ((height + th - 1) / th)
    require(offs.length == expectTiles && counts.length == expectTiles,
      s"TIFF tile index: ${offs.length} offsets/${counts.length} counts for $expectTiles tiles")
    offs.zip(counts).zipWithIndex.foreach { case ((o, c), i) =>
      require(o >= 0 && c >= 0 && o + c <= fileLen,
        s"truncated TIFF: tile $i claims [$o, ${o + c}) past end $fileLen")
    }

    // GeoTIFF affine: ModelPixelScale + one ModelTiepoint (the GDAL/COG
    // form) — always from the FULL-RES IFD; an overview widens the
    // pixel scale by the actual size ratio below. Tiepoint maps raster
    // (i,j) -> model (x,y).
    val scale = ifd0.get(TagModelPixelScale).map(doubles)
    val tie = ifd0.get(TagModelTiepoint).map(doubles)
    val (ox, oy, sx, sy) = (scale, tie) match {
      case (Some(sc), Some(tp)) =>
        require(sc.length >= 2 && tp.length >= 6,
          s"GeoTIFF tags malformed: ${sc.length}-double scale, ${tp.length}-double tiepoint")
        require(sc(0) > 0 && sc(1) > 0, s"pixel scale (${sc(0)}, ${sc(1)}) not positive")
        // origin = model position of raster point (0,0)
        (tp(3) - tp(0) * sc(0), tp(4) + tp(1) * sc(1), sc(0), sc(1))
      case (None, None) => (0.0, 0.0, 1.0, -1.0) // bare TIFF: pixel space
      case _ => throw new IllegalArgumentException(
        "GeoTIFF needs BOTH ModelPixelScale and ModelTiepoint (or neither)")
    }
    // GeoKey directory: header is 4 shorts, then 4-short key entries; a
    // key with tiffTagLocation 0 holds its SHORT value inline in the 4th
    // short — the form every key this profile reads uses (1024
    // GTModelType, 1025 GTRasterType, 3072 ProjectedCSType)
    val geoKeys: Map[Int, Int] =
      ifd0.get(TagGeoKeyDirectory).map(longs).map { gk =>
        gk.drop(4).grouped(4).collect {
          case k if k.length == 4 && k(1) == 0 && k(2) == 1 =>
            k(0).toInt -> k(3).toInt
        }.toMap
      }.getOrElse(Map.empty)
    // GeoKey 1025 GTRasterType: 2 = PixelIsPoint
    val pixelIsPoint = geoKeys.get(1025).contains(2)
    // GeoKey 1024 GTModelType: absent = geographic (the pre-GeoKey
    // GeoTIFF default and the bare-TIFF pixel-space contract); 1 =
    // projected — the coordinate columns MUST NOT claim to be degrees
    // (a UTM/Web-Mercator COG pruned in lat/lon space prunes WRONG
    // tiles), so the scan presents northing/easting instead; anything
    // else (3 geocentric, 32767 user-defined) is out of profile.
    val modelType = geoKeys.getOrElse(1024, 2)
    require(modelType == 1 || modelType == 2,
      s"GeoTIFF GTModelType $modelType out of profile (only 1 projected " +
        "and 2 geographic are supported; 3 = geocentric, 32767 = user-defined)")
    val epsg = geoKeys.getOrElse(3072, 0)
    val fullW = if (overview == 0) width
      else longs(ifd0(TagImageWidth))(0).toInt
    val fullH = if (overview == 0) height
      else longs(ifd0(TagImageLength))(0).toInt
    val (sxEff, syEff) =
      (sx * (fullW.toDouble / width), sy * (fullH.toDouble / height))
    // GDAL writes NODATA on the full-res IFD only — read it there for
    // every level (fall back to the selected IFD for writers that stamp
    // all levels); GDAL spells float NaN as lowercase "nan"
    val noData = ifd0.get(TagGdalNoData).orElse(ifd.get(TagGdalNoData))
      .map(ascii).flatMap { s =>
        val t = s.trim
        if (t.equalsIgnoreCase("nan")) Some(Double.NaN)
        else try Some(t.toDouble) catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"GDAL_NODATA tag unparseable: '$t'")
        }
      }

    val jpegTables = ifd.get(TagJpegTables).map(payload).orNull
    if (jpegTables != null) {
      require(jpegTables.length >= 4 &&
        (jpegTables(0) & 0xFF) == 0xFF && (jpegTables(1) & 0xFF) == 0xD8 &&
        (jpegTables(jpegTables.length - 2) & 0xFF) == 0xFF &&
        (jpegTables(jpegTables.length - 1) & 0xFF) == 0xD9,
        "JPEGTables stream is not SOI...EOI framed")
    }
    TiffRaster(width, height, bands, sampleFormat, bitsPerSample, tw, th,
      offs, counts, compression, predictor, be, stripped,
      ox, oy, sxEff, syEff, pixelIsPoint, noData, jpegTables,
      modelType, epsg)
  }

  // ------------------------------------------------------ tile decode

  /** Decode one tile's compressed bytes to row-major band-interleaved
    * Double samples (tileWidth*tileHeight*bands long — edge tiles are
    * PADDED to full tile size per the spec; callers clip). NoData is NOT
    * applied here (the scan does, so the null check stays in one
    * place). */
  def decodeTile(r: TiffRaster, compressed: Array[Byte], ty: Int): Array[Double] = {
    if (r.compression == 7) return decodeJpegTile(r, compressed, ty)
    val bytesPerSample = r.bitsPerSample / 8
    val rowBytes = r.tileWidth * r.bands * bytesPerSample
    // a stripped file's LAST strip carries only the remaining rows per
    // TIFF 6.0 — but some writers pad it to full RowsPerStrip, so the
    // decoders accept anything in [needed, full] and we use `rows`
    val rows = r.rowsInTile(ty)
    val maxBytes = rowBytes * r.tileHeight
    val raw0 = r.compression match {
      case 1 => compressed
      case 5 => lzwDecode(compressed, rowBytes * rows, maxBytes)
      case 8 | 32946 => inflate(compressed, rowBytes * rows, maxBytes)
      case 32773 => packBitsDecode(compressed, rowBytes * rows, maxBytes)
      case 50000 => zstdDecode(compressed, rowBytes * rows, maxBytes)
    }
    require(raw0.length >= rowBytes * rows,
      s"TIFF tile decompressed to ${raw0.length} bytes, need ${rowBytes * rows}")
    val raw = raw0
    if (r.predictor == 2) {
      // horizontal differencing: per row, per band, cumulative sum over
      // the sample integers at their native width
      var y = 0
      while (y < rows) {
        val base = y * rowBytes
        var x = 1
        while (x < r.tileWidth) {
          var b = 0
          while (b < r.bands) {
            val cur = base + (x * r.bands + b) * bytesPerSample
            val prev = cur - r.bands * bytesPerSample
            addBytes(raw, prev, cur, bytesPerSample, r.bigEndian)
            b += 1
          }
          x += 1
        }
        y += 1
      }
    }
    if (r.predictor == 3) {
      // floating-point predictor (libtiff fpAcc): per row, byte-wise
      // cumulative sum with stride = samples-per-pixel, then de-shuffle
      // the byte PLANES (MSB plane first in the file) back to
      // sample-major order in the file's declared endianness
      val wc = r.tileWidth * r.bands
      val stride = r.bands
      val tmp = new Array[Byte](rowBytes)
      var y = 0
      while (y < rows) {
        val base = y * rowBytes
        var i = stride
        while (i < rowBytes) {
          raw(base + i) = (raw(base + i) + raw(base + i - stride)).toByte
          i += 1
        }
        System.arraycopy(raw, base, tmp, 0, rowBytes)
        var s = 0
        while (s < wc) {
          var b = 0
          while (b < bytesPerSample) {
            val plane = if (r.bigEndian) b else bytesPerSample - 1 - b
            raw(base + s * bytesPerSample + b) = tmp(plane * wc + s)
            b += 1
          }
          s += 1
        }
        y += 1
      }
    }
    // output stays FULL tile size (absent rows zero-padded) so callers
    // index uniformly; the scan clips to the raster bounds anyway
    val present = r.tileWidth * rows * r.bands
    val out = new Array[Double](r.tileWidth * r.tileHeight * r.bands)
    var i = 0
    while (i < present) {
      out(i) = sampleAt(raw, i * bytesPerSample, r)
      i += 1
    }
    out
  }

  /** JPEG-in-TIFF (new-style, compression 7): every tile/strip is one
    * complete JPEG stream through the in-repo T.81 codec — grayscale to
    * 1 band, YCbCr→RGB to 3. */
  private def decodeJpegTile(r: TiffRaster, compressed: Array[Byte],
      ty: Int): Array[Double] = {
    // abbreviated tile streams (the GDAL default) carry no DQT/DHT of
    // their own: splice the shared JPEGTables stream (minus its EOI)
    // ahead of the tile's content (minus its SOI)
    val stream =
      if (r.jpegTables == null) compressed
      else {
        require(compressed.length >= 2 && (compressed(0) & 0xFF) == 0xFF &&
          (compressed(1) & 0xFF) == 0xD8, "JPEG tile missing SOI")
        val merged = new Array[Byte](r.jpegTables.length - 2 + compressed.length - 2)
        System.arraycopy(r.jpegTables, 0, merged, 0, r.jpegTables.length - 2)
        System.arraycopy(compressed, 2, merged, r.jpegTables.length - 2,
          compressed.length - 2)
        merged
      }
    val img = graft.functions.Jpeg.decode(stream)
    // libtiff/GDAL encode a stripped file's FINAL strip as a JPEG of
    // only the remaining rows; padded full-height strips are accepted too
    val rows = r.rowsInTile(ty)
    require(img.width == r.tileWidth &&
      (img.height == r.tileHeight || img.height == rows),
      s"JPEG tile is ${img.width}x${img.height}, TIFF says " +
        s"${r.tileWidth}x${r.tileHeight} (or $rows final-strip rows)")
    require((img.components == 1 && r.bands == 1) ||
      (img.components == 3 && r.bands == 3),
      s"JPEG tile has ${img.components} components, TIFF says ${r.bands} bands")
    val n = r.tileWidth * img.height
    val out = new Array[Double](r.tileWidth * r.tileHeight * r.bands)
    var i = 0
    if (r.bands == 1)
      while (i < n) { out(i) = img.pixels(i).toDouble; i += 1 }
    else
      while (i < n) {
        val p = img.pixels(i)
        out(i * 3) = ((p >> 16) & 0xFF).toDouble
        out(i * 3 + 1) = ((p >> 8) & 0xFF).toDouble
        out(i * 3 + 2) = (p & 0xFF).toDouble
        i += 1
      }
    out
  }

  /** sample[cur] += sample[prev] at native integer width (mod 2^bits). */
  private def addBytes(b: Array[Byte], prev: Int, cur: Int, size: Int,
      be: Boolean): Unit = {
    var carrySum = 0L
    var pv = 0L; var cv = 0L
    var i = 0
    while (i < size) {
      val sh = if (be) (size - 1 - i) * 8 else i * 8
      pv |= (b(prev + i) & 0xFFL) << sh
      cv |= (b(cur + i) & 0xFFL) << sh
      i += 1
    }
    carrySum = pv + cv
    i = 0
    while (i < size) {
      val sh = if (be) (size - 1 - i) * 8 else i * 8
      b(cur + i) = ((carrySum >> sh) & 0xFF).toByte
      i += 1
    }
  }

  private def sampleAt(b: Array[Byte], o: Int, r: TiffRaster): Double = {
    val size = r.bitsPerSample / 8
    var v = 0L
    var i = 0
    while (i < size) {
      val sh = if (r.bigEndian) (size - 1 - i) * 8 else i * 8
      v |= (b(o + i) & 0xFFL) << sh
      i += 1
    }
    r.sampleFormat match {
      case 1 => v.toDouble // unsigned
      case 2 => // signed at native width
        val shift = 64 - r.bitsPerSample
        ((v << shift) >> shift).toDouble
      case 3 =>
        if (r.bitsPerSample == 32) java.lang.Float.intBitsToFloat(v.toInt).toDouble
        else java.lang.Double.longBitsToDouble(v)
    }
  }

  /** Raw inflate with both zlib-wrapped and raw streams accepted
    * (Deflate-in-TIFF is zlib-wrapped; be liberal like libtiff). */
  private def inflate(in: Array[Byte], expect: Int,
      capacity: Int = -1): Array[Byte] = {
    val cap = if (capacity < 0) expect else capacity
    def run(nowrap: Boolean): Array[Byte] = {
      val inf = new java.util.zip.Inflater(nowrap)
      inf.setInput(in)
      val out = new Array[Byte](cap)
      var got = 0
      while (got < cap && !inf.finished()) {
        val n = inf.inflate(out, got, cap - got)
        if (n == 0 && inf.needsInput())
          throw new java.util.zip.DataFormatException("truncated deflate stream")
        got += n
      }
      inf.end()
      require(got >= expect, s"deflate stream yielded $got of $expect bytes")
      out
    }
    try run(nowrap = false)
    catch { case _: java.util.zip.DataFormatException =>
      try run(nowrap = true)
      catch { case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(
          s"corrupt TIFF deflate tile: ${e.getMessage}") }
    }
  }

  /** Zstd (compression 50000 — GDAL's modern COG default): the same
    * zstd-jni backend the Zarr/HDF5 codec paths use. Accepts anything
    * in [expect, capacity] like the other decoders (padded final
    * strips). No JDK TIFF counterpart exists to interop-pin — the
    * writer-beside-reader roundtrip + the shared zstd-jni library (also
    * exercised against real zarr fixtures) carry the validation. */
  private def zstdDecode(in: Array[Byte], expect: Int,
      capacity: Int = -1): Array[Byte] = {
    val cap = if (capacity < 0) expect else capacity
    val out = new Array[Byte](cap)
    val got = try
      com.github.luben.zstd.Zstd.decompressByteArray(out, 0, cap, in, 0, in.length)
    catch { case e: com.github.luben.zstd.ZstdException =>
      throw new IllegalArgumentException(s"corrupt TIFF zstd tile: ${e.getMessage}")
    }
    require(got >= expect, s"zstd tile yielded $got of $expect bytes")
    out
  }

  private def packBitsDecode(in: Array[Byte], expect: Int,
      capacity: Int = -1): Array[Byte] = {
    val cap = if (capacity < 0) expect else capacity
    val out = new Array[Byte](cap)
    var i = 0; var o = 0
    while (o < expect && i < in.length) {
      val n = in(i); i += 1
      if (n >= 0) {
        require(i + n + 1 <= in.length && o + n + 1 <= cap,
          s"PackBits literal run of ${n + 1} overruns")
        System.arraycopy(in, i, out, o, n + 1); i += n + 1; o += n + 1
      } else if (n != -128) {
        require(i < in.length && o + (1 - n) <= cap,
          s"PackBits replicate run of ${1 - n} overruns")
        java.util.Arrays.fill(out, o, o + 1 - n, in(i)); i += 1; o += 1 - n
      } // -128: no-op
    }
    require(o >= expect, s"truncated PackBits tile: yielded $o of $expect")
    out
  }

  /** TIFF LZW (6.0 §13): MSB-first variable-width codes 9→12 bits,
    * ClearCode 256, EOI 257, with the "early change" (the code width
    * bumps one code BEFORE the table fills — the libtiff/GDAL wire
    * form). */
  private def lzwDecode(in: Array[Byte], expect: Int,
      capacity: Int = -1): Array[Byte] = {
    val cap = if (capacity < 0) expect else capacity
    val out = new Array[Byte](cap)
    var o = 0
    var bitPos = 0L
    val nBits = in.length.toLong * 8
    def read(width: Int): Int = {
      require(bitPos + width <= nBits, s"truncated LZW tile at bit $bitPos")
      var v = 0
      var i = 0
      while (i < width) {
        val bp = bitPos + i
        v = (v << 1) | ((in((bp >> 3).toInt) >> (7 - (bp & 7)).toInt) & 1)
        i += 1
      }
      bitPos += width
      v
    }
    val Clear = 256; val Eoi = 257
    // dictionary: firstFree grows from 258; entries as (prefix, byte)
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4096)
    var next = 258
    var width = 9
    var old = -1
    def emit(code: Int): Byte = {
      var sp = 0
      var c = code
      while (c >= 258) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      val first = c.toByte
      require(o + sp + 1 <= cap,
        s"LZW output overruns tile: $o + ${sp + 1} > $cap")
      out(o) = first; o += 1
      while (sp > 0) { sp -= 1; out(o) = stack(sp); o += 1 }
      first
    }
    var done = false
    while (!done && o < expect) {
      val code = read(width)
      if (code == Eoi) done = true
      else if (code == Clear) { next = 258; width = 9; old = -1 }
      else {
        require(code < next || (code == next && old >= 0),
          s"corrupt LZW tile: code $code with table at $next")
        if (old < 0) { // first code after clear: literal
          require(code < 256, s"corrupt LZW tile: first code $code not a literal")
          out(o) = code.toByte; o += 1
          old = code
        } else {
          val first =
            if (code == next) { // KwKwK
              // emit old's expansion + its first byte
              val f = firstByte(code = old, prefix, suffix)
              emit(old)
              require(o < cap, "LZW output overruns tile (KwKwK)")
              out(o) = f; o += 1
              f
            } else emit(code)
          if (next < 4096) {
            prefix(next) = old; suffix(next) = first; next += 1
            // early change, decoder side: bump when the table reaches
            // 2^width - 1 (511/1023/2047) — the libtiff / JDK-ImageIO
            // wire form, pinned by the ImageIO interop spec
            if (next == (1 << width) - 1 && width < 12) width += 1
          }
          old = code
        }
      }
    }
    require(o >= expect, s"LZW tile yielded $o of $expect bytes")
    out
  }

  private def firstByte(code: Int, prefix: Array[Int], suffix: Array[Byte]): Byte = {
    var c = code
    while (c >= 258) c = prefix(c)
    c.toByte
  }

  // ------------------------------------------------------------- write

  /** Writer options; each knob exercises a distinct reader path. */
  final case class WriteOpts(
      tileSize: Int = 0, // 0 = strips (rowsPerStrip), else NxN tiles
      rowsPerStrip: Int = 8,
      compression: Int = 1, // 1 none, 5 LZW, 8 deflate, 32773 packbits, 50000 zstd
      predictor: Int = 1,
      bigTiff: Boolean = false,
      overview: Boolean = false, // append a /2 overview IFD (COG shape)
      pixelIsPoint: Boolean = false,
      noData: Option[Double] = None,
      // emit shared tables via tag 347 + ABBREVIATED per-tile streams
      // (the GDAL JPEG-in-TIFF default); compression 7 only
      jpegTablesSplit: Boolean = false,
      // GTModelType to stamp: 2 geographic (default), 1 projected
      modelType: Int = 2,
      // ProjectedCSType (GeoKey 3072) when projected; 0 = omit
      epsg: Int = 0)

  /** Write a GeoTIFF: `values(band)(y*width + x)`, sampleFormat/bits as
    * in the descriptor, geo-transform (originX, originY, scaleX, scaleY)
    * with origin = model position of the raster's top-left CORNER. */
  def write(width: Int, height: Int, values: Array[Array[Double]],
      sampleFormat: Int, bitsPerSample: Int,
      originX: Double, originY: Double, scaleX: Double, scaleY: Double,
      opts: WriteOpts = WriteOpts()): Array[Byte] = {
    val bands = values.length
    require(bands >= 1 && values.forall(_.length == width * height),
      s"need >=1 band of ${width * height} values")
    require(opts.tileSize == 0 || opts.tileSize % 16 == 0,
      "tile size must be a multiple of 16")
    require(opts.predictor != 3 || sampleFormat == 3,
      "floating-point predictor needs float samples")
    require(opts.compression != 7 ||
      (sampleFormat == 1 && bitsPerSample == 8 && (bands == 1 || bands == 3)
        && opts.predictor == 1),
      "JPEG-in-TIFF writes 8-bit unsigned 1/3-band tiles, no predictor")

    require(!opts.jpegTablesSplit || opts.compression == 7,
      "jpegTablesSplit applies to JPEG-in-TIFF (compression 7) only")
    require(!(opts.jpegTablesSplit && opts.overview),
      "shared JPEG tables + overview IFD unsupported in the writer")
    /** Split a standalone JPEG into (SOI+DQT/DHT+EOI tables stream,
      * abbreviated stream without those segments). */
    def splitJpegTables(stream: Array[Byte]): (Array[Byte], Array[Byte]) = {
      val tables = new ArrayBuffer[Byte](); val rest = new ArrayBuffer[Byte]()
      tables += 0xFF.toByte; tables += 0xD8.toByte
      rest += 0xFF.toByte; rest += 0xD8.toByte
      var o = 2
      var inScan = false
      while (o < stream.length) {
        if (inScan) { rest += stream(o); o += 1 }
        else {
          require((stream(o) & 0xFF) == 0xFF, s"bad JPEG marker at $o")
          val m = stream(o + 1) & 0xFF
          val segLen =
            if (m == 0xD9) 2
            else 2 + (((stream(o + 2) & 0xFF) << 8) | (stream(o + 3) & 0xFF))
          val sink = if (m == 0xDB || m == 0xC4) tables else rest
          var i = 0
          while (i < segLen) { sink += stream(o + i); i += 1 }
          if (m == 0xDA) inScan = true // entropy data follows to EOI
          o += segLen
        }
      }
      tables += 0xFF.toByte; tables += 0xD9.toByte
      (tables.toArray, rest.toArray)
    }
    var sharedJpegTables: Array[Byte] = null

    val out = new ArrayBuffer[Byte](1 << 16)
    def pad(): Unit = while (out.length % 2 != 0) out += 0
    def u16(v: Int): Unit = { out += (v & 0xFF).toByte; out += ((v >> 8) & 0xFF).toByte }
    def u32(v: Long): Unit = { u16((v & 0xFFFF).toInt); u16(((v >> 16) & 0xFFFF).toInt) }
    def u64(v: Long): Unit = { u32(v & 0xFFFFFFFFL); u32(v >>> 32) }

    val big = opts.bigTiff
    out += 'I'; out += 'I'
    u16(if (big) 43 else 42)
    if (big) { u16(8); u16(0); u64(0) } else u32(0)
    val ifdPtrAt = if (big) 8 else 4

    def encodePlane(w: Int, h: Int, vals: Array[Array[Double]])
        : (Int, Int, Array[Array[Byte]]) = {
      val bytesPerSample = bitsPerSample / 8
      val (tw, th) =
        if (opts.tileSize > 0) (opts.tileSize, opts.tileSize)
        else (w, math.min(opts.rowsPerStrip, h))
      val across = (w + tw - 1) / tw
      val down = (h + th - 1) / th
      def encodeRawTile(ty: Int, tx: Int): Array[Byte] = {
        val rowBytes = tw * bands * bytesPerSample
        // TIFF 6.0: tiles pad to full size; a stripped file's final
        // strip carries ONLY the remaining rows
        val rows =
          if (opts.tileSize > 0) th else math.min(th, h - ty * th)
        val raw = new Array[Byte](rowBytes * rows)
        var y = 0
        while (y < rows) {
          var x = 0
          while (x < tw) {
            val sy = ty * th + y; val sx = tx * tw + x
            var b = 0
            while (b < bands) {
              // edge padding: replicate... spec says padded, content
              // arbitrary; zeros keep predictor simple
              val v = if (sy < h && sx < w) vals(b)(sy * w + sx) else 0.0
              var bits = sampleFormat match {
                case 3 =>
                  if (bitsPerSample == 32)
                    java.lang.Float.floatToIntBits(v.toFloat).toLong & 0xFFFFFFFFL
                  else java.lang.Double.doubleToLongBits(v)
                case _ => v.toLong & ((if (bitsPerSample == 64) -1L
                  else (1L << bitsPerSample) - 1))
              }
              val o0 = y * rowBytes + (x * bands + b) * bytesPerSample
              var i = 0
              while (i < bytesPerSample) {
                raw(o0 + i) = (bits & 0xFF).toByte; bits >>>= 8; i += 1
              }
              b += 1
            }
            x += 1
          }
          y += 1
        }
        if (opts.predictor == 2) {
          val rowBytes2 = tw * bands * bytesPerSample
          var y = 0
          while (y < rows) {
            val base = y * rowBytes2
            var x = tw - 1
            while (x >= 1) {
              var b = 0
              while (b < bands) {
                val cur = base + (x * bands + b) * bytesPerSample
                val prev = cur - bands * bytesPerSample
                subBytes(raw, prev, cur, bytesPerSample)
                b += 1
              }
              x -= 1
            }
            y += 1
          }
        }
        if (opts.predictor == 3) {
          // fpDiff: shuffle each row to byte planes (MSB plane first;
          // our raw layout is little-endian, so plane p = byte bps-1-p),
          // then byte-wise difference with stride = samples per pixel
          val wc = tw * bands
          val tmp = new Array[Byte](rowBytes)
          var y = 0
          while (y < rows) {
            val base = y * rowBytes
            System.arraycopy(raw, base, tmp, 0, rowBytes)
            var s = 0
            while (s < wc) {
              var p = 0
              while (p < bytesPerSample) {
                raw(base + p * wc + s) =
                  tmp(s * bytesPerSample + (bytesPerSample - 1 - p))
                p += 1
              }
              s += 1
            }
            var i = rowBytes - 1
            while (i >= bands) {
              raw(base + i) = (raw(base + i) - raw(base + i - bands)).toByte
              i -= 1
            }
            y += 1
          }
        }
        opts.compression match {
          case 1 => raw
          case 5 => lzwEncode(raw)
          case 8 => deflate(raw)
          case 32773 => packBitsEncode(raw)
          case 50000 => com.github.luben.zstd.Zstd.compress(raw, 3)
        }
      }
      val tiles = Array.tabulate(down * across) { t =>
        val ty = t / across; val tx = t % across
        if (opts.compression == 7) {
          // one complete JPEG stream per tile (padded to full tile size)
          val px = Array.tabulate(tw * th) { i =>
            val sy = ty * th + i / tw; val sx = tx * tw + i % tw
            def at(b: Int) =
              (if (sy < h && sx < w) vals(b)(sy * w + sx) else 0.0).toInt & 0xFF
            if (bands == 1) at(0) else (at(0) << 16) | (at(1) << 8) | at(2)
          }
          val full = graft.functions.Jpeg.encode(tw, th, px, color = bands == 3)
          if (!opts.jpegTablesSplit) full
          else {
            val (tables, abbreviated) = splitJpegTables(full)
            if (sharedJpegTables == null) sharedJpegTables = tables
            abbreviated
          }
        } else encodeRawTile(ty, tx)
      }
      (tw, th, tiles)
    }

    final case class Tag(id: Int, typ: Int, count: Long, values: Array[Long],
        dbl: Array[Double] = null, asc: String = null,
        raw: Array[Byte] = null)

    def writeIfd(w: Int, h: Int, tw: Int, th: Int, tiles: Array[Array[Byte]],
        isOverview: Boolean, geo: Boolean): Long = {
      // lay tile payloads down first
      val tileOffs = tiles.map { t => pad(); val o = out.length.toLong; out ++= t; o }
      val tiled = opts.tileSize > 0
      var tags = ArrayBuffer[Tag]()
      if (isOverview)
        tags += Tag(TagNewSubfileType, 4, 1, Array(1L))
      tags += Tag(TagImageWidth, 4, 1, Array(w.toLong))
      tags += Tag(TagImageLength, 4, 1, Array(h.toLong))
      tags += Tag(TagBitsPerSample, 3, bands, Array.fill(bands)(bitsPerSample.toLong))
      tags += Tag(TagCompression, 3, 1, Array(opts.compression.toLong))
      tags += Tag(TagPhotometric, 3, 1,
        Array(if (opts.compression == 7 && bands == 3) 6L
          else if (bands == 3) 2L else 1L))
      if (!tiled) {
        tags += Tag(TagStripOffsets, if (big) 16 else 4, tiles.length, tileOffs)
        tags += Tag(TagRowsPerStrip, 4, 1, Array(th.toLong))
        tags += Tag(TagStripByteCounts, 4, tiles.length, tiles.map(_.length.toLong))
      }
      tags += Tag(TagSamplesPerPixel, 3, 1, Array(bands.toLong))
      tags += Tag(TagPlanarConfig, 3, 1, Array(1L))
      if (opts.predictor != 1)
        tags += Tag(TagPredictor, 3, 1, Array(opts.predictor.toLong))
      if (tiled) {
        tags += Tag(TagTileWidth, 3, 1, Array(tw.toLong))
        tags += Tag(TagTileLength, 3, 1, Array(th.toLong))
        tags += Tag(TagTileOffsets, if (big) 16 else 4, tiles.length, tileOffs)
        tags += Tag(TagTileByteCounts, 4, tiles.length, tiles.map(_.length.toLong))
      }
      tags += Tag(TagSampleFormat, 3, bands, Array.fill(bands)(sampleFormat.toLong))
      if (geo) {
        tags += Tag(TagModelPixelScale, 12, 3, null,
          dbl = Array(scaleX, scaleY, 0.0))
        tags += Tag(TagModelTiepoint, 12, 6, null,
          dbl = Array(0.0, 0.0, 0.0, originX, originY, 0.0))
        // minimal GeoKey directory: v1.1.0, GTModelType + GTRasterType
        // per opts, plus ProjectedCSType when a projected EPSG is given
        val keys = ArrayBuffer(
          (1024L, opts.modelType.toLong),
          (1025L, if (opts.pixelIsPoint) 2L else 1L))
        if (opts.modelType == 1 && opts.epsg > 0)
          keys += ((3072L, opts.epsg.toLong))
        tags += Tag(TagGeoKeyDirectory, 3, 4 + 4 * keys.length,
          Array(1L, 1L, 0L, keys.length.toLong) ++
            keys.flatMap { case (k, v) => Seq(k, 0L, 1L, v) })
      }
      if (sharedJpegTables != null && !isOverview)
        tags += Tag(TagJpegTables, 7, sharedJpegTables.length.toLong, null,
          raw = sharedJpegTables)
      opts.noData.foreach { nd =>
        val s = (if (nd == nd.toLong.toDouble) nd.toLong.toString else nd.toString)
        tags += Tag(TagGdalNoData, 2, s.length + 1L, null, asc = s)
      }
      tags = tags.sortBy(_.id)

      val entrySize = if (big) 20 else 12
      val inline = if (big) 8 else 4
      def typeSize(t: Int) = t match {
        case 1 | 2 | 7 => 1; case 3 => 2; case 4 => 4; case 12 | 16 => 8
      }
      // out-of-line payloads
      val payloadOffs = tags.map { t =>
        val n = (typeSize(t.typ) * t.count).toInt
        if (n <= inline) -1L
        else {
          pad(); val o = out.length.toLong
          emitTagPayload(t, out)
          o
        }
      }
      pad()
      val ifdAt = out.length.toLong
      if (big) u64(tags.length.toLong) else u16(tags.length)
      tags.zip(payloadOffs).foreach { case (t, po) =>
        u16(t.id); u16(t.typ)
        if (big) u64(t.count) else u32(t.count)
        val mark = out.length
        if (po >= 0) { if (big) u64(po) else u32(po) }
        else emitTagPayload(t, out)
        while (out.length < mark + inline) out += 0
        require(out.length == mark + inline, s"tag ${t.id} inline overflow")
      }
      // next-IFD pointer: caller patches
      if (big) u64(0) else u32(0)
      ifdAt
    }

    def emitTagPayload(t: Tag, sink: ArrayBuffer[Byte]): Unit = {
      def p16(v: Int): Unit = { sink += (v & 0xFF).toByte; sink += ((v >> 8) & 0xFF).toByte }
      def p32(v: Long): Unit = { p16((v & 0xFFFF).toInt); p16(((v >> 16) & 0xFFFF).toInt) }
      def p64(v: Long): Unit = { p32(v & 0xFFFFFFFFL); p32(v >>> 32) }
      if (t.raw != null) sink ++= t.raw
      else if (t.asc != null) { t.asc.foreach(c => sink += c.toByte); sink += 0 }
      else if (t.dbl != null) t.dbl.foreach(d => p64(java.lang.Double.doubleToLongBits(d)))
      else t.values.foreach { v =>
        t.typ match {
          case 1 | 2 => sink += (v & 0xFF).toByte
          case 3 => p16(v.toInt)
          case 4 => p32(v)
          case 16 => p64(v)
        }
      }
    }

    val (tw, th, tiles) = encodePlane(width, height, values)
    val ifd0 = writeIfd(width, height, tw, th, tiles, isOverview = false, geo = true)
    // patch header IFD pointer
    patchPtr(out, ifdPtrAt, ifd0, big)
    if (opts.overview) {
      val ow = math.max(1, width / 2); val oh = math.max(1, height / 2)
      val ovals = Array.tabulate(bands)(b => Array.tabulate(ow * oh) { i =>
        values(b)((i / ow) * 2 * width + (i % ow) * 2)
      })
      val (otw, oth, otiles) = encodePlane(ow, oh, ovals)
      val ifd1 = writeIfd(ow, oh, otw, oth, otiles, isOverview = true, geo = false)
      patchNextPtr(out, ifd0, ifd1, big)
    }
    out.toArray
  }

  private def patchPtr(out: ArrayBuffer[Byte], at: Int, v: Long, big: Boolean): Unit = {
    val n = if (big) 8 else 4
    var x = v
    var i = 0
    while (i < n) { out(at + i) = (x & 0xFF).toByte; x >>>= 8; i += 1 }
  }

  /** Patch the next-IFD pointer at the end of the IFD that starts at
    * `ifdAt`. */
  private def patchNextPtr(out: ArrayBuffer[Byte], ifdAt: Long, target: Long,
      big: Boolean): Unit = {
    val a = ifdAt.toInt
    val n =
      if (big) java.nio.ByteBuffer.wrap(out.slice(a, a + 8).toArray)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong.toInt
      else ((out(a) & 0xFF) | ((out(a + 1) & 0xFF) << 8))
    val entrySize = if (big) 20 else 12
    val ptrAt = a + (if (big) 8 else 2) + n * entrySize
    patchPtr(out, ptrAt, target, big)
  }

  private def subBytes(b: Array[Byte], prev: Int, cur: Int, size: Int): Unit = {
    // little-endian writer layout
    var pv = 0L; var cv = 0L
    var i = 0
    while (i < size) {
      pv |= (b(prev + i) & 0xFFL) << (i * 8)
      cv |= (b(cur + i) & 0xFFL) << (i * 8)
      i += 1
    }
    var d = cv - pv
    i = 0
    while (i < size) { b(cur + i) = (d & 0xFF).toByte; d >>>= 8; i += 1 }
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(6, false) // zlib-wrapped
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = new ArrayBuffer[Byte](raw.length / 2)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out ++= buf.take(n)
    }
    d.end()
    out.toArray
  }

  private def packBitsEncode(raw: Array[Byte]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](raw.length + raw.length / 128 + 2)
    var i = 0
    while (i < raw.length) {
      // find a run
      var run = 1
      while (i + run < raw.length && run < 128 && raw(i + run) == raw(i)) run += 1
      if (run >= 2) {
        out += (1 - run).toByte; out += raw(i); i += run
      } else {
        var lit = 1
        while (i + lit < raw.length && lit < 128 &&
          !(i + lit + 1 < raw.length && raw(i + lit) == raw(i + lit + 1))) lit += 1
        out += (lit - 1).toByte
        var j = 0
        while (j < lit) { out += raw(i + j); j += 1 }
        i += lit
      }
    }
    out.toArray
  }

  /** TIFF LZW encoder (MSB-first, early change) — string-table via a
    * hash of (prefixCode, byte). */
  private def lzwEncode(raw: Array[Byte]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](raw.length)
    var acc = 0L; var nAcc = 0
    var width = 9
    def put(code: Int): Unit = {
      acc = (acc << width) | code
      nAcc += width
      while (nAcc >= 8) {
        out += ((acc >> (nAcc - 8)) & 0xFF).toByte
        nAcc -= 8
      }
    }
    val Clear = 256; val Eoi = 257
    val table = new java.util.HashMap[Long, Integer](8192)
    def key(pfx: Int, b: Byte) = (pfx.toLong << 8) | (b & 0xFFL)
    var next = 258
    put(Clear)
    var i = 0
    if (raw.nonEmpty) {
      var cur = raw(0) & 0xFF
      i = 1
      while (i < raw.length) {
        val b = raw(i)
        val k = key(cur, b)
        val hit = table.get(k)
        if (hit != null) cur = hit
        else {
          put(cur)
          table.put(k, next)
          next += 1
          // encoder side: the encoder's table runs ONE entry ahead of
          // the decoder's, so it bumps at 2^width (libtiff's
          // free_ent > maxcode with maxcode = 2^nbits - 1)
          if (next == (1 << width) && width < 12) width += 1
          if (next == 4094) { // table nearly full: clear
            put(Clear)
            table.clear(); next = 258; width = 9
          }
          cur = b & 0xFF
        }
        i += 1
      }
      put(cur)
    }
    put(Eoi)
    if (nAcc > 0) out += ((acc << (8 - nAcc)) & 0xFF).toByte
    out.toArray
  }
}
