package graft.sources.grib

import java.io.{DataOutputStream, EOFException, InputStream}

/** GRIB editions 1 AND 2 binary format model (WMO FM 92, public specs):
  * writer + parser for the subset the DSv2 scan supports — the OTHER input
  * format of the reference next to NetCDF (transform.py:75-79 lists grib
  * alongside netcdf; kerchunk's grib2 path plays the reader role there).
  * Both editions parse into the same [[GribMessage]] planning state: the
  * decode formula `(R + X·2^E) / 10^D` is identical, only header layout
  * and the reference-value float encoding (IBM/370 vs IEEE 754) differ,
  * and parsing resolves both to a Double. Files may mix editions.
  *
  * Edition-1 subset: PDS with full reference time; GDS grid type 0
  * (regular lat/lon); BMS bitmaps (inline); BDS simple packing.
  * Edition-2 subset: grid templates 3.0 (regular lat/lon, 10⁻⁶ degrees)
  * and 3.30 (Lambert conformal — RTMA/HRRR grids); product templates 4.0,
  * 4.8 and their individual-ensemble-member forms 4.1/4.11 (perturbation
  * number → the scan's `member` column); data representation templates 5.0 (simple packing, IEEE
  * float reference), 5.2 (complex packing, byte-aligned group
  * streams), 5.3 (complex packing + order-1/2 spatial differencing —
  * the packing operational NCEP archives like GFS carry), 5.40 (lossless
  * JPEG 2000 — the ECMWF/ERA5 archive packing, via the in-repo
  * [[Jpeg2000]] codec), 5.41 (PNG rasters — MRMS-style, via the in-repo
  * [[Png]] codec) and 5.42 (CCSDS/AEC Rice coding, [[Ccsds]]); section-6
  * bitmaps (present/previous/none); multi-FIELD messages (repeated
  * section 4-7 groups). Validated against NCEP's rtma_pcp.grib (the
  * reference's own test input).
  *
  * All multi-byte integers are big-endian; "signed" GRIB fields are
  * SIGN-MAGNITUDE (high bit = sign) in both editions, not two's
  * complement.
  */
object GribFormat {

  // ------------------------------------------------------------ primitives

  private[grib] def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)

  private[grib] def u24(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 16) | ((b(off + 1) & 0xFF) << 8) | (b(off + 2) & 0xFF)

  private[grib] def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)

  private[grib] def u64(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xFFL); i += 1 }
    v
  }

  /** GRIB sign-magnitude signed int from 2-4 bytes (4-byte width carries
    * edition-2 microdegree coordinates; magnitude is capped at 31 bits). */
  private[grib] def sm(b: Array[Byte], off: Int, len: Int): Int = {
    var v = b(off) & 0x7F
    var i = 1
    while (i < len) { v = (v << 8) | (b(off + i) & 0xFF); i += 1 }
    if ((b(off) & 0x80) != 0) -v else v
  }

  private[grib] def writeSm(out: DataOutputStream, v: Int, len: Int): Unit = {
    val mag = math.abs(v)
    val signBit = if (v < 0) 0x80 else 0x00
    len match {
      case 2 =>
        out.writeByte(signBit | ((mag >> 8) & 0x7F)); out.writeByte(mag & 0xFF)
      case 3 =>
        out.writeByte(signBit | ((mag >> 16) & 0x7F))
        out.writeByte((mag >> 8) & 0xFF); out.writeByte(mag & 0xFF)
      case 4 =>
        out.writeByte(signBit | ((mag >> 24) & 0x7F))
        out.writeByte((mag >> 16) & 0xFF)
        out.writeByte((mag >> 8) & 0xFF); out.writeByte(mag & 0xFF)
    }
  }

  /** IBM System/370 single-precision float: sign(1) exponent(7, base 16,
    * bias 64) fraction(24). The GRIB1 reference-value encoding. */
  private[grib] def ibmToDouble(bits: Int): Double = {
    if ((bits & 0x7FFFFFFF) == 0) return 0.0
    val sign = if ((bits & 0x80000000) != 0) -1.0 else 1.0
    val exp = (bits >>> 24) & 0x7F
    val frac = (bits & 0x00FFFFFF).toDouble / 0x1000000.toDouble
    sign * frac * math.pow(16.0, exp - 64)
  }

  private[grib] def doubleToIbm(v: Double): Int = {
    if (v == 0.0) return 0
    val sign = if (v < 0) 0x80000000 else 0
    var mag = math.abs(v)
    // normalize so fraction ∈ [1/16, 1): mag = frac * 16^(exp-64)
    var exp = 64
    while (mag >= 1.0) { mag /= 16.0; exp += 1 }
    while (mag < 1.0 / 16.0) { mag *= 16.0; exp -= 1 }
    require(exp >= 0 && exp <= 127, s"IBM float exponent out of range for $v")
    val frac = math.round(mag * 0x1000000.toDouble).toInt.min(0x00FFFFFF)
    sign | (exp << 24) | frac
  }

  // --------------------------------------------------------------- model

  /** Lambert-conformal grid (edition-2 template 3.30): first point +
    * orientation + standard parallels + metre spacing. Cell lat/lon come
    * from the shared scalar LCC inverse (ops/Projection.scala). */
  final case class LccGrid(
      la1: Double, lo1: Double, lov: Double, latin1: Double, latin2: Double,
      latD: Double, dxM: Double, dyM: Double, radius: Double) extends Serializable {
    @transient lazy val mapping: graft.ops.Projection.LambertConformalConic =
      graft.ops.Projection.LambertConformalConic(
        lat0 = latD, lon0 = lov, lat1 = latin1, lat2 = latin2, radius = radius)
    /** Projected (y, x) of the first grid point. lo1 and lov share the
      * GRIB 0..360 convention, so Δλ is consistent as-is. */
    @transient lazy val origin: (Double, Double) = mapping.forwardXY(la1, lo1)
  }

  /** Polar-stereographic grid (edition-2 template 3.20 — the NCEP
    * Alaska/sea-ice regional shape): first point + true-scale latitude +
    * orientation + metre spacing. Cell lat/lon come from the shared
    * scalar polar inverse (ops/Projection.scala). */
  final case class PsGrid(
      la1: Double, lo1: Double, latTs: Double, lov: Double,
      dxM: Double, dyM: Double, northPole: Boolean, radius: Double)
      extends Serializable {
    @transient lazy val mapping: graft.ops.Projection.PolarStereographic =
      graft.ops.Projection.PolarStereographic(
        northPole = northPole, lon0 = lov, latTs = latTs, radius = radius)
    /** Projected (y, x) of the first grid point (lo1/lov share the GRIB
      * 0..360 convention, so Δλ is consistent as-is). */
    @transient lazy val origin: (Double, Double) = mapping.forwardXY(la1, lo1)
  }

  /** Mercator grid (edition-2 template 3.10 — tropical regional
    * archives): first point + true-scale latitude (LaD) + metre spacing
    * on the projection plane. Longitudes are therefore evenly spaced in
    * degrees; latitudes follow the inverse Gudermannian. */
  final case class MercGrid(
      la1: Double, lo1: Double, latTs: Double,
      dxM: Double, dyM: Double, radius: Double) extends Serializable {
    @transient lazy val mapping: graft.ops.Projection.Mercator =
      graft.ops.Projection.Mercator(
        lon0 = lo1, latTs = latTs, radius = radius)
    /** Projected (y, x) of the first grid point (x = 0 by lon0 = lo1). */
    @transient lazy val origin: (Double, Double) = mapping.forwardXY(la1, lo1)
  }

  /** Writer geometry for grid template 3.10: first grid point,
    * true-scale latitude, metre spacing; `lats`/`lons` supply only the
    * grid dimensions, like [[PsWriterGrid]]. */
  final case class MercWriterGrid(la1: Double, lo1: Double, latTs: Double,
      dxM: Double, dyM: Double)

  /** Writer geometry for grid template 3.20 (north-pole aspect): first
    * grid point, true-scale latitude (LaD), orientation longitude (LoV),
    * metre spacing. The `lats`/`lons` axes passed alongside supply only
    * the grid DIMENSIONS (nj, ni) — cell coordinates come from the
    * projection. */
  final case class PsWriterGrid(la1: Double, lo1: Double, latTs: Double,
      lov: Double, dxM: Double, dyM: Double)

  /** Edition-2 template 5.2/5.3 (complex packing) group parameters.
    * `spatialOrder` > 0 marks template 5.3: the packed integers are
    * first/second spatial DIFFERENCES, reconstructed per g2clib
    * `comunpack` before unscaling; `spatialDescBytes` is the octet width
    * of the extra descriptors (initial value(s) + overall minimum) that
    * template 7.3 prepends to the data section. */
  final case class ComplexParams(
      ng: Int,
      widthRef: Int, widthBits: Int,
      lengthRef: Long, lengthInc: Int, lastLength: Long, lengthBits: Int,
      spatialOrder: Int = 0, spatialDescBytes: Int = 0)
      extends Serializable

  /** The writer's fixed 5.42 parameters — ecCodes' operational profile
    * (MSB bit order + unit-delay preprocessor), sized small (block 16,
    * RSI 8 blocks) so even test grids span several reference segments. */
  private val CcsdsWriterParams =
    Ccsds.Params(flags = Ccsds.FlagMsb | Ccsds.FlagPreprocess,
      blockSize = 16, rsi = 8)

  /** Spherical-harmonic coefficient field (edition-2 grid template 3.50 +
    * data representation template 5.50 "spectral data — simple packing"):
    * ERA5 model-level fields in the native MARS archive are spectral
    * (reference target: docs/etl_developers_manual.md:158-168). Only
    * TRIANGULAR truncation (J = K = M, what ECMWF emits) with
    * representation type 1 (associated Legendre) and mode 1 (the m-major
    * complex ordering: m = 0..M, n = m..M, each coefficient a (re, im)
    * pair) is accepted; anything else is refused by name. The real part
    * of the (0,0) coefficient travels UNPACKED as IEEE32 in the DRS
    * (template 5.50 octets 22-25); every other value is simple-packed.
    * Output is coefficient space — rows (m, n, part, value) through the
    * `grib-spectral` scan; synthesis onto a grid is a regrid step. */
  /** How the spectral coefficients travel (DRS template). */
  sealed trait SpectralPacking extends Serializable
  /** Template 5.50 — simple packing; the real (0,0) coefficient rides
    * unpacked as IEEE32 in the DRS. */
  final case class SpectralSimple(real00: Double) extends SpectralPacking
  /** Template 5.51 — complex packing, ECMWF's native archive form for
    * spectral fields: the sub-truncation-`subTrunc` subset (triangular:
    * m ≤ Ts, n ≤ Ts — the large low-wavenumber terms) travels UNPACKED as
    * IEEE floats of `precBytes` at the head of section 7; every remaining
    * coefficient is premultiplied by the Laplacian operator power
    * (n(n+1))^p before simple packing, so decode divides it back out
    * (WMO template 5.51 notes; p is stored signed in 10⁻⁶ units). */
  final case class SpectralComplex(laplacianP: Double, subTrunc: Int,
      precBytes: Int) extends SpectralPacking

  final case class SpectralGrid(trunc: Int,
      packing: SpectralPacking) extends Serializable {
    /** Complex coefficient pairs under triangular truncation. */
    def nPairs: Int = (trunc + 1) * (trunc + 2) / 2
    /** Stored VALUES (re + im per pair) — the message's nValues. */
    def nCoeffValues: Int = 2 * nPairs
    /** Pair index → (m, n) under the m-major mode-1 ordering. */
    @transient lazy val pairMN: Array[(Int, Int)] = {
      val out = new Array[(Int, Int)](nPairs)
      var p = 0
      var m = 0
      while (m <= trunc) {
        var n = m
        while (n <= trunc) { out(p) = (m, n); p += 1; n += 1 }
        m += 1
      }
      out
    }

    /** Is pair p in template 5.51's unpacked sub-truncation subset? */
    def inSubset(p: Int, subTrunc: Int): Boolean = {
      val (m, n) = pairMN(p)
      m <= subTrunc && n <= subTrunc
    }

    /** 5.51 bookkeeping: for value index k, its position within the
      * unpacked subset stream (≥ 0) or within the packed stream (encoded
      * as -(idx+1)). Subset and packed values each keep m-major order. */
    @transient lazy val complexPos: Array[Int] = {
      val sub = packing match {
        case SpectralComplex(_, t, _) => t
        case _ => -1
      }
      val out = new Array[Int](nCoeffValues)
      var subIdx = 0
      var packIdx = 0
      var p = 0
      while (p < nPairs) {
        val in = sub >= 0 && inSubset(p, sub)
        var c = 0
        while (c < 2) {
          out(2 * p + c) =
            if (in) { val v = subIdx; subIdx += 1; v }
            else { val v = -(packIdx + 1); packIdx += 1; v }
          c += 1
        }
        p += 1
      }
      out
    }

    /** 5.51: number of VALUES in the unpacked subset (Ts). */
    def subsetValues: Int = packing match {
      case SpectralComplex(_, t, _) =>
        val s = math.min(t, trunc)
        (s + 1) * (s + 2) // pairs (m ≤ s, n ≤ s, n ≥ m) = (s+1)(s+2)/2, ×2
      case _ => 0
    }

    /** 5.51: Laplacian multiplier (n(n+1))^p for the pair holding value
      * index k. */
    def laplacian(k: Int): Double = packing match {
      case SpectralComplex(p, _, _) =>
        val n = pairMN(k / 2)._2
        math.pow(n.toDouble * (n + 1).toDouble, p)
      case _ => 1.0
    }
  }

  /** Rotated lat/lon grid (edition-2 template 3.1 — COSMO/ICON/HARMONIE
    * regional grids): the stored coordinates are ROTATED lat/lon; the
    * southern pole of projection (GRIB convention) maps to CF's rotated
    * NORTH pole as (−spLat, spLon − 180°). */
  final case class RotGrid(spLat: Double, spLon: Double, angle: Double)
      extends Serializable {
    @transient lazy val mapping: graft.ops.Projection.RotatedPole =
      graft.ops.Projection.RotatedPole(
        poleLat = -spLat,
        poleLon = if (spLon - 180.0 <= -180.0) spLon + 180.0 else spLon - 180.0,
        angle = angle)
  }

  /** Latitudes (degrees, north→south) of the 2N parallels of a regular
    * Gaussian grid (GRIB2 template 3.40 — the ECMWF/ERA5 native family):
    * arcsines of the roots of the Legendre polynomial P₂ₙ, Newton-iterated
    * from the Chebyshev initial guess. Pure JDK math; the roots converge
    * quadratically (≤ ~6 iterations at double precision). */
  def gaussianLatitudes(n: Int): Array[Double] =
    gaussCache.computeIfAbsent(n, computeGaussianLatitudes(_)).clone()

  // per-JVM memo: every partition reader of an N-parallel archive reuses
  // the same 2N roots instead of redoing the O(N²) Newton recurrences
  private val gaussCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Double]]()

  private def computeGaussianLatitudes(n: Int): Array[Double] = {
    require(n >= 1 && n <= 4096, s"Gaussian N $n outside 1..4096")
    val m = 2 * n
    val lats = new Array[Double](m)
    var i = 0
    while (i < n) { // northern half; southern mirrors
      var x = math.cos(math.Pi * (4 * i + 3) / (4.0 * m + 2))
      var it = 0
      var done = false
      while (!done && it < 100) {
        // P_m(x) and P_{m-1}(x) by upward recurrence
        var p0 = 1.0; var p1 = x
        var k = 2
        while (k <= m) {
          val p2 = ((2 * k - 1) * x * p1 - (k - 1) * p0) / k
          p0 = p1; p1 = p2
          k += 1
        }
        val dp = m * (x * p1 - p0) / (x * x - 1.0)
        val dx = p1 / dp
        x -= dx
        done = math.abs(dx) < 1e-15
        it += 1
      }
      lats(i) = math.toDegrees(math.asin(x))
      lats(m - 1 - i) = -lats(i)
      i += 1
    }
    lats
  }

  /** One parsed message's planning state: grid + packing + the absolute
    * byte offset of the packed data (reading is a positioned slab read). */
  final case class GribMessage(
      paramId: Int,
      /** VALID time: forecast reference time + lead. */
      validTime: java.time.LocalDateTime,
      ni: Int, nj: Int,
      la1: Double, lo1: Double, la2: Double, lo2: Double,
      decimalScale: Int,
      binaryScale: Int,
      refValue: Double,
      bitsPerValue: Int,
      dataOffset: Long,
      dataBytes: Int,
      totalLength: Int,
      bitmapOffset: Long = -1L,
      bitmapBytes: Int = 0,
      complex: Option[ComplexParams] = None,
      lcc: Option[LccGrid] = None,
      /** Grid template 3.20 (polar stereographic): cells inverse-project
        * at (x0 + i·dx, y0 + j·dy), like the Lambert grid. */
      ps: Option[PsGrid] = None,
      /** Grid template 3.10 (Mercator): same projected-cell walk. */
      merc: Option[MercGrid] = None,
      /** Ensemble perturbation number (product templates 4.1/4.11);
        * -1 = deterministic product. */
      member: Int = -1,
      /** Data representation template 5.41: the data section is a PNG
        * image of the scaled offsets (MRMS-style packing). */
      png: Boolean = false,
      /** Data representation template 5.42: CCSDS/AEC (Rice) coded
        * offsets — the modern ECMWF operational packing. */
      ccsds: Option[Ccsds.Params] = None,
      /** Grid template 3.1: stored coords are rotated; cells inverse-rotate
        * to true lat/lon at read. */
      rot: Option[RotGrid] = None,
      /** Grid template 3.40 (regular Gaussian): N parallels between pole
        * and equator; row latitudes are the Gaussian parallels inside
        * [la1, la2], not evenly spaced. */
      gaussN: Option[Int] = None,
      /** Quasi-regular (reduced) grid: points per row from section 3's
        * optional list (ERA5's native reduced Gaussian shape — rows near
        * the poles carry fewer points). Row r spans the full circle from
        * lo1 with spacing 360/rowLengths(r). */
      rowLengths: Option[Array[Int]] = None,
      /** Data representation template 5.40: the data section is a JPEG 2000
        * codestream of the scaled offsets (the ECMWF/ERA5 archive
        * packing), decoded by the in-repo [[Jpeg2000]] codec. */
      jpeg: Boolean = false,
      /** Grid template 3.50 + DRS 5.50: spherical-harmonic coefficients
        * (see [[SpectralGrid]]); such messages scan through the
        * `grib-spectral` source, never through lat/lon rows. */
      spectral: Option[SpectralGrid] = None,
      /** Vertical axis: GRIB2 PDT octet 23 (type of first fixed surface,
        * code table 4.5 — 100 isobaric Pa, 103 height m, 1 ground) /
        * GRIB1 PDS octet 10 level indicator; 255 = missing. The reference
        * separates these hypercubes via `scan_grib(filter)[scan_indices]`
        * ("multiple depth / surface layers", transform.py:234-240). */
      levelType: Int = 255,
      /** First-fixed-surface value (GRIB2: scaledValue / 10^scaleFactor;
        * GRIB1: PDS octets 11-12). NaN when the surface carries no value. */
      level: Double = Double.NaN,
      /** SECOND fixed-surface value (GRIB2 PDT octets 29-34; GRIB1 layer
        * level types carry (top, bottom) as two one-octet values) — the
        * LAYER products (soil layers, cloud layers). NaN = no second
        * surface (a point level). Both surfaces share `levelType`. */
      levelTo: Double = Double.NaN,
      /** Forecast reference time (section 1 / PDS date): validTime − lead.
        * Forecast archives key on (baseTime, step) — two reference times
        * with overlapping valid times must stay distinct (the reference's
        * forecast/ensemble dim sets, transform.py:724-759). */
      baseTime: java.time.LocalDateTime = null,
      /** Forecast lead in minutes (0 = analysis). For INTERVAL products
        * this is the endStep (valid − ref, ecCodes convention). */
      stepMinutes: Long = 0L,
      /** Interval products only: minutes from the reference time to the
        * START of the overall interval (ecCodes startStep). Long.MinValue
        * = point-in-time product. Keys apart two accumulation windows
        * ending at the same valid time — the GFS/NAM precip-bucket file
        * shape ([0,12] h and [6,12] h buckets in one file). */
      stepStartMinutes: Long = Long.MinValue,
      /** Derived-ensemble statistic (product templates 4.2/4.12, code
        * table 4.7: 0 = mean, 2 = std dev — the GEFS geavg/gespr archive
        * shape); -1 = not a derived product. Derived products carry no
        * perturbation number: `member` stays -1. */
      derived: Int = -1,
      /** Probability products (templates 4.5/4.9 — the NBM/probabilistic
        * forecast shape): code-table-4.9 probability type (0 below lower,
        * 1 above upper, 2 between, 3 above lower, 4 below upper);
        * -1 = not a probability product. */
      probType: Int = -1,
      /** Probability LOWER limit (scaledValue / 10^scaleFactor, physical
        * units); NaN when absent (e.g. type 1 carries only the upper). */
      probLo: Double = Double.NaN,
      /** Probability UPPER limit; NaN when absent. */
      probHi: Double = Double.NaN,
      /** Percentile products (templates 4.6/4.10): the percentile value
        * 0-100; -1 = not a percentile product. */
      percentile: Int = -1) {
    // lazy, not def: latLonAt runs per cell (twice per row for lat+lon
    // columns) on rotated/Gaussian grids — rebuilding the axis arrays per
    // call would dominate a large scan
    @transient lazy val lats: Array[Double] = gaussN match {
      case Some(n) =>
        val all = GribFormat.gaussianLatitudes(n) // north→south
        // tolerance covers the file's coordinate quantisation: GRIB1
        // stores millidegrees (±5e-4), edition 2 microdegrees — and the
        // narrowest parallel spacing (N=4096) is ~0.022°, so no neighbor
        // can fall inside the widened band
        val lo = math.min(la1, la2) - 6e-4
        val hi = math.max(la1, la2) + 6e-4
        val inRange = all.filter(l => l >= lo && l <= hi)
        require(inRange.length == nj,
          s"Gaussian grid: ${inRange.length} parallels of N=$n fall in " +
            s"[$la1, $la2], header says nj=$nj")
        if (la1 >= la2) inRange else inRange.reverse
      case None =>
        Array.tabulate(nj)(j =>
          la1 + (if (nj == 1) 0.0 else (la2 - la1) * j / (nj - 1)))
    }
    @transient lazy val lons: Array[Double] =
      Array.tabulate(ni)(i => lo1 + (if (ni == 1) 0.0 else (lo2 - lo1) * i / (ni - 1)))
    def nValues: Int =
      spectral.map(_.nCoeffValues)
        .orElse(rowLengths.map(_.sum)).getOrElse(ni * nj)
    def hasBitmap: Boolean = bitmapOffset >= 0

    /** Reduced rows: exclusive prefix sums for O(log nj) cell→row lookup. */
    @transient private lazy val rowPrefix: Array[Int] =
      rowLengths.map(_.scanLeft(0)(_ + _)).orNull

    /** GRIB longitude convention 0 ≤ λ < 360: a projection inverse
      * returns lon0 ± 180, which for lon0 near 0 goes negative and for
      * lon0 > 180 exceeds 360 — wrap BOTH sides. */
    private def wrapLon(lon: Double): Double = {
      val w = lon % 360.0
      if (w < 0) w + 360.0 else w
    }

    /** The projected-grid cell walk shared by the LCC / polar / Mercator
      * templates: invert the projection at (x0 + i·dx, y0 + j·dy).
      * Takes the mapping itself (virtual dispatch) — latLonAt runs per
      * CELL, so a Function2 here would allocate a closure per call. */
    private def projectedAt(k: Int, origin: (Double, Double), dyM: Double,
        dxM: Double,
        mapping: graft.ops.Projection.GridMapping): (Double, Double) = {
      val (y0, x0) = origin
      val (lat, lon) =
        mapping.inverseXY(y0 + (k / ni) * dyM, x0 + (k % ni) * dxM)
      (lat, wrapLon(lon))
    }

    /** Cell k's latitude/longitude. Regular grids read the axis arrays;
      * LCC/polar/Mercator grids invert the projection at
      * (x0 + i·dx, y0 + j·dy). */
    def latLonAt(k: Int): (Double, Double) = ps match {
      case Some(g) => projectedAt(k, g.origin, g.dyM, g.dxM, g.mapping)
      case None => merc match {
        case Some(g) => projectedAt(k, g.origin, g.dyM, g.dxM, g.mapping)
        case None => latLonAtUnprojected(k)
      }
    }

    private def latLonAtUnprojected(k: Int): (Double, Double) = lcc match {
      case None if rowLengths.isDefined =>
        // reduced grid: binary-search the row, then the row's own spacing
        val pre = rowPrefix
        var lo = 0
        var hi = pre.length - 1 // invariant: pre(lo) <= k < pre(hi)
        while (hi - lo > 1) {
          val mid = (lo + hi) >>> 1
          if (pre(mid) <= k) lo = mid else hi = mid
        }
        val inRow = k - pre(lo)
        (lats(lo), lo1 + inRow * 360.0 / rowLengths.get(lo))
      case None => rot match {
        case None => (lats(k / ni), lons(k % ni))
        case Some(rg) =>
          val (lat, lon) = rg.mapping.inverseXY(lats(k / ni), lons(k % ni))
          (lat, wrapLon(lon))
      }
      case Some(g) => projectedAt(k, g.origin, g.dyM, g.dxM, g.mapping)
    }

    private def unscale(x: Double): Double =
      (refValue + x * math.pow(2.0, binaryScale)) / math.pow(10.0, decimalScale)

    /** MSB-first bit extraction. */
    private def extract(slab: Array[Byte], startBit: Long, nbits: Int): Long = {
      if (nbits == 0) return 0L
      var acc = 0L
      var bit = startBit
      var got = 0
      while (got < nbits) {
        val byteIdx = (bit / 8).toInt
        val bitInByte = (bit % 8).toInt
        val take = math.min(8 - bitInByte, nbits - got)
        val chunk = ((slab(byteIdx) & 0xFF) >>> (8 - bitInByte - take)) &
          ((1 << take) - 1)
        acc = (acc << take) | chunk
        got += take
        bit += take
      }
      acc
    }

    /** Build a cell decoder over the data (and bitmap) slabs. Returns NaN
      * for bitmap-masked cells — the scan surfaces them as null. */
    def decoder(slab: Array[Byte], bitmapSlab: Array[Byte]): Int => Double = {
      spectral.foreach { sp =>
        require(!hasBitmap, "spectral fields carry no bitmap")
        sp.packing match {
          case SpectralSimple(real00) =>
            // template 7.50: every value simple-packed EXCEPT value 0 —
            // the real (0,0) coefficient, which rides unpacked in the DRS
            return (k: Int) =>
              if (k == 0) real00
              else unscale(extract(slab, (k - 1).toLong * bitsPerValue,
                bitsPerValue).toDouble)
          case SpectralComplex(_, _, precBytes) =>
            // template 7.51: the sub-truncation subset as IEEE floats at
            // the head, then the simple-packed remainder — each packed
            // value divided back by its Laplacian premultiplier
            val subsetVals = sp.subsetValues
            val packedBitBase = subsetVals.toLong * precBytes * 8
            return (k: Int) => {
              val pos = sp.complexPos(k)
              if (pos >= 0) {
                val off = pos * precBytes
                if (precBytes == 4)
                  java.lang.Float.intBitsToFloat(u32(slab, off).toInt).toDouble
                else java.lang.Double.longBitsToDouble(u64(slab, off))
              } else {
                val idx = -pos - 1
                unscale(extract(slab,
                  packedBitBase + idx.toLong * bitsPerValue,
                  bitsPerValue).toDouble) / sp.laplacian(k)
              }
            }
        }
      }
      // bitmap rank: prefix popcounts per 64-bit word → rank(k) in O(1)
      val (present, rank): (Int => Boolean, Int => Int) =
        if (!hasBitmap) ((_: Int) => true, (k: Int) => k)
        else {
          val words = (nValues + 63) / 64
          val bm = new Array[Long](words)
          var k = 0
          while (k < nValues) {
            if (((bitmapSlab(k / 8) >> (7 - k % 8)) & 1) != 0)
              bm(k / 64) |= 1L << (k % 64)
            k += 1
          }
          val prefix = new Array[Int](words + 1)
          var w = 0
          while (w < words) {
            prefix(w + 1) = prefix(w) + java.lang.Long.bitCount(bm(w))
            w += 1
          }
          ((k: Int) => ((bm(k / 64) >> (k % 64)) & 1L) != 0,
            (k: Int) => prefix(k / 64) +
              java.lang.Long.bitCount(bm(k / 64) & ((1L << (k % 64)) - 1)))
        }
      if (ccsds.isDefined) {
        // template 7.42: the section body is the AEC bitstream of the
        // scaled offsets (present cells only under a bitmap)
        val nPresent = if (hasBitmap) rank(nValues - 1) +
          (if (present(nValues - 1)) 1 else 0) else nValues
        val vals = new Array[Double](nPresent)
        if (bitsPerValue == 0) {
          java.util.Arrays.fill(vals, unscale(0.0))
        } else {
          val raw = Ccsds.decode(slab, nPresent, bitsPerValue, ccsds.get)
          var j = 0
          while (j < nPresent) { vals(j) = unscale(raw(j).toDouble); j += 1 }
        }
        return (k: Int) => if (!present(k)) Double.NaN else vals(rank(k))
      }
      if (jpeg) {
        // template 7.40: the section body IS a JPEG 2000 codestream of the
        // scaled offsets — (ni, nj) without a bitmap, (nPresent, 1) with one
        val nPresent = if (hasBitmap) rank(nValues - 1) +
          (if (present(nValues - 1)) 1 else 0) else nValues
        val vals = new Array[Double](nPresent)
        if (bitsPerValue == 0) {
          java.util.Arrays.fill(vals, unscale(0.0))
        } else {
          // the expectation bounds the SIZ header BEFORE decode allocates
          val (w, h, samples) = Jpeg2000.decode(slab, expectedCells = nPresent)
          require(w.toLong * h == nPresent,
            s"JPEG 2000 raster $w x $h carries ${w.toLong * h} values, " +
              s"field has $nPresent present")
          var j = 0
          while (j < nPresent) { vals(j) = unscale(samples(j).toDouble); j += 1 }
        }
        return (k: Int) => if (!present(k)) Double.NaN else vals(rank(k))
      }
      if (png) {
        // template 7.41: the section body IS a PNG raster of the scaled
        // offsets — (ni, nj) without a bitmap, (nPresent, 1) with one
        val nPresent = if (hasBitmap) rank(nValues - 1) +
          (if (present(nValues - 1)) 1 else 0) else nValues
        val (w, h, samples) = Png.decode(slab)
        require(w * h == nPresent,
          s"PNG raster $w x $h carries ${w * h} values, field has $nPresent present")
        val vals = new Array[Double](nPresent)
        var j = 0
        while (j < nPresent) { vals(j) = unscale(samples(j).toDouble); j += 1 }
        return (k: Int) => if (!present(k)) Double.NaN else vals(rank(k))
      }
      complex match {
        case None =>
          (k: Int) =>
            if (!present(k)) Double.NaN
            else if (bitsPerValue == 0) unscale(0.0)
            else unscale(extract(slab, rank(k).toLong * bitsPerValue,
              bitsPerValue).toDouble)
        case Some(cp) =>
          // template 7.2/7.3: byte-aligned streams of group refs, widths,
          // lengths, then the per-group packed values (layout verified
          // against NCEP g2clib output, rtma_pcp.grib). 7.3 prepends the
          // spatial-differencing extra descriptors.
          val nPresent = if (hasBitmap) rank(nValues - 1) +
            (if (present(nValues - 1)) 1 else 0) else nValues
          val raw = new Array[Long](nPresent)
          var bit = 0L
          // 7.3 extra descriptors: order initial value(s) + overall minimum,
          // signed-magnitude in spatialDescBytes octets each (WMO 7.3 note 2)
          var ival1 = 0L; var ival2 = 0L; var minsd = 0L
          if (cp.spatialOrder > 0) {
            val db = cp.spatialDescBytes * 8
            def signedMag(v: Long): Long =
              if ((v & (1L << (db - 1))) != 0) -(v & ((1L << (db - 1)) - 1)) else v
            ival1 = signedMag(extract(slab, bit, db)); bit += db
            if (cp.spatialOrder == 2) { ival2 = signedMag(extract(slab, bit, db)); bit += db }
            minsd = signedMag(extract(slab, bit, db)); bit += db
          }
          val refs = new Array[Long](cp.ng)
          var g = 0
          while (g < cp.ng) { refs(g) = extract(slab, bit, bitsPerValue); bit += bitsPerValue; g += 1 }
          bit = (bit + 7) / 8 * 8
          val widths = new Array[Int](cp.ng)
          g = 0
          while (g < cp.ng) {
            widths(g) = cp.widthRef + extract(slab, bit, cp.widthBits).toInt
            bit += cp.widthBits; g += 1
          }
          bit = (bit + 7) / 8 * 8
          val lengths = new Array[Int](cp.ng)
          g = 0
          while (g < cp.ng) {
            lengths(g) = (cp.lengthRef + extract(slab, bit, cp.lengthBits) *
              cp.lengthInc).toInt
            bit += cp.lengthBits; g += 1
          }
          if (cp.ng > 0) lengths(cp.ng - 1) = cp.lastLength.toInt
          bit = (bit + 7) / 8 * 8
          var out = 0
          g = 0
          while (g < cp.ng) {
            var i = 0
            while (i < lengths(g)) {
              raw(out) = refs(g) + extract(slab, bit, widths(g))
              bit += widths(g)
              out += 1
              i += 1
            }
            g += 1
          }
          require(out == nPresent,
            s"complex packing decoded $out of $nPresent present values")
          // spatial-difference reconstruction (g2clib comunpack.c): the
          // first `order` entries are REPLACED by the initial values, the
          // rest shift by the overall minimum and integrate
          if (cp.spatialOrder == 1 && nPresent > 0) {
            raw(0) = ival1
            var n = 1
            while (n < nPresent) { raw(n) += minsd + raw(n - 1); n += 1 }
          } else if (cp.spatialOrder == 2 && nPresent > 1) {
            raw(0) = ival1; raw(1) = ival2
            var n = 2
            while (n < nPresent) {
              raw(n) += minsd + 2 * raw(n - 1) - raw(n - 2); n += 1
            }
          }
          val vals = new Array[Double](nPresent)
          var j = 0
          while (j < nPresent) { vals(j) = unscale(raw(j).toDouble); j += 1 }
          (k: Int) => if (!present(k)) Double.NaN else vals(rank(k))
      }
    }

    /** Decode cell k (row-major: lat rows, lon fastest) from the packed
      * slab bytes — simple packing without bitmap (the original fast
      * path; the DSv2 reader uses [[decoder]] for the general case). */
    def decode(slab: Array[Byte], k: Int): Double = {
      if (bitsPerValue == 0) return unscale(0.0)
      unscale(extract(slab, k.toLong * bitsPerValue, bitsPerValue).toDouble)
    }
  }

  // -------------------------------------------------------------- writing

  /** Scale values by 10^decimalScale and derive the packing width —
    * shared by both editions' writers so the simple-packing encoder can
    * never diverge between them. NaN cells become bitmap holes: returns
    * (present scaled values, min, bitsPerValue, bitmap bytes or None). */
  /** Write one GRIB2 SPECTRAL message: grid template 3.50 (spherical
    * harmonics, triangular truncation M) + product 4.0 + DRS 5.50 (simple
    * spectral packing) + data 7.50. Each field's `coeffs` array holds the
    * (M+1)(M+2) coefficient VALUES in m-major mode-1 order (m = 0..M,
    * n = m..M, re then im per pair); coeffs(0) — the real (0,0)
    * coefficient — travels unpacked as IEEE32 in the DRS, everything else
    * simple-packed with the given decimal scale. */
  def writeSpectralMessage2(
      out: DataOutputStream,
      refTime: java.time.LocalDateTime,
      trunc: Int,
      fields: Seq[(Int, Int, Array[Double])], // (paramId, leadHours, coeffs)
      decimalScale: Int = 0,
      /** Template 5.51 (complex spectral packing) instead of 5.50: the
        * Laplacian power p and the triangular sub-truncation whose
        * coefficients travel unpacked as IEEE32. */
      complexSub: Option[(Double, Int)] = None,
      /** First fixed surfaces aligned with `fields` (type, value at scale
        * factor 0); empty = ground surface (1, 0). ERA5 model-level
        * spectral fields repeat (time, param) once per level. */
      levels: Seq[(Int, Long)] = Seq.empty): Unit = {
    require(trunc >= 0, s"negative truncation $trunc")
    require(fields.nonEmpty, "a GRIB2 message needs at least one field")
    require(levels.isEmpty || levels.length == fields.length,
      s"${levels.length} levels for ${fields.length} fields")
    complexSub.foreach { case (p, sub) =>
      require(sub >= 0 && sub <= trunc, s"sub-truncation $sub outside 0..$trunc")
      require(math.abs(math.round(p * 1e6)) <= Int.MaxValue, s"Laplacian p $p")
    }
    val nVals = (trunc + 1) * (trunc + 2)
    // m-major pair walk shared with the reader
    val grid = SpectralGrid(trunc,
      complexSub.map { case (p, sub) => SpectralComplex(p, sub, 4) }
        .getOrElse(SpectralSimple(0.0)))
    final case class Plan(paramId: Int, leadHours: Int, real00: Float,
        subset: Array[Float], scaled: Array[Long], minV: Long, bits: Int)
    val plans = fields.map { case (paramId, leadHours, coeffs) =>
      require(coeffs.length == nVals,
        s"${coeffs.length} coefficient values for triangular M=$trunc ($nVals)")
      require(!coeffs.exists(_.isNaN), "spectral coefficients cannot be missing")
      complexSub match {
        case None =>
          val real00 = coeffs(0).toFloat
          require(real00.toDouble == coeffs(0),
            s"real (0,0) coefficient ${coeffs(0)} not exact in float32")
          val (scaled, minV, bits, bitmap) = packPlan(coeffs.drop(1), decimalScale)
          require(bitmap.isEmpty, "spectral fields carry no bitmap")
          require(bits <= 24, s"coefficient range needs $bits bits (>24); " +
            "raise decimalScale")
          require(minV.toFloat.toLong == minV, s"reference $minV not exact in float32")
          Plan(paramId, leadHours, real00, Array.empty, scaled, minV, bits)
        case Some((lapP, sub)) =>
          val subset = (0 until nVals).filter(k => grid.complexPos(k) >= 0)
            .map(k => coeffs(k).toFloat).toArray
          // Laplacian-premultiplied remainder, simple-packed
          val packed = (0 until nVals).filter(k => grid.complexPos(k) < 0)
            .map(k => coeffs(k) * grid.laplacian(k)).toArray
          val (scaled, minV, bits, bitmap) =
            if (packed.isEmpty) (Array.emptyLongArray, 0L, 0, None)
            else packPlan(packed, decimalScale)
          require(bitmap.isEmpty, "spectral fields carry no bitmap")
          require(bits <= 24, s"Laplacian-scaled range needs $bits bits (>24)")
          require(minV.toFloat.toLong == minV, s"reference $minV not exact in float32")
          Plan(paramId, leadHours, 0f, subset, scaled, minV, bits)
      }
    }
    val sec3Len = 28
    val sec5Len = if (complexSub.isDefined) 36 else 25
    val total = 16L + 21 + sec3Len +
      plans.map(p => 34L + sec5Len + 6 +
        (5 + p.subset.length.toLong * 4 +
          (p.scaled.length.toLong * p.bits + 7) / 8)).sum + 4
    // Section 0 — indicator
    out.writeBytes("GRIB")
    out.writeByte(0); out.writeByte(0)
    out.writeByte(0) // discipline: meteorological
    out.writeByte(2) // edition
    out.writeLong(total)
    // Section 1 — identification (same profile as writeMessage2Fields)
    out.writeInt(21); out.writeByte(1)
    out.writeShort(255); out.writeShort(0)
    out.writeByte(2); out.writeByte(0)
    out.writeByte(1)
    out.writeShort(refTime.getYear)
    out.writeByte(refTime.getMonthValue); out.writeByte(refTime.getDayOfMonth)
    out.writeByte(refTime.getHour); out.writeByte(refTime.getMinute)
    out.writeByte(refTime.getSecond)
    out.writeByte(0); out.writeByte(1)
    // Section 3 — template 3.50
    out.writeInt(sec3Len); out.writeByte(3)
    out.writeByte(0) // source: templates
    out.writeInt(nVals) // data points = coefficient values
    out.writeByte(0); out.writeByte(0) // no optional list
    out.writeShort(50)
    out.writeInt(trunc); out.writeInt(trunc); out.writeInt(trunc) // J, K, M
    out.writeByte(1) // representation type: associated Legendre
    out.writeByte(1) // representation mode: m-major complex ordering
    plans.zipWithIndex.foreach { case (p, fi) =>
      // Section 4 — product template 4.0
      out.writeInt(34); out.writeByte(4)
      out.writeShort(0); out.writeShort(0)
      out.writeByte((p.paramId >> 8) & 0xFF)
      out.writeByte(p.paramId & 0xFF)
      out.writeByte(2); out.writeByte(0); out.writeByte(0)
      out.writeShort(0); out.writeByte(0)
      out.writeByte(1) // time unit: hours
      out.writeInt(p.leadHours)
      // surface 1: (type, scale factor 0, scaled value); ground by default
      val (surfType, surfVal) = if (levels.isEmpty) (1, 0L) else levels(fi)
      out.writeByte(surfType); out.writeByte(0); out.writeInt(surfVal.toInt)
      out.writeByte(255); out.writeByte(255); out.writeInt(-1)
      // Section 5 — template 5.50 (5.0's 21-octet prefix + real00 IEEE32)
      // or 5.51 (prefix + Laplacian p, Js/Ks/Ms, Ts, precision)
      out.writeInt(sec5Len); out.writeByte(5)
      out.writeInt(nVals)
      out.writeShort(if (complexSub.isDefined) 51 else 50)
      out.writeInt(java.lang.Float.floatToIntBits(p.minV.toFloat))
      writeSm(out, 0, 2) // binary scale E = 0
      writeSm(out, decimalScale, 2)
      out.writeByte(p.bits)
      out.writeByte(0) // field type: floating point
      complexSub match {
        case None =>
          out.writeInt(java.lang.Float.floatToIntBits(p.real00))
        case Some((lapP, sub)) =>
          writeSm(out, math.round(lapP * 1e6).toInt, 4)
          out.writeShort(sub); out.writeShort(sub); out.writeShort(sub)
          out.writeInt((sub + 1) * (sub + 2)) // Ts (values)
          out.writeByte(1) // precision: IEEE 32-bit
      }
      // Section 6 — no bitmap
      out.writeInt(6); out.writeByte(6); out.writeByte(255)
      // Section 7 — 5.50: packed values (all but the real (0,0)
      // coefficient); 5.51: IEEE32 subset then the packed remainder
      out.writeInt(5 + p.subset.length * 4 +
        ((p.scaled.length.toLong * p.bits + 7) / 8).toInt)
      out.writeByte(7)
      p.subset.foreach(f => out.writeInt(java.lang.Float.floatToIntBits(f)))
      writePacked(out, p.scaled, p.minV, p.bits)
    }
    out.writeBytes("7777")
  }

  private def packPlan(values: Array[Double],
      decimalScale: Int): (Array[Long], Long, Int, Option[Array[Byte]]) = {
    val hasNaN = values.exists(_.isNaN)
    val present = if (hasNaN) values.filterNot(_.isNaN) else values
    require(present.nonEmpty, "all-missing GRIB field unsupported")
    val d = math.pow(10.0, decimalScale)
    val scaled = present.map(v => math.round(v * d))
    val minV = scaled.min
    val range = scaled.max - minV
    val bits = if (range == 0) 0
      else math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(range))
    // callers that SIMPLE-pack enforce bits <= 24; complex/spatial-diff
    // paths pack group widths instead, so a wide range is fine there
    val bitmap = if (!hasNaN) None else Some {
      val bm = new Array[Byte]((values.length + 7) / 8)
      var k = 0
      while (k < values.length) {
        if (!values(k).isNaN) bm(k / 8) = (bm(k / 8) | (1 << (7 - k % 8))).toByte
        k += 1
      }
      bm
    }
    (scaled, minV, bits, bitmap)
  }

  /** MSB-first bit stream with byte alignment — the template 7.2 stream
    * encoder. */
  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var acc = 0L
    private var nAcc = 0
    def put(v: Long, bits: Int): Unit = {
      if (bits == 0) return
      acc = (acc << bits) | (v & ((1L << bits) - 1))
      nAcc += bits
      while (nAcc >= 8) {
        buf += ((acc >> (nAcc - 8)) & 0xFF).toByte
        nAcc -= 8
      }
    }
    def align(): Unit = if (nAcc > 0) {
      buf += ((acc << (8 - nAcc)) & 0xFF).toByte
      nAcc = 0
    }
    def bytes: Array[Byte] = { align(); buf.toArray }
  }

  private def bitsFor(x: Long): Int =
    if (x <= 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(x)

  /** Template 5.2/7.2 encoding of the present values: fixed 32-cell groups,
    * per-group reference + width, byte-aligned ref/width/length streams.
    * Returns (section-5 template body from octet 20 on, section-7 bytes,
    * bitsForRefs). */
  private def complexPack(scaled: Array[Long], minV: Long):
      (ComplexParams, Array[Byte], Int) = {
    val G = 32
    val nGroups = (scaled.length + G - 1) / G
    val refs = new Array[Long](nGroups)
    val widths = new Array[Int](nGroups)
    val lengths = new Array[Int](nGroups)
    var g = 0
    while (g < nGroups) {
      val lo = g * G
      val hi = math.min(lo + G, scaled.length)
      var mn = Long.MaxValue; var mx = Long.MinValue
      var i = lo
      while (i < hi) {
        if (scaled(i) < mn) mn = scaled(i)
        if (scaled(i) > mx) mx = scaled(i)
        i += 1
      }
      refs(g) = mn - minV
      widths(g) = bitsFor(mx - mn)
      lengths(g) = hi - lo
      g += 1
    }
    val refBits = bitsFor(refs.max)
    val widthRef = widths.min
    val widthBits = bitsFor((widths.max - widthRef).toLong)
    val lengthRef = lengths.min.toLong
    val lengthBits = bitsFor((lengths.max - lengthRef).toLong)
    val cp = ComplexParams(nGroups, widthRef, widthBits,
      lengthRef, 1, lengths.last.toLong, lengthBits)
    val w = new BitWriter
    refs.foreach(r => w.put(r, refBits)); w.align()
    widths.foreach(x => w.put((x - widthRef).toLong, widthBits)); w.align()
    lengths.foreach(l => w.put(l - lengthRef, lengthBits)); w.align()
    g = 0
    while (g < nGroups) {
      val lo = g * G
      val hi = math.min(lo + G, scaled.length)
      var i = lo
      while (i < hi) {
        w.put(scaled(i) - minV - refs(g), widths(g))
        i += 1
      }
      g += 1
    }
    (cp, w.bytes, refBits)
  }

  /** Template 5.3/7.3 pre-pass (the encode mirror of the decoder's
    * g2clib-style reconstruction): order-1/2 differences of the scaled
    * values, shifted nonnegative by the overall minimum. Positions
    * 0..order-1 pack as 0 — the decoder replaces them with the initial
    * values carried in the extra descriptors. Returns the array to
    * group-pack plus (ival1, ival2, minsd). */
  private def spatialDiffPlan(scaled: Array[Long], order: Int):
      (Array[Long], Long, Long, Long) = {
    val n = scaled.length
    require(n > order, s"order-$order spatial differencing needs > $order values")
    val d = new Array[Long](n)
    if (order == 1) {
      var k = n - 1
      while (k >= 1) { d(k) = scaled(k) - scaled(k - 1); k -= 1 }
    } else {
      var k = n - 1
      while (k >= 2) { d(k) = scaled(k) - 2 * scaled(k - 1) + scaled(k - 2); k -= 1 }
    }
    var minsd = Long.MaxValue
    var k = order
    while (k < n) { if (d(k) < minsd) minsd = d(k); k += 1 }
    val sd = new Array[Long](n)
    k = order
    while (k < n) { sd(k) = d(k) - minsd; k += 1 }
    (sd, scaled(0), if (order == 2) scaled(1) else 0L, minsd)
  }

  /** Signed-magnitude u32 for the 7.3 extra descriptors (first bit =
    * sign, WMO regulation 92.1.5). */
  private def signedMag32(v: Long): Long = {
    require(math.abs(v) < (1L << 31), s"descriptor $v exceeds 31-bit magnitude")
    if (v < 0) (1L << 31) | -v else v
  }

  /** MSB-first bit-packing of (scaled − min) offsets — the shared data
    * section encoder. */
  private def writePacked(out: DataOutputStream, scaled: Array[Long],
      minV: Long, bits: Int): Unit = {
    var acc = 0L; var nAcc = 0
    scaled.foreach { s =>
      val x = s - minV
      acc = (acc << bits) | x
      nAcc += bits
      while (nAcc >= 8) {
        out.writeByte(((acc >> (nAcc - 8)) & 0xFF).toInt)
        nAcc -= 8
      }
    }
    if (nAcc > 0) out.writeByte(((acc << (8 - nAcc)) & 0xFF).toInt)
  }

  /** Write one GRIB1 message: a regular lat/lon grid of `values`
    * (row-major, lat rows with lon fastest), simple-packed with the given
    * decimal scale. Binary scale 0 and bits sized to the scaled range, so
    * values with ≤ `decimalScale` decimals round-trip exactly. */
  def writeMessage(
      out: DataOutputStream,
      paramId: Int,
      refTime: java.time.LocalDateTime,
      lats: Seq[Double], lons: Seq[Double],
      values: Array[Double],
      decimalScale: Int = 0,
      leadHours: Int = 0,
      /** GDS grid type 4 (Gaussian): N parallels pole→equator. */
      gaussianN: Option[Int] = None,
      /** Reduced Gaussian rows (ni → MISSING, PL list at octet 33). */
      reducedRows: Option[Seq[Int]] = None,
      /** > 0 writes an ACCUMULATION (time range indicator 4) over
        * [ref+lead, ref+lead+accumHours] — valid at the interval END,
        * the GPCP/NCEP-precip edition-1 shape; 0 = point-in-time. */
      accumHours: Int = 0): Unit = {
    require(accumHours >= 0, s"accumHours $accumHours negative")
    require(leadHours >= 0 &&
        leadHours + accumHours <= (if (accumHours > 0) 255 else 65535),
      s"lead $leadHours + accumulation $accumHours exceeds the PDS range " +
        s"(P1/P2 are one octet each; a point lead may span both as TRI 10)")
    require(reducedRows.isEmpty || gaussianN.isDefined,
      "reduced rows require a Gaussian grid (type 4)")
    val nj = lats.length; val ni = lons.length
    reducedRows.foreach { pl =>
      require(pl.length == nj, s"${pl.length} row lengths for $nj parallels")
      require(pl.forall(_ > 0), "reduced grid has an empty row")
    }
    val nCells1 = reducedRows.map(_.sum).getOrElse(ni * nj)
    require(values.length == nCells1,
      s"${values.length} values for $nCells1-cell grid")
    require(ni <= 65535 && nj <= 65535, s"grid $ni x $nj exceeds GDS u16 dims")
    val (scaled, minV, bits, bitmap) = packPlan(values, decimalScale)
    require(bits <= 24,
      s"range needs $bits bits (>24); raise decimalScale granularity")
    val refValue = minV.toDouble // stored as IBM float, exact for ints < 2^24
    val dataBits = scaled.length.toLong * bits
    val dataByteLen = ((dataBits + 7) / 8).toInt
    val bdsLen0 = 11 + dataByteLen
    val bdsLen = bdsLen0 + (bdsLen0 % 2) // BDS length must be even
    val pdsLen = 28
    val gdsLen = 32 + reducedRows.map(_.length * 2).getOrElse(0)
    val bmsLen0 = bitmap.map(6 + _.length).getOrElse(0)
    val bmsLen = bmsLen0 + (bmsLen0 % 2) // BMS length must be even too
    val total = 8 + pdsLen + gdsLen + bmsLen + bdsLen + 4
    require(total <= 0xFFFFFF,
      s"message of $total bytes exceeds the 24-bit GRIB1 length; split the grid")

    // IS
    out.writeBytes("GRIB")
    out.writeByte((total >> 16) & 0xFF); out.writeByte((total >> 8) & 0xFF)
    out.writeByte(total & 0xFF)
    out.writeByte(1) // edition
    // PDS
    out.writeByte(0); out.writeByte(0); out.writeByte(pdsLen) // length u24
    out.writeByte(128) // table version (local)
    out.writeByte(255) // center
    out.writeByte(255) // process
    out.writeByte(255) // grid id
    out.writeByte(0x80 | (if (bitmap.isDefined) 0x40 else 0x00)) // GDS present, BMS if holes
    out.writeByte(paramId)
    out.writeByte(1); writeSm(out, 0, 2) // level type surface, level 0
    val century = (refTime.getYear - 1) / 100 + 1
    val yoc = refTime.getYear - (century - 1) * 100
    out.writeByte(yoc); out.writeByte(refTime.getMonthValue)
    out.writeByte(refTime.getDayOfMonth); out.writeByte(refTime.getHour)
    out.writeByte(refTime.getMinute)
    out.writeByte(1) // time unit hours
    if (accumHours > 0) {
      // accumulation [ref+P1, ref+P2], valid at the interval end
      out.writeByte(leadHours); out.writeByte(leadHours + accumHours)
      out.writeByte(4) // time range indicator: accumulation
    } else if (leadHours > 255) {
      // TRI 10: P1 spans octets 19-20 (the long-lead reanalysis shape)
      out.writeShort(leadHours)
      out.writeByte(10)
    } else {
      out.writeByte(leadHours); out.writeByte(0) // P1 (forecast lead), P2
      out.writeByte(0) // time range indicator: forecast valid at ref+P1
    }
    out.writeByte(0); out.writeByte(0) // number in average
    out.writeByte(0) // missing from average
    out.writeByte(century)
    out.writeByte(0) // subcenter
    writeSm(out, decimalScale, 2)
    // GDS (grid type 0 regular lat/lon, or 4 Gaussian; millidegrees)
    out.writeByte((gdsLen >> 16) & 0xFF); out.writeByte((gdsLen >> 8) & 0xFF)
    out.writeByte(gdsLen & 0xFF)
    out.writeByte(0) // NV
    out.writeByte(if (reducedRows.isDefined) 33 else 255) // PV: PL list or absent
    out.writeByte(if (gaussianN.isDefined) 4 else 0) // data representation type
    out.writeShort(if (reducedRows.isDefined) 0xFFFF else ni) // ni or MISSING
    out.writeShort(nj)
    def mdeg(x: Double): Int = math.round(x * 1000).toInt
    writeSm(out, mdeg(lats.head), 3); writeSm(out, mdeg(lons.head), 3)
    out.writeByte(0x80) // resolution/component flags: directions given
    writeSm(out, mdeg(lats.last), 3); writeSm(out, mdeg(lons.last), 3)
    val di = if (ni > 1) mdeg(math.abs(lons.last - lons.head) / (ni - 1)) else 0
    val dj = if (nj > 1) mdeg(math.abs(lats.last - lats.head) / (nj - 1)) else 0
    out.writeShort(di)
    out.writeShort(gaussianN.getOrElse(dj)) // grid 4 carries N in the Dj slot
    out.writeByte(if (lats.last >= lats.head) 0x40 else 0x00) // scanning mode: +j if increasing
    out.writeByte(0); out.writeByte(0); out.writeByte(0); out.writeByte(0) // reserved
    reducedRows.foreach(_.foreach(out.writeShort)) // PL list (octet 33+)
    // BMS (only when the field has holes)
    bitmap.foreach { bm =>
      out.writeByte((bmsLen >> 16) & 0xFF); out.writeByte((bmsLen >> 8) & 0xFF)
      out.writeByte(bmsLen & 0xFF)
      val unused = (bmsLen - 6) * 8 - values.length
      out.writeByte(unused & 0xFF)
      out.writeShort(0) // table reference: bitmap follows
      out.write(bm)
      if (bmsLen != bmsLen0) out.writeByte(0)
    }
    // BDS (length is a full u24 — big grids exceed 65535 bytes)
    out.writeByte((bdsLen >> 16) & 0xFF); out.writeByte((bdsLen >> 8) & 0xFF)
    out.writeByte(bdsLen & 0xFF)
    val unusedBits = (bdsLen - bdsLen0) * 8 + (dataByteLen * 8 - dataBits).toInt
    out.writeByte((unusedBits & 0x0F)) // flags 0 (simple, grid-point) + unused-bit count low nibble
    writeSm(out, 0, 2) // binary scale factor E = 0
    out.writeInt(doubleToIbm(refValue))
    out.writeByte(bits)
    writePacked(out, scaled, minV, bits)
    // pad BDS to even length
    if (bdsLen != bdsLen0) out.writeByte(0)
    // end section
    out.writeBytes("7777")
  }

  /** Write one GRIB2 message (grid template 3.0, product template 4.0,
    * data template 5.0): a regular lat/lon grid of `values` (row-major,
    * lat rows with lon fastest), simple-packed. `paramId` encodes the
    * product parameter as (category << 8) | number. Binary scale 0 and
    * bits sized to the scaled range, like the edition-1 writer. */
  def writeMessage2(
      out: DataOutputStream,
      paramId: Int,
      refTime: java.time.LocalDateTime,
      lats: Seq[Double], lons: Seq[Double],
      values: Array[Double],
      decimalScale: Int = 0,
      leadHours: Int = 0,
      complexPacking: Boolean = false,
      spatialDiffOrder: Int = 0,
      pngPacking: Boolean = false,
      ccsdsPacking: Boolean = false,
      jpegPacking: Boolean = false,
      rotatedPole: Option[(Double, Double, Double)] = None,
      gaussianN: Option[Int] = None,
      reducedRows: Option[Seq[Int]] = None): Unit =
    writeMessage2Fields(out, refTime, lats, lons,
      Seq((paramId, leadHours, values)), decimalScale, complexPacking,
      spatialDiffOrder, pngPacking = pngPacking, ccsdsPacking = ccsdsPacking,
      jpegPacking = jpegPacking,
      rotatedPole = rotatedPole, gaussianN = gaussianN,
      reducedRows = reducedRows)

  /** Write one GRIB2 MESSAGE carrying one or more FIELDS: sections 0-3 are
    * shared, each field contributes its own section 4-7 group (WMO FM 92
    * multi-field form — how archives pack several parameters of one grid
    * and reference time into one message). */
  def writeMessage2Fields(
      out: DataOutputStream,
      refTime: java.time.LocalDateTime,
      lats: Seq[Double], lons: Seq[Double],
      fields: Seq[(Int, Int, Array[Double])], // (paramId, leadHours, values)
      decimalScale: Int = 0,
      complexPacking: Boolean = false,
      /** 0 = plain 5.2 groups; 1|2 = template 5.3 spatial differencing
        * (requires complexPacking). */
      spatialDiffOrder: Int = 0,
      /** Template 5.41: the scaled offsets travel as a PNG raster
        * ((ni, nj), or (nPresent, 1) under a bitmap) — g2clib pngpack.c. */
      pngPacking: Boolean = false,
      /** Template 5.42: CCSDS/AEC (Rice) coded offsets — ecCodes
        * `grid_ccsds`, flags MSB|preprocess, block 16, RSI 8. */
      ccsdsPacking: Boolean = false,
      /** Template 5.40: the scaled offsets travel as a lossless JPEG 2000
        * codestream ((ni, nj), or (nPresent, 1) under a bitmap) — the
        * ECMWF/ERA5 archive packing, in-repo [[Jpeg2000]] codec. */
      jpegPacking: Boolean = false,
      /** Grid template 3.1 (rotated lat/lon): CF rotated-north-pole
        * (poleLat, poleLon, angle); `lats`/`lons` are then ROTATED
        * coordinates. None = plain 3.0. */
      rotatedPole: Option[(Double, Double, Double)] = None,
      /** Grid template 3.40 (regular Gaussian): N parallels pole→equator;
        * `lats` must be (a contiguous subset of) `gaussianLatitudes(N)`. */
      gaussianN: Option[Int] = None,
      /** Reduced (quasi-regular) Gaussian rows: points per parallel —
        * rows span the full circle from `lons.head` with per-row spacing.
        * Requires `gaussianN`; `values` are row-major with these lengths. */
      reducedRows: Option[Seq[Int]] = None,
      /** Grid template 3.20 (polar stereographic, north-pole aspect):
        * see [[PsWriterGrid]]. Mutually exclusive with the other grid
        * templates. */
      polarStereo: Option[PsWriterGrid] = None,
      /** Grid template 3.10 (Mercator): see [[MercWriterGrid]]. Mutually
        * exclusive with the other grid templates. */
      mercator: Option[MercWriterGrid] = None,
      /** Ensemble perturbation numbers aligned with `fields` (empty =
        * deterministic products; -1 entries stay deterministic). Members
        * write product template 4.1 instead of 4.0. */
      members: Seq[Int] = Seq.empty,
      /** First fixed surfaces aligned with `fields`: (type from code table
        * 4.5, value at scale factor 0) — e.g. (100, 85000) = 850 hPa.
        * Empty = every field at ground surface (1, 0), the pre-level
        * profile. This is how a multi-LEVEL fixture (ERA5 pressure-level
        * shape) is written. */
      levels: Seq[(Int, Long)] = Seq.empty,
      /** Second-fixed-surface values aligned with `fields` (LAYER
        * products — the type repeats the first surface's): Long.MinValue
        * entries mean "no second surface". Requires `levels`. */
      levelTops: Seq[Long] = Seq.empty,
      /** Accumulation interval hours aligned with `fields`: > 0 writes an
        * INTERVAL product (template 4.8, or 4.11 with a member) whose
        * overall interval runs [ref+lead, ref+lead+interval] — the NCEP
        * precipitation shape; 0 = point-in-time (4.0/4.1). */
      intervals: Seq[Int] = Seq.empty,
      /** Derived-ensemble statistics aligned with `fields` (code table
        * 4.7: 0 = mean, 2 = std dev; -1 entries stay non-derived).
        * Writes product template 4.2, or 4.12 with an interval — the
        * GEFS geavg/gespr archive shape. Mutually exclusive per field
        * with `members`. */
      derivedStats: Seq[Int] = Seq.empty,
      /** Probability products aligned with `fields`: (table-4.9 type,
        * lower limit, upper limit) at scale factor 0, Long.MinValue = that
        * limit absent; (-1, _, _) entries stay non-probability. Writes
        * product template 4.5, or 4.9 with an interval — the NBM shape.
        * Mutually exclusive per field with members/derivedStats. */
      probs: Seq[(Int, Long, Long)] = Seq.empty,
      /** Percentile products aligned with `fields`: the percentile 0-100;
        * -1 entries stay non-percentile. Writes product template 4.6, or
        * 4.10 with an interval. Mutually exclusive per field with the
        * other product axes. */
      percentiles: Seq[Int] = Seq.empty,
      /** Section 0 discipline (0 = meteorological, 1 = hydrological,
        * 2 = land surface, 10 = oceanographic). Joins the scan's param
        * key as the high 8 bits. */
      discipline: Int = 0): Unit = {
    require(discipline >= 0 && discipline <= 255, s"discipline $discipline")
    require(fields.nonEmpty, "a GRIB2 message needs at least one field")
    require(members.isEmpty || members.length == fields.length,
      s"${members.length} members for ${fields.length} fields")
    require(levels.isEmpty || levels.length == fields.length,
      s"${levels.length} levels for ${fields.length} fields")
    require(levelTops.isEmpty ||
        (levels.nonEmpty && levelTops.length == fields.length),
      s"${levelTops.length} second-surface values need aligned levels")
    require(intervals.isEmpty || intervals.length == fields.length,
      s"${intervals.length} intervals for ${fields.length} fields")
    require(intervals.forall(_ >= 0), s"negative interval in $intervals")
    require(derivedStats.isEmpty || derivedStats.length == fields.length,
      s"${derivedStats.length} derived stats for ${fields.length} fields")
    require(derivedStats.isEmpty || members.isEmpty ||
        fields.indices.forall(i => derivedStats(i) < 0 || members(i) < 0),
      "a field is either an individual member (4.1/4.11) or a derived " +
        "statistic (4.2/4.12), not both")
    require(probs.isEmpty || probs.length == fields.length,
      s"${probs.length} probability specs for ${fields.length} fields")
    require(percentiles.isEmpty || percentiles.length == fields.length,
      s"${percentiles.length} percentiles for ${fields.length} fields")
    fields.indices.foreach { i =>
      val axes = Seq(
        members.lift(i).exists(_ >= 0), derivedStats.lift(i).exists(_ >= 0),
        probs.lift(i).exists(_._1 >= 0), percentiles.lift(i).exists(_ >= 0))
      require(axes.count(identity) <= 1,
        s"field $i mixes product axes (member/derived/probability/percentile)")
    }
    probs.foreach { case (t, lo, hi) =>
      require(t < 0 || lo != Long.MinValue || hi != Long.MinValue,
        "a probability field needs at least one limit")
      require((lo == Long.MinValue || lo >= 0) &&
        (hi == Long.MinValue || hi >= 0),
        "this writer emits non-negative probability limits (scale factor 0)")
    }
    require(spatialDiffOrder >= 0 && spatialDiffOrder <= 2,
      s"spatial differencing order $spatialDiffOrder (0, 1, 2)")
    require(spatialDiffOrder == 0 || complexPacking,
      "spatial differencing (5.3) rides on complex packing")
    require(Seq(complexPacking, pngPacking, ccsdsPacking, jpegPacking)
        .count(identity) <= 1,
      "pick one data representation: complex (5.2/5.3), PNG (5.41), " +
        "CCSDS (5.42) or JPEG 2000 (5.40)")
    val nj = lats.length; val ni = lons.length

    final case class FieldPlan(
        paramId: Int, leadHours: Int,
        scaled: Array[Long], minV: Long, bits: Int,
        bitmap: Option[Array[Byte]],
        complexParts: Option[(ComplexParams, Array[Byte], Int)],
        pngBytes: Option[Array[Byte]],
        ccsdsBytes: Option[Array[Byte]],
        jpegBytes: Option[Array[Byte]],
        refValue: Float,
        member: Int, derived: Int,
        probType: Int, probLo: Long, probHi: Long, pct: Int,
        surfType: Int, surfVal: Long, surfVal2: Long,
        accumHours: Int,
        sec4Len: Int, sec5Len: Int, sec6Len: Int, sec7Len: Int)

    val nMembers = members.count(_ >= 0)
    val plans = fields.zipWithIndex.map { case ((paramId, leadHours, values), fi) =>
      val member = if (members.isEmpty) -1 else members(fi)
      require(leadHours >= 0, s"negative lead $leadHours")
      require(paramId >= 0 && paramId <= 0xFFFF, s"paramId $paramId not (cat<<8)|num")
      val nCells = reducedRows.map(_.sum).getOrElse(ni * nj)
      require(values.length == nCells,
        s"${values.length} values for $nCells-cell grid")
      val (scaled, minV, bits, bitmap) = packPlan(values, decimalScale)
      if (pngPacking) require(bits <= 32,
        s"range needs $bits bits (>32); PNG packing tops out at RGBA depth")
      else if (ccsdsPacking) require(bits <= 32,
        s"range needs $bits bits (>32); CCSDS samples top out at 32")
      else if (jpegPacking) require(bits <= 26,
        s"range needs $bits bits (>26); JPEG 2000 component precision cap")
      else if (!complexPacking) require(bits <= 24,
        s"range needs $bits bits (>24); raise decimalScale or complex-pack")
      // the reference value travels as IEEE float32 — exact for ints < 2^24
      require(minV.toFloat.toLong == minV, s"reference $minV not exact in float32")
      // a field with ≤ order present cells can't difference — degrade to
      // plain 5.2 groups for THAT field (encoders in the wild do the same)
      val fieldOrder = if (scaled.length > spatialDiffOrder) spatialDiffOrder else 0
      val complexParts =
        if (fieldOrder > 0) {
          // 5.3: group-pack the shifted differences; R = 0 because the
          // reconstruction rebuilds the FULL scaled values (g2clib)
          val (sd, ival1, ival2, minsd) = spatialDiffPlan(scaled, fieldOrder)
          val (cp0, groupBytes, refBits) = complexPack(sd, 0L)
          val w = new BitWriter
          w.put(signedMag32(ival1), 32)
          if (fieldOrder == 2) w.put(signedMag32(ival2), 32)
          w.put(signedMag32(minsd), 32)
          val cp = cp0.copy(spatialOrder = fieldOrder, spatialDescBytes = 4)
          Some((cp, w.bytes ++ groupBytes, refBits))
        }
        else if (complexPacking) Some(complexPack(scaled, minV))
        else None
      // shared by the raster/stream packings (5.40/5.41/5.42): the data
      // section carries (scaled − min) offsets; image packings flatten to
      // one row when a bitmap or a reduced grid leaves no (ni, nj) shape
      lazy val offsets = {
        val o = new Array[Long](scaled.length)
        var i = 0
        while (i < scaled.length) { o(i) = scaled(i) - minV; i += 1 }
        o
      }
      lazy val rasterShape =
        if (bitmap.isDefined || reducedRows.isDefined) (scaled.length, 1)
        else (ni, nj)
      // 7.41: PNG of the offsets (g2clib pngpack.c shape convention)
      val pngBytes =
        if (!pngPacking) None
        else Some(Png.encode(rasterShape._1, rasterShape._2,
          math.max(bits, 1), offsets))
      val ccsdsBytes =
        if (!ccsdsPacking) None
        else if (bits == 0) Some(Array.emptyByteArray) // constant field
        else Some(Ccsds.encode(offsets, math.max(bits, 2), CcsdsWriterParams))
      // 7.40: lossless JPEG 2000 codestream of the offsets
      val jpegBytes =
        if (!jpegPacking) None
        else if (bits == 0) Some(Array.emptyByteArray) // constant field
        else Some(Jpeg2000.encode(rasterShape._1, rasterShape._2,
          math.max(bits, 1), offsets))
      val dataByteLen = (complexParts, pngBytes, ccsdsBytes, jpegBytes) match {
        case (Some((_, bytes, _)), _, _, _) => bytes.length
        case (_, Some(bytes), _, _) => bytes.length
        case (_, _, Some(bytes), _) => bytes.length
        case (_, _, _, Some(bytes)) => bytes.length
        case _ => ((scaled.length.toLong * bits + 7) / 8).toInt
      }
      val (surfType, surfVal) =
        if (levels.isEmpty) (1, 0L) else levels(fi)
      val surfVal2 = if (levelTops.isEmpty) Long.MinValue else levelTops(fi)
      val accumHours = if (intervals.isEmpty) 0 else intervals(fi)
      val derivedStat = if (derivedStats.isEmpty) -1 else derivedStats(fi)
      val (probT, probLo, probHi) =
        if (probs.isEmpty) (-1, Long.MinValue, Long.MinValue) else probs(fi)
      val pct = if (percentiles.isEmpty) -1 else percentiles(fi)
      FieldPlan(paramId, leadHours, scaled, minV, bits, bitmap, complexParts,
        pngBytes, ccsdsBytes, jpegBytes,
        refValue = if (fieldOrder > 0) 0f else minV.toFloat,
        member = member, derived = derivedStat,
        probType = probT, probLo = probLo, probHi = probHi, pct = pct,
        surfType = surfType, surfVal = surfVal, surfVal2 = surfVal2,
        accumHours = accumHours,
        sec4Len = (if (member >= 0) 37
          else if (derivedStat >= 0) 36
          else if (probT >= 0) 47
          else if (pct >= 0) 35 else 34) +
          (if (accumHours > 0) 24 else 0),
        sec5Len = if (fieldOrder > 0) 49 else if (complexPacking) 47
          else if (ccsdsPacking) 25 else if (jpegPacking) 23 else 21,
        sec6Len = 6 + bitmap.map(_.length).getOrElse(0),
        sec7Len = 5 + dataByteLen)
    }
    require(Seq(rotatedPole.isDefined, gaussianN.isDefined,
        polarStereo.isDefined, mercator.isDefined).count(identity) <= 1,
      "pick one grid template: rotated (3.1), Mercator (3.10), polar " +
        "stereographic (3.20) or Gaussian (3.40)")
    require(reducedRows.isEmpty || gaussianN.isDefined,
      "reduced rows require a Gaussian grid (template 3.40)")
    reducedRows.foreach { pl =>
      require(pl.length == lats.length,
        s"${pl.length} row lengths for ${lats.length} parallels")
      require(pl.forall(_ > 0), "reduced grid has an empty row")
    }
    gaussianN.foreach { n =>
      val all = gaussianLatitudes(n)
      require(lats.forall(l => all.exists(g => math.abs(g - l) < 1e-9)),
        s"every latitude must be a Gaussian parallel of N=$n")
    }
    val sec3Len =
      (if (rotatedPole.isDefined) 84
       else if (polarStereo.isDefined) 65 else 72) +
        reducedRows.map(_.length * 2).getOrElse(0)
    // (3.10 and 3.0/3.40 are both 72-octet sections)
    val total = 16L + 21 + sec3Len +
      plans.map(p => p.sec4Len.toLong + p.sec5Len + p.sec6Len + p.sec7Len).sum + 4

    // Section 0 — indicator
    out.writeBytes("GRIB")
    out.writeByte(0); out.writeByte(0) // reserved
    out.writeByte(discipline)
    out.writeByte(2) // edition
    out.writeLong(total)
    // Section 1 — identification
    out.writeInt(21); out.writeByte(1)
    out.writeShort(255); out.writeShort(0) // centre, subcentre
    out.writeByte(2); out.writeByte(0) // master/local table versions
    out.writeByte(1) // significance: start of forecast
    out.writeShort(refTime.getYear)
    out.writeByte(refTime.getMonthValue); out.writeByte(refTime.getDayOfMonth)
    out.writeByte(refTime.getHour); out.writeByte(refTime.getMinute)
    out.writeByte(refTime.getSecond)
    out.writeByte(0); out.writeByte(1) // production status, data type: forecast
    // Section 3 — grid definition: template 3.0 (lat/lon in 10^-6
    // degrees), 3.1 (rotated: 3.0 + southern pole + angle), 3.20 (polar
    // stereographic), or 3.40 (Gaussian)
    def udeg(x: Double): Int = math.round(x * 1e6).toInt
    mercator.foreach { g =>
      out.writeInt(sec3Len); out.writeByte(3)
      out.writeByte(0) // source: templates
      out.writeInt(ni * nj)
      out.writeByte(0); out.writeByte(0) // no optional list
      out.writeShort(10)
      out.writeByte(6) // shape of earth: spherical r=6371229
      out.writeByte(0); out.writeInt(0) // radius scale/value (n/a)
      out.writeByte(0); out.writeInt(0) // major axis
      out.writeByte(0); out.writeInt(0) // minor axis
      out.writeInt(ni); out.writeInt(nj)
      writeSm(out, udeg(g.la1), 4); writeSm(out, udeg(g.lo1), 4)
      out.writeByte(0x30) // resolution flags: increments given
      writeSm(out, udeg(g.latTs), 4) // LaD: true-scale latitude
      // last grid point from the projection walk (diagnostic corners)
      val m0 = graft.ops.Projection.Mercator(g.lo1, g.latTs)
      val (y0, x0) = m0.forwardXY(g.la1, g.lo1)
      val (la2w, lo2w) = m0.inverseXY(y0 + (nj - 1) * g.dyM,
        x0 + (ni - 1) * g.dxM)
      writeSm(out, udeg(la2w), 4); writeSm(out, udeg(lo2w), 4)
      out.writeByte(0x40) // octet 60: scanning +i, +j, i-consecutive
      out.writeInt(0) // octets 61-64: orientation
      out.writeInt(math.round(g.dxM * 1000).toInt) // Di in mm
      out.writeInt(math.round(g.dyM * 1000).toInt) // Dj in mm
    }
    if (mercator.isEmpty) polarStereo match {
      case Some(g) =>
        out.writeInt(sec3Len); out.writeByte(3)
        out.writeByte(0) // source: templates
        out.writeInt(ni * nj)
        out.writeByte(0); out.writeByte(0) // no optional list
        out.writeShort(20)
        out.writeByte(6) // shape of earth: spherical r=6371229
        out.writeByte(0); out.writeInt(0) // radius scale/value (n/a)
        out.writeByte(0); out.writeInt(0) // major axis
        out.writeByte(0); out.writeInt(0) // minor axis
        out.writeInt(ni); out.writeInt(nj)
        writeSm(out, udeg(g.la1), 4); writeSm(out, udeg(g.lo1), 4)
        out.writeByte(0x30) // resolution flags: increments given
        writeSm(out, udeg(g.latTs), 4) // LaD: true-scale latitude
        writeSm(out, udeg(g.lov), 4) // LoV: orientation
        out.writeInt(math.round(g.dxM * 1000).toInt) // Dx in mm
        out.writeInt(math.round(g.dyM * 1000).toInt) // Dy in mm
        out.writeByte(0) // projection centre: north pole
        out.writeByte(0x40) // scanning: +i, +j, i-consecutive
      case None =>
        out.writeInt(sec3Len); out.writeByte(3)
        out.writeByte(0) // source: templates
        out.writeInt(reducedRows.map(_.sum).getOrElse(ni * nj))
        // optional points-per-row list: u16 entries, interpretation 1
        if (reducedRows.isDefined) { out.writeByte(2); out.writeByte(1) }
        else { out.writeByte(0); out.writeByte(0) }
        out.writeShort(
          if (rotatedPole.isDefined) 1
          else if (gaussianN.isDefined) 40
          else 0)
        out.writeByte(6) // shape of earth: spherical r=6371229
        out.writeByte(0); out.writeInt(0) // radius scale/value (n/a for shape 6)
        out.writeByte(0); out.writeInt(0) // major axis
        out.writeByte(0); out.writeInt(0) // minor axis
        out.writeInt(if (reducedRows.isDefined) -1 else ni) // MISSING when reduced
        out.writeInt(nj)
        out.writeInt(0); out.writeInt(0) // basic angle + subdivisions: 10^-6 unit
        writeSm(out, udeg(lats.head), 4); writeSm(out, udeg(lons.head), 4)
        out.writeByte(0x30) // resolution flags: i and j increments given
        writeSm(out, udeg(lats.last), 4); writeSm(out, udeg(lons.last), 4)
        val di = if (ni > 1) udeg(math.abs(lons.last - lons.head) / (ni - 1)) else 0
        val dj = if (nj > 1) udeg(math.abs(lats.last - lats.head) / (nj - 1)) else 0
        out.writeInt(di)
        // 3.40 carries N (parallels pole→equator) in the Dj slot
        out.writeInt(gaussianN.getOrElse(dj))
        out.writeByte(if (lats.last >= lats.head) 0x40 else 0x00) // scanning mode
        reducedRows.foreach(_.foreach(out.writeShort))
        rotatedPole.foreach { case (poleLat, poleLon, angle) =>
          // CF rotated north pole -> GRIB southern pole of projection
          val spLat = -poleLat
          val spLon0 = poleLon + 180.0
          val spLon = if (spLon0 > 180.0) spLon0 - 360.0 else spLon0
          writeSm(out, udeg(spLat), 4)
          writeSm(out, udeg(spLon), 4)
          out.writeInt(java.lang.Float.floatToIntBits(angle.toFloat))
        }
    }
    plans.foreach { p =>
      val refValue = p.refValue
      // Section 4 — product definition: 4.0 (deterministic point) / 4.1
      // (ensemble member) / 4.8 (interval) / 4.11 (ensemble interval)
      out.writeInt(p.sec4Len); out.writeByte(4)
      out.writeShort(0) // no coordinate values
      out.writeShort(
        if (p.accumHours > 0) {
          if (p.member >= 0) 11 else if (p.derived >= 0) 12
          else if (p.probType >= 0) 9 else if (p.pct >= 0) 10 else 8
        } else {
          if (p.member >= 0) 1 else if (p.derived >= 0) 2
          else if (p.probType >= 0) 5 else if (p.pct >= 0) 6 else 0
        }) // 4.0 / 4.1 / 4.2 / 4.5 / 4.6 / 4.8 / 4.9 / 4.10 / 4.11 / 4.12
      out.writeByte((p.paramId >> 8) & 0xFF) // parameter category
      out.writeByte(p.paramId & 0xFF) // parameter number
      out.writeByte(2); out.writeByte(0); out.writeByte(0) // process type/bg/id
      out.writeShort(0); out.writeByte(0) // cutoff
      out.writeByte(1) // time unit: hours
      out.writeInt(p.leadHours) // forecast time (interval START for 4.8/4.11)
      // surface 1: (type, scale factor 0, scaled value); ground by default
      out.writeByte(p.surfType); out.writeByte(0); out.writeInt(p.surfVal.toInt)
      if (p.surfVal2 == Long.MinValue) {
        out.writeByte(255); out.writeByte(255); out.writeInt(-1) // surface 2: none
      } else {
        // layer product: surface 2 repeats the type at scale factor 0
        out.writeByte(p.surfType); out.writeByte(0)
        out.writeInt(p.surfVal2.toInt)
      }
      if (p.member >= 0) {
        out.writeByte(3) // ensemble type: perturbed forecast
        out.writeByte(p.member) // perturbation number
        out.writeByte(math.max(nMembers, p.member + 1)) // forecasts in ensemble
      } else if (p.derived >= 0) {
        out.writeByte(p.derived) // derived forecast type (table 4.7)
        out.writeByte(math.max(nMembers, 2)) // forecasts in ensemble
      } else if (p.probType >= 0) {
        out.writeByte(0) // forecast probability number
        out.writeByte(1) // total number of probabilities
        out.writeByte(p.probType) // table 4.9
        if (p.probLo == Long.MinValue) { out.writeByte(255); out.writeInt(-1) }
        else { out.writeByte(0); out.writeInt(p.probLo.toInt) }
        if (p.probHi == Long.MinValue) { out.writeByte(255); out.writeInt(-1) }
        else { out.writeByte(0); out.writeInt(p.probHi.toInt) }
      } else if (p.pct >= 0) {
        out.writeByte(p.pct) // percentile value (0-100)
      }
      if (p.accumHours > 0) {
        // statistical-processing trailer: END of the overall interval,
        // one accumulation range of accumHours hours
        val end = refTime.plusHours(p.leadHours.toLong + p.accumHours)
        out.writeShort(end.getYear)
        out.writeByte(end.getMonthValue); out.writeByte(end.getDayOfMonth)
        out.writeByte(end.getHour); out.writeByte(end.getMinute)
        out.writeByte(end.getSecond)
        out.writeByte(1) // number of time ranges
        out.writeInt(0) // missing values in the statistical process
        out.writeByte(1) // statistical process: accumulation
        out.writeByte(2) // time-increment type: successive start times
        out.writeByte(1) // range unit: hours
        out.writeInt(p.accumHours) // length of the range
        out.writeByte(1) // increment unit: hours
        out.writeInt(0) // increment: continuous
      }
      // Section 5 — data representation (template 5.0 simple / 5.2 complex);
      // ndata = number of points carried in section 7 (present cells only)
      out.writeInt(p.sec5Len); out.writeByte(5)
      out.writeInt(p.scaled.length)
      p.complexParts match {
        case None =>
          // templates 5.40 (JPEG 2000), 5.41 (PNG) and 5.42 (CCSDS) all
          // share 5.0's 21-octet body
          out.writeShort(
            if (p.pngBytes.isDefined) 41
            else if (p.ccsdsBytes.isDefined) 42
            else if (p.jpegBytes.isDefined) 40
            else 0)
          out.writeInt(java.lang.Float.floatToIntBits(refValue))
          writeSm(out, 0, 2) // binary scale E = 0
          writeSm(out, decimalScale, 2)
          out.writeByte(
            if (p.pngBytes.isDefined) math.max(p.bits, 1)
            else if (p.ccsdsBytes.isDefined && p.bits > 0) math.max(p.bits, 2)
            else if (p.jpegBytes.isDefined && p.bits > 0) math.max(p.bits, 1)
            else p.bits)
          out.writeByte(0) // field type: floating point
          if (p.ccsdsBytes.isDefined) {
            out.writeByte(CcsdsWriterParams.flags)
            out.writeByte(CcsdsWriterParams.blockSize)
            out.writeShort(CcsdsWriterParams.rsi)
          }
          if (p.jpegBytes.isDefined) {
            out.writeByte(0) // compression type: lossless
            out.writeByte(255) // target compression ratio: missing
          }
        case Some((cp, _, refBits)) =>
          out.writeShort(if (cp.spatialOrder > 0) 3 else 2) // template 5.2/5.3
          out.writeInt(java.lang.Float.floatToIntBits(refValue))
          writeSm(out, 0, 2) // binary scale E = 0
          writeSm(out, decimalScale, 2)
          out.writeByte(refBits) // bits per group reference
          out.writeByte(0) // field type: floating point
          out.writeByte(1) // group splitting: general
          out.writeByte(0) // missing-value management: none (bitmap carries holes)
          out.writeInt(0); out.writeInt(0) // primary/secondary missing substitutes
          out.writeInt(cp.ng)
          out.writeByte(cp.widthRef)
          out.writeByte(cp.widthBits)
          out.writeInt(cp.lengthRef.toInt)
          out.writeByte(cp.lengthInc)
          out.writeInt(cp.lastLength.toInt)
          out.writeByte(cp.lengthBits)
          if (cp.spatialOrder > 0) {
            out.writeByte(cp.spatialOrder) // octet 48
            out.writeByte(cp.spatialDescBytes) // octet 49
          }
      }
      // Section 6 — bitmap (indicator 0) or none (255)
      out.writeInt(p.sec6Len); out.writeByte(6)
      p.bitmap match {
        case Some(bm) => out.writeByte(0); out.write(bm)
        case None => out.writeByte(255)
      }
      // Section 7 — data
      out.writeInt(p.sec7Len); out.writeByte(7)
      (p.complexParts, p.pngBytes, p.ccsdsBytes, p.jpegBytes) match {
        case (Some((_, bytes, _)), _, _, _) => out.write(bytes)
        case (_, Some(bytes), _, _) => out.write(bytes)
        case (_, _, Some(bytes), _) => out.write(bytes)
        case (_, _, _, Some(bytes)) => out.write(bytes)
        case _ => writePacked(out, p.scaled, p.minV, p.bits)
      }
    }
    // Section 8 — end
    out.writeBytes("7777")
  }

  // -------------------------------------------------------------- parsing

  /** Parse all message descriptors in a stream (headers only — the packed
    * data is skipped and read later as a positioned slab). */
  def parseMessages(in: InputStream): Seq[GribMessage] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[GribMessage]
    var offset = 0L
    def readN(n: Int): Array[Byte] = {
      val b = new Array[Byte](n)
      var got = 0
      while (got < n) {
        val r = in.read(b, got, n - got)
        if (r < 0) throw new EOFException(s"Truncated GRIB at offset $offset")
        got += r
      }
      offset += n
      b
    }
    def skipN(n: Long): Unit = {
      var left = n
      while (left > 0) {
        val s = in.skip(left)
        if (s <= 0) throw new EOFException("Truncated GRIB data section")
        left -= s
      }
      offset += n
    }

    /** Edition-2 message body: a stream of (length, number, body) sections
      * bracketed by section 0 (already consumed as `head` + the 8 length
      * bytes) and the "7777" end section. A MESSAGE may carry several
      * FIELDS (repeated section 4-7 groups sharing the earlier sections,
      * WMO FM 92 §2) — every completed section 7 snapshots one
      * [[GribMessage]] from the current section state. */
    def parseEdition2(msgStart: Long, discipline: Int): Seq[GribMessage] = {
      val total = u64(readN(8), 0)
      require(total <= Int.MaxValue, s"GRIB2 message of $total bytes unsupported")
      val fields = scala.collection.mutable.ArrayBuffer.empty[GribMessage]
      var paramId = -1
      var refTime0: java.time.LocalDateTime = null
      var timeUnit = 1
      var forecast = 0
      var ni = 0; var nj = 0
      var la1 = 0.0; var lo1 = 0.0; var la2 = 0.0; var lo2 = 0.0
      var decimalScale = 0; var binaryScale = 0
      var refValue = 0.0
      var bits = 0
      var bitmapOffset = -1L; var bitmapBytes = 0
      var complex: Option[ComplexParams] = None
      var ccsds: Option[Ccsds.Params] = None
      var lcc: Option[LccGrid] = None
      var psg: Option[PsGrid] = None
      var mrc: Option[MercGrid] = None
      var rot: Option[RotGrid] = None
      var gaussN: Option[Int] = None
      var rowLengths: Option[Array[Int]] = None
      var member = -1
      var derived1 = -1
      var probType1 = -1
      var probLo1 = Double.NaN
      var probHi1 = Double.NaN
      var percentile1 = -1
      var levelType1 = 255
      var level1 = Double.NaN
      var levelTo1 = Double.NaN
      var intervalEnd: java.time.LocalDateTime = null
      var png = false
      var jpeg = false
      var spectralTrunc: Option[Int] = None
      var spectralPacking: Option[SpectralPacking] = None
      var seenRepr = false
      var done = false
      while (!done) {
        val first4 = readN(4)
        if (new String(first4, "US-ASCII") == "7777") done = true
        else {
          val secLen = u32(first4, 0).toInt
          // a section is at least its 5-byte header; EXACTLY 5 is legal
          // for a constant field's data section (bits-per-value 0, no
          // packed bytes)
          require(secLen >= 5, s"Corrupt GRIB2 section length $secLen")
          val num = readN(1)(0) & 0xFF
          // body(i) is section octet i+6 (1-based octets in the WMO tables)
          if (num == 7) {
            val dataOffset = offset
            val dataBytes = secLen - 5
            skipN((secLen - 5).toLong)
            require(refTime0 != null && paramId >= 0 && ni > 0 && seenRepr,
              "GRIB2 field reached section 7 without sections 1, 3, 4 and 5")
            val leadMin: Long = unitMinutes(timeUnit, forecast.toLong,
              secondsCode = 13, edition = "GRIB2", label = "forecast lead")
            // interval products (4.8/4.11): the VALID time is the END of
            // the overall interval from the PDT, not ref + lead — a 1-h
            // precip accumulation with lead 0 is valid at ref + 1 h (the
            // real NCEP rtma_pcp.grib shape); step keeps the ecCodes
            // endStep convention (valid − ref)
            val validTime =
              if (intervalEnd != null) intervalEnd
              else refTime0.plusMinutes(leadMin)
            val stepMin: Long =
              if (intervalEnd != null)
                java.time.Duration.between(refTime0, intervalEnd).toMinutes
              else leadMin
            val stepStartMin: Long =
              if (intervalEnd != null) leadMin else Long.MinValue
            val spectral = (spectralTrunc, spectralPacking) match {
              case (Some(t), Some(pk)) => Some(SpectralGrid(t, pk))
              case (Some(_), None) => throw new IllegalArgumentException(
                "spectral grid (template 3.50) needs DRS template 5.50 or " +
                  "5.51 (spectral packing)")
              case (None, Some(_)) => throw new IllegalArgumentException(
                "spectral DRS templates 5.50/5.51 need the " +
                  "spherical-harmonic grid (template 3.50)")
              case (None, None) => None
            }
            fields += GribMessage(paramId, validTime, ni, nj, la1, lo1, la2,
              lo2, decimalScale, binaryScale, refValue, bits, dataOffset,
              dataBytes, total.toInt, bitmapOffset, bitmapBytes, complex, lcc,
              psg, mrc, member, png, ccsds, rot, gaussN, rowLengths,
              jpeg = jpeg,
              spectral = spectral, levelType = levelType1, level = level1,
              levelTo = levelTo1,
              baseTime = refTime0, stepMinutes = stepMin,
              stepStartMinutes = stepStartMin, derived = derived1,
              probType = probType1, probLo = probLo1, probHi = probHi1,
              percentile = percentile1)
          } else if (num == 6) {
            val indicator = readN(1)(0) & 0xFF
            indicator match {
              case 255 => // no bitmap for THIS field
                bitmapOffset = -1L; bitmapBytes = 0
              case 254 => () // reuse the previously-defined bitmap
              case 0 => // bitmap in this section, right after the indicator
                bitmapOffset = offset
                bitmapBytes = secLen - 6
              case other => throw new IllegalArgumentException(
                s"bitmap indicator $other unsupported (0 = present, 254 = " +
                  "previous, 255 = none)")
            }
            skipN((secLen - 6).toLong)
          } else {
            val body = readN(secLen - 5)
            num match {
              case 1 =>
                refTime0 = java.time.LocalDateTime.of(u16(body, 7),
                  body(9) & 0xFF, body(10) & 0xFF, body(11) & 0xFF,
                  body(12) & 0xFF, body(13) & 0xFF)
              case 2 => // local use — ignored
              case 3 =>
                u16(body, 7) match {
                  case t @ (0 | 1 | 40) =>
                    require(u32(body, 33) == 0L,
                      "non-default basic angle unsupported (10^-6 degree unit only)")
                    nj = u32(body, 29).toInt
                    val niRaw = u32(body, 25)
                    if (t == 40 && niRaw == 0xFFFFFFFFL) {
                      // reduced (quasi-regular) Gaussian — ERA5's native
                      // layout: ni is MISSING and the points-per-row list
                      // rides section 3's optional-numbers tail (octets 73+)
                      val w = body(5) & 0xFF
                      val interp = body(6) & 0xFF
                      require(interp == 1,
                        s"optional-list interpretation $interp unsupported " +
                          "(1: numbers are points per row)")
                      require(w == 1 || w == 2 || w == 4,
                        s"optional-list entry width $w octets unsupported (1, 2, 4)")
                      require(body.length >= 67 + nj * w,
                        s"section 3 too short for $nj row lengths of $w octets")
                      val pl = Array.tabulate(nj) { r =>
                        val off = 67 + r * w
                        w match {
                          case 1 => body(off) & 0xFF
                          case 2 => u16(body, off)
                          case 4 => u32(body, off).toInt
                        }
                      }
                      require(pl.forall(_ > 0), "reduced grid has an empty row")
                      require(pl.sum.toLong == u32(body, 1),
                        s"points-per-row sum ${pl.sum} != declared data points ${u32(body, 1)}")
                      rowLengths = Some(pl)
                      ni = pl.max // row-major upper bound; cells resolve via rowLengths
                    } else {
                      ni = niRaw.toInt
                      rowLengths = None
                    }
                    la1 = sm(body, 41, 4) / 1e6; lo1 = sm(body, 45, 4) / 1e6
                    la2 = sm(body, 50, 4) / 1e6; lo2 = sm(body, 54, 4) / 1e6
                    // 0x20 = j-consecutive (transposed cell order); 0x10 =
                    // boustrophedon (alternate rows reversed) — both would
                    // silently misattribute cells if decoded i-consecutive
                    require((body(66) & 0x30) == 0,
                      s"scanning mode 0x${(body(66) & 0xFF).toHexString} unsupported " +
                        "(i-consecutive, uniform row direction only)")
                    // 3.1 = rotated lat/lon: 3.0's layout + the southern
                    // pole of projection and rotation angle (octets 73-84);
                    // la1..lo2 are then ROTATED coordinates
                    rot =
                      if (t == 1) Some(RotGrid(
                        spLat = sm(body, 67, 4) / 1e6,
                        spLon = sm(body, 71, 4) / 1e6,
                        angle = java.lang.Float.intBitsToFloat(u32(body, 75).toInt)
                          .toDouble))
                      else None
                    // 3.40 = regular Gaussian: octets 68-71 carry N
                    // (parallels pole→equator) where 3.0 carries Dj
                    gaussN = if (t == 40) Some(u32(body, 62).toInt) else None
                    lcc = None
                    psg = None
                    mrc = None
                  case 30 => // Lambert conformal (RTMA/HRRR/NDFD grids)
                    require(body.length >= 68,
                      s"grid template 3.30 section too short " +
                        s"(${body.length + 5} octets, need 73)")
                    val radius = (body(9) & 0xFF) match { // octet 15: shape
                      case 0 => 6367470.0
                      case 1 =>
                        val scale = body(10) & 0xFF
                        u32(body, 11).toDouble / math.pow(10.0, scale)
                      case 6 => 6371229.0
                      case s => throw new IllegalArgumentException(
                        s"earth shape $s unsupported (0, 1, 6)")
                    }
                    ni = u32(body, 25).toInt; nj = u32(body, 29).toInt
                    val gla1 = sm(body, 33, 4) / 1e6 // octets 39-42
                    val glo1 = sm(body, 37, 4) / 1e6 // octets 43-46
                    val latD = sm(body, 42, 4) / 1e6 // octets 48-51
                    val lov = sm(body, 46, 4) / 1e6 // octets 52-55
                    val dx = u32(body, 50).toDouble / 1e3 // mm → m
                    val dy = u32(body, 54).toDouble / 1e3
                    require((body(58) & 0x80) == 0, // octet 64
                      "south-pole-centred Lambert projection unsupported")
                    require((body(59) & 0xB0) == 0 && (body(59) & 0x40) != 0,
                      s"scanning mode 0x${(body(59) & 0xFF).toHexString} unsupported " +
                        "(+i, +j, i-consecutive only)")
                    val latin1 = sm(body, 60, 4) / 1e6 // octets 66-69
                    val latin2 = sm(body, 64, 4) / 1e6
                    la1 = gla1; lo1 = glo1
                    lcc = Some(LccGrid(gla1, glo1, lov, latin1, latin2, latD,
                      dx, dy, radius))
                    psg = None
                    mrc = None
                    rot = None
                    gaussN = None
                    rowLengths = None
                  case 10 => // Mercator (tropical regional archives)
                    require(body.length >= 67,
                      s"grid template 3.10 section too short " +
                        s"(${body.length + 5} octets, need 72)")
                    val radius = (body(9) & 0xFF) match { // octet 15: shape
                      case 0 => 6367470.0
                      case 1 =>
                        val scale = body(10) & 0xFF
                        u32(body, 11).toDouble / math.pow(10.0, scale)
                      case 6 => 6371229.0
                      case sh => throw new IllegalArgumentException(
                        s"earth shape $sh unsupported (0, 1, 6)")
                    }
                    ni = u32(body, 25).toInt; nj = u32(body, 29).toInt
                    val gla1 = sm(body, 33, 4) / 1e6 // octets 39-42
                    val glo1 = sm(body, 37, 4) / 1e6 // octets 43-46
                    val latTs = sm(body, 42, 4) / 1e6 // octets 48-51: LaD
                    la2 = sm(body, 46, 4) / 1e6 // octets 52-55
                    lo2 = sm(body, 50, 4) / 1e6 // octets 56-59
                    // octet 60: scanning mode (earlier than 3.20/3.30!).
                    // The projected walk goes +x/+y, so -i (0x80) would
                    // silently mirror longitudes — refuse it too.
                    require((body(54) & 0xB0) == 0 && (body(54) & 0x40) != 0,
                      s"scanning mode 0x${(body(54) & 0xFF).toHexString} unsupported " +
                        "(+i, +j, i-consecutive only)")
                    // octets 61-64: orientation (unused on the sphere)
                    val dx = u32(body, 59).toDouble / 1e3 // octets 65-68, mm
                    val dy = u32(body, 63).toDouble / 1e3 // octets 69-72
                    la1 = gla1; lo1 = glo1
                    mrc = Some(MercGrid(gla1, glo1, latTs, dx, dy, radius))
                    lcc = None
                    psg = None
                    rot = None
                    gaussN = None
                    rowLengths = None
                  case 20 => // polar stereographic (NCEP Alaska/sea-ice grids)
                    // octets 15-55 share 3.30's layout exactly (shape,
                    // dims, first point, LaD = true-scale latitude, LoV)
                    require(body.length >= 60,
                      s"grid template 3.20 section too short " +
                        s"(${body.length + 5} octets, need 65)")
                    val radius = (body(9) & 0xFF) match { // octet 15: shape
                      case 0 => 6367470.0
                      case 1 =>
                        val scale = body(10) & 0xFF
                        u32(body, 11).toDouble / math.pow(10.0, scale)
                      case 6 => 6371229.0
                      case sh => throw new IllegalArgumentException(
                        s"earth shape $sh unsupported (0, 1, 6)")
                    }
                    ni = u32(body, 25).toInt; nj = u32(body, 29).toInt
                    val gla1 = sm(body, 33, 4) / 1e6 // octets 39-42
                    val glo1 = sm(body, 37, 4) / 1e6 // octets 43-46
                    val latTs = sm(body, 42, 4) / 1e6 // octets 48-51: LaD
                    val lov = sm(body, 46, 4) / 1e6 // octets 52-55
                    val dx = u32(body, 50).toDouble / 1e3 // mm → m
                    val dy = u32(body, 54).toDouble / 1e3
                    // octet 64: projection centre flag (0x80 = south pole)
                    val south = (body(58) & 0x80) != 0
                    require((body(59) & 0xB0) == 0 && (body(59) & 0x40) != 0,
                      s"scanning mode 0x${(body(59) & 0xFF).toHexString} unsupported " +
                        "(+i, +j, i-consecutive only)")
                    la1 = gla1; lo1 = glo1
                    psg = Some(PsGrid(gla1, glo1, latTs, lov, dx, dy,
                      northPole = !south, radius = radius))
                    lcc = None
                    mrc = None
                    rot = None
                    gaussN = None
                    rowLengths = None
                  case 50 => // spherical harmonic coefficients (ERA5 spectral)
                    val j = u32(body, 9).toInt // octets 15-18
                    val k = u32(body, 13).toInt
                    val m = u32(body, 17).toInt
                    require(j == k && k == m,
                      s"pentagonal spectral truncation J=$j K=$k M=$m " +
                        "unsupported (triangular J=K=M only — the ECMWF form)")
                    val repType = body(21) & 0xFF // octet 27
                    val repMode = body(22) & 0xFF // octet 28
                    require(repType == 1,
                      s"spectral representation type $repType unsupported " +
                        "(1: associated Legendre functions)")
                    require(repMode == 1,
                      s"spectral representation mode $repMode unsupported " +
                        "(1: m-major complex ordering)")
                    val declared = u32(body, 1)
                    val expect = (m + 1).toLong * (m + 2)
                    require(declared == expect,
                      s"spectral section 3 declares $declared data points; " +
                        s"triangular M=$m holds $expect coefficient values")
                    spectralTrunc = Some(m)
                    ni = expect.toInt; nj = 1
                    lcc = None; psg = None; mrc = None; rot = None
                    gaussN = None
                    rowLengths = None
                  case t => throw new IllegalArgumentException(
                    s"grid template $t unsupported (3.0 lat/lon, 3.1 rotated, " +
                      "3.10 Mercator, 3.20 polar stereographic, 3.30 Lambert, " +
                      "3.40 Gaussian, 3.50 spectral)")
                }
              case 4 =>
                // 4.0 (analysis/forecast at a point), 4.8 (accumulation
                // over an interval) and their ensemble forms 4.1/4.11
                // (individual member) share the leading octets the scan
                // needs; 4.1/4.11 add the perturbation number at octet 36
                val tmpl = u16(body, 2)
                require(tmpl == 0 || tmpl == 1 || tmpl == 2 || tmpl == 5 ||
                    tmpl == 6 || tmpl == 8 || tmpl == 9 || tmpl == 10 ||
                    tmpl == 11 || tmpl == 12,
                  s"product template $tmpl unsupported " +
                    "(4.0, 4.1, 4.2, 4.5, 4.6, 4.8, 4.9, 4.10, 4.11, 4.12)")
                // discipline (section 0 octet 7) joins the parameter key:
                // (discipline, category, number) is the WMO identity —
                // soil moisture (2,0,x) must never alias a meteorological
                // (0,0,x) product. Discipline-0 params keep their
                // pre-existing 16-bit ids.
                paramId = (discipline << 16) |
                  ((body(4) & 0xFF) << 8) | (body(5) & 0xFF)
                timeUnit = body(12) & 0xFF
                forecast = sm(body, 13, 4)
                // octets 23-28: FIRST fixed surface (type, sign-magnitude
                // scale factor, scaled value) — the vertical axis. An ERA5
                // pressure-level file repeats (time, param) once per level;
                // without this parse those fields collide silently.
                levelType1 = body(17) & 0xFF
                level1 = {
                  val sf = body(18) & 0xFF
                  if (levelType1 == 255 || sf == 255 ||
                      u32(body, 19) == 0xFFFFFFFFL) Double.NaN
                  else {
                    val factor = (sf & 0x7F) * (if ((sf & 0x80) != 0) -1 else 1)
                    sm(body, 19, 4).toDouble / math.pow(10.0, factor)
                  }
                }
                // octets 29-34: SECOND fixed surface — layer products
                // (soil 0-10 cm, cloud layers). A second surface of a
                // DIFFERENT type can't ride one levelType column; refuse
                // it by name rather than half-key the layer.
                levelTo1 = {
                  val t2 = body(23) & 0xFF
                  val sf2 = body(24) & 0xFF
                  if (t2 == 255 || sf2 == 255 ||
                      u32(body, 25) == 0xFFFFFFFFL) Double.NaN
                  else {
                    require(t2 == levelType1,
                      s"second fixed surface type $t2 differs from the " +
                        s"first ($levelType1) — mixed-type layers " +
                        "unsupported")
                    val factor =
                      (sf2 & 0x7F) * (if ((sf2 & 0x80) != 0) -1 else 1)
                    sm(body, 25, 4).toDouble / math.pow(10.0, factor)
                  }
                }
                member = if (tmpl == 1 || tmpl == 11) body(30) & 0xFF else -1
                // 4.2/4.12 (derived ensemble — GEFS mean/spread archives):
                // octet 35 carries the table-4.7 statistic; no
                // perturbation number
                derived1 = if (tmpl == 2 || tmpl == 12) body(29) & 0xFF else -1
                // 4.5/4.9 (probability — the NBM shape): octet 37 carries
                // the table-4.9 probability type, octets 38-42/43-47 the
                // (scale factor, scaled value) lower/upper limits — the
                // thresholds ARE hypercube axes: one file carries PoP > 1
                // AND > 5 mm at one (ref, step)
                if (tmpl == 5 || tmpl == 9) {
                  require(body.length >= 42,
                    s"product template 4.$tmpl section too short " +
                      s"(${body.length + 5} octets) for the probability limits")
                  probType1 = body(31) & 0xFF
                  def limit(sfOff: Int, valOff: Int): Double = {
                    val sf = body(sfOff) & 0xFF
                    if (sf == 255 || u32(body, valOff) == 0xFFFFFFFFL) Double.NaN
                    else {
                      val factor = (sf & 0x7F) * (if ((sf & 0x80) != 0) -1 else 1)
                      sm(body, valOff, 4).toDouble / math.pow(10.0, factor)
                    }
                  }
                  probLo1 = limit(32, 33)
                  probHi1 = limit(37, 38)
                  require(!probLo1.isNaN || !probHi1.isNaN,
                    s"probability product 4.$tmpl carries neither a lower " +
                      "nor an upper limit")
                } else { probType1 = -1; probLo1 = Double.NaN; probHi1 = Double.NaN }
                // 4.6/4.10 (percentile): octet 35 is the percentile 0-100
                percentile1 =
                  if (tmpl == 6 || tmpl == 10) body(29) & 0xFF else -1
                // 4.8/4.11/4.12/4.9/4.10: time of END of the overall
                // interval — octets 35-41 (4.8) / 38-44 (4.11, after the
                // ensemble octets) / 37-43 (4.12, after the derived
                // octets) / 48-54 (4.9, after the probability octets) /
                // 36-42 (4.10, after the percentile octet)
                intervalEnd =
                  if (tmpl == 8 || tmpl == 9 || tmpl == 10 || tmpl == 11 ||
                      tmpl == 12) {
                    val o = tmpl match {
                      case 9 => 42
                      case 10 => 30
                      case 11 => 32
                      case 12 => 31
                      case _ => 29
                    }
                    require(body.length >= o + 7,
                      s"product template 4.$tmpl section too short " +
                        s"(${body.length + 5} octets) for the interval-end time")
                    java.time.LocalDateTime.of(u16(body, o),
                      body(o + 2) & 0xFF, body(o + 3) & 0xFF,
                      body(o + 4) & 0xFF, body(o + 5) & 0xFF,
                      body(o + 6) & 0xFF)
                  } else null
              case 5 =>
                seenRepr = true
                refValue = java.lang.Float.intBitsToFloat(u32(body, 6).toInt).toDouble
                binaryScale = sm(body, 10, 2)
                decimalScale = sm(body, 12, 2)
                bits = body(14) & 0xFF
                spectralPacking = None // a later field may repack on a grid
                u16(body, 4) match {
                  case 50 => // spectral data — simple packing
                    require(body.length >= 20,
                      s"template 5.50 section carries ${body.length + 5} octets (25 needed)")
                    complex = None; png = false; jpeg = false; ccsds = None
                    spectralPacking = Some(SpectralSimple(
                      java.lang.Float.intBitsToFloat(u32(body, 16).toInt).toDouble))
                  case 51 =>
                    // spectral data — COMPLEX packing, the native ECMWF
                    // archive form: 5.0's 21-octet prefix, then the signed
                    // Laplacian scaling factor in 10^-6 units (octets
                    // 22-25), the sub-truncation Js/Ks/Ms (26-31), Ts
                    // (32-35), and the unpacked-subset precision (36,
                    // code table 5.7) — NCEP template tables
                    require(body.length >= 31,
                      s"template 5.51 section carries ${body.length + 5} octets (36 needed)")
                    complex = None; png = false; jpeg = false; ccsds = None
                    val lap = sm(body, 16, 4) / 1e6
                    val js = u16(body, 20); val ks = u16(body, 22)
                    val ms = u16(body, 24)
                    require(js == ks && ks == ms,
                      s"pentagonal spectral sub-truncation Js=$js Ks=$ks " +
                        s"Ms=$ms unsupported (triangular Js=Ks=Ms only)")
                    val ts = u32(body, 26)
                    val expectTs = (js + 1).toLong * (js + 2)
                    require(ts == expectTs,
                      s"template 5.51 declares Ts=$ts unpacked values; " +
                        s"triangular sub-truncation $js holds $expectTs")
                    val precBytes = (body(30) & 0xFF) match {
                      case 1 => 4
                      case 2 => 8
                      case other => throw new IllegalArgumentException(
                        s"unpacked-subset precision $other unsupported " +
                          "(code table 5.7: 1 = IEEE32, 2 = IEEE64)")
                    }
                    spectralPacking = Some(SpectralComplex(lap, js, precBytes))
                  case 0 =>
                    require((body(15) & 0xFF) == 0,
                      s"field type ${body(15)} unsupported (only 0: floating point)")
                    complex = None // a later field may revert to simple packing
                    png = false
                    jpeg = false
                    ccsds = None
                  case 41 => // PNG packing — 5.0's 21-octet layout + a raster body
                    require((body(15) & 0xFF) == 0,
                      s"field type ${body(15)} unsupported (only 0: floating point)")
                    complex = None
                    png = true
                    jpeg = false
                    ccsds = None
                  case 42 => // CCSDS/AEC (Rice) — 5.0's layout + flags/block/RSI
                    require((body(15) & 0xFF) == 0,
                      s"field type ${body(15)} unsupported (only 0: floating point)")
                    complex = None
                    png = false
                    jpeg = false
                    ccsds = Some(Ccsds.Params(
                      flags = body(16) & 0xFF,
                      blockSize = body(17) & 0xFF,
                      rsi = u16(body, 18)))
                  case 40 => // JPEG 2000 — 5.0's layout + compression type/ratio
                    require(body.length >= 18,
                      s"template 5.40 section carries ${body.length + 5} " +
                        "octets (23 needed)")
                    require((body(15) & 0xFF) == 0,
                      s"field type ${body(15)} unsupported (only 0: floating point)")
                    require((body(16) & 0xFF) == 0,
                      s"JPEG 2000 compression type ${body(16) & 0xFF} unsupported " +
                        "(0: lossless 5/3 only — lossy 9/7 streams are out of scope)")
                    complex = None
                    png = false
                    jpeg = true
                    ccsds = None
                  case t @ (2 | 3) => // complex packing (5.2) / + spatial differencing (5.3)
                    png = false
                    jpeg = false
                    ccsds = None
                    require((body(16) & 0xFF) == 1,
                      s"group splitting method ${body(16)} unsupported (1: general)")
                    require((body(17) & 0xFF) == 0,
                      s"missing-value management ${body(17)} unsupported (0: none — " +
                        "missing cells travel in the bitmap)")
                    val (order, descBytes) =
                      if (t == 2) (0, 0)
                      else ((body(42) & 0xFF, body(43) & 0xFF): @unchecked) match {
                        case (o, db) =>
                          require(o == 1 || o == 2,
                            s"spatial differencing order $o unsupported (1, 2)")
                          require(db >= 1 && db <= 4,
                            s"spatial-differencing descriptor width $db octets (1-4)")
                          (o, db)
                      }
                    complex = Some(ComplexParams(
                      ng = u32(body, 26).toInt,
                      widthRef = body(30) & 0xFF,
                      widthBits = body(31) & 0xFF,
                      lengthRef = u32(body, 32),
                      lengthInc = body(36) & 0xFF,
                      lastLength = u32(body, 37),
                      lengthBits = body(41) & 0xFF,
                      spatialOrder = order,
                      spatialDescBytes = descBytes))
                  case t => throw new IllegalArgumentException(
                    s"data representation template $t unsupported " +
                      "(5.0, 5.2, 5.3, 5.40, 5.41, 5.42, 5.50, 5.51)")
                }
              case n => throw new IllegalArgumentException(s"Unexpected GRIB2 section $n")
            }
          }
        }
      }
      require(offset - msgStart == total,
        s"GRIB2 message length mismatch: read ${offset - msgStart}, declared $total")
      require(fields.nonEmpty,
        "GRIB2 message missing a required section (1, 3, 4, 5 and 7 all needed)")
      fields.toSeq
    }
    while (true) {
      // IS or EOF
      val head = new Array[Byte](8)
      var got = 0
      var eof = false
      while (got < 8 && !eof) {
        val r = in.read(head, got, 8 - got)
        if (r < 0) { eof = true } else got += r
      }
      if (eof) {
        require(got == 0, s"Trailing ${got} bytes at offset $offset")
        return dupGuard(out.toSeq)
      }
      val msgStart = offset
      offset += 8
      require(new String(head, 0, 4, "US-ASCII") == "GRIB", "Bad GRIB magic")
      if (head(7) == 2) {
        out ++= parseEdition2(msgStart, discipline = head(6) & 0xFF)
      } else {
      val total = u24(head, 4)
      require(head(7) == 1, s"Only GRIB editions 1 and 2 supported, got ${head(7)}")
      // PDS
      val pdsLenB = readN(3)
      val pdsLen = u24(pdsLenB, 0)
      val pds = readN(pdsLen - 3)
      val flags = pds(4) & 0xFF
      require((flags & 0x80) != 0, "GDS-less messages unsupported")
      val hasBms = (flags & 0x40) != 0
      val paramId = pds(5) & 0xFF
      // PDS octets 10-12: level indicator (table 3) + height/pressure
      // value — the edition-1 vertical axis (multi-level files repeat
      // (time, param) once per level)
      val g1LevelType = (pds(6) & 0xFF) match {
        case 0 => 255 // table 3 reserves 0 — normalize to the missing code
        case t => t
      }
      // table 3 LAYER types carry (top, bottom) as two one-octet values
      // in octets 11-12; point types carry one u16 value
      val G1LayerTypes = Set(101, 104, 106, 108, 110, 112, 114, 116, 120,
        121, 128, 141)
      val g1IsLayer = G1LayerTypes.contains(g1LevelType)
      val g1LevelRaw =
        if (g1LevelType == 255) Double.NaN
        else if (g1IsLayer) (pds(7) & 0xFF).toDouble
        else u16(pds, 7).toDouble
      val g1LevelToRaw =
        if (g1IsLayer) (pds(8) & 0xFF).toDouble else Double.NaN
      val (g1NormType, g1Level, g1LevelTo) =
        g1Grib2Level(g1LevelType, g1LevelRaw, g1LevelToRaw)
      val century = pds(21) & 0xFF
      val year = (century - 1) * 100 + (pds(9) & 0xFF)
      val refTime0 = java.time.LocalDateTime.of(year, pds(10) & 0xFF,
        pds(11) & 0xFF, pds(12) & 0xFF, pds(13) & 0xFF)
      // forecast messages carry their lead in P1/P2 (octets 19-20) in the
      // PDS time unit (octet 18), keyed by the time range indicator
      // (octet 21, table 5): 0 = valid at ref+P1; 1 = initialized
      // analysis (valid at ref); 4 = accumulation over [ref+P1, ref+P2]
      // valid at the interval END (matching the edition-2 template-4.8
      // convention above); 10 = P1 spans both octets (long-lead
      // reanalysis). Statistical indicators this scan can't key
      // (averages 3/113+, climatology) fail loudly, like the other
      // unsupported-subset conditions.
      val timeUnit = pds(14) & 0xFF
      val p1 = pds(15) & 0xFF
      val p2 = pds(16) & 0xFF
      val rangeIndicator = pds(17) & 0xFF
      val leadUnits: Long = rangeIndicator match {
        case 0 => p1.toLong
        case 1 => 0L
        case 4 => p2.toLong // the valid time IS the accumulation end
        case 10 => ((p1 << 8) | p2).toLong
        case r => throw new IllegalArgumentException(
          s"time range indicator $r unsupported (0: forecast at ref+P1, " +
            "1: initialized analysis, 4: accumulation valid at ref+P2, " +
            "10: 16-bit P1)")
      }
      val g1StepMin: Long = unitMinutes(timeUnit, leadUnits,
        secondsCode = 254, edition = "GRIB1 PDS", label = "forecast lead")
      val refTime = refTime0.plusMinutes(g1StepMin)
      // TRI 4: P1 is the interval START in the same unit
      val g1StepStartMin: Long =
        if (rangeIndicator != 4) Long.MinValue
        else unitMinutes(timeUnit, p1.toLong, secondsCode = 254,
          edition = "GRIB1 PDS", label = "interval start (P1)")
      val decimalScale = sm(pds, 23, 2)
      // GDS
      val gdsLenB = readN(3)
      val gdsLen = u24(gdsLenB, 0)
      val gds = readN(gdsLen - 3)
      val gridType = gds(2) & 0xFF
      require(gridType == 0 || gridType == 4,
        s"Grid type $gridType unsupported (0: lat/lon, 4: Gaussian)")
      val niRaw = u16(gds, 3); val nj = u16(gds, 5)
      val la1 = sm(gds, 7, 3) / 1000.0; val lo1 = sm(gds, 10, 3) / 1000.0
      val la2 = sm(gds, 14, 3) / 1000.0; val lo2 = sm(gds, 17, 3) / 1000.0
      // Gaussian grid (type 4): the Dj slot (octets 26-27) carries N —
      // the ERA5 GRIB1-native family; reduced rows ride the PL list
      val g1GaussN = if (gridType == 4) Some(u16(gds, 22)) else None
      val g1Rows: Option[Array[Int]] =
        if (niRaw != 0xFFFF) None
        else {
          val nv = gds(0) & 0xFF
          val pv = gds(1) & 0xFF
          require(pv != 255,
            "ni is MISSING but the GDS carries no PL points-per-row list")
          // PL starts at GDS octet PV + 4·NV (vertical coords precede it);
          // gds(i) is GDS octet i+4
          val start = pv + 4 * nv - 4
          require(gds.length >= start + 2 * nj,
            s"GDS too short for $nj PL entries at octet ${pv + 4 * nv}")
          val pl = Array.tabulate(nj)(r => u16(gds, start + 2 * r))
          require(pl.forall(_ > 0), "reduced grid has an empty row")
          Some(pl)
        }
      val ni = g1Rows.map(_.max).getOrElse(niRaw)
      // scanning mode (octet 28): ±i/±j direction is captured by the
      // la1→la2 / lo1→lo2 interpolation, but the j-CONSECUTIVE bit (0x20)
      // transposes the cell order — decoding it as i-consecutive would
      // silently swap lat/lon attribution, so refuse it
      require((gds(24) & 0x20) == 0,
        "j-consecutive scanning mode (0x20) unsupported (i-consecutive only)")
      // BMS: length(3) unused-bits(1) table-ref(2) then the bitmap bits
      var bitmapOffset = -1L
      var bitmapBytes = 0
      if (hasBms) {
        val bmsLenB = readN(3)
        val bmsLen = u24(bmsLenB, 0)
        val bmsHead = readN(3) // unused bits + table reference
        require(u16(bmsHead, 1) == 0,
          s"predefined bitmap ${u16(bmsHead, 1)} unsupported (inline bitmaps only)")
        bitmapOffset = offset
        bitmapBytes = bmsLen - 6
        skipN(bitmapBytes.toLong)
      }
      // BDS
      val bdsLenB = readN(3)
      val bdsLen = u24(bdsLenB, 0)
      val bdsHead = readN(8)
      require((bdsHead(0) & 0xF0) == 0, "Only simple grid-point packing supported")
      val binaryScale = sm(bdsHead, 1, 2)
      val refValue = ibmToDouble(
        ((bdsHead(3) & 0xFF) << 24) | ((bdsHead(4) & 0xFF) << 16) |
          ((bdsHead(5) & 0xFF) << 8) | (bdsHead(6) & 0xFF))
      val bits = bdsHead(7) & 0xFF
      val dataOffset = offset
      val dataBytes = bdsLen - 11
      // skip the packed data + the 4-byte end section
      skipN(dataBytes.toLong + 4)
      require(offset - msgStart == total,
        s"Message length mismatch: read ${offset - msgStart}, declared $total")
      out += GribMessage(paramId, refTime, ni, nj, la1, lo1, la2, lo2,
        decimalScale, binaryScale, refValue, bits, dataOffset, dataBytes, total,
        bitmapOffset, bitmapBytes, gaussN = g1GaussN, rowLengths = g1Rows,
        levelType = g1NormType, level = g1Level, levelTo = g1LevelTo,
        baseTime = refTime0, stepMinutes = g1StepMin,
        stepStartMinutes = g1StepStartMin)
      } // end edition-1 branch
    }
    dupGuard(out.toSeq)
  }


  /** GRIB1 table-3 level → GRIB2 table-4.5 convention, ecCodes-style,
    * so the (level_type, level, level_to) axis is CROSS-EDITION uniform:
    * without this a level filter or a store mixing editions silently
    * matches nothing (850 hPa vs 85000 Pa) or mis-keys on diverging
    * numeric codes (GRIB1 105 "height above ground" vs GRIB2 103).
    * Point types whose code AND unit already agree pass through (1-9,
    * 160, the 200+ local-use block); the unit-divergent rows convert to
    * the GRIB2 SI convention (isobaric hPa→Pa, depths cm→m, altitude
    * layers hm→m, scaled sigma/eta fractions) and layer codes collapse
    * onto their GRIB2 point-type code with the bounds in (level,
    * level_to) — the same shape edition-2 layers (two fixed surfaces)
    * scan to above. High-precision layer encodings (121/128/141) decode
    * their offset-coded octets before converting. */
  private[grib] def g1Grib2Level(t: Int, v: Double, vTo: Double)
      : (Int, Double, Double) = t match {
    case 255 => (255, Double.NaN, Double.NaN)
    case 20  => (20, v / 100.0, Double.NaN)             // isothermal 1/100 K → K
    case 100 => (100, v * 100.0, Double.NaN)            // isobaric hPa → Pa
    case 101 => (100, v * 1000.0, vTo * 1000.0)         // layer, kPa → Pa
    case 102 => (101, v, Double.NaN)                    // mean sea level
    case 103 => (102, v, Double.NaN)                    // altitude above MSL, m
    case 104 => (102, v * 100.0, vTo * 100.0)           // layer, hm → m
    case 105 => (103, v, Double.NaN)                    // height above ground, m
    case 106 => (103, v * 100.0, vTo * 100.0)           // layer, hm → m
    case 107 => (104, v / 10000.0, Double.NaN)          // sigma /10000
    case 108 => (104, v / 100.0, vTo / 100.0)           // layer sigma /100
    case 109 => (105, v, Double.NaN)                    // hybrid level number
    case 110 => (105, v, vTo)                           // layer hybrid
    case 111 => (106, v / 100.0, Double.NaN)            // depth below land cm → m
    case 112 => (106, v / 100.0, vTo / 100.0)           // layer depths cm → m
    case 113 => (107, v, Double.NaN)                    // isentropic K
    case 114 => (107, 475.0 - v, 475.0 - vTo)           // layer, 475 K − value
    case 115 => (108, v * 100.0, Double.NaN)            // press diff hPa → Pa
    case 116 => (108, v * 100.0, vTo * 100.0)           // layer press diff
    case 117 => (109, v * 1e-9, Double.NaN)             // PV 10⁻⁹ K m²/(kg s)
    case 119 => (111, v / 10000.0, Double.NaN)          // eta /10000
    case 120 => (111, v / 100.0, vTo / 100.0)           // layer eta /100
    case 121 => (100, (1100.0 - v) * 100.0, (1100.0 - vTo) * 100.0) // 1100−hPa
    case 125 => (103, v / 100.0, Double.NaN)            // height cm → m
    case 128 => (104, 1.1 - v / 1000.0, 1.1 - vTo / 1000.0) // 1.1 − v/1000
    case 141 => (100, v * 1000.0, (1100.0 - vTo) * 100.0) // top kPa, bot 1100−hPa
    case other => (other, v, vTo)                       // code+unit shared
  }

  /** ONE unit-to-minutes table for BOTH editions' PDS/PDT time units
    * (identical multipliers; only the seconds code differs — GRIB2
    * table 4.4 uses 13, GRIB1 table 4 uses 254). `label` names the value
    * in diagnostics (lead vs interval start) so a refusal points at the
    * right octet. Sub-minute values refuse rather than truncate. */
  private[grib] def unitMinutes(unit: Int, n: Long, secondsCode: Int,
      edition: String, label: String): Long = unit match {
    case 0 => n
    case 1 => n * 60
    case 2 => n * 1440
    case 10 => n * 180
    case 11 => n * 360
    case 12 => n * 720
    case u if u == secondsCode => // the time axis is minute-resolved
      require(n % 60 == 0,
        s"sub-minute $label (${n} s) unsupported: the time axis is " +
          "minute-resolved")
      n / 60
    case u => throw new IllegalArgumentException(
      s"$edition time unit $u unsupported " +
        s"(0=min, 1=hour, 2=day, 10/11/12=3/6/12h, $secondsCode=s)")
  }

  /** Refuse a file whose fields collide on the FULL hypercube key
    * (refTime, step, param, member, levelType, level): such fields would
    * scan into silently colliding duplicate cells — the one failure mode
    * worse than a refusal. A multi-LEVEL file is fine (the level axis
    * keeps the key distinct), and so are two reference times whose valid
    * times overlap (forecast archives — the (refTime, step) pair keys
    * them); a genuinely duplicated field is not. The reference sidesteps
    * this by selecting one hypercube per scan
    * (`scan_grib(filter)[scan_indices]`, transform.py:214-219). */
  private def dupGuard(ms: Seq[GribMessage]): Seq[GribMessage] = {
    val dups = ms.groupBy(m => (m.baseTime, (m.stepMinutes, m.stepStartMinutes), m.paramId,
        m.member, m.derived, m.levelType,
        (java.lang.Double.doubleToLongBits(m.level),
          java.lang.Double.doubleToLongBits(m.levelTo)),
        // probability/percentile axes: two thresholds of one param at one
        // (ref, step) are DISTINCT hypercubes (the NBM file shape)
        (m.probType, java.lang.Double.doubleToLongBits(m.probLo),
          java.lang.Double.doubleToLongBits(m.probHi), m.percentile),
        m.spectral.isDefined))
      .filter(_._2.lengthCompare(1) > 0)
    if (dups.nonEmpty) {
      val key = dups.keys.minBy(_.toString)
      val (t, (step, _), p, mem, drv, lt, (lv, _), _, _) = key
      throw new IllegalArgumentException(
        s"GRIB file carries ${dups.size} duplicated field key(s): e.g. " +
          s"${dups(key).length} fields share (refTime=$t, " +
          s"step=${step}min, param=$p, " +
          s"member=${if (mem < 0) "none" else mem}, " +
          s"derived=${if (drv < 0) "none" else drv}, " +
          s"levelType=${if (lt == 255) "none" else lt}, " +
          s"level=${java.lang.Double.longBitsToDouble(lv)}) — cells would " +
          "silently collide. Split the file or fix the producer")
    }
    ms
  }

  /** Convenience: write messages to a Hadoop-visible path in the given
    * edition (1 or 2). */
  def writeFile(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      messages: Seq[(Int, java.time.LocalDateTime, Seq[Double], Seq[Double], Array[Double])],
      decimalScale: Int = 0,
      edition: Int = 1,
      complexPacking: Boolean = false,
      spatialDiffOrder: Int = 0,
      pngPacking: Boolean = false,
      ccsdsPacking: Boolean = false,
      jpegPacking: Boolean = false,
      rotatedPole: Option[(Double, Double, Double)] = None,
      gaussianN: Option[Int] = None,
      reducedRows: Option[Seq[Int]] = None): Unit = {
    require(edition == 1 || edition == 2, s"edition $edition not in {1, 2}")
    require(rotatedPole.isEmpty || edition == 2, "rotated grids are edition-2 only")
    require(!complexPacking || edition == 2, "complex packing is edition-2 only")
    require(!pngPacking || edition == 2, "PNG packing is edition-2 only")
    require(!ccsdsPacking || edition == 2, "CCSDS packing is edition-2 only")
    require(!jpegPacking || edition == 2, "JPEG 2000 packing is edition-2 only")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new DataOutputStream(new java.io.BufferedOutputStream(
      fs.create(new org.apache.hadoop.fs.Path(path), true)))
    try messages.foreach { case (param, t, lats, lons, vals) =>
      if (edition == 1) writeMessage(out, param, t, lats, lons, vals, decimalScale,
        gaussianN = gaussianN, reducedRows = reducedRows)
      else writeMessage2(out, param, t, lats, lons, vals, decimalScale,
        complexPacking = complexPacking, spatialDiffOrder = spatialDiffOrder,
        pngPacking = pngPacking, ccsdsPacking = ccsdsPacking,
        jpegPacking = jpegPacking,
        rotatedPole = rotatedPole, gaussianN = gaussianN,
        reducedRows = reducedRows)
    }
    finally out.close()
  }
}
