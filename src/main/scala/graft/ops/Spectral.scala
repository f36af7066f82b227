package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spectral → grid synthesis: the inverse spherical-harmonic transform
  * that turns the `grib-spectral` scan's coefficient rows (templates
  * 3.50 + 5.50/5.51, e.g. ERA5 model-level fields) into lat/lon values —
  * the in-engine form of the "regrid first" workflow the spectral scan
  * documents.
  *
  * Convention (pinned here and in SpectralSpec; self-consistent with the
  * quadrature analysis in the spec):
  *
  *   f(φ, λ) = Σ_{m=0..T} Σ_{n=m..T} \bar P_nm(sin φ) ·
  *             (re_nm · cos mλ + im_nm · sin mλ)
  *
  * with FULLY NORMALIZED associated Legendre functions from the standard
  * stable recurrences (Holmes & Featherstone 2002, the geodesy forms):
  *
  *   \bar P_00 = 1
  *   \bar P_mm = √((2m+1)/(2m)) · cos φ · \bar P_{m−1,m−1}
  *   \bar P_{m+1,m} = √(2m+3) · sin φ · \bar P_mm
  *   \bar P_nm = α_nm sin φ \bar P_{n−1,m} − β_nm \bar P_{n−2,m}
  *     α_nm = √((2n−1)(2n+1) / ((n−m)(n+m)))
  *     β_nm = √((2n+1)(n+m−1)(n−m−1) / ((n−m)(n+m)(2n−3)))
  *
  * Under this normalization ∫∫ (\bar P_nm cos mλ)² dΩ = 4π/(2−δ_m0) —
  * what the spec's Gauss–Legendre analysis roundtrip relies on. Mapping
  * from ECMWF's complex C_nm: re = (2−δ_m0)·Re(C_nm), im = −(2−δ_m0)·
  * Im(C_nm) (the usual real-form fold of e^{imλ} + conjugate).
  *
  * Scale shape — the classic pseudo-spectral transform, Spark-first:
  * coefficients reshape to ONE dense array per key (a T=639 field is
  * ~3 MB — a row, never a driver structure); the Legendre table is
  * computed once per (key, latitude) and SHARED by every longitude on
  * that parallel (the m-spectra G_m(φ)); grid rows are emitted straight
  * from `mapPartitions` and never shuffle. Work is O(T²) per latitude +
  * O(T) per cell, partitioned by key — the textbook cost of synthesis.
  */
object Spectral {

  /** Fully normalized \bar P_nm(sin φ) for all 0 ≤ m ≤ n ≤ T, indexed in
    * the m-major pair order the `grib-spectral` scan emits. */
  private[ops] def legendreTable(trunc: Int, sinPhi: Double): Array[Double] = {
    val cosPhi = math.sqrt(math.max(0.0, 1.0 - sinPhi * sinPhi))
    val nPairs = (trunc + 1) * (trunc + 2) / 2
    val out = new Array[Double](nPairs)
    var base = 0 // index of (m, m) in m-major order
    var pmm = 1.0
    var m = 0
    while (m <= trunc) {
      if (m > 0) pmm *= math.sqrt((2.0 * m + 1) / (2.0 * m)) * cosPhi
      out(base) = pmm
      if (m < trunc) {
        var pPrev2 = pmm
        var pPrev1 = math.sqrt(2.0 * m + 3) * sinPhi * pmm
        out(base + 1) = pPrev1
        var n = m + 2
        while (n <= trunc) {
          val alpha = math.sqrt((2.0 * n - 1) * (2.0 * n + 1) /
            ((n - m).toDouble * (n + m)))
          val beta = math.sqrt((2.0 * n + 1) * (n + m - 1.0) * (n - m - 1.0) /
            ((n - m).toDouble * (n + m) * (2.0 * n - 3)))
          val p = alpha * sinPhi * pPrev1 - beta * pPrev2
          out(base + (n - m)) = p
          pPrev2 = pPrev1; pPrev1 = p
          n += 1
        }
      }
      base += trunc - m + 1
      m += 1
    }
    out
  }

  /** Synthesize a lat/lon grid from coefficient rows (`m`, `n`, `part`
    * ∈ 're'|'im', `value`) — the `grib-spectral` scan's row model —
    * grouped by `keyCols` (typically the time column). The truncation is
    * inferred per key (max n); missing coefficients are zero. Output:
    * keyCols ++ (latitude, longitude, value). */
  def synthesize(
      coeffs: DataFrame,
      keyCols: Seq[String],
      lats: Seq[Double],
      lons: Seq[Double]): DataFrame = {
    require(keyCols.nonEmpty, "synthesize needs at least one key column")
    val keyFields = keyCols.map(c => coeffs.schema(c))
    val outSchema = StructType(keyFields ++ Seq(
      StructField("latitude", DoubleType, nullable = false),
      StructField("longitude", DoubleType, nullable = false),
      StructField("value", DoubleType, nullable = false)))
    val packed = coeffs.groupBy(keyCols.map(col): _*)
      .agg(collect_list(struct(
        col("m").cast(IntegerType).as("m"),
        col("n").cast(IntegerType).as("n"),
        col("part"),
        col("value").cast(DoubleType).as("value"))).as("__c"))
    val latArr = lats.toArray
    val lonRad = lons.toArray.map(math.toRadians)
    val lonDeg = lons.toArray
    val nKeys = keyCols.length
    packed.mapPartitions { rows =>
      rows.flatMap { row =>
        val entries = row.getSeq[Row](nKeys)
        val trunc = entries.iterator.map(_.getInt(1)).foldLeft(0)(math.max)
        val nPairs = (trunc + 1) * (trunc + 2) / 2
        val re = new Array[Double](nPairs)
        val im = new Array[Double](nPairs)
        val seen = new java.util.BitSet(2 * nPairs)
        // m-major pair index of (m, n): rows before m sum to
        // m·(2T+3−m)/2, then offset n−m
        def pairIdx(m: Int, n: Int): Int =
          m * (2 * trunc + 3 - m) / 2 + (n - m)
        entries.foreach { e =>
          val m = e.getInt(0); val n = e.getInt(1)
          require(m >= 0 && m <= n && n <= trunc, s"coefficient ($m,$n)")
          val isIm = e.getString(2) == "im"
          val p = pairIdx(m, n)
          val slot = if (isIm) nPairs + p else p
          // A repeated (m, n, part) under one key means the key columns
          // don't separate the input (e.g. two params or ensemble members
          // grouped together) — summing their coefficients would silently
          // blend fields, so refuse by name instead.
          if (seen.get(slot)) throw new IllegalArgumentException(
            s"duplicate spectral coefficient (m=$m, n=$n, " +
              s"part=${e.getString(2)}) under key ${(0 until nKeys)
                .map(row.get).mkString("(", ", ", ")")}: the key columns " +
              s"$keyCols do not uniquely identify one field — include the " +
              "distinguishing columns (e.g. param, member) in keyCols or " +
              "filter the scan to one field")
          seen.set(slot)
          if (isIm) im(p) = e.getDouble(3) else re(p) = e.getDouble(3)
        }
        val key = (0 until nKeys).map(row.get)
        latArr.iterator.flatMap { lat =>
          val tbl = legendreTable(trunc, math.sin(math.toRadians(lat)))
          // m-spectra on this parallel: G_m = Σ_n \bar P_nm · c_nm
          val gRe = new Array[Double](trunc + 1)
          val gIm = new Array[Double](trunc + 1)
          var m = 0
          var base = 0
          while (m <= trunc) {
            var accRe = 0.0; var accIm = 0.0
            var j = 0
            while (j <= trunc - m) {
              accRe += tbl(base + j) * re(base + j)
              accIm += tbl(base + j) * im(base + j)
              j += 1
            }
            gRe(m) = accRe; gIm(m) = accIm
            base += trunc - m + 1
            m += 1
          }
          lonDeg.indices.iterator.map { li =>
            val lam = lonRad(li)
            var v = 0.0
            var mm = 0
            while (mm <= trunc) {
              v += gRe(mm) * math.cos(mm * lam) + gIm(mm) * math.sin(mm * lam)
              mm += 1
            }
            Row.fromSeq(key ++ Seq(lat, lonDeg(li), v))
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Synthesize SEVERAL parameters from one coefficient scan into one
    * grid frame with a column per variable — the multi-param MARS-request
    * shape (a single ERA5 request routinely returns several params in one
    * file; reference manifest behavior: one data variable per requested
    * param). `param` rides in the synthesis KEY, so fields can never
    * blend (and [[synthesize]]'s duplicate-coefficient refusal remains
    * the backstop); a bounded pivot (values known up front — no extra
    * distinct pass) then folds the per-param rows into per-variable
    * columns. One shuffle keyed on (key, cell), O(params) columns.
    * Output: keyCols ++ (latitude, longitude) ++ paramVars.values. */
  def synthesizeVars(
      coeffs: DataFrame,
      keyCols: Seq[String],
      /** paramId → output variable name, e.g. Map(130 -> "t", 131 -> "u"). */
      paramVars: Map[Int, String],
      lats: Seq[Double],
      lons: Seq[Double]): DataFrame = {
    require(paramVars.nonEmpty, "synthesizeVars needs at least one param")
    require(paramVars.values.toSet.size == paramVars.size,
      s"duplicate variable names in $paramVars")
    val params = paramVars.keys.toSeq.sorted
    // the In predicate prunes whole messages at planning in the scan
    val one = synthesize(
      coeffs.filter(col("param").isin(params.map(p => p: Any): _*)),
      keyCols :+ "param", lats, lons)
    val grouped = one
      .groupBy((keyCols ++ Seq("latitude", "longitude")).map(col): _*)
      .pivot("param", params.map(p => p: Any))
      .agg(first(col("value")))
    params.foldLeft(grouped)((df, p) =>
      df.withColumnRenamed(p.toString, paramVars(p)))
  }
}
