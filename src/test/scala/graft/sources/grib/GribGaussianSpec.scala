package graft.sources.grib

import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** GRIB2 grid template 3.40 — regular Gaussian grids, the ECMWF/ERA5
  * native family: row latitudes are Gaussian parallels (Legendre roots),
  * NOT evenly spaced; the scan must emit them exactly. Reduced
  * (quasi-regular) grids are refused by name. */
class GribGaussianSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  test("gaussianLatitudes: known roots, symmetry, ordering, Legendre zero residual") {
    // N=1 → P₂ roots ±1/√3 → ±35.26438968…°
    val n1 = GribFormat.gaussianLatitudes(1)
    assert(n1.length == 2)
    assert(math.abs(n1(0) - 35.264389682754654) < 1e-9)
    assert(math.abs(n1(1) + 35.264389682754654) < 1e-9)
    // N=16: 32 parallels, strictly descending, antisymmetric
    val n16 = GribFormat.gaussianLatitudes(16)
    assert(n16.length == 32)
    assert(n16.sliding(2).forall(p => p(0) > p(1)))
    n16.indices.foreach(i => assert(math.abs(n16(i) + n16(31 - i)) < 1e-9))
    // every latitude is a root of P₃₂ (residual at double precision)
    n16.foreach { latDeg =>
      val x = math.sin(math.toRadians(latDeg))
      var p0 = 1.0; var p1 = x
      (2 to 32).foreach { k => val p2 = ((2 * k - 1) * x * p1 - (k - 1) * p0) / k
        p0 = p1; p1 = p2 }
      assert(math.abs(p1) < 1e-12, s"P32($latDeg°) = $p1")
    }
    // ECMWF F32 sanity: first parallel of N=32 is ~87.8638°
    assert(math.abs(GribFormat.gaussianLatitudes(32)(0) - 87.8638) < 1e-3)
  }

  test("template 3.40 full-globe file: scan emits the Gaussian parallels, values exact") {
    val dir = Files.createTempDirectory("gribgauss").toString
    val glats = GribFormat.gaussianLatitudes(2).toSeq // 4 parallels, N→S
    val lons = Seq(0.0, 90.0, 180.0, 270.0)
    val vals = Array.tabulate(16)(i => i * 1.5)
    GribFormat.writeFile(spark, s"$dir/g.grb2", Seq(
      (61, LocalDateTime.of(2024, 8, 1, 0, 0), glats, lons, vals)),
      decimalScale = 1, edition = 2, gaussianN = Some(2))
    val df = spark.read.format("grib1").load(s"$dir/g.grb2")
    assert(df.count() == 16)
    val gotLats = df.select("latitude").distinct()
      .orderBy(col("latitude").desc).as[Double].collect().toSeq
    gotLats.zip(glats).foreach { case (g, e) => assert(math.abs(g - e) < 1e-5, s"$g vs $e") }
    // values land on the right (gaussian-lat, lon) cells
    val v = df.filter(col("longitude") === 90.0)
      .orderBy(col("latitude").desc).select("value").as[Double].collect().toSeq
    assert(v == Seq(1.5, 7.5, 13.5, 19.5)) // vals(j*4 + 1), rows north→south
  }

  test("template 3.40 subset grid (contiguous parallel band) resolves its rows") {
    val dir = Files.createTempDirectory("gribgauss_sub").toString
    // N=4 → 8 parallels; take the middle 4 (a regional extract)
    val all = GribFormat.gaussianLatitudes(4)
    val band = all.slice(2, 6).toSeq
    val lons = Seq(10.0, 20.0)
    val vals = Array.tabulate(8)(i => 100.0 + i)
    GribFormat.writeFile(spark, s"$dir/b.grb2", Seq(
      (61, LocalDateTime.of(2024, 8, 2, 0, 0), band, lons, vals)),
      edition = 2, gaussianN = Some(4))
    val df = spark.read.format("grib1").load(s"$dir/b.grb2")
    assert(df.count() == 8)
    val gotLats = df.select("latitude").distinct()
      .orderBy(col("latitude").desc).as[Double].collect().toSeq
    gotLats.zip(band).foreach { case (g, e) => assert(math.abs(g - e) < 1e-5) }
    val r = df.filter(col("longitude") === 20.0).orderBy(col("latitude").desc)
      .select("value").as[Double].collect().toSeq
    assert(r == Seq(101.0, 103.0, 105.0, 107.0))
  }

  test("reduced Gaussian grid (ERA5-native): per-row spacing, values, bitmap") {
    val dir = Files.createTempDirectory("gribgauss_red").toString
    // N=2 → 4 parallels; polar rows carry fewer points, like a real
    // reduced grid: pl = [4, 8, 8, 4], 24 cells row-major
    val glats = GribFormat.gaussianLatitudes(2).toSeq
    val pl = Seq(4, 8, 8, 4)
    val vals = Array.tabulate(24)(i => if (i == 5) Double.NaN else i * 1.5)
    GribFormat.writeFile(spark, s"$dir/red.grb2", Seq(
      (61, LocalDateTime.of(2024, 8, 3, 0, 0), glats, Seq(0.0),
        vals)), decimalScale = 1, edition = 2, gaussianN = Some(2),
      reducedRows = Some(pl))
    val df = spark.read.format("grib1").load(s"$dir/red.grb2")
    assert(df.count() == 24)
    // each parallel has ITS OWN longitude spacing spanning the full circle
    val rows = df.select("latitude", "longitude", "value").collect()
      .map(r => (r.getDouble(0), r.getDouble(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    val byLat = rows.groupBy(_._1)
    assert(byLat.size == 4)
    glats.zip(pl).foreach { case (lat, n) =>
      val rowCells = byLat.collectFirst {
        case (l, cells) if math.abs(l - lat) < 1e-5 => cells
      }.get
      assert(rowCells.length == n, s"row at $lat has ${rowCells.length}, want $n")
      val lonsGot = rowCells.map(_._2).sorted.toSeq
      val lonsWant = (0 until n).map(i => i * 360.0 / n)
      lonsGot.zip(lonsWant).foreach { case (g, w) => assert(math.abs(g - w) < 1e-5) }
    }
    // values land row-major; the NaN cell is a bitmap hole (null)
    assert(rows.count(_._3.isEmpty) == 1)
    val rowTwoFirst = rows.find(r =>
      math.abs(r._1 - glats(1)) < 1e-5 && math.abs(r._2) < 1e-5).get
    assert(rowTwoFirst._3.contains(4 * 1.5)) // first cell of row 1 = vals(4)
  }

  test("edition-1 Gaussian (GDS type 4): regular and reduced — the ERA5 GRIB1-native shape") {
    val dir = Files.createTempDirectory("grib1gauss").toString
    // regular: N=2 (4 parallels) × 3 lons — millidegree coords must still
    // resolve to the exact computed parallels
    val glats = GribFormat.gaussianLatitudes(2).toSeq
    val vals = Array.tabulate(12)(i => i * 0.5)
    GribFormat.writeFile(spark, s"$dir/g1.grb", Seq(
      (61, LocalDateTime.of(2024, 9, 1, 0, 0), glats, Seq(0.0, 120.0, 240.0), vals)),
      decimalScale = 1, edition = 1, gaussianN = Some(2))
    val df = spark.read.format("grib1").load(s"$dir/g1.grb")
    assert(df.count() == 12)
    val gotLats = df.select("latitude").distinct()
      .orderBy(col("latitude").desc).as[Double].collect().toSeq
    gotLats.zip(glats).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-9, s"$g vs exact parallel $e") }
    assert(df.filter(col("longitude") === 120.0)
      .orderBy(col("latitude").desc).select("value").as[Double]
      .collect().toSeq == Seq(0.5, 2.0, 3.5, 5.0))

    // reduced: pl = [3, 5] over N=1, PL list at GDS octet 33
    val rlats = GribFormat.gaussianLatitudes(1).toSeq
    val rvals = Array.tabulate(8)(i => 10.0 + i)
    GribFormat.writeFile(spark, s"$dir/r1.grb", Seq(
      (61, LocalDateTime.of(2024, 9, 2, 0, 0), rlats, Seq(0.0), rvals)),
      edition = 1, gaussianN = Some(1), reducedRows = Some(Seq(3, 5)))
    val rdf = spark.read.format("grib1").load(s"$dir/r1.grb")
    assert(rdf.count() == 8)
    val northRow = rdf.filter(col("latitude") > 0).orderBy("longitude")
      .select("longitude", "value").collect()
    assert(northRow.map(_.getDouble(0)).toSeq == Seq(0.0, 120.0, 240.0))
    assert(northRow.map(_.getDouble(1)).toSeq == Seq(10.0, 11.0, 12.0))
    val southRow = rdf.filter(col("latitude") < 0).orderBy("longitude")
      .select("longitude", "value").collect()
    assert(southRow.map(_.getDouble(0)).toSeq == Seq(0.0, 72.0, 144.0, 216.0, 288.0))
    assert(southRow.map(_.getDouble(1)).toSeq == Seq(13.0, 14.0, 15.0, 16.0, 17.0))
  }

  test("ni=MISSING without the points-per-row list is refused by name") {
    // patch a regular 3.40 file's ni to MISSING (0xFFFFFFFF) — the
    // optional-list header still says "no list", which must fail cleanly
    val dir = Files.createTempDirectory("gribgauss_bad").toString
    val glats = GribFormat.gaussianLatitudes(1).toSeq
    GribFormat.writeFile(spark, s"$dir/r.grb2", Seq(
      (61, LocalDateTime.of(2024, 8, 3, 0, 0), glats, Seq(0.0, 120.0, 240.0),
        Array.tabulate(6)(_.toDouble))), edition = 2, gaussianN = Some(1))
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(s"$dir/r.grb2"))
    // section 3 starts at offset 16+21; ni is octets 31-34 of the section
    val sec3 = 16 + 21
    (0 until 4).foreach(i => bytes(sec3 + 30 + i) = 0xFF.toByte)
    val patched = s"$dir/r_patched.grb2"
    Files.write(java.nio.file.Paths.get(patched), bytes)
    val err = intercept[Throwable] {
      spark.read.format("grib1").load(patched).count()
    }
    val msgs = Iterator.iterate(err)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("optional-list"), msgs)
  }
}
