package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.DatasetDescriptor

class QcSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  test("inverseNormalCdf matches known quantiles") {
    assert(math.abs(Qc.inverseNormalCdf(0.975) - 1.959964) < 1e-5)
    assert(math.abs(Qc.inverseNormalCdf(0.5)) < 1e-9)
    assert(math.abs(Qc.inverseNormalCdf(0.025) + 1.959964) < 1e-5)
  }

  test("wilsonInterval brackets the observed proportion") {
    val (lo, hi) = Qc.wilsonInterval(50, 100, alpha = 0.05)
    assert(lo < 0.5 && 0.5 < hi)
    assert(lo > 0.38 && hi < 0.62)
    val (lo0, _) = Qc.wilsonInterval(0, 100, alpha = 0.05)
    assert(lo0 == 0.0)
  }

  test("nanFrequencyByTime counts NaN and null per timestep") {
    val df = Seq(
      (ts("2024-01-01T00:00:00"), Some(1.0)),
      (ts("2024-01-01T00:00:00"), Some(Double.NaN)),
      (ts("2024-01-01T00:00:00"), None: Option[Double]),
      (ts("2024-01-02T00:00:00"), Some(2.0))).toDF("time", "value")
    val out = Qc.nanFrequencyByTime(df, "time", "value").collect()
    assert(out(0).getAs[Long]("n_nan") == 2L && out(0).getAs[Long]("n_sampled") == 3L)
    assert(out(1).getAs[Long]("n_nan") == 0L)
  }

  test("nanFrequencyViolationsDF flags timesteps whose CI excludes expectation") {
    val df = Seq(
      (ts("2024-01-01T00:00:00"), 1000L, 500L), // p=0.5, expected 0.0 → flag
      (ts("2024-01-02T00:00:00"), 1000L, 0L))   // p=0.0, expected 0.0 → pass
      .toDF("time", "n_sampled", "n_nan")
      .withColumn("nan_frequency", col("n_nan").cast("double") / col("n_sampled"))
    val out = Qc.nanFrequencyViolationsDF(df, expectedFrequency = 0.0)
    assert(out.collect().map(_.get(0).toString).toSeq == Seq("2024-01-01T00:00"))
  }

  test("valuesMatch: tolerance, NaN-equivalence, sentinel, infinity (publish.py:1011-1095)") {
    val cases = Seq(
      (1.0, 1.00005, true),              // within 1e-4
      (1.0, 1.5, false),                 // differs
      (Double.NaN, Double.NaN, true),    // both NaN
      (Double.NaN, -9999.0, true),       // NaN vs missing sentinel
      (Double.PositiveInfinity, 1e39, true), // both infish, same sign
      (Double.PositiveInfinity, Double.NegativeInfinity, false),
      (Double.NaN, 1.0, false))
    val df = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val out = df.select(coalesce(
      Qc.valuesMatch(col("a"), col("b"), Some(-9999.0)), lit(false))).as[Boolean].collect()
    cases.zip(out).foreach { case ((a, b, want), got) =>
      assert(got == want, s"valuesMatch($a, $b) = $got, want $want")
    }
  }

  test("mismatchedCells flags one-side-null and value drift, passes equal cells") {
    val src = Seq((1, Some(1.0)), (2, Some(2.0)), (3, None: Option[Double]), (4, Some(4.0)))
      .toDF("k", "v")
    val dst = Seq((1, Some(1.0)), (2, Some(9.0)), (3, Some(3.0)), (4, None: Option[Double]))
      .toDF("k", "v")
    val bad = Qc.mismatchedCells(src, dst, Seq("k"), "v")
      .select("k").as[Int].collect().toSet
    assert(bad == Set(2, 3, 4))
  }

  test("allValueViolations applies unit bounds and NaN policy") {
    val desc = DatasetDescriptor("x", "value", spatialDims = Seq("latitude", "longitude"),
      hasNans = false, unitOfMeasurement = Some("deg_C"))
    val df = Seq(20.0, -95.0, 70.0, Double.NaN).toDF("value")
    val out = Qc.allValueViolations(df, desc).as[Double].collect()
    assert(out.length == 3) // -95 (cold), 70 (hot), NaN (forbidden)
    val nanOk = desc.copy(hasNans = true)
    assert(Qc.allValueViolations(df, nanOk).count() == 2)
  }

  test("bboxCoords rounds the spatial envelope") {
    val desc = DatasetDescriptor("x", "value", spatialDims = Seq("latitude", "longitude"),
      bboxRounding = 2)
    val df = Seq((10.123456, 100.98765, 1.0), (-5.5, 120.0, 2.0))
      .toDF("latitude", "longitude", "value")
    val r = Qc.bboxCoords(df, desc).head()
    assert(r.getDouble(0) == 100.99 && r.getDouble(1) == -5.5)
    assert(r.getDouble(2) == 120.0 && r.getDouble(3) == 10.12)
  }
}
