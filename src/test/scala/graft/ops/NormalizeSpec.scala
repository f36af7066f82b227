package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.{DatasetDescriptor, TimeSpan}

class NormalizeSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  test("standardizeLongitudes wraps into [-180, 180) (convenience.py:506-524)") {
    val df = Seq(0.0, 180.0, 181.0, 359.75, -190.0, 360.0).toDF("longitude")
    val out = Normalize.standardizeLongitudes(df)
      .as[Double].collect().toSeq
    assert(out == Seq(0.0, -180.0, -179.0, -0.25, 170.0, 0.0))
  }

  test("missingToNaN rewrites the sentinel only") {
    val df = Seq(1.0, -9999.0, 2.5).toDF("value")
    val out = Normalize.missingToNaN(df, "value", -9999.0).as[Double].collect()
    assert(out(0) == 1.0 && out(1).isNaN && out(2) == 2.5)
  }

  test("fillMissingTimeSteps pads only the holes with nulls") {
    val df = Seq(
      (ts("2024-01-01T00:00:00"), 1.0),
      (ts("2024-01-02T00:00:00"), 2.0),
      (ts("2024-01-05T00:00:00"), 5.0)).toDF("time", "value")
    val out = Normalize.fillMissingTimeSteps(df, "time", Seq.empty, TimeSpan.Daily)
      .orderBy("time").collect()
    assert(out.length == 5)
    assert(out.map(_.get(0).toString).toSeq == Seq(
      "2024-01-01T00:00", "2024-01-02T00:00", "2024-01-03T00:00",
      "2024-01-04T00:00", "2024-01-05T00:00"))
    assert(out(2).isNullAt(1) && out(3).isNullAt(1) && out(4).getDouble(1) == 5.0)
  }

  test("fillMissingTimeSteps crosses holes with the spatial key set") {
    val df = Seq(
      (ts("2024-01-01T00:00:00"), 10.0, 1.0),
      (ts("2024-01-01T00:00:00"), 20.0, 2.0),
      (ts("2024-01-03T00:00:00"), 10.0, 3.0),
      (ts("2024-01-03T00:00:00"), 20.0, 4.0)).toDF("time", "latitude", "value")
    val out = Normalize.fillMissingTimeSteps(df, "time", Seq("latitude"), TimeSpan.Daily)
    assert(out.count() == 6)
    assert(out.filter(col("value").isNull).count() == 2)
  }

  test("reindexDense also fills per-cell holes on present timesteps") {
    val df = Seq(
      (ts("2024-01-01T00:00:00"), 10.0, 1.0),
      (ts("2024-01-01T00:00:00"), 20.0, 2.0),
      (ts("2024-01-03T00:00:00"), 10.0, 3.0)) // cell 20 missing on the 3rd
      .toDF("time", "latitude", "value")
    // fillMissingTimeSteps keeps the ragged hole (documented precondition)…
    assert(Normalize.fillMissingTimeSteps(df, "time", Seq("latitude"),
      TimeSpan.Daily).count() == 5)
    // …reindexDense pads it: 3 days × 2 cells
    val out = Normalize.reindexDense(df, "time", Seq("latitude"), TimeSpan.Daily)
    assert(out.count() == 6)
    assert(out.filter(col("value").isNull).count() == 3)
    assert(out.filter(col("time") === ts("2024-01-03T00:00:00") &&
      col("latitude") === 20.0).count() == 1)
  }

  test("renameDataVariable renames the non-dim column; tolerates canonical") {
    val desc = DatasetDescriptor("x", "precip", spatialDims = Seq("latitude", "longitude"))
    val df = Seq((ts("2024-01-01T00:00:00"), 1.0, 2.0, 9.0))
      .toDF("time", "latitude", "longitude", "raw")
    assert(Normalize.renameDataVariable(df, desc).columns.contains("precip"))
    val already = df.withColumnRenamed("raw", "precip")
    assert(Normalize.renameDataVariable(already, desc).columns.count(_ == "precip") == 1)
  }

  test("transposeToStandard orders dims and tolerates absent dims (transform.py:670-673)") {
    val desc = DatasetDescriptor("x", "v", spatialDims = Seq("latitude", "longitude"))
    val df = Seq((1.0, 9.0, ts("2024-01-01T00:00:00"))).toDF("latitude", "v", "time")
    assert(Normalize.transposeToStandard(df, desc).columns.toSeq ==
      Seq("time", "latitude", "v"))
  }

  test("normalize pipeline: sentinel→NaN, dtype cast, hooks") {
    val desc = DatasetDescriptor("x", "v", spatialDims = Seq("latitude", "longitude"),
      missingValue = Some(-9.0))
    val df = Seq((ts("2024-01-01T00:00:00"), 1.0, 2.0, -9.0))
      .toDF("time", "latitude", "longitude", "raw")
    var postRan = false
    val out = Normalize.normalize(df, desc, post = d => { postRan = true; d })
    assert(postRan)
    assert(out.schema("v").dataType == org.apache.spark.sql.types.FloatType)
    assert(out.select("v").as[Float].head().isNaN)
  }

  test("expandDim adds a constant dimension column") {
    val out = Normalize.expandDim(Seq(1).toDF("a"), "step", lit(0L))
    assert(out.columns.contains("step") && out.select("step").as[Long].head() == 0L)
  }
}
