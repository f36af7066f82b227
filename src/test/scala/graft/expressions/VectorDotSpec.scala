package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Similarity

/** Native dot-product expression: bit parity with the HOF formulation. */
class VectorDotSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the aggregate(zip_with) formulation") {
    val vecs = (0 until 50).map { i =>
      ((0 until 16).map(d => math.sin(i * 0.7 + d).toFloat),
        (0 until 16).map(d => math.cos(i * 0.3 + d).toFloat))
    }.toDF("a", "b")
    val out = vecs.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof"))
    assert(out.filter(col("native") =!= col("hof")).count() == 0)
    assert(out.filter(col("native").isNull).count() == 0)
  }

  test("null array and length mismatch yield null (zip_with parity)") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (None, Some(Seq(1.0f))),
      (Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f)))
    ).toDF("a", "b")
    val out = df.select(Similarity.dot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
    assert(out(2).isNullAt(0)) // mismatched lengths
  }

  test("rejects non-float-array inputs at analysis time") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0))).toDF("a", "b") // array<double>
    assertThrows[org.apache.spark.sql.AnalysisException] {
      df.select(Similarity.dot(col("a"), col("b"))).collect()
    }
  }
}
