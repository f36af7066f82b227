package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  test("saltedJoin equals the unsalted join on a skewed key distribution") {
    // 90% of rows share one key — the skew shape salting exists for
    val large = (0 until 2000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong)
    }.toDF("k", "payload")
    val small = Seq(("hot", 1.0), ("k0", 2.0), ("k3", 3.0)).toDF("k", "w")

    val plain = large.join(small, Seq("k")).select("k", "payload", "w")
    val salted = Skew.saltedJoin(large, small, Seq("k"), salt = 8)
      .select("k", "payload", "w")
    assert(collectSet(salted) == collectSet(plain))
    assert(salted.count() == plain.count())
  }

  test("left_semi salting preserves semantics") {
    val large = (0 until 500).map(i => ("hot", i.toLong)).toDF("k", "payload")
    val small = Seq(Tuple1("hot")).toDF("k")
    val out = Skew.saltedJoin(large, small, Seq("k"), 4, "left_semi")
    assert(out.count() == 500)
  }

  test("outer joins are rejected") {
    val df = Seq(("a", 1)).toDF("k", "v")
    assertThrows[IllegalArgumentException](
      Skew.saltedJoin(df, df, Seq("k"), 4, "full_outer"))
  }
}
