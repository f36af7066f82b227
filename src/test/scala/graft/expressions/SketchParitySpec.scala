package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{Dedup, Similarity, Text}

/** Pins the native SimHash64 / SrpBucket expressions bit-identical to the
  * interpreted higher-order-function formulations they replaced. */
class SketchParitySpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  /** `Text.bind` (private there): evaluate-once binding of a subtree. */
  private def bind(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** The pre-native simhash: 64 `aggregate` passes over token hashes. */
  private def simhashHof(textCol: Column): Column =
    bind(transform(Text.tokens(textCol), t => xxhash64(t))) { tokenHashes =>
      (0 until 64).map { bit =>
        val vote = aggregate(tokenHashes, lit(0L),
          (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(lit(1L)) === 1L, lit(1L))
            .otherwise(lit(-1L)))
        when(vote > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b))
    }

  /** The pre-native srpBucket: nBits `aggregate(zip_with(...))` passes. */
  private def srpHof(vecCol: Column, dim: Int, nBits: Int): Column =
    (0 until nBits).map { plane =>
      val signs = array((0 until dim).map(i =>
        lit(SrpBucketExpr.planeSign(plane, i))): _*)
      val proj = aggregate(
        zip_with(vecCol, signs, (v, s) => v.cast("double") * s),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), plane)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  test("native simhash64 is bit-identical to the HOF formulation") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumped over the lazy dog",
      "completely different content here with unicode tökens ünd mörę",
      "a", "a b", "  leading and   irregular\tspacing \n newline ",
      "").zipWithIndex.map(_.swap).toDF("id", "text")
    val cmp = docs.select(
      Dedup.simhash64(col("text")).as("native"),
      simhashHof(col("text")).as("hof"))
    assert(cmp.filter(col("native") =!= col("hof")).count() == 0)
    // empty text → no tokens → all votes 0 → 0L
    assert(docs.filter(col("id") === 6)
      .select(Dedup.simhash64(col("text"))).head().getLong(0) == 0L)
    // null propagates
    assert(docs.select(Dedup.simhash64(lit(null).cast("string"))).head().isNullAt(0))
  }

  test("native srpBucket is bit-identical to the HOF formulation") {
    val vecs = (0 until 200).map { i =>
      (i.toLong, (0 until 16).map(d => math.sin(i * 0.73 + d * 1.31).toFloat))
    }.toDF("id", "vec")
    for (nBits <- Seq(1, 8, 16)) {
      val cmp = vecs.select(
        Similarity.srpBucket(col("vec"), 16, nBits).as("native"),
        srpHof(col("vec"), 16, nBits).as("hof"))
      assert(cmp.filter(col("native") =!= col("hof")).count() == 0, s"nBits=$nBits")
    }
    // length-mismatch parity: zip_with null-propagation → bucket 0
    val short = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "vec")
    val both = short.select(
      Similarity.srpBucket(col("vec"), 16, 8).as("native"),
      srpHof(col("vec"), 16, 8).as("hof")).head()
    assert(both.getLong(0) == 0L && both.getLong(1) == 0L)
    // null propagates
    assert(short.select(Similarity.srpBucket(lit(null).cast("array<float>"), 16, 8))
      .head().isNullAt(0))
    // a null ELEMENT nulls every HOF projection → bucket 0; the native
    // expression must match rather than reading the slot as 0.0f
    val withNullElem = Seq(Tuple1(Seq[java.lang.Float](1.0f, null, 3.0f, 4.0f)))
      .toDF("vec")
    val pair = withNullElem.select(
      Similarity.srpBucket(col("vec"), 4, 8).as("native"),
      srpHof(col("vec"), 4, 8).as("hof")).head()
    assert(pair.getLong(0) == 0L && pair.getLong(1) == 0L)
  }

  test("driver-side srpBucketOf matches the executor expression") {
    val q = (0 until 16).map(d => math.cos(d * 0.41).toFloat)
    val fromExpr = Seq(Tuple1(q)).toDF("vec")
      .select(Similarity.srpBucket(col("vec"), 16, 12)).head().getLong(0)
    assert(Similarity.srpBucketOf(q, 12) == fromExpr)
  }
}
