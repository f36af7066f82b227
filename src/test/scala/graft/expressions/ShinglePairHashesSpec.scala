package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{Dedup, Text}

/** Native shingle-hash expression: bit parity with the built-in xxhash64
  * foldings, distinct semantics, nulls, and the codegen path. */
class ShinglePairHashesSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  test("hash values are bit-identical to xxhash64 over Text.shingles") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "  leading and   irregular\twhitespace\nhere  ",
      "short", "", "one two three"
    ).toDF("text")
    val viaHof = df.select(
      array_distinct(transform(Text.shingles(col("text"), 3), s => xxhash64(s))).as("a"),
      array_distinct(transform(Text.shingles(col("text"), 3), s => xxhash64(lit(1), s))).as("b"))
    val viaExpr = df.select(
      Dedup.shinglePairHashes(col("text"), 3).getField("a").as("a"),
      Dedup.shinglePairHashes(col("text"), 3).getField("b").as("b"))
    assert(viaExpr.collect().map(_.toSeq).toSeq == viaHof.collect().map(_.toSeq).toSeq)
  }

  test("duplicate shingles are deduplicated keeping first occurrence") {
    val df = Seq("a b a b a b a b").toDF("text") // shingles: "a b","b a" repeated
    val out = df.select(Dedup.shinglePairHashes(col("text"), 2).getField("a"))
      .head().getSeq[Long](0)
    assert(out.length == 2)
    assert(out.distinct == out)
  }

  test("null text yields null; short text yields empty array") {
    val df = Seq(Some("one two"), None).toDF("text")
    val out = df.select(Dedup.shinglePairHashes(col("text"), 3).as("p")).collect()
    assert(out(0).getSeq[Any](0).isEmpty) // 2 tokens < n=3
    assert(out(1).isNullAt(0))
  }

  test("survives both codegen and interpreted evaluation paths") {
    val df = (0 until 100).map(i => s"tok$i " * 10).toDF("text")
    val n = df.select(explode(Dedup.shinglePairHashes(col("text"), 3)).as("p"))
      .select("p.a").distinct().count()
    assert(n > 0)
  }
}
