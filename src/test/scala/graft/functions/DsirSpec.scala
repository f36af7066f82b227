package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*) = {
    val sp = spark; import sp.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  test("weights match the hand-computed add-one log-ratio") {
    // target corpus: "a a", raw corpus: "b". vocab = {a, b}
    // ct(a)=2 cr(a)=0, ct(b)=0 cr(b)=1, nt=2 nr=1 v=2
    val df = docs((1L, "a a", "en"), (2L, "b", "de"))
    val out = Text.dsirWeights(df, "doc_id", "text", col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val wA = math.log(3.0 / 4.0) - math.log(1.0 / 3.0)
    val wB = math.log(1.0 / 4.0) - math.log(2.0 / 3.0)
    assert(math.abs(out(1L) - math.rint(2 * wA * 1e4) / 1e4) < 1e-9)
    assert(math.abs(out(2L) - math.rint(wB * 1e4) / 1e4) < 1e-9)
  }

  test("target-domain documents score higher than off-domain ones") {
    val df = docs(
      (1L, "alpha beta gamma", "en"), (2L, "alpha beta delta", "en"),
      (3L, "uno dos tres", "de"), (4L, "uno dos cuatro", "de"))
    val out = Text.dsirWeights(df, "doc_id", "text", col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) > out(3L) && out(2L) > out(4L))
  }

  test("hashed feature space equals exact grams when collision-free") {
    val df = docs(
      (1L, "alpha beta gamma alpha", "en"), (2L, "beta delta", "en"),
      (3L, "uno dos tres beta", "de"), (4L, "uno cuatro", "de"))
    val exact = Text.dsirWeights(df, "doc_id", "text", col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 2^20 buckets over 8 distinct tokens: collision probability ~3e-5;
    // the fixed token set is verified collision-free by construction here
    val hashed = Text.dsirWeights(df, "doc_id", "text",
      col("lang") === "en", hashBuckets = Some(1 << 20))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(exact === hashed)
  }
}
