package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unicode normalization + the extended Gopher repetition suite. */
class TextNormalizeSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def one(c: org.apache.spark.sql.Column, t: String): String =
    Seq(t).toDF("t").select(c).as[String].head()

  test("NFC composes combining sequences and singletons; NFKC adds " +
      "compatibility folding; both idempotent; ASCII untouched") {
    val dec = "café Å"
    assert(one(Text.normalizeNfc(col("t")), dec) == "café Å")
    assert(one(Text.normalizeNfc(col("t")), "café") == "café")
    // NFC keeps the ligature and superscript; NFKC folds them
    assert(one(Text.normalizeNfc(col("t")), "xﬁ m²") == "xﬁ m²")
    assert(one(Text.normalizeNfkc(col("t")), "xﬁ m²") == "xfi m2")
    assert(one(Text.normalizeNfc(col("t")), "plain ascii") == "plain ascii")
    // the dedup motivation: normalized spellings hash together
    val fp = Seq("café", "café").toDF("t")
      .select(Text.fingerprint(Text.normalizeNfc(col("t")))).as[Long]
      .collect()
    assert(fp(0) == fp(1))
  }

  test("duplicateParagraphFraction, topNgramCoverage, dupNgramMassFraction " +
      "hand-computed values") {
    def d(c: org.apache.spark.sql.Column, t: String): Double =
      Seq(t).toDF("t").select(c).as[Double].head()
    // 4 paragraphs, 'dup' twice → (4-3)/4
    assert(d(Text.duplicateParagraphFraction(col("t")),
      "a\n\ndup\n\nb\n\ndup") == 0.25)
    assert(d(Text.duplicateParagraphFraction(col("t")), "solo") == 0.0)
    // trigrams of "a b a b a b": [a b a, b a b, a b a, b a b] → top = 2/4
    assert(d(Text.topNgramCoverage(col("t"), 3), "a b a b a b") == 0.5)
    // 5-grams of "x x x x x x": two identical "x x x x x" (len 9):
    // dup mass 2*9 over total 2*9 → 1.0
    assert(d(Text.dupNgramMassFraction(col("t"), 5), "x x x x x x") == 1.0)
    // all-distinct 5-grams → 0.0
    assert(d(Text.dupNgramMassFraction(col("t"), 5), "a b c d e f") == 0.0)
    // shorter than n → empty shingles → 0.0
    assert(d(Text.dupNgramMassFraction(col("t"), 5), "a b") == 0.0)
  }
}
