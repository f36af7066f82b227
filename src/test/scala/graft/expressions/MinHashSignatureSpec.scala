package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Dedup

/** Native shuffle-free MinHash signature expression. */
class MinHashSignatureSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  test("signature has numHashes slots; identical docs share it exactly") {
    val df = Seq((1L, "the quick brown fox jumps"), (2L, "the quick brown fox jumps"),
      (3L, "a completely different sentence here")).toDF("id", "t")
    val sigs = Dedup.minhashSignatures(df, "id", "t", 3, 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L).length == 32)
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("signature agreement estimates jaccard for near-identical docs") {
    // 20 tokens, one substitution → shingle jaccard ≈ 17/23 ≈ 0.74
    val base = (0 until 20).map(i => s"w$i")
    val variant = base.updated(10, "XX")
    val df = Seq((1L, base.mkString(" ")), (2L, variant.mkString(" "))).toDF("id", "t")
    val sigs = Dedup.minhashSignatures(df, "id", "t", 3, 256)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agree = sigs(1L).zip(sigs(2L)).count { case (a, b) => a == b } / 256.0
    assert(math.abs(agree - 17.0 / 23.0) < 0.12, s"agreement $agree")
  }

  test("documents with fewer than n tokens get the sentinel signature") {
    val df = Seq((1L, "one two")).toDF("id", "t")
    val sig = Dedup.minhashSignatures(df, "id", "t", 3, 8).head().getSeq[Long](1)
    assert(sig.forall(_ == Long.MaxValue))
  }

  test("null text yields null signature") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("a b c d"))).toDF("id", "t")
    val out = Dedup.minhashSignatures(df, "id", "t", 3, 8).orderBy("doc_id").collect()
    assert(out(0).isNullAt(1))
    assert(!out(1).isNullAt(1))
  }

  test("shingle-less documents never become candidate pairs") {
    val df = Seq((1L, "one two"), (2L, "three four"), (3L, ""),
      (4L, "a b c d e f g"), (5L, "a b c d e f g")).toDF("id", "t")
    val pairs = Dedup.minhashCandidatePairs(df, "id", "t", 3, 16, 4)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((4L, 5L))) // only the real duplicates, no sentinel pairs
  }
}
