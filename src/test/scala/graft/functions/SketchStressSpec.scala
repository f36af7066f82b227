package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The heavy-hitter claim at stress scale: over a 1M-doc / ~12M-token
  * corpus whose tail is ~200k distinct words, [[Sketch.frequentTokens]]
  * must return EXACTLY the exact-aggregation answer while its first pass
  * holds only ⌈1/ε⌉+1 entries per partition and its verify join shuffles
  * only candidate occurrences. SCALING.md §sketch-monitoring cites this. */
class SketchStressSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  test("1M-doc corpus: Misra-Gries + exact verify equals the exact heavy hitters") {
    // word w of doc d: ~5% of positions land on one of 5 hot words
    // (~1.2% frequency each); the rest spread over a 200k-word tail
    // (~55 occurrences each) — far below any ε, so the long tail is
    // exactly the mass that must never shuffle
    val docs = spark.range(1000000L).select(col("id").as("doc_id"),
      array_join(transform(sequence(lit(0), lit(11)), w => {
        val h = xxhash64(col("id"), w)
        // rehash for the hot index: h = 0 (mod 20) forces h = 0 (mod 5)
        when(pmod(h, lit(20)) === 0,
            concat(lit("hot"), pmod(xxhash64(h), lit(5))))
          .otherwise(concat(lit("w"), pmod(h, lit(200000))))
      }), " ").as("text"))
    val eps = 0.005
    val got = Sketch.frequentTokens(docs, "text", eps)
      .orderBy("token").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val toks = docs.select(explode(Text.tokens(col("text"))).as("token"))
    val n = toks.count()
    val exact = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").cast("double") >= lit(eps * n.toDouble))
      .orderBy("token").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(exact.nonEmpty && exact.map(_._1) ==
      (0 until 5).map(i => s"hot$i"), s"fixture drift: $exact")
    assert(got == exact)
  }
}
