package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale-hardening gate for SRP bucketing: adaptive bit selection must keep
  * within-bucket pair work bounded on a large skewed corpus (the fixed
  * nBits=8 default was O(n²/256) — quadratic ruin at a billion vectors). */
class SrpStressSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  test("srpBitsFor tracks corpus size with clamps") {
    assert(Similarity.srpBitsFor(100L) == 4)            // clamp floor
    assert(Similarity.srpBitsFor(1000000L) == 12)       // 1e6/256 → 2^12 buckets
    assert(Similarity.srpBitsFor(1000000000L, 256L) == 22)
    assert(Similarity.srpBitsFor(Long.MaxValue) == 24)  // clamp ceiling
    // monotonic in n
    val seq = Seq(1L, 1000L, 100000L, 10000000L, 1000000000L)
      .map(Similarity.srpBitsFor(_))
    assert(seq == seq.sorted)
  }

  test("1M-vector skewed corpus: adaptive bits bound the max bucket pair count") {
    val n = 1000000L
    // anisotropic (all components shifted positive) — projections are
    // biased, so buckets skew well away from uniform: the realistic case.
    val df = spark.range(n).select(
      expr("transform(sequence(0, 15), " +
        "d -> cast((hash(id, d) % 1000) / 1000.0 + 0.25 as float))")
        .as("vec"))
    def bucketCounts(bits: Int): Array[Long] =
      df.select(Similarity.srpBucket(col("vec"), 16, bits).as("b"))
        .groupBy("b").count().select("count").as[Long].collect()
    def pairWork(counts: Array[Long]): Double =
      counts.map(c => c.toDouble * (c - 1).toDouble / 2.0).sum

    val bits = Similarity.srpBitsFor(n) // 12
    val adaptive = bucketCounts(bits)
    val target = 256.0
    // mean occupancy lands near target even under skew…
    assert(n.toDouble / adaptive.length < 16.0 * target)
    // …and the worst bucket stays ~1% of the corpus (observed 9313 ≈ 38×
    // the uniform mean under this bias — skew tolerated), so its pair
    // count stays inside one task's budget; quadratic ruin would be a
    // bucket of n/2^8 ≈ 3900 at MEAN, i.e. EVERY bucket this size.
    val maxBucket = adaptive.max
    assert(maxBucket < n / 64, s"max bucket $maxBucket too large")
    // total candidate-pair work must beat a fixed small setting by a wide
    // margin (that is the point of scaling bits with n)
    val fixed4 = bucketCounts(4)
    assert(pairWork(adaptive) * 20.0 < pairWork(fixed4),
      s"adaptive ${pairWork(adaptive)} vs fixed-4 ${pairWork(fixed4)}")
  }
}
