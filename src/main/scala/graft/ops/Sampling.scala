package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * A corpus sample must be REPRODUCIBLE (same rows on every run, any
  * cluster size, any partitioning) and CHEAP (no shuffle, no count pass) —
  * `df.sample()` is neither across runs/engines. The standard construction
  * is a content hash compared to a rate threshold: keep a row iff
  * `h(key, seed) < fraction · 2³²`.
  *
  * The hash here is the first 8 hex chars of `md5(key ‖ seed)`, compared AS
  * A STRING against the threshold rendered in 8-digit lowercase hex. Both
  * md5-hex and byte-wise string comparison behave identically in every SQL
  * engine (hex digits are ASCII-ordered), so the exact sample is portable —
  * the DuckDB oracle replays it verbatim. Per-row, no shuffle, trivially
  * pushed into the scan.
  */
object Sampling {

  /** First 8 lowercase-hex chars of md5(key ‖ seed) — a uniform draw from
    * [0, 2³²) rendered as text. NULL keys draw as the empty string (sharing
    * its hash) rather than producing a NULL predicate that would silently
    * drop the row at every fraction including 1.0. */
  def hashHex(key: Column, seed: String): Column =
    substring(md5(concat(coalesce(key.cast("string"), lit("")), lit(seed))), 1, 8)

  /** `fraction` as an 8-digit lowercase-hex threshold. Fraction 1.0 maps to
    * "g" — one char past 'f' in ASCII — so every 8-hex draw compares below
    * it (a 9-digit "100000000" would compare LEXICOGRAPHICALLY below
    * "2…"-prefixed draws and break the predicate). */
  def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"sampling fraction must be in [0,1], got $fraction")
    val units = math.round(fraction * 4294967296.0) // 2^32
    if (units >= 4294967296L) "g" else f"$units%08x"
  }

  /** Uniform deterministic sample: keep each row iff its hash draw falls
    * below `fraction`. Same rows every run, independent of partitioning. */
  def sampleByHash(df: DataFrame, keyCol: String, fraction: Double,
      seed: String = ""): DataFrame =
    df.filter(hashHex(col(keyCol), seed) < lit(thresholdHex(fraction)))

  /** Per-stratum cap ("domain capping"): keep at most `maxPerStratum` rows
    * of each stratum, chosen by a deterministic hash RANK rather than a
    * fraction — the standard guard against any single source dominating a
    * corpus mix. Rank order is (hash draw, key), so the kept subset is a
    * uniform, reproducible choice and adding new rows to a stratum never
    * evicts more than the overflow. One shuffle on the stratum key. */
  def capPerStratum(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      maxPerStratum: Int,
      seed: String = ""): DataFrame = {
    require(maxPerStratum > 0, s"cap must be positive, got $maxPerStratum")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(hashHex(col(keyCol), seed), col(keyCol))
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= maxPerStratum)
      .drop("__rank")
  }

  /** Score-based per-stratum cap: keep the `k` BEST rows of each stratum
    * under an explicit ordering (quality-score curation — "the 10k
    * highest-quality documents per source"), where [[capPerStratum]] keeps
    * a uniform random subset. The caller's ordering should end in a unique
    * key (e.g. the doc id) so ties — and therefore the kept set — are
    * deterministic on every engine. One shuffle on the stratum key;
    * per-partition sort bounded by the largest stratum. */
  def topKPerStratum(df: DataFrame, strataCol: String, k: Int,
      ordering: Seq[Column]): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(ordering.nonEmpty, "topKPerStratum needs at least one ordering column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(ordering: _*)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** Deterministic train/val/test assignment: the unit interval is carved
    * into consecutive hash ranges — [0, f₁) → split 1, [f₁, f₁+f₂) →
    * split 2, … — and each row lands where its draw falls; the remainder
    * is the LAST split. Adds `<splitCol>`. Per-row, shuffle-free,
    * engine-portable, and STABLE under corpus growth: a row's split never
    * changes when other rows arrive, which is the property that keeps
    * eval sets leak-free across crawl cycles (new near-dups of a test doc
    * can still land in train — run dedup first; this op only pins
    * assignment determinism). */
  def hashSplit(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)], splitCol: String = "split",
      seed: String = ""): DataFrame = {
    require(splits.size >= 2, s"need at least 2 splits, got ${splits.size}")
    require(splits.map(_._2).forall(_ > 0), s"split fractions must be positive: $splits")
    require(splits.map(_._2).sum <= 1.0 + 1e-9,
      s"split fractions exceed 1: ${splits.map(_._2).sum}")
    val h = hashHex(col(keyCol), seed)
    val cumulative = splits.init.scanLeft(0.0)(_ + _._2).tail // upper bound per non-final split
    val assigned = splits.init.zip(cumulative).foldLeft(when(lit(false), lit(""))) {
      case (acc, ((name, _), upper)) =>
        acc.when(h < lit(thresholdHex(upper)), lit(name))
    }.otherwise(lit(splits.last._1))
    df.withColumn(splitCol, assigned)
  }

  /** Temperature-based mixture rates (the mT5 / multilingual-mix scheme):
    * a domain holding weight share p_d of the corpus is resampled toward
    * q_d ∝ p_d^alpha — alpha = 1 keeps natural proportions, alpha → 0
    * flattens the mix — and the per-domain KEEP rate is the one that hits
    * a total budget of `budgetFraction` × corpus weight at those mix
    * proportions: rate_d = min(1, budgetFraction · total · q_d / w_d).
    *
    * Driver-side by design: the per-domain aggregate is bounded by the
    * number of domains (like k-means centroids), and returning literal
    * rates keeps the sampling predicate a pure per-row CASE — shuffle-free
    * and engine-portable. Rates are rounded to 6 decimals so an oracle
    * recomputing them in SQL lands on the same threshold (every step up to
    * the Σ√p reduction is IEEE-exact: integer sums, one division, sqrt —
    * all correctly rounded; the rounding belt absorbs the one
    * order-dependent float sum). */
  def temperatureMixtureRates(df: DataFrame, domainCol: String,
      weightCol: String, alpha: Double, budgetFraction: Double): Map[String, Double] = {
    require(alpha > 0 && alpha <= 1, s"temperature alpha in (0,1], got $alpha")
    require(budgetFraction > 0 && budgetFraction <= 1,
      s"budgetFraction in (0,1], got $budgetFraction")
    val perDomain = df.groupBy(col(domainCol))
      .agg(sum(col(weightCol)).as("w"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1) // fixed reduction order for the one inexact float sum
    val total = perDomain.map(_._2).sum.toDouble
    val weightOf = perDomain.toMap
    val qRaw = perDomain.map { case (d, w) => d -> math.pow(w / total, alpha) }
    val qSum = qRaw.map(_._2).sum
    qRaw.map { case (d, q) =>
      val w = weightOf(d).toDouble
      val rate = math.min(1.0, budgetFraction * total * (q / qSum) / w)
      d -> BigDecimal(rate).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  /** Temperature-based mixture sample: [[temperatureMixtureRates]] rates
    * applied through the deterministic hash threshold — unknown domains
    * (none, since rates come from this frame) would keep nothing. Two jobs:
    * one bounded per-domain aggregate, then the per-row shuffle-free
    * filter. */
  def temperatureMixtureSample(df: DataFrame, keyCol: String,
      domainCol: String, weightCol: String, alpha: Double,
      budgetFraction: Double, seed: String = ""): DataFrame = {
    val rates = temperatureMixtureRates(df, domainCol, weightCol, alpha, budgetFraction)
    stratifiedSampleByHash(df, keyCol, domainCol, rates, defaultFraction = 0.0, seed)
  }

  /** Stratified deterministic sample: per-stratum fractions (e.g. language
    * rebalancing — downsample the head languages, keep the tail whole).
    * Strata not in `fractions` use `defaultFraction`. Still per-row and
    * shuffle-free: the stratum column only feeds a CASE, never a groupBy. */
  def stratifiedSampleByHash(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double,
      seed: String = ""): DataFrame = {
    val threshold = fractions.toSeq.sortBy(_._1).foldLeft(
      when(lit(false), lit(""))) { case (acc, (stratum, f)) =>
        acc.when(col(strataCol) === lit(stratum), lit(thresholdHex(f)))
    }.otherwise(lit(thresholdHex(defaultFraction)))
    df.filter(hashHex(col(keyCol), seed) < threshold)
  }
}
