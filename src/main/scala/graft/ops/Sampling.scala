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
