package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based corpus monitoring — the bounded-state statistics a
  * 100 TB curation pipeline tracks continuously (boilerplate heavy
  * hitters, per-source dedup rates) without ever shuffling the long tail.
  *
  * Two classic summaries, both with exactness recovered at the end:
  *
  *  - Misra-Gries heavy hitters ([[frequentTokens]]): each partition keeps
  *    a k-entry summary (k ≈ 1/ε); the union of partition summaries is a
  *    PROVEN superset of every token with global frequency ≥ ε·N, and an
  *    exact verify pass (only candidate tokens survive the map side)
  *    returns true counts — approximate candidate generation, exact
  *    output, the same shape as the LSH → exact-verify dedup ops.
  *  - Apache DataSketches HLL ([[distinctSketches]] /
  *    [[unionSketchTables]] / [[distinctEstimates]]): per-group distinct
  *    sketches as a persistable, MERGEABLE monitoring table — a new crawl
  *    batch is sketched alone and unioned in, so the corpus is never
  *    rescanned (register-wise max is associative and order-independent).
  *
  * Reference corpus ops live in extractor/transform land in the reference
  * (gridded_etl_tools has no corpus layer); these extend the engine's
  * LLM-pipeline pack (SURVEY §2 "beyond the reference").
  */
object Sketch {

  /** Exact heavy-hitter tokens: every token whose corpus frequency is at
    * least `eps` of all token occurrences, with its EXACT count.
    *
    * Plan shape: ONE corpus scan emits per-partition Misra-Gries summaries
    * (bounded ⌈1/ε⌉+1 entries each, regardless of corpus size) together
    * with partition token counts — collected driver-side (small by
    * construction, ≤ partitions·(k+1) rows, the centroid-sidecar
    * precedent); the exact pass then broadcasts the candidates, so the
    * token exchange carries only candidate occurrences — the long tail
    * (the overwhelming majority at any realistic ε) never shuffles. Guarantee: a token with count
    * ≥ ε·N exceeds ε·N_p on at least one partition (averaging), and with
    * k > 1/ε its Misra-Gries undercount bound N_p/k < ε·N_p keeps it in
    * that partition's summary — no false negatives; the verify join
    * removes all false positives. */
  def frequentTokens(df: DataFrame, textCol: String, eps: Double): DataFrame = {
    require(eps > 0 && eps <= 0.5, s"eps $eps outside (0, 0.5]")
    val spark = df.sparkSession
    import spark.implicits._
    val k = math.ceil(1.0 / eps).toInt + 1
    val toks = df.select(explode(Text.tokens(col(textCol))).as("token"))
      .as[String]
    // one corpus scan produces BOTH the per-partition summaries and the
    // partition token counts ("" is an impossible token — Text.tokens
    // drops empties — so it marks the count row). The collected summary is
    // small by construction: ≤ partitions · (k + 1) rows.
    val summary = toks.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      var n = 0L
      while (it.hasNext) {
        val t = it.next()
        n += 1
        m.get(t) match {
          case Some(c) => m.update(t, c + 1)
          case None =>
            if (m.size < k) m.update(t, 1L)
            else {
              // the classic decrement-all step: every summary count pays
              // one, zeros leave — amortized O(1) per token
              m.mapValuesInPlace((_, c) => c - 1)
              m.filterInPlace((_, c) => c > 0)
            }
        }
      }
      m.keysIterator.map((_, 0L)) ++ Iterator(("", n))
    }.collect()
    val total = summary.collect { case ("", n) => n }.sum
    val candidates = summary.collect { case (t, _) if t.nonEmpty => t }
      .distinct.toSeq.toDF("token")
    toks.toDF("token")
      .join(broadcast(candidates), Seq("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").cast("double") >= lit(eps * total.toDouble))
      .select("token", "cnt")
  }

  /** Per-group HLL distinct sketches over `keyExpr` — the persistable
    * monitoring table. `lgK` = log2 of the register count (12 → 4096
    * registers, ~1.6 % standard error, 4 KB dense). */
  def distinctSketches(df: DataFrame, groupCol: String, keyExpr: Column,
      lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK $lgK outside [4, 21]")
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(keyExpr, lit(lgK)).as("sketch"))
  }

  /** Merge two sketch tables (e.g. the persisted corpus table and a new
    * batch's): groups shared by both union register-wise, others pass
    * through. Incremental merging never rescans the corpus; a merged
    * estimate carries the same lgK error bound as a one-shot sketch.
    * (Estimates are NOT bit-identical across different batch splits: the
    * DataSketches sketch keeps exact coupons while small and promotes to
    * dense registers at a split-dependent point, and union results use
    * the composite rather than the streaming HIP estimator — so gates
    * pin the error bound, not estimator bytes.) */
  def unionSketchTables(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.unionByName(b).groupBy(col(groupCol))
      .agg(hll_union_agg(col("sketch"), lit(false)).as("sketch"))

  /** Estimated distinct counts (BIGINT) from a sketch table. */
  def distinctEstimates(sk: DataFrame, groupCol: String): DataFrame =
    sk.select(col(groupCol),
      hll_sketch_estimate(col("sketch")).as("estimate"))
}
