package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relevance scoring for corpus curation — rank documents against a query
  * term set (data-selection pipelines score training documents against a
  * target-domain description; BM25 is the standard lexical baseline).
  *
  * Scale shape: tokens are filtered to the query vocabulary BEFORE any
  * shuffle, so the grouped rows are bounded by |docs|·|query|, independent
  * of document length; the per-term document frequencies and the corpus
  * stats are broadcast (|query| rows and 1 row). One shuffle on the doc id.
  */
object Rank {

  /** Okapi BM25 score of every document against `queryTerms`.
    *
    * score(d) = Σ_t ln((N − df_t + 0.5)/(df_t + 0.5) + 1) ·
    *            tf_td / (tf_td + k1·(1 − b + b·|d|/avgdl))
    *
    * (the Robertson–Spärck-Jones idf with the Lucene +1 floor, so scores
    * are non-negative even for terms in over half the corpus). Documents
    * matching no query term score 0. Output: (idCol, bm25), the score
    * rounded to 4 decimals (ln differs across engines in the last ulp).
    */
  def bm25Scores(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    val toks = df.select(col(idCol), Text.tokens(col(textCol)).as("__t"))
      .withColumn("__dl", size(col("__t")).cast("double"))
    val stats = toks.agg(count(lit(1)).cast("double").as("__N"),
      avg(col("__dl")).as("__avgdl"))
    val m = toks.select(col(idCol), col("__dl"), explode(col("__t")).as("__w"))
      .filter(col("__w").isInCollection(queryTerms.distinct))
    val tf = m.groupBy(col(idCol), col("__w"))
      .agg(max(col("__dl")).as("__dl"), count(lit(1)).cast("double").as("__tf"))
    val dft = m.groupBy(col("__w"))
      .agg(countDistinct(col(idCol)).cast("double").as("__dft"))
    val contrib = tf.join(broadcast(dft), "__w").crossJoin(broadcast(stats))
      .withColumn("__c",
        log((col("__N") - col("__dft") + 0.5) / (col("__dft") + 0.5) + 1.0) *
          col("__tf") /
          (col("__tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("__dl") / col("__avgdl"))))
    val scores = contrib.groupBy(idCol).agg(sum(col("__c")).as("__s"))
    df.select(col(idCol)).join(scores, Seq(idCol), "left")
      .select(col(idCol), round(coalesce(col("__s"), lit(0.0)), 4).as("bm25"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of N ranked lists —
    * the standard way hybrid retrieval merges a lexical ranking (BM25)
    * with a dense one (embedding cosine) without score calibration:
    *
    *   rrf(d) = Σ_lists 1 / (k + rank_list(d))
    *
    * Each input is (id, score); ranks are dense over (score DESC, id) so
    * ties are deterministic and engine-portable. A document absent from a
    * list simply contributes nothing for it (the pure RRF convention).
    *
    * Scale: each ranking is a window over its OWN list — these are the
    * top-k outputs of upstream retrievers (bounded, usually ≤10⁴ rows),
    * not the corpus; the fusion is a union + one aggregate on the id.
    * The rounding to 6 decimals absorbs cross-engine division ulp. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, scoreCol: String,
      k: Int = 60): DataFrame = {
    require(lists.nonEmpty, "empty fusion input")
    val ranked = lists.zipWithIndex.map { case (l, i) =>
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col(scoreCol).desc, col(idCol))
      l.select(col(idCol), col(scoreCol))
        .withColumn("__r", row_number().over(w))
        .select(col(idCol), lit(i).as("__li"),
          (lit(1.0) / (lit(k.toDouble) + col("__r"))).as("__c"))
    }
    // fold contributions in list order — bit-stable across partitionings
    ranked.reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(
        round(aggregate(
          transform(array_sort(collect_list(struct(col("__li"), col("__c")))),
            s => s.getField("__c")),
          lit(0.0), (acc, x) => acc + x), 6).as("rrf_score"),
        count(lit(1)).as("n_lists"))
  }
}
