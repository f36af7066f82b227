package graft

import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Text, Web}
import graft.ops.Sampling

/** E2E composition of the training-data curation operators — the pipeline a
  * real corpus build runs, stage by stage, with an invariant asserted after
  * each: quality filter → URL dedup → near-dup cluster dedup → per-source
  * cap → sequence packing. Also pins end-to-end determinism across
  * partitionings (every stage is hash/window-deterministic by design).
  */
class CorpusPipelineSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  /** 40 docs across 2 sources: 30 good prose docs (3 exact-duplicate
    * groups of 10), 5 too-short docs, 5 no-stopword docs. */
  private def corpus = {
    val prose = (g: Int) =>
      s"the quick brown fox g$g jumps over the lazy dog and runs to the barn " * 3
    val rows =
      (0 until 30).map(i => (i.toLong, prose(i % 3), s"src${i % 2}",
        s"https://Example.com/doc/${i % 3}?utm_source=x&v=${i % 3}")) ++
      (30 until 35).map(i => (i.toLong, "too short", s"src${i % 2}",
        s"https://example.com/short/$i")) ++
      (35 until 40).map(i => (i.toLong, "zz yy xx ww vv uu tt ss rr qq " * 5,
        s"src${i % 2}", s"https://example.com/junk/$i"))
    rows.toDF("doc_id", "text", "source", "url")
  }

  private def runPipeline(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    // 1. quality: only the 30 prose docs pass (short fails words, junk
    //    fails stopwords)
    val keep = Text.gopherQualityFilter(df, "doc_id", "text",
      minWords = 20, maxWords = 1000, minMeanLen = 2, maxMeanLen = 10)
      .filter(col("keep")).select("doc_id")
    val quality = df.join(keep, Seq("doc_id"))
    // 2. URL dedup: the 30 prose docs share 3 canonical URLs → 3 keepers
    val urlKeep = Web.urlDedup(quality, "doc_id", "url")
      .select(col("keeper_id").as("doc_id"))
    val urlDeduped = quality.join(urlKeep, Seq("doc_id"))
    // 3. near-dup cluster dedup is idempotent here (URL dedup already
    //    collapsed the exact-dup groups, and the 3 survivors differ)
    val deduped = Dedup.clusterCanonicalDedup(urlDeduped, "doc_id", "text",
      shingleSize = 3, numHashes = 16, bands = 4, threshold = 0.9)
      .join(urlDeduped, Seq("doc_id"))
    // 4. per-source cap + 5. packing compose without loss at this size
    val capped = Sampling.capPerStratum(deduped, "doc_id", "source", 5, "s")
    Text.packSequences(capped, "doc_id", "text", budgetTokens = 64, shards = 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
  }

  test("curation pipeline: each stage enforces its invariant") {
    val df = corpus
    val kept = Text.gopherQualityFilter(df, "doc_id", "text",
      minWords = 20, maxWords = 1000, minMeanLen = 2, maxMeanLen = 10)
      .filter(col("keep")).select("doc_id").as[Long].collect().toSet
    assert(kept == (0L until 30L).toSet, s"quality should keep the prose docs: $kept")

    val out = runPipeline(df)
    // 3 canonical docs survive (one per duplicate group: ids 0, 1, 2)
    assert(out == Seq(0L, 1L, 2L), s"pipeline survivors: $out")
  }

  test("curation pipeline is deterministic across partitionings") {
    assert(runPipeline(corpus.repartition(1)) == runPipeline(corpus.repartition(13)))
  }

  test("packing respects the budget over the surviving corpus") {
    val packed = Text.packSequences(corpus, "doc_id", "text",
      budgetTokens = 100, shards = 2)
    // every bin's token total stays under budget + one max-doc overshoot
    val maxDoc = packed.agg(max("n_tokens")).as[Long].head()
    val binTotals = packed.groupBy("shard", "bin")
      .agg(sum("n_tokens").as("tot")).as[(Long, Long, Long)].collect()
    assert(binTotals.forall(_._3 <= 100 + maxDoc),
      s"bin overflow: ${binTotals.mkString(",")}")
  }
}
