package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Similarity}
import graft.ops.Filters

/** Physical-plan shape assertions: the scale claims in the operator docs
  * must be visible in `explain` output — filters pushed to the scan, small
  * sides broadcast, top-k as TakeOrderedAndProject, no cartesian products.
  * These tests pin the plans so a refactor that silently loses a pushdown
  * or broadcasts the wrong side fails CI, not the 100 TB run.
  */
class PlanShapeSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private lazy val dataDir: String = {
    val dir = Files.createTempDirectory("planspec").toString
    dailyGrid(1, 20).write.parquet(s"$dir/grid")
    dir
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("time-slice filter pushes down to the parquet scan") {
    val scan = spark.read.parquet(s"$dataDir/grid")
    val q = Filters.timeSlice(scan, "time",
      lit(ts("2024-01-05T00:00:00")), lit(ts("2024-01-10T00:00:00")))
    val plan = planOf(q)
    assert(plan.contains("PushedFilters:") &&
      plan.replaceAll("\\s", "").contains("GreaterThanOrEqual(time"),
      s"expected pushed time predicate in:\n$plan")
  }

  test("column pruning: a two-column projection reads a two-column schema") {
    val scan = spark.read.parquet(s"$dataDir/grid")
    val q = scan.select("time", "value").filter(col("value") > 0)
    val plan = planOf(q)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("time") && readSchema.contains("value") &&
      !readSchema.contains("latitude"),
      s"expected pruned ReadSchema, got: $readSchema")
  }

  test("semi-join filter broadcasts the small distinct key side") {
    val scan = spark.read.parquet(s"$dataDir/grid")
    val keys = dailyGrid(1, 3).select("time")
    val plan = planOf(Filters.semiJoinFilter(scan, keys, Seq("time")))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected broadcast left-semi join in:\n$plan")
  }

  test("nearest-with-tolerance is a TakeOrderedAndProject, not a global sort") {
    val scan = spark.read.parquet(s"$dataDir/grid")
    val q = Filters.nearestWithTolerance(scan, "time",
      lit(ts("2024-01-05T12:00:00")), 86400.0)
    val plan = planOf(q)
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k in:\n$plan")
    assert(!plan.contains("Sort ["), s"no global sort expected in:\n$plan")
  }

  test("brute-force cosine top-k is a TakeOrderedAndProject") {
    val vecs = (0 until 100)
      .map(i => (i.toLong, Array.fill(8)(i.toFloat / 100)))
      .toDF("vec_id", "embedding")
    val plan = planOf(Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      Seq.fill(8)(0.5f), 5))
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k in:\n$plan")
  }

  test("minhash candidate pairs: no cartesian product anywhere") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d f")).toDF("doc_id", "text")
    val plan = planOf(Dedup.minhashCandidatePairs(docs, "doc_id", "text", 3, 16, 4))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must stay an equi-join:\n$plan")
  }

  test("minhash signatures are computed shuffle-free (native expression)") {
    Seq((1L, "a b c d e"), (2L, "b c d e f"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dataDir/docs")
    val docs = spark.read.parquet(s"$dataDir/docs")
    val plan = planOf(Dedup.minhashSignatures(docs, "doc_id", "text", 3, 16))
    assert(plan.contains("minhash_signature"), s"expected native expr in:\n$plan")
    assert(!plan.contains("Exchange"),
      s"signature generation must not shuffle:\n$plan")
  }

  test("heavy-hitter verify join broadcasts the candidate frame") {
    val docs = (1 to 50).map(i => (i.toLong, "the quick fox " + s"w$i"))
      .toDF("doc_id", "text")
    val plan = planOf(graft.functions.Sketch.frequentTokens(docs, "text", 0.05))
    assert(plan.contains("BroadcastHashJoin"),
      s"candidates must broadcast into the verify join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus-side tokens must never sort-merge:\n$plan")
  }

  test("post-parse QC bounds the store side to each file's time range (O7)") {
    import graft.model.{DatasetDescriptor, TimeSpan, TimeUnitKind}
    import graft.ops.QcDrivers
    import graft.store.GridStore
    val root = Files.createTempDirectory("o7prune").toString
    val desc = DatasetDescriptor("o7", "value", timeResolution = TimeSpan.Daily)
    val store = new GridStore(spark, s"$root/store", desc, TimeUnitKind.Days)
    store.writeInitial(dailyGrid(1, 6)) // six daily bucket directories
    dailyGrid(1, 6).filter(col("time") === lit(ts("2024-01-02T00:00:00")))
      .write.parquet(s"$root/f1") // source file covers day 2 only
    var ranges = List.empty[(java.time.LocalDateTime, java.time.LocalDateTime)]
    val out = QcDrivers.postParseQualityCheck(spark,
      (lo, hi) => { ranges ::= (lo, hi); store.readRange(lo, hi) },
      Seq(s"$root/f1"), f => spark.read.parquet(f),
      Seq("time", "latitude", "longitude"), "value", desc, maxChecks = 10)
    assert(out.count() == 0)
    // the accessor saw only the file's own (day-2) range …
    val (lo, hi) = ranges.head
    assert(lo.toLocalDate.toString == "2024-01-02" && hi.toLocalDate == lo.toLocalDate)
    // … and the bucket-pruned range read touches ONLY that bucket directory
    val files = store.readRange(lo, hi)
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("__bucket=2024-01-02")),
      s"expected only the day-2 bucket, read: ${files.mkString(", ")}")
  }

  test("exact dedup shuffles the hash, not the text") {
    val docs = Seq((1L, "some long document body")).toDF("doc_id", "text")
    val plan = planOf(Dedup.exactDupGroups(docs, "doc_id", "text"))
    val exchangeLine = plan.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .mkString("\n")
    assert(exchangeLine.contains("content_hash"),
      s"shuffle key should be the md5 hash:\n$exchangeLine")
  }

  test("hash sampling is a pure filter: no exchange, no aggregate") {
    val docs = Seq((1L, "en"), (2L, "de")).toDF("doc_id", "lang")
    val plan = planOf(graft.ops.Sampling.stratifiedSampleByHash(
      docs, "doc_id", "lang", Map("en" -> 0.5), 0.25))
    assert(!plan.contains("Exchange") && !plan.contains("Aggregate"),
      s"sampling must stay a per-row filter:\n$plan")
  }

  test("sequence packing windows are shard-partitioned, never global") {
    val docs = Seq((1L, "a b c"), (2L, "d e")).toDF("doc_id", "text")
    val plan = planOf(graft.functions.Text.packSequences(docs, "doc_id", "text", 512, 4))
    val windowLines = plan.linesIterator.filter(_.contains("Window")).mkString("\n")
    assert(plan.contains("hashpartitioning(shard"),
      s"the window must partition by shard:\n$plan")
    assert(!windowLines.contains("SinglePartition"),
      s"no global single-partition window allowed:\n$windowLines")
  }

  test("Bloom decontamination keeps might_contain out of interpreted UDF land") {
    val corpus = Seq((10L, "w1 w2 w3 w4 w5 w6 w7 w8 w9")).toDF("doc_id", "text")
    val bench = Seq((1L, "w1 w2 w3 w4 w5 w6 w7 w8")).toDF("doc_id", "text")
    val plan = planOf(Dedup.contaminatedDocsBloom(corpus, bench, "doc_id", "text"))
    assert(plan.contains("might_contain"), s"expected the native expression:\n$plan")
    assert(!plan.contains("UDF"), s"no Scala UDF on the corpus scan:\n$plan")
  }

  test("BPE pair counting partial-aggregates map-side before the shuffle") {
    val docs = Seq((1L, "abab cd")).toDF("doc_id", "text")
    val plan = planOf(graft.functions.Text.charPairCounts(docs, "text"))
    assert(plan.contains("partial_count"),
      s"expected a partial (map-side) count before the exchange:\n$plan")
  }

  test("SQ8 top-k: d-row stats broadcast, top-k is TakeOrderedAndProject") {
    val emb = Seq((0L, Seq(1.0f, 2.0f)), (1L, Seq(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val plan = planOf(Similarity.sq8TopK(emb, "vec_id", "embedding",
      Seq(1.0f, 2.0f), 5))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must not be a global sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the per-dimension stats side must broadcast:\n$plan")
  }

  test("DSIR weights: corpus totals ride as a one-row broadcast, no cartesian") {
    val docs = Seq((1L, "a b", "en"), (2L, "c", "de")).toDF("doc_id", "text", "lang")
    val plan = planOf(graft.functions.Text.dsirWeights(
      docs, "doc_id", "text", col("lang") === "en"))
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected the one-row totals broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no cartesian product allowed:\n$plan")
  }

  test("threshold indices aggregate without any window or sort") {
    val grid = dailyGrid(1, 10)
    val plan = planOf(graft.ops.GridAnalytics.thresholdIndices(grid, "time",
      Seq("latitude", "longitude"), "value", "month", 10.0, 5.0, 15.0))
    assert(!plan.contains("Window") && !plan.contains("Sort"),
      s"one hash aggregate, no window/sort:\n$plan")
    assert(plan.contains("partial"),
      s"expected a map-side partial aggregate:\n$plan")
  }

  test("triangle counting stays equi-join: no cartesian, no nested loop") {
    val es = (0 until 60).map(i => (i.toLong % 12, (i * 7).toLong % 12))
      .toDF("src", "dst")
    val plan = planOf(graft.functions.Graph.triangleCounts(es, "src", "dst"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"wedge + closing joins must be equi-joins:\n$plan")
  }

  test("pageRank round output reads the checkpointed frame, not a " +
      "re-derived lineage (constant plan depth across iterations)") {
    val es = (0 until 60).map(i => (i.toLong % 12, (i * 7).toLong % 12))
      .toDF("src", "dst")
    val pr = graft.functions.Graph.pageRank(es, "src", "dst", iters = 3)
    val plan = planOf(pr)
    // after per-round localCheckpoint the final plan is a projection over
    // the materialized RDD — iteration count must not deepen it
    assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"),
      s"expected checkpoint-backed scan in:\n$plan")
    assert(!plan.contains("Join"),
      s"no join lineage may survive the checkpoint:\n$plan")
  }
}
