package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dedup, Graph}

/** 10M-document stress tier for the iterative operators — one order of
  * magnitude above the always-on 1M gates, where GC pressure and the
  * checkpoint lifecycle actually bite. Run STANDALONE (it wants its own
  * local[32] session and several minutes):
  *
  *   GRAFT_STRESS_10M=1 sbt "testOnly graft.StressTier10MSpec"
  *
  * Measured numbers are recorded in SCALING.md §stress-tiers; the
  * assertions here pin CORRECTNESS at scale (component structure, rank
  * conservation, planted-dup recall) and the LIFECYCLE invariant (no net
  * growth of persisted blocks after Housekeeping), not wall-clock. */
class StressTier10MSpec extends AnyFunSuite {

  private def enabled = sys.env.contains("GRAFT_STRESS_10M")

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[32]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-stress-10m")
    .getOrCreate()

  private def timed[T](what: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    info(f"$what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  private def blocksResident: Int = spark.sparkContext.getPersistentRDDs.size

  test("connected components at 10M nodes: exact structure, no block leak") {
    assume(enabled, "set GRAFT_STRESS_10M=1 to run the 10M stress tier")
    val before = blocksResident
    // 2M chains of 5 nodes: edges (i, i+1) except at chain boundaries
    val n = 10000000L
    val pairs = spark.range(n - 1)
      .filter(col("id") % 5 =!= 4)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val cc = timed("CC 10M nodes / 8M edges") {
      val out = Dedup.connectedComponents(pairs, "a", "b")
      val sizes = out.groupBy("component").count()
        .groupBy("count").agg(count(lit(1)).as("n_components"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      sizes
    }
    // every chain must resolve to exactly one 5-node component
    assert(cc == Map(5L -> 2000000L), s"component size histogram: $cc")
    Housekeeping.releaseAll(spark, blocking = true)
    assert(blocksResident <= before,
      s"persistent blocks grew: $before -> $blocksResident")
  }

  test("pagerank at 10M nodes / 30M edges: rank conservation, no block leak") {
    assume(enabled, "set GRAFT_STRESS_10M=1 to run the 10M stress tier")
    val before = blocksResident
    val n = 10000000L
    // ring + two deterministic chord families → ~30M directed edges
    val ids = spark.range(n)
    val edges = ids.select(col("id").as("src"), ((col("id") + 1) % n).as("dst"))
      .unionAll(ids.select(col("id").as("src"),
        ((col("id") * 2 + 1) % n).as("dst")))
      .unionAll(ids.select(col("id").as("src"),
        ((col("id") * 7 + 3) % n).as("dst")))
    val (nNodes, totalRank) = timed("PageRank 10M nodes / 30M edges, 3 iters") {
      val pr = Graph.pageRank(edges, "src", "dst", iters = 3)
      val r = pr.agg(count(lit(1)), sum(col("rank"))).head()
      val out = (r.getLong(0), r.getLong(1))
      Housekeeping.release(pr)
      out
    }
    assert(nNodes == n)
    // integer PageRank conserves total mass up to floor truncation: each
    // iteration loses < 1 unit per EDGE (contrib floor) + < 1 per node
    // (damping floor) → 3 iters lose < 3·(E + n) = 120M units of the
    // n·scale = 10^13 total (12 ppm). A real conservation bug (dropped
    // dangling mass, lost partition) is orders of magnitude larger.
    val scale = 1000000L
    val nEdges = 30000000L
    assert(totalRank <= n * scale && totalRank > n * scale - 3L * (nEdges + n),
      s"total rank $totalRank vs ${n * scale}")
    Housekeeping.releaseAll(spark, blocking = true)
    assert(blocksResident <= before,
      s"persistent blocks grew: $before -> $blocksResident")
  }

  test("LSH admission at a 10M-doc index: batch-proportional probe, full recall") {
    assume(enabled, "set GRAFT_STRESS_10M=1 to run the 10M stress tier")
    val sp = spark
    val n = 10000000L
    val nParts = 256
    def textExpr(id: org.apache.spark.sql.Column, salt: Int) =
      array_join(transform(sequence(lit(0), lit(11)),
        w => concat(lit("w"), pmod(xxhash64(id, w + lit(salt * 1000)), lit(4000)))), " ")
    val corpus = sp.range(n).select(col("id").as("doc_id"),
      textExpr(col("id"), 0).as("text"))
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_lsh_stress10m"
    val fs = new HPath(path).getFileSystem(sp.sparkContext.hadoopConfiguration)
    fs.delete(new HPath(path), true)
    timed("index build 10M docs") {
      Dedup.lshIndexWrite(corpus, "doc_id", "text", path,
        shingleSize = 3, numHashes = 64, bands = 16, nParts = nParts)
    }
    val indexBytes = fs.getContentSummary(new HPath(path)).getLength
    info(f"index size: ${indexBytes / 1e6}%.0f MB")

    val batch = sp.range(1024).select(
      (col("id") + n).as("doc_id"),
      when(col("id") % 16 === 0, textExpr(pmod(col("id") * 997, lit(n)), 0))
        .otherwise(textExpr(col("id"), 7)).as("text"))
    val bytesRead = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          bytesRead.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
    }
    sp.sparkContext.addSparkListener(listener)
    val dups = timed("probe 1024-doc batch") {
      Dedup.lshProbeNearDups(sp, path, batch, "doc_id", "text", 0.9).collect()
    }
    Thread.sleep(500)
    sp.sparkContext.removeSparkListener(listener)
    val partBytes = indexBytes / nParts
    info(f"probe read ${bytesRead.get / 1e6}%.1f MB = " +
      f"${bytesRead.get * 100.0 / indexBytes}%.2f%% of the index " +
      f"(~${bytesRead.get / math.max(partBytes, 1)} of $nParts partitions)")
    // all 64 planted duplicates, zero false pairs
    assert(dups.length == 64, s"${dups.length} pairs")
    assert(dups.forall(_.getAs[Double]("jaccard") == 1.0))
    // the real scale model: probe I/O = (touched partitions, governed by
    // the batch's band hashes + candidate docs) × (partition size, fixed
    // by sizing nParts to the corpus). Measured: ~7 of 256 partitions
    // (80 MB of 2.9 GB). Pin the partition-count bound, not a raw
    // fraction — a regression to corpus-wide scans touches ALL partitions
    assert(bytesRead.get < 32L * partBytes,
      s"probe read ${bytesRead.get} bytes = more than 32 of $nParts " +
        s"partitions ($partBytes B each) — no longer partition-pruned")
  }
}
