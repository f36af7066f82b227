package graft.functions

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.graftbridge.TestBridge
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import graft.{Housekeeping, SparkSpec}

/** The checkpoint-lifecycle contract for iterative operators: every
  * superseded round's blocks are released while the loop runs, at most ONE
  * persisted frame (the result) survives the call, and
  * [[Housekeeping.release]] returns the session to its baseline. Without
  * this, a long session (the 129-query bench; a week-long curation job)
  * accumulates dead checkpoint blocks until the block manager starts
  * evicting live ones — the q68 regression of round 6. */
class CheckpointLifecycleSpec extends SparkSpec {

  private def resident: Int = spark.sparkContext.getPersistentRDDs.size

  private def pairsDf = {
    val sp = spark; import sp.implicits._
    // two multi-edge components, one self-loop-only node, one disjoint pair
    Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (6L, 6L), (7L, 8L), (8L, 9L))
      .toDF("a", "b")
  }

  test("connectedComponents retains exactly its result; release restores baseline") {
    Housekeeping.releaseAll(spark)
    val base = resident
    val cc = Dedup.connectedComponents(pairsDf, "a", "b")
    val rows = cc.collect()
    assert(rows.length == 9)
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L,
        7L -> 7L, 8L -> 7L, 9L -> 7L))
    assert(resident == base + 1,
      s"expected only the result frame persisted, found ${resident - base}")
    Housekeeping.release(cc)
    assert(resident == base, "release(result) must restore the baseline")
  }

  test("pageRank / personalizedPageRank / triangleCounts retain exactly one frame") {
    val sp = spark; import sp.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("s", "d")
    for ((name, run) <- Seq[(String, () => org.apache.spark.sql.DataFrame)](
        "pageRank" -> (() => Graph.pageRank(edges, "s", "d", iters = 3)),
        "personalizedPageRank" ->
          (() => Graph.personalizedPageRank(edges, "s", "d", seeds = Seq(1L), iters = 3)),
        "triangleCounts" -> (() => Graph.triangleCounts(edges, "s", "d")))) {
      Housekeeping.releaseAll(spark)
      val base = resident
      val out = run()
      assert(out.collect().nonEmpty)
      assert(resident == base + 1, s"$name left ${resident - base} frames persisted")
      Housekeeping.release(out)
      assert(resident == base, s"$name result not released")
    }
  }

  test("connectedComponents runs ONE driver action per round (digest materializes the lazy checkpoint)") {
    val sp = spark; import sp.implicits._
    val heads = new AtomicInteger
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        if (funcName == "head") heads.incrementAndGet()
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // a single edge converges in exactly one round: digests = initial + 1
      Dedup.connectedComponents(Seq((1L, 2L)).toDF("a", "b"), "a", "b").collect()
      TestBridge.waitListenerBusEmpty(spark.sparkContext)
      assert(heads.get() == 2,
        s"expected 2 digest actions (initial + 1 round), saw ${heads.get()}")
    } finally {
      spark.listenerManager.unregister(listener)
      Housekeeping.releaseAll(spark)
    }
  }
}
