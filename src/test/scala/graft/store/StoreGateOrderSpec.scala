package graft.store

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

import graft.SparkSpec
import graft.model.{DatasetDescriptor, TimeSpan}

/** Tamper-evident pin for the publish protocol's READ-BEFORE-WRITE
  * invariant (r16, VERDICT r15 "What's wrong #3"): the classification
  * frame's plan reads the CURRENT store files, and since r15 dropped its
  * defensive checkpoint, correctness depends on the quality gate being the
  * frame's ONLY consumer and running BEFORE the delta write replaces those
  * files. r16 additionally runs the gate CONCURRENTLY with the padding
  * read (guide §2.6) — both remain strictly pre-write.
  *
  * This spec asserts the ordering at the JOB level via the labeled job
  * descriptions GridStore sets: every "update gate" job must END before
  * any "delta write" job STARTS. Anyone who reorders the protocol (moves
  * the gate after the write, or starts the write before awaiting the
  * gate) trips this even if results happen to survive on a small fixture.
  */
class StoreGateOrderSpec extends SparkSpec {

  private val desc = DatasetDescriptor("gate_order", "value",
    spatialDims = Seq("latitude", "longitude"), timeResolution = TimeSpan.Daily)

  private final case class Span(desc: String, start: Long, var end: Long = -1L)

  test("update gate completes before the delta write starts (overlap stays pre-write)") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_gateorder"
    GridStore.fileSystem(spark, path).delete(new HPath(path), true)
    val store = new GridStore(spark, path, desc)
    store.publish(dailyGrid(1, 10))

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Span]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(e.jobId, Span(d, e.time))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = jobs.get(e.jobId); if (s != null) s.end = e.time
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // insert 9-10 (overlap → padding read runs) + append 11-12
      store.publish(dailyGrid(9, 4, base = 100.0))
      Thread.sleep(500) // listener bus drain
    } finally spark.sparkContext.removeSparkListener(listener)

    val spans = jobs.values().toArray(Array.empty[Span]).toSeq
    val gate = spans.filter(_.desc.contains("update gate"))
    val pad = spans.filter(_.desc.contains("padding read"))
    val write = spans.filter(_.desc.contains("delta write"))
    assert(gate.nonEmpty, "no labeled 'update gate' job ran")
    assert(pad.nonEmpty, "no labeled 'padding read' job ran (fixture must overlap)")
    assert(write.nonEmpty, "no labeled 'delta write' job ran")
    assert(gate.forall(_.end > 0), "gate job did not finish")
    val gateEnd = gate.map(_.end).max
    val writeStart = write.map(_.start).min
    assert(gateEnd <= writeStart,
      s"delta write started at $writeStart before the update gate finished " +
        s"at $gateEnd — the gate must fully precede any write that replaces " +
        "the store files its classification frame reads")
  }
}
