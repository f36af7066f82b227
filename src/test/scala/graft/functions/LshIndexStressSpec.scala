package graft.functions

import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.graftbridge.TestBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The marquee incremental-dedup claim at stress scale: a PERSISTED 1M-doc
  * LSH index admits a new batch with probe cost proportional to the BATCH,
  * not the corpus — the corpus text is never re-shingled, and the verify
  * join reads only the doc partitions that hold actual candidates. q104
  * gates the same loop's correctness at oracle scale; this spec measures
  * the scale behavior (task input bytes) and pins recall on planted
  * duplicates at 1M. Numbers feed SCALING.md §incremental-dedup. */
class LshIndexStressSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private val n = 1000000L
  private val nParts = 128

  /** Deterministic 12-word text over a 4k-word vocab; `salt` shifts the
    * word-position seed space (NOT the id — an id shift would just alias
    * another corpus doc's text verbatim). */
  private def textExpr(id: Column, salt: Int): Column =
    array_join(transform(sequence(lit(0), lit(11)),
      w => concat(lit("w"), pmod(xxhash64(id, w + lit(salt * 1000)), lit(4000)))), " ")

  private def corpus: DataFrame =
    spark.range(n).select(col("id").as("doc_id"), textExpr(col("id"), 0).as("text"))

  test("1M-doc index: batch probe is batch-proportional and finds every planted dup") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_lsh_stress"
    val fs = new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new HPath(path), true)

    val tBuild0 = System.nanoTime()
    Dedup.lshIndexWrite(corpus, "doc_id", "text", path,
      shingleSize = 3, numHashes = 64, bands = 16, nParts = nParts)
    val buildSec = (System.nanoTime() - tBuild0) / 1e9
    val indexBytes = fs.getContentSummary(new HPath(path)).getLength

    // batch of 1024: every 16th doc duplicates corpus doc (i*997) % n
    // verbatim (jaccard 1.0); the rest are salted fresh text
    val batch = spark.range(1024).select(
      (col("id") + n).as("doc_id"),
      when(col("id") % 16 === 0, textExpr(pmod(col("id") * 997, lit(n)), 0))
        .otherwise(textExpr(col("id"), 7)).as("text"))

    val bytesRead = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          bytesRead.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
    }
    def measured[A](body: => A): (A, Long) = {
      TestBridge.waitListenerBusEmpty(spark.sparkContext)
      bytesRead.set(0L)
      spark.sparkContext.addSparkListener(listener)
      try {
        val r = body
        TestBridge.waitListenerBusEmpty(spark.sparkContext)
        (r, bytesRead.get())
      } finally spark.sparkContext.removeSparkListener(listener)
    }

    val t1 = System.nanoTime()
    val (pairs, probeBytes) = measured {
      Dedup.lshProbeNearDups(spark, path, batch, "doc_id", "text", 0.9).collect()
    }
    val probeSec = (System.nanoTime() - t1) / 1e9

    // every plant found at jaccard 1.0, pointing at its planted original
    val found = pairs.map(r => r.getLong(1) -> r.getLong(0)).toMap
    val expected = (0L until 1024L by 16L).map(i => (i + n) -> (i * 997 % n))
    assert(expected.forall { case (b, a) => found.get(b).contains(a) },
      s"missing plants: ${expected.filterNot { case (b, a) => found.get(b).contains(a) }.take(5)}")
    assert(pairs.forall(_.getDouble(2) >= 0.9))
    // salted fresh texts must not near-dup anything (4000^12 space)
    assert(pairs.length == expected.size,
      s"unexpected extra pairs: ${pairs.length} vs ${expected.size}")

    // the scale claim: probing 1024 docs into a 1M-doc index reads a small
    // fraction of the index — the corpus is never re-shingled, and the
    // docs-side verify scan is partition-pruned to candidate partitions
    assert(probeBytes < indexBytes / 2,
      s"probe read $probeBytes of $indexBytes index bytes — not batch-proportional")

    // a 16-doc micro-batch must read strictly less than the 1024-doc batch
    // (band-partition pruning engages when the batch's hash spread < nParts)
    val micro = spark.range(16).select((col("id") + n + 5000).as("doc_id"),
      textExpr(col("id"), 11).as("text"))
    val (_, microBytes) = measured {
      Dedup.lshProbeNearDups(spark, path, micro, "doc_id", "text", 0.9).collect()
    }
    assert(microBytes < probeBytes,
      s"micro-batch read $microBytes vs batch $probeBytes")

    info(f"build ${buildSec}%.1f s; index ${indexBytes / 1e6}%.0f MB; " +
      f"probe(1024) ${probeSec}%.1f s / ${probeBytes / 1e6}%.0f MB read; " +
      f"probe(16) ${microBytes / 1e6}%.0f MB read")
    fs.delete(new HPath(path), true)
  }
}
