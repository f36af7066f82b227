package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.functions.{Tar, Warc}

/** MICRO_BATCH_READ over archive landing directories — the live-crawl
  * shape: a fetcher drops finished .warc.gz segments / WebDataset
  * shards, the curation pipeline drains them incrementally. Same
  * watermark contract as the GRIB/NetCDF streams (natural filename
  * order, append-only dir, per-file admission), with the batch scan's
  * SPLIT partitions inside each admitted file. */
class ArchiveStreamingSpec extends SparkSpec {

  private def writeWarc(path: String, n: Int): Unit =
    Files.write(Paths.get(path), Warc.encode(
      (0 until n).map(i => Warc.WRecord("response",
        targetUri = s"https://x.test/$i", httpStatus = Some(200),
        body = s"<p>doc $i</p>")), gzipPerRecord = true))

  test("warc stream ingests newly-landed segments incrementally; " +
      "maxFilesPerTrigger bounds batches") {
    val dir = Files.createTempDirectory("warcstream").toString
    writeWarc(s"$dir/seg9.warc.gz", 3)
    writeWarc(s"$dir/seg10.warc.gz", 4) // natural order beats lexicographic
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("warc")
      .option("maxFilesPerTrigger", "1")
      .option("maxSplitBytes", "512") // split partitions inside a batch
      .load(dir)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = df.count()
        if (n > 0) batches.synchronized { batches += n }; ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("warcstream_ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      // one file per batch, natural order: seg9 (3 records) then seg10 (4)
      assert(batches.synchronized(batches.toSeq) == Seq(3L, 4L))
      writeWarc(s"$dir/seg11.warc.gz", 2)
      q.processAllAvailable()
      assert(batches.synchronized(batches.toSeq) == Seq(3L, 4L, 2L))
      q.processAllAvailable() // no new files → no new rows
      assert(batches.synchronized(batches.toSeq) == Seq(3L, 4L, 2L))
    } finally q.stop()
  }

  test("webdataset stream drains a landing dir of shards") {
    val dir = Files.createTempDirectory("wdsstream").toString
    def shard(path: String, base: Int): Unit =
      Files.write(Paths.get(path), Tar.encode((0 until 3).flatMap(k => Seq(
        f"s${base + k}%04d.txt" -> s"t${base + k}".getBytes("UTF-8"),
        f"s${base + k}%04d.cls" -> "1".getBytes("UTF-8")))))
    shard(s"$dir/shard-1.tar", 0)
    val total = new java.util.concurrent.atomic.AtomicLong
    val q = spark.readStream.format("webdataset")
      .option("maxSplitBytes", "1024").load(dir)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        total.addAndGet(df.count()); ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("wdsstream_ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(total.get() == 6)
      shard(s"$dir/shard-2.tar", 10)
      q.processAllAvailable()
      assert(total.get() == 12)
    } finally q.stop()
  }
}
