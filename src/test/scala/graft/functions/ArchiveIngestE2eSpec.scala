package graft.functions

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end ingestion glue: the archive readers consume the binary
  * column Spark's built-in `binaryFile` source produces — the exact
  * path a production job runs over a crawl/shard bucket
  * (`spark.read.format("binaryFile").load(dir)` → reader → text
  * operators), with distributed file-level parallelism for free. */
class ArchiveIngestE2eSpec extends SparkSpec {

  test("binaryFile dir of .warc.gz → records → htmlToText pipeline") {
    val dir = Files.createTempDirectory("warcdir").toString
    for (i <- 1 to 3) {
      val recs = Seq(
        Warc.WRecord("warcinfo", body = s"shard $i\n"),
        Warc.WRecord("response", targetUri = s"https://x.test/$i",
          httpStatus = Some(200),
          body = s"<html><body><p>doc $i &amp; text</p></body></html>"))
      Files.write(Paths.get(s"$dir/crawl-$i.warc.gz"),
        Warc.encode(recs, gzipPerRecord = true))
    }
    val bin = spark.read.format("binaryFile").load(dir)
      .select(
        regexp_extract(col("path"), "crawl-([0-9]+)", 1).cast("long").as("id"),
        col("content"))
    val texts = Warc.records(bin, "id", "content")
      .filter(col("http_status") === 200)
      .select(col("id"), Text.htmlToText(col("payload_text")).as("text"))
      .orderBy("id")
      .collect()
    assert(texts.map(_.getAs[String]("text")).toSeq ==
      (1 to 3).map(i => s"doc $i & text"))
  }

  test("binaryFile dir of WebDataset shards → samples → grouped training rows") {
    val dir = Files.createTempDirectory("wdsdir").toString
    for (i <- 1 to 2) {
      val files = (0 until 3).flatMap(k => Seq(
        f"$k%04d.txt" -> s"text $i-$k".getBytes("UTF-8"),
        f"$k%04d.cls" -> s"${(i + k) % 3}".getBytes("UTF-8")))
      Files.write(Paths.get(s"$dir/shard-$i.tar"), Tar.encode(files))
    }
    val bin = spark.read.format("binaryFile").load(dir)
      .select(
        regexp_extract(col("path"), "shard-([0-9]+)", 1).cast("long").as("id"),
        col("content"))
    // the WebDataset pivot: one training row per sample key
    val samples = Tar.webdatasetSamples(bin, "id", "content")
      .groupBy("id", "sample_key")
      .pivot("ext", Seq("txt", "cls"))
      .agg(first(col("payload").cast("string")))
    val rows = samples.orderBy("id", "sample_key").collect()
    assert(rows.length == 6)
    assert(rows.head.getAs[String]("txt") == "text 1-0")
    assert(rows.forall(r => r.getAs[String]("cls").length == 1))
  }

  test("binaryFile dir of TFRecord shards → tf.Example feature rows") {
    val dir = Files.createTempDirectory("tfrdir").toString
    val shard = TfRecord.encode(Seq(
      TfExample.encode(Seq(
        "text" -> TfExample.Feature("bytes",
          bytesVals = Seq("hello".getBytes("UTF-8"))),
        "label" -> TfExample.Feature("int64", int64Vals = Seq(1L))))),
      gzip = true)
    Files.write(Paths.get(s"$dir/part-0.tfrecord.gz"), shard)
    val bin = spark.read.format("binaryFile").load(dir)
      .select(lit(0L).as("id"), col("content"))
    val feats = TfExample.featureTable(bin, "id", "content")
      .orderBy("key").collect()
    assert(feats.map(_.getAs[String]("key")).toSeq == Seq("label", "text"))
  }
}
