package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Zip

/** INDEX-planned `format("zip")` DSv2: partitions from the central
  * directory (no resync), member-name pushdown pruning at planning,
  * payload-free column pruning, ZIP64, JDK interop, streaming reuse. */
class ZipSourceSpec extends SparkSpec {

  private def files(n: Int): Seq[(String, Array[Byte], Boolean)] =
    (0 until n).map(i => (f"book/ch$i%03d.${if (i % 4 == 0) "xml" else "txt"}",
      s"chapter $i ${"body " * (i % 30)}".getBytes("UTF-8"), i % 2 == 1))

  private def zipDir(n: Int = 60, zip64: Boolean = false): String = {
    val dir = Files.createTempDirectory("zipsrc").toString
    Files.write(Paths.get(s"$dir/a.zip"), Zip.encode(files(n), zip64))
    dir
  }

  test("members bin into >1 partition by compressed size; rows invariant " +
      "across split sizes and equal to the in-memory reference") {
    val dir = zipDir()
    def collect(split: Long) = {
      val df = spark.read.format("zip")
        .option("maxSplitBytes", split.toString).load(dir)
      (df.rdd.getNumPartitions,
        df.select(col("entry_idx"), col("name"), col("method"),
            col("byte_size"), col("payload").cast("string").as("p"))
          .orderBy("entry_idx").collect().toSeq)
    }
    val (n1, whole) = collect(10L << 20)
    val (nk, split) = collect(512)
    assert(n1 == 1 && nk > 3, s"$n1/$nk")
    assert(whole == split)
    val ref = Zip.entries(1L, Files.readAllBytes(Paths.get(s"$dir/a.zip")))
    assert(whole.map(r => (r.getString(1), new String(
      ref(r.getInt(0)).data, "UTF-8") == r.getString(4))).forall(_._2))
    assert(whole.length == ref.length)
  }

  test("member-name pushdown prunes AT PLANNING: fewer partitions, " +
      "PushedFilters visible, exact rows") {
    val dir = zipDir()
    val df = spark.read.format("zip")
      .option("maxSplitBytes", "512").load(dir)
    val all = df.rdd.getNumPartitions
    val filtered = df.filter(col("name").startsWith("book/ch00"))
    assert(filtered.count() == 10)
    assert(filtered.rdd.getNumPartitions < all,
      s"${filtered.rdd.getNumPartitions} vs $all")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("StringStartsWith"), plan)
  }

  test("without the payload column a task reads ZERO member bytes " +
      "(inventory queries touch only the directory)") {
    val dir = zipDir()
    val df = spark.read.format("zip").load(dir)
      .select("name", "byte_size")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("payload"), plan)
    assert(df.count() == 60)
  }

  test("ZIP64 archives plan and read through the same path") {
    val dir = zipDir(n = 20, zip64 = true)
    val rows = spark.read.format("zip").option("maxSplitBytes", "512")
      .load(dir)
      .select(col("name"), col("payload").cast("string").as("p"))
      .orderBy("name").collect()
    assert(rows.length == 20)
    assert(rows.head.getAs[String]("p").startsWith("chapter 0"))
  }

  test("INTEROP: a JDK ZipOutputStream archive (data-descriptor local " +
      "headers) reads through the DSv2") {
    val dir = Files.createTempDirectory("zipjdk").toString
    val fo = new java.io.FileOutputStream(s"$dir/j.zip")
    val zo = new java.util.zip.ZipOutputStream(fo)
    for (i <- 0 until 8) {
      zo.putNextEntry(new java.util.zip.ZipEntry(s"m$i.txt"))
      zo.write(s"jdk member $i".getBytes("UTF-8"))
      zo.closeEntry()
    }
    zo.close()
    val rows = spark.read.format("zip").load(dir)
      .select(col("name"), col("payload").cast("string").as("p"))
      .orderBy("name").collect()
    assert(rows.length == 8)
    assert(rows.map(_.getAs[String]("p")).toSeq ==
      (0 until 8).map(i => s"jdk member $i"))
  }

  test("streaming drains a landing dir of archives") {
    val dir = Files.createTempDirectory("zipstream").toString
    Files.write(Paths.get(s"$dir/b1.zip"), Zip.encode(files(5)))
    val total = new java.util.concurrent.atomic.AtomicLong
    val q = spark.readStream.format("zip").load(dir)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        total.addAndGet(df.count()); ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("zipstream_ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(total.get() == 5)
      Files.write(Paths.get(s"$dir/b2.zip"), Zip.encode(files(7)))
      q.processAllAvailable()
      assert(total.get() == 12)
    } finally q.stop()
  }
}
