package graft.sources.grib

import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Grib2Spec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  test("edition-2 writer → parser → scan: cells, negative coords, multi-message") {
    val dir = Files.createTempDirectory("grib2ed").toString
    GribFormat.writeFile(spark, s"$dir/two.grb2", Seq(
      (61, LocalDateTime.of(2024, 3, 1, 0, 0), Seq(-45.5, -45.0),
        Seq(10.0, 10.5), Array(1.0, 2.0, 3.0, 4.0)),
      (61, LocalDateTime.of(2024, 3, 2, 0, 0), Seq(-45.5, -45.0),
        Seq(10.0, 10.5), Array(5.0, 6.0, 7.0, 8.0))), edition = 2)
    val df = spark.read.format("grib1").load(s"$dir/two.grb2")
    assert(df.columns.toSeq ==
      Seq("time", "latitude", "longitude", "param", "member", "derived",
        "level_type", "level", "level_to", "ref_time", "step", "step_start",
        "prob_type", "prob_lo", "prob_hi", "percentile", "value"))
    assert(df.count() == 8)
    val r = df.filter(col("time") === lit(ts("2024-03-02T00:00:00")) &&
      col("latitude") === -45.0 && col("longitude") === 10.5).head()
    assert(r.getAs[Double]("value") == 8.0)
    assert(r.getAs[Int]("param") == 61)
  }

  test("edition-2 decimal scaling and sub-microdegree coords are exact") {
    val dir = Files.createTempDirectory("grib2dec").toString
    val vals = Array(0.25, 1.75, -3.5, 10.0, 0.0, 99.75)
    GribFormat.writeFile(spark, s"$dir/f.grb2", Seq(
      (11, LocalDateTime.of(2024, 1, 1, 6, 30), Seq(0.125, 1.125),
        Seq(0.0, 0.625, 1.25), vals)), decimalScale = 2, edition = 2)
    val got = spark.read.format("grib1").load(s"$dir/f.grb2")
      .orderBy("latitude", "longitude")
    assert(got.select("value").as[Double].collect().toSeq == vals.toSeq)
    // 10^-6-degree grid coords survive exactly (GRIB1's millidegrees
    // could not carry 0.625 at 3 decimals — the edition-2 gain)
    assert(got.select("longitude").distinct().orderBy("longitude")
      .as[Double].collect().toSeq == Seq(0.0, 0.625, 1.25))
  }

  test("a file may mix editions; both decode to the same schema") {
    val dir = Files.createTempDirectory("gribmix").toString
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val out = new java.io.DataOutputStream(
      fs.create(new org.apache.hadoop.fs.Path(s"$dir/mix.grb"), true))
    try {
      GribFormat.writeMessage(out, 7, LocalDateTime.of(2024, 5, 1, 0, 0),
        Seq(0.0, 1.0), Seq(0.0, 1.0), Array(1.0, 2.0, 3.0, 4.0))
      GribFormat.writeMessage2(out, 7, LocalDateTime.of(2024, 5, 2, 0, 0),
        Seq(0.0, 1.0), Seq(0.0, 1.0), Array(10.0, 20.0, 30.0, 40.0))
    } finally out.close()
    val df = spark.read.format("grib1").load(s"$dir/mix.grb")
    val sums = df.groupBy("time").agg(sum("value").as("s"))
      .orderBy("time").select("s").as[Double].collect().toSeq
    assert(sums == Seq(10.0, 100.0))
  }

  test("edition-2 forecast time shifts the valid time") {
    val dir = Files.createTempDirectory("grib2lead").toString
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val out = new java.io.DataOutputStream(
      fs.create(new org.apache.hadoop.fs.Path(s"$dir/lead.grb2"), true))
    try GribFormat.writeMessage2(out, 2, LocalDateTime.of(2024, 12, 31, 18, 0),
      Seq(0.0, 1.0), Seq(0.0, 1.0), Array(1.0, 2.0, 3.0, 4.0), leadHours = 9)
    finally out.close()
    val t = spark.read.format("grib1").load(s"$dir/lead.grb2")
      .select("time").distinct().as[java.time.LocalDateTime].head()
    assert(t == LocalDateTime.of(2025, 1, 1, 3, 0)) // crosses the year
  }

  test("edition-2 messages prune by time and param at planning") {
    val dir = Files.createTempDirectory("grib2prune").toString
    GribFormat.writeFile(spark, s"$dir/p.grb2", (1 to 5).map { d =>
      (d, LocalDateTime.of(2024, 6, d, 0, 0), Seq(0.0, 1.0), Seq(0.0, 1.0),
        Array(1.0, 2.0, 3.0, 4.0))
    }, edition = 2)
    val plan = spark.read.format("grib1").load(s"$dir/p.grb2")
      .filter(col("time") >= lit(ts("2024-06-04T00:00:00")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("messages=2/5"), s"expected message pruning in:\n$plan")
    val byParam = spark.read.format("grib1").load(s"$dir/p.grb2")
      .filter(col("param") === 3)
      .queryExecution.executedPlan.toString
    assert(byParam.contains("messages=1/5"), s"expected param pruning in:\n$byParam")
  }

  test("lossy JPEG 2000 (compression type 1) is refused by name") {
    // write a real 5.40 file, then patch section 5's compression-type
    // octet (22) to 1 — the refusal fires at section-5 parse, before any
    // codestream bytes are touched
    val dir = Files.createTempDirectory("grib2jp2").toString
    val path = s"$dir/jp2.grb2"
    GribFormat.writeFile(spark, path, Seq(
      (61, LocalDateTime.of(2024, 3, 1, 0, 0), Seq(0.0, 1.0),
        Seq(0.0, 1.0), Array(1.0, 2.0, 3.0, 4.0))), edition = 2,
      jpegPacking = true)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
    // walk sections (16-byte indicator, then [len:4][num:1] sections) to
    // section 5; compression type sits at section octet 22
    var off = 16
    var patched = false
    while (!patched) {
      val len = ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
      if ((bytes(off + 4) & 0xff) == 5) {
        bytes(off + 21) = 1
        patched = true
      } else off += len
    }
    // fresh name: the writer's Hadoop-local .crc sidecar would otherwise
    // reject the patched bytes before the parser ever sees them
    val patchedPath = s"$dir/jp2_patched.grb2"
    Files.write(java.nio.file.Paths.get(patchedPath), bytes)
    val err = intercept[Throwable] {
      spark.read.format("grib1").load(patchedPath).count()
    }
    val msgs = Iterator.iterate(err)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("lossless") && msgs.contains("unsupported"),
      s"unexpected error chain: $msgs")
  }

  test("param category lands in the high byte of paramId") {
    val dir = Files.createTempDirectory("grib2cat").toString
    GribFormat.writeFile(spark, s"$dir/c.grb2", Seq(
      ((3 << 8) | 7, LocalDateTime.of(2024, 1, 1, 0, 0), Seq(0.0, 1.0),
        Seq(0.0, 1.0), Array(1.0, 2.0, 3.0, 4.0))), edition = 2)
    val p = spark.read.format("grib1").load(s"$dir/c.grb2")
      .select("param").distinct().as[Int].head()
    assert(p == ((3 << 8) | 7))
  }
}
