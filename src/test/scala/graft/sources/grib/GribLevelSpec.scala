package graft.sources.grib

import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** S9 vertical-level axis + forecast keys — the two hypercube dimensions
  * the reference separates via `scan_grib(filter=…)[scan_indices]`
  * ("multiple depth / surface layers", transform.py:214-219, 234-240) and
  * its forecast/ensemble category dim sets (transform.py:724-759):
  *  - a multi-LEVEL file (the ERA5 pressure-level shape) scans with a
  *    distinct (level_type, level) per field, never colliding cells;
  *  - two reference times with overlapping VALID times stay distinct via
  *    (ref_time, step);
  *  - a file with two fields on the SAME full key is refused by name;
  *  - level / ref_time predicates prune whole messages at planning. */
class GribLevelSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft_griblevel_$tag"
    val p = new org.apache.hadoop.fs.Path(d)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true); fs.mkdirs(p)
    d
  }

  private def write(path: String)(body: java.io.DataOutputStream => Unit): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(p, true)))
    try body(out) finally out.close()
  }

  private val lats = Seq(0.0, 1.0)
  private val lons = Seq(10.0, 11.0)
  private def grid(base: Double): Array[Double] =
    Array.tabulate(4)(base + _)

  // 850/500/250 hPa in Pa at scale factor 0 — isobaric surface type 100
  private val PressureLevels = Seq(85000L, 50000L, 25000L)

  test("multi-level file (ERA5 pressure-level shape): distinct levels, " +
      "values exact, no colliding cells") {
    val dir = freshDir("multi")
    val days = Seq(LocalDateTime.parse("2024-03-01T00:00"),
      LocalDateTime.parse("2024-03-02T00:00"))
    write(s"$dir/pl.grb2") { out =>
      days.zipWithIndex.foreach { case (d, di) =>
        GribFormat.writeMessage2Fields(out, d, lats, lons,
          fields = PressureLevels.indices.map(li =>
            (130, 0, grid(di * 100.0 + li * 1000.0))),
          levels = PressureLevels.map(v => (100, v)))
      }
    }
    val df = spark.read.format("grib1").load(s"$dir/pl.grb2")
    // 2 days x 3 levels x 4 cells — every cell distinct, none collided
    assert(df.count() == 24)
    assert(df.select("level").distinct().collect().map(_.getDouble(0)).sorted
      .sameElements(Array(25000.0, 50000.0, 85000.0)))
    assert(df.select("level_type").distinct().head().getInt(0) == 100)
    // per-(time, level) values recover the per-field grids exactly
    val r = df.filter(col("time") === lit(ts("2024-03-02T00:00:00")) &&
        col("level") === 50000.0 &&
        col("latitude") === 0.0 && col("longitude") === 10.0).head()
    assert(r.getAs[Double]("value") == 100.0 + 1000.0)
    // analysis product: ref_time = valid time, step 0
    assert(df.filter(col("step") === 0L).count() == 24)
    assert(df.filter(col("ref_time") === col("time")).count() == 24)
  }

  test("level equality prunes whole messages at planning") {
    val dir = freshDir("prune")
    write(s"$dir/pl.grb2") { out =>
      GribFormat.writeMessage2Fields(out, LocalDateTime.parse("2024-03-01T00:00"),
        lats, lons,
        fields = PressureLevels.indices.map(li => (130, 0, grid(li * 1000.0))),
        levels = PressureLevels.map(v => (100, v)))
    }
    val q = spark.read.format("grib1").load(s"$dir/pl.grb2")
      .filter(col("level") === 50000.0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("messages=1/3"),
      s"level equality must prune messages at planning:\n$plan")
    assert(q.count() == 4)
    // level_type + IsNull prune too
    val q2 = spark.read.format("grib1").load(s"$dir/pl.grb2")
      .filter(col("level").isNull)
    assert(q2.queryExecution.executedPlan.toString.contains("messages=0/3"))
    assert(q2.count() == 0)
  }

  test("probability products (4.5/4.9, the NBM shape): two thresholds at " +
      "one (ref_time, step) stay distinct; thresholds prune at planning; " +
      "4.9 keys the interval end") {
    val dir = freshDir("prob")
    val ref = LocalDateTime.parse("2024-03-01T00:00")
    write(s"$dir/pop.grb2") { out =>
      // P(precip > 1 mm) and P(precip > 5 mm), point-in-time, lead 6 h
      GribFormat.writeMessage2Fields(out, ref, lats, lons,
        fields = Seq((61, 6, grid(10.0)), (61, 6, grid(70.0))),
        probs = Seq((3, 1L, Long.MinValue), (3, 5L, Long.MinValue)))
      // interval form (4.9): probability over [6, 12] h — valid at END
      GribFormat.writeMessage2Fields(out, ref, lats, lons,
        fields = Seq((61, 6, grid(40.0))),
        probs = Seq((3, 1L, Long.MinValue)),
        intervals = Seq(6))
    }
    val df = spark.read.format("grib1").load(s"$dir/pop.grb2")
    assert(df.count() == 12)
    assert(df.select("prob_type").distinct().head().getInt(0) == 3)
    assert(df.select("prob_lo").distinct().collect().map(_.getDouble(0))
      .sorted.toSeq == Seq(1.0, 5.0))
    assert(df.select("prob_hi").na.drop().count() == 0) // upper absent
    // the two point thresholds share (ref_time, step) yet never collide
    val pt = df.filter(col("step_start").isNull)
    assert(pt.select("ref_time", "step").distinct().count() == 1)
    assert(pt.filter(col("prob_lo") === 1.0 &&
      col("latitude") === 0.0 && col("longitude") === 10.0)
      .select("value").head().getDouble(0) == 10.0)
    assert(pt.filter(col("prob_lo") === 5.0 &&
      col("latitude") === 0.0 && col("longitude") === 10.0)
      .select("value").head().getDouble(0) == 70.0)
    // 4.9: valid = interval END (ref + 12 h), step = endStep, start kept
    val iv = df.filter(col("step_start").isNotNull)
    assert(iv.select("time").distinct().head()
      .getAs[LocalDateTime](0) == ref.plusHours(12))
    assert(iv.select("step").distinct().head().getLong(0) == 720L)
    assert(iv.select("step_start").distinct().head().getLong(0) == 360L)
    // threshold equality prunes whole messages at planning
    val q = spark.read.format("grib1").load(s"$dir/pop.grb2")
      .filter(col("prob_lo") === 5.0)
    assert(q.queryExecution.executedPlan.toString.contains("messages=1/3"),
      "prob_lo equality must prune messages at planning")
    // the same threshold twice is a full-key collision, refused by name
    val e = intercept[IllegalArgumentException] {
      write(s"$dir/dup.grb2") { out =>
        GribFormat.writeMessage2Fields(out, ref, lats, lons,
          fields = Seq((61, 6, grid(1.0)), (61, 6, grid(2.0))),
          probs = Seq((3, 1L, Long.MinValue), (3, 1L, Long.MinValue)))
      }
      spark.read.format("grib1").load(s"$dir/dup.grb2").count()
    }
    assert(e.getMessage.contains("duplicated field key"))
  }

  test("percentile products (4.6/4.10): the percentile keys the " +
      "hypercube; interval form keys the interval end") {
    val dir = freshDir("pct")
    val ref = LocalDateTime.parse("2024-03-01T00:00")
    write(s"$dir/pct.grb2") { out =>
      GribFormat.writeMessage2Fields(out, ref, lats, lons,
        fields = Seq((167, 6, grid(250.0)), (167, 6, grid(280.0))),
        percentiles = Seq(10, 90))
      GribFormat.writeMessage2Fields(out, ref, lats, lons,
        fields = Seq((61, 6, grid(5.0))),
        percentiles = Seq(50), intervals = Seq(6))
    }
    val df = spark.read.format("grib1").load(s"$dir/pct.grb2")
    assert(df.count() == 12)
    assert(df.select("percentile").distinct().collect().map(_.getInt(0))
      .sorted.toSeq == Seq(10, 50, 90))
    assert(df.filter(col("percentile") === 90 &&
      col("latitude") === 0.0 && col("longitude") === 10.0)
      .select("value").head().getDouble(0) == 280.0)
    val iv = df.filter(col("percentile") === 50)
    assert(iv.select("time").distinct().head()
      .getAs[LocalDateTime](0) == ref.plusHours(12))
    assert(iv.select("step_start").distinct().head().getLong(0) == 360L)
  }

  test("two fields on the SAME full hypercube key are refused by name") {
    val dir = freshDir("dup")
    write(s"$dir/dup.grb2") { out =>
      GribFormat.writeMessage2Fields(out, LocalDateTime.parse("2024-03-01T00:00"),
        lats, lons,
        fields = Seq((130, 0, grid(0.0)), (130, 0, grid(50.0))),
        levels = Seq((100, 85000L), (100, 85000L)))
    }
    val e = intercept[Exception] {
      spark.read.format("grib1").load(s"$dir/dup.grb2").collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    val msgs = chain(e).flatMap(c => Option(c.getMessage))
    assert(msgs.exists(m => m.contains("silently collide") &&
      m.contains("param=130") && m.contains("level=85000.0")),
      s"refusal must name the colliding key: $msgs")
  }

  test("forecast keys: two reference times with overlapping valid times " +
      "stay distinct via (ref_time, step)") {
    val dir = freshDir("fcst")
    val d0 = LocalDateTime.parse("2024-03-01T00:00")
    val d6 = LocalDateTime.parse("2024-03-01T06:00")
    write(s"$dir/f.grb2") { out =>
      // ref 00Z lead 6h and ref 06Z lead 0h — SAME valid time 06Z
      GribFormat.writeMessage2Fields(out, d0, lats, lons,
        fields = Seq((130, 6, grid(0.0))))
      GribFormat.writeMessage2Fields(out, d6, lats, lons,
        fields = Seq((130, 0, grid(5000.0))))
    }
    val df = spark.read.format("grib1").load(s"$dir/f.grb2")
    assert(df.count() == 8, "both hypercubes must survive the scan")
    assert(df.filter(col("time") === lit(ts("2024-03-01T06:00:00")))
      .count() == 8, "both fields share the valid time")
    // the 6h-lead field keys as (ref 00Z, step 360min)
    val lead = df.filter(col("step") === 360L)
    assert(lead.count() == 4)
    assert(lead.select("ref_time").distinct().head()
      .getAs[LocalDateTime](0) == d0)
    assert(lead.filter(col("latitude") === 0.0 && col("longitude") === 10.0)
      .head().getAs[Double]("value") == 0.0)
    // the analysis field keys as (ref 06Z, step 0)
    val ana = df.filter(col("step") === 0L)
    assert(ana.select("ref_time").distinct().head()
      .getAs[LocalDateTime](0) == d6)
    assert(ana.filter(col("latitude") === 0.0 && col("longitude") === 10.0)
      .head().getAs[Double]("value") == 5000.0)
    // ref_time equality prunes whole messages at planning
    val q = df.filter(col("ref_time") === lit(ts("2024-03-01T00:00:00")))
    assert(q.queryExecution.executedPlan.toString.contains("messages=1/2"))
    assert(q.count() == 4)
  }

  test("interval products (4.8/4.11): valid time is the interval END, " +
      "step the endStep — never ref + lead") {
    val dir = freshDir("accum")
    val ref = LocalDateTime.parse("2024-03-01T00:00")
    write(s"$dir/acc.grb2") { out =>
      // 1-h accumulation starting at lead 6h: interval [06, 07] — valid 07Z
      GribFormat.writeMessage2Fields(out, ref, lats, lons,
        fields = Seq((61, 6, grid(0.0))), intervals = Seq(1))
      // ensemble interval (4.11), lead 0, 3-h accumulation — valid 03Z
      GribFormat.writeMessage2Fields(out, ref, lats, lons,
        fields = Seq((61, 0, grid(100.0))), members = Seq(2),
        intervals = Seq(3))
    }
    val df = spark.read.format("grib1").load(s"$dir/acc.grb2")
    assert(df.count() == 8)
    val det = df.filter(col("member").isNull)
    assert(det.select("time").distinct().head()
      .getAs[LocalDateTime](0) == ref.plusHours(7))
    assert(det.select("step").distinct().head().getLong(0) == 7 * 60)
    assert(det.select("ref_time").distinct().head()
      .getAs[LocalDateTime](0) == ref)
    val ens = df.filter(col("member") === 2)
    assert(ens.select("time").distinct().head()
      .getAs[LocalDateTime](0) == ref.plusHours(3))
    assert(ens.select("step").distinct().head().getLong(0) == 3 * 60)
    assert(ens.filter(col("latitude") === 0.0 && col("longitude") === 10.0)
      .head().getAs[Double]("value") == 100.0)
  }

  test("LAYER products (second fixed surface): soil layers sharing a top " +
      "stay distinct on level_to; duplicated layers are refused by name") {
    val dir = freshDir("layer")
    val ref = LocalDateTime.parse("2024-03-01T00:00")
    write(s"$dir/soil.grb2") { out =>
      // soil moisture layers 0-10 cm and 0-100 cm (depth type 106, both
      // tops at 0): only the SECOND surface separates them
      GribFormat.writeMessage2Fields(out, ref, lats, lons,
        fields = Seq((192, 0, grid(5.0)), (192, 0, grid(300.0))),
        levels = Seq((106, 0L), (106, 0L)),
        levelTops = Seq(10L, 100L))
    }
    val df = spark.read.format("grib1").load(s"$dir/soil.grb2")
    assert(df.count() == 8)
    assert(df.select("level_type").distinct().head().getInt(0) == 106)
    assert(df.select("level").distinct().head().getDouble(0) == 0.0)
    val shallow = df.filter(col("level_to") === 10.0)
    val deep = df.filter(col("level_to") === 100.0)
    assert(shallow.count() == 4 && deep.count() == 4)
    assert(shallow.filter(col("latitude") === 0.0 && col("longitude") === 10.0)
      .head().getAs[Double]("value") == 5.0)
    assert(deep.filter(col("latitude") === 0.0 && col("longitude") === 10.0)
      .head().getAs[Double]("value") == 300.0)
    // level_to predicates prune whole messages at planning
    val plan = deep.queryExecution.executedPlan.toString
    assert(plan.contains("messages=1/2"), s"no message pruning in:\n$plan")
    // the same layer twice collides on the FULL key incl. level_to
    write(s"$dir/dup.grb2") { out =>
      GribFormat.writeMessage2Fields(out, ref, lats, lons,
        fields = Seq((192, 0, grid(1.0)), (192, 0, grid(2.0))),
        levels = Seq((106, 0L), (106, 0L)),
        levelTops = Seq(10L, 10L))
    }
    val e = intercept[Exception] {
      spark.read.format("grib1").load(s"$dir/dup.grb2").count()
    }
    assert(e.getMessage.contains("duplicated field key"))
  }

  test("edition-1 layer level types split octets 11-12 into (top, bottom) " +
      "and normalize to the GRIB2 code + unit convention") {
    val dir = freshDir("g1layer")
    val ref = LocalDateTime.parse("2024-03-01T00:00")
    val raw = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(raw)
    GribFormat.writeMessage(dos, 61, ref, lats, lons, grid(0.0))
    dos.close()
    val bytes = raw.toByteArray
    // PDS octet 10 (level type, offset 8+9) -> 112 (layer between
    // depths); octets 11-12 (offsets 18-19) -> top 10 cm, bottom 200 cm
    assert(bytes(17) == 1, "PDS level-type octet moved; update the patch")
    bytes(17) = 112.toByte
    bytes(18) = 10; bytes(19) = 200.toByte
    write(s"$dir/l.grb")(_.write(bytes))
    val df = spark.read.format("grib1").load(s"$dir/l.grb")
    // table-3 112 (cm) normalizes to GRIB2 4.5 code 106 (depth below
    // land surface, m) — the cross-edition level axis is uniform
    assert(df.select("level_type").distinct().head().getInt(0) == 106)
    assert(df.select("level").distinct().head().getDouble(0) == 0.10)
    assert(df.select("level_to").distinct().head().getDouble(0) == 2.00)
  }

  test("edition-1 isobaric levels normalize hPa to the GRIB2 Pa " +
      "convention: one filter matches both editions") {
    val dir = freshDir("g1iso")
    val ref = LocalDateTime.parse("2024-03-01T00:00")
    val raw = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(raw)
    GribFormat.writeMessage(dos, 61, ref, lats, lons, grid(7.0))
    dos.close()
    val bytes = raw.toByteArray
    assert(bytes(17) == 1, "PDS level-type octet moved; update the patch")
    bytes(17) = 100.toByte // isobaric, value 850 hPa (u16 octets 11-12)
    bytes(18) = ((850 >> 8) & 0xFF).toByte; bytes(19) = (850 & 0xFF).toByte
    write(s"$dir/iso.grb")(_.write(bytes))
    // the same surface as GRIB2 (next cycle, so the keys stay distinct):
    // param 61 at 85000 Pa, level_type 100
    write(s"$dir/iso.grb2") { out =>
      GribFormat.writeMessage2Fields(out, ref.plusHours(6), lats, lons,
        fields = Seq((61, 0, grid(7.0))), levels = Seq((100, 85000L)))
    }
    val both = spark.read.format("grib1").load(dir)
    assert(both.count() == 8)
    // ONE level filter in Pa matches the hPa-coded edition-1 message too
    assert(both.filter(col("level_type") === 100 &&
      col("level") === 85000.0).count() == 8)
  }

  test("GRIB2 discipline joins the parameter key: land-surface (2,0,0) " +
      "never aliases meteorological (0,0,0)") {
    val dir = freshDir("disc")
    val ref = LocalDateTime.parse("2024-03-01T00:00")
    write(s"$dir/d.grb2") { out =>
      GribFormat.writeMessage2Fields(out, ref, lats, lons,
        fields = Seq((0, 0, grid(1.0)))) // discipline 0, category 0, number 0
      GribFormat.writeMessage2Fields(out, ref, lats, lons,
        fields = Seq((0, 0, grid(100.0))), discipline = 2)
    }
    val df = spark.read.format("grib1").load(s"$dir/d.grb2")
    assert(df.count() == 8)
    val params = df.select("param").distinct().collect()
      .map(_.getInt(0)).sorted.toSeq
    assert(params == Seq(0, 2 << 16), s"params $params")
    assert(df.filter(col("param") === (2 << 16)).count() == 4)
  }

  test("derived-ensemble products (4.2/4.12, the GEFS geavg/gespr shape): " +
      "mean and spread stay distinct on the derived axis") {
    val dir = freshDir("derived")
    val ref = LocalDateTime.parse("2024-03-01T00:00")
    write(s"$dir/ge.grb2") { out =>
      // point-in-time mean (0) and spread (2) of the same (time, param):
      // only the derived axis separates them
      GribFormat.writeMessage2Fields(out, ref, lats, lons,
        fields = Seq((130, 6, grid(10.0)), (130, 6, grid(500.0))),
        derivedStats = Seq(0, 2))
      // interval form (4.12): 3-h accumulated ensemble mean — valid 09Z
      GribFormat.writeMessage2Fields(out, ref, lats, lons,
        fields = Seq((61, 6, grid(77.0))), derivedStats = Seq(0),
        intervals = Seq(3))
    }
    val df = spark.read.format("grib1").load(s"$dir/ge.grb2")
    assert(df.count() == 12)
    assert(df.filter(col("member").isNotNull).count() == 0)
    val mean = df.filter(col("derived") === 0 && col("param") === 130)
    val spread = df.filter(col("derived") === 2)
    assert(mean.count() == 4 && spread.count() == 4)
    assert(mean.filter(col("latitude") === 0.0 && col("longitude") === 10.0)
      .head().getAs[Double]("value") == 10.0)
    assert(spread.filter(col("latitude") === 0.0 && col("longitude") === 10.0)
      .head().getAs[Double]("value") == 500.0)
    // 4.12 keys like 4.8: valid = interval end (6 + 3 h), step = endStep
    val acc = df.filter(col("param") === 61)
    assert(acc.select("time").distinct().head()
      .getAs[LocalDateTime](0) == ref.plusHours(9))
    assert(acc.select("step").distinct().head().getLong(0) == 9 * 60)
    // derived predicates prune whole messages at planning
    val plan = df.filter(col("derived") === 2).queryExecution
      .executedPlan.toString
    assert(plan.contains("messages=1/3"), s"no message pruning in:\n$plan")
    // a file duplicating the SAME derived statistic is refused by name
    write(s"$dir/dup.grb2") { out =>
      GribFormat.writeMessage2Fields(out, ref, lats, lons,
        fields = Seq((130, 6, grid(1.0)), (130, 6, grid(2.0))),
        derivedStats = Seq(0, 0))
    }
    val e = intercept[Exception] {
      spark.read.format("grib1").load(s"$dir/dup.grb2").count()
    }
    assert(e.getMessage.contains("derived=0"))
  }

  test("precip buckets (two accumulation windows ending at one valid " +
      "time) stay distinct on step_start — the GFS bucket file shape") {
    val dir = freshDir("bucket")
    val ref = LocalDateTime.parse("2024-03-01T00:00")
    write(s"$dir/b.grb2") { out =>
      // APCP over [0, 12] h and over [6, 12] h: same valid time (12Z),
      // same endStep — only the interval START separates them
      GribFormat.writeMessage2Fields(out, ref, lats, lons,
        fields = Seq((61, 0, grid(0.0)), (61, 6, grid(500.0))),
        intervals = Seq(12, 6))
    }
    val df = spark.read.format("grib1").load(s"$dir/b.grb2")
    assert(df.count() == 8)
    assert(df.select("time").distinct().head()
      .getAs[LocalDateTime](0) == ref.plusHours(12))
    assert(df.select("step").distinct().head().getLong(0) == 12 * 60)
    val starts = df.select("step_start").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(starts == Seq(0L, 6 * 60L))
    assert(df.filter(col("step_start") === 6 * 60L &&
        col("latitude") === 0.0 && col("longitude") === 10.0)
      .head().getAs[Double]("value") == 500.0)
    // step_start prunes whole messages; point products carry null
    val plan = df.filter(col("step_start") === 0L).queryExecution
      .executedPlan.toString
    assert(plan.contains("messages=1/2"), s"no pruning in:\n$plan")
    write(s"$dir/p.grb2") { out =>
      GribFormat.writeMessage2Fields(out, ref, lats, lons,
        fields = Seq((61, 0, grid(0.0))))
    }
    val point = spark.read.format("grib1").load(s"$dir/p.grb2")
    assert(point.filter(col("step_start").isNull).count() == 4)
    // a genuinely duplicated window is still refused by name
    write(s"$dir/dup.grb2") { out =>
      GribFormat.writeMessage2Fields(out, ref, lats, lons,
        fields = Seq((61, 0, grid(0.0)), (61, 0, grid(1.0))),
        intervals = Seq(12, 12))
    }
    val e = intercept[Exception] {
      spark.read.format("grib1").load(s"$dir/dup.grb2").count()
    }
    assert(e.getMessage.contains("duplicated field key"))
  }

  test("edition-1 accumulations (TRI 4) and long leads (TRI 10) key like " +
      "edition 2: valid = interval end / ref + 16-bit P1") {
    val dir = freshDir("g1tri")
    val ref = LocalDateTime.parse("2024-03-01T00:00")
    write(s"$dir/tri.grb") { out =>
      // 2-h accumulation starting at lead 6: interval [06, 08] — valid 08Z
      GribFormat.writeMessage(out, 61, ref, lats, lons, grid(0.0),
        leadHours = 6, accumHours = 2)
      // 300-h lead: > 255 forces P1 across octets 19-20 under TRI 10
      GribFormat.writeMessage(out, 61, ref, lats, lons, grid(50.0),
        leadHours = 300)
    }
    val df = spark.read.format("grib1").load(s"$dir/tri.grb")
    assert(df.count() == 8)
    assert(df.select("ref_time").distinct().head()
      .getAs[LocalDateTime](0) == ref)
    val acc = df.filter(col("step") === 8 * 60L)
    assert(acc.count() == 4)
    assert(acc.select("time").distinct().head()
      .getAs[LocalDateTime](0) == ref.plusHours(8))
    val long = df.filter(col("step") === 300 * 60L)
    assert(long.count() == 4)
    assert(long.select("time").distinct().head()
      .getAs[LocalDateTime](0) == ref.plusHours(300))
    assert(long.filter(col("latitude") === 0.0 && col("longitude") === 10.0)
      .head().getAs[Double]("value") == 50.0)
  }

  test("coarse PDS time units (10/11/12 = 3/6/12 h) scale the lead") {
    val dir = freshDir("g1unit")
    val ref = LocalDateTime.parse("2024-03-01T00:00")
    // write a 2-unit lead at unit "hours", then byte-patch PDS octet 18
    // (time unit, file offset 8 + 17) to 3-hourly: lead becomes 6 h
    val raw = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(raw)
    GribFormat.writeMessage(dos, 61, ref, lats, lons, grid(0.0),
      leadHours = 2)
    dos.close()
    val bytes = raw.toByteArray
    assert(bytes(25) == 1, "PDS time-unit octet moved; update the patch")
    bytes(25) = 10
    write(s"$dir/u.grb")(_.write(bytes))
    val df = spark.read.format("grib1").load(s"$dir/u.grb")
    assert(df.select("time").distinct().head()
      .getAs[LocalDateTime](0) == ref.plusHours(6))
    assert(df.select("step").distinct().head().getLong(0) == 360L)
    // unit 254 (seconds): a 2-unit lead patched to seconds is sub-minute
    // and refused by name; 120 s (= 0x78 in P1) resolves to 2 min
    val bytes2 = bytes.clone()
    bytes2(25) = 254.toByte
    write(s"$dir/s_bad.grb")(_.write(bytes2))
    val e = intercept[Exception] {
      spark.read.format("grib1").load(s"$dir/s_bad.grb").count()
    }
    assert(e.getMessage.contains("sub-minute"))
    bytes2(26) = 120.toByte // P1 = 120 seconds
    write(s"$dir/s_ok.grb")(_.write(bytes2))
    val ds = spark.read.format("grib1").load(s"$dir/s_ok.grb")
    assert(ds.select("step").distinct().head().getLong(0) == 2L)
  }

  test("edition-1 fixtures surface the PDS level and forecast key") {
    val dir = freshDir("g1")
    GribFormat.writeFile(spark, s"$dir/a.grb", Seq(
      (61, LocalDateTime.parse("2024-03-01T00:00"), lats, lons, grid(0.0))))
    val df = spark.read.format("grib1").load(s"$dir/a.grb")
    // the GRIB1 writer declares level type 1 (surface), value 0
    assert(df.select("level_type").distinct().head().getInt(0) == 1)
    assert(df.select("level").distinct().head().getDouble(0) == 0.0)
    assert(df.filter(col("step") === 0L && col("ref_time") === col("time"))
      .count() == 4)
  }
}
