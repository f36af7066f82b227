package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GridAnalyticsSpec extends SparkSpec {

  test("temporalResample buckets time and aggregates per cell") {
    val sp = spark; import sp.implicits._
    // two cells, four daily steps spanning an ISO week boundary
    // (2024-01-07 is a Sunday; week-truncation pins Monday starts)
    val df = Seq(
      (ts("2024-01-05T00:00"), 0.0, 1.0), (ts("2024-01-06T00:00"), 0.0, 3.0),
      (ts("2024-01-08T00:00"), 0.0, 10.0), (ts("2024-01-09T00:00"), 0.0, 20.0),
      (ts("2024-01-05T00:00"), 1.0, 100.0), (ts("2024-01-08T00:00"), 1.0, 7.0)
    ).toDF("time", "lat", "value")
    val out = GridAnalytics.temporalResample(df, "time", Seq("lat"), "value", "week")
      .orderBy("time", "lat").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("time").toLocalDateTime.toLocalDate.toString,
        r.getDouble(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0.0, 2.0), ("2024-01-01", 1.0, 100.0),
      ("2024-01-08", 0.0, 15.0), ("2024-01-08", 1.0, 7.0)))
    val mx = GridAnalytics.temporalResample(df, "time", Seq("lat"), "value", "week", "max")
      .orderBy("time", "lat").collect().map(_.getDouble(2))
    assert(mx.toSeq == Seq(3.0, 100.0, 20.0, 7.0))
  }

  test("climatology and anomalies by calendar period") {
    val sp = spark; import sp.implicits._
    // Mondays (2024-01-01, -08) vs Tuesdays (-02, -09) on one cell
    val df = Seq(
      (ts("2024-01-01T00:00"), 0.0, 10.0), (ts("2024-01-08T00:00"), 0.0, 20.0),
      (ts("2024-01-02T00:00"), 0.0, 100.0), (ts("2024-01-09T00:00"), 0.0, 300.0)
    ).toDF("time", "lat", "value")
    val clim = GridAnalytics.climatology(df, "time", Seq("lat"), "value", "dayofweek")
      .orderBy("dayofweek").collect()
    // Spark dayofweek: Sunday=1 → Monday=2, Tuesday=3
    assert(clim.map(r => (r.getInt(0), r.getDouble(2))).toSeq ==
      Seq((2, 15.0), (3, 200.0)))
    val an = GridAnalytics.anomalies(df, "time", Seq("lat"), "value", "dayofweek")
      .orderBy("time").select("anomaly").collect().map(_.getDouble(0))
    assert(an.toSeq == Seq(-5.0, -100.0, 5.0, 100.0))
  }

  test("rollingTime trailing window per cell with minPeriods") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (ts("2024-01-01T00:00"), 0.0, 1.0), (ts("2024-01-02T00:00"), 0.0, 2.0),
      (ts("2024-01-03T00:00"), 0.0, 3.0), (ts("2024-01-04T00:00"), 0.0, 4.0),
      (ts("2024-01-01T00:00"), 1.0, 10.0), (ts("2024-01-02T00:00"), 1.0, 30.0)
    ).toDF("time", "lat", "value")
    val out = GridAnalytics.rollingTime(df, "time", Seq("lat"), "value", k = 3,
      agg = "mean", minPeriods = 2)
      .orderBy("lat", "time").collect()
      .map(r => Option(r.get(3)).map(_.asInstanceOf[Double]))
    // cell 0: null, (1+2)/2, (1+2+3)/3, (2+3+4)/3 ; cell 1: null, 20
    assert(out.toSeq == Seq(None, Some(1.5), Some(2.0), Some(3.0), None, Some(20.0)))
    intercept[IllegalArgumentException] {
      GridAnalytics.rollingTime(df, "time", Seq.empty, "value", 3)
    }
  }

  test("coarsen block-aggregates a regular grid, centre coords on edges too") {
    val sp = spark; import sp.implicits._
    val t = ts("2024-01-01T00:00")
    // 3x3 grid at step 0.5 from origin (10, 20); factor 2 → blocks of 2x2
    // with a trailing partial row/column
    val rows = for (i <- 0 until 3; j <- 0 until 3)
      yield (t, 10.0 + i * 0.5, 20.0 + j * 0.5, (i * 3 + j).toDouble)
    val df = rows.toDF("time", "lat", "lon", "value")
    val out = GridAnalytics.coarsen(df, "time", "lat", "lon", "value",
      lat0 = 10.0, dLat = 0.5, lon0 = 20.0, dLon = 0.5, fy = 2, fx = 2)
      .orderBy("lat", "lon").collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    // block (0,0): cells (0,0)(0,1)(1,0)(1,1) = 0,1,3,4 → 2.0, centre (10.25, 20.25)
    // block (0,1): cells (0,2)(1,2) = 2,5 → 3.5, centre lon 20.25+1.0
    // block (1,0): cells (2,0)(2,1) = 6,7 → 6.5
    // block (1,1): cell (2,2) = 8
    assert(out.toSeq == Seq(
      (10.25, 20.25, 2.0), (10.25, 21.25, 3.5),
      (11.25, 20.25, 6.5), (11.25, 21.25, 8.0)))
  }

  test("regridBilinear interpolates, renormalizes on missing corners, clips the hull") {
    val sp = spark; import sp.implicits._
    val t = ts("2024-01-01T00:00")
    // 2x2 source grid step 1.0 at origin (0,0): v(i,j) = 2i + j
    val src = Seq(
      (t, 0.0, 0.0, 0.0), (t, 0.0, 1.0, 1.0),
      (t, 1.0, 0.0, 2.0), (t, 1.0, 1.0, 3.0)
    ).toDF("time", "lat", "lon", "value")
    val target = Seq(
      (0.5, 0.5),   // centre → mean of all 4 = 1.5
      (0.0, 0.0),   // exact corner → 0.0
      (0.25, 0.75), // 0.75*(0.25*0+0.75*1 is lon) ... = 2*0.25 + 0.75 = 1.25
      (-1.0, 0.5)   // outside hull → dropped
    ).toDF("lat", "lon")
    val out = GridAnalytics.regridBilinear(src, target, Some("time"),
      "lat", "lon", "value", 0.0, 1.0, 2, 0.0, 1.0, 2)
      .orderBy("lat", "lon").collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq == Seq((0.0, 0.0, 0.0), (0.25, 0.75, 1.25), (0.5, 0.5, 1.5)))

    // drop one corner: centre point renormalizes over the 3 present ones
    val holed = src.filter(!(col("lat") === 1.0 && col("lon") === 1.0))
    val out2 = GridAnalytics.regridBilinear(holed, Seq((0.5, 0.5)).toDF("lat", "lon"),
      Some("time"), "lat", "lon", "value", 0.0, 1.0, 2, 0.0, 1.0, 2)
      .collect().map(_.getDouble(3))
    assert(out2.toSeq == Seq((0.25 * 0 + 0.25 * 1 + 0.25 * 2) / 0.75))
  }

  test("interpolateNaTime lerps gaps per cell, leaves edges null, handles irregular cadence") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      // cell 0: leading null, interior run of two nulls, irregular step to day 6
      (ts("2024-01-01T00:00"), 0.0, None: Option[Double]),
      (ts("2024-01-02T00:00"), 0.0, Some(10.0)),
      (ts("2024-01-03T00:00"), 0.0, None),
      (ts("2024-01-04T00:00"), 0.0, None),
      (ts("2024-01-06T00:00"), 0.0, Some(50.0)),
      // cell 1: trailing null
      (ts("2024-01-01T00:00"), 1.0, Some(5.0)),
      (ts("2024-01-02T00:00"), 1.0, None)
    ).toDF("time", "lat", "value")
    val out = GridAnalytics.interpolateNaTime(df, "time", Seq("lat"), "value")
      .orderBy("lat", "time").collect()
      .map(r => Option(r.get(3)).map(_.asInstanceOf[Double]))
    // cell 0: null (no left), 10, 10+(40)*(1/4)=20, 30, 50
    assert(out.toSeq == Seq(None, Some(10.0), Some(20.0), Some(30.0), Some(50.0),
      Some(5.0), None))
  }

  test("weightedSpatialMean cos-lat weights the spatial reduction") {
    val sp = spark; import sp.implicits._
    val t = ts("2024-01-01T00:00")
    // lat 0 (w=1) value 10, lat 60 (w=0.5) value 40 → (10 + 20)/(1.5) = 20
    val df = Seq((t, 0.0, 10.0), (t, 60.0, 40.0)).toDF("time", "lat", "value")
    val out = GridAnalytics.weightedSpatialMean(df, "time", "lat", "value")
      .collect().map(_.getDouble(1))
    assert(math.abs(out.head - 20.0) < 1e-9)
  }

  test("percentilesByCell interpolates exact quantiles per cell") {
    val sp = spark; import sp.implicits._
    val df = (1 to 5).map(i => (ts(f"2024-01-0${i}T00:00"), 0.0, i * 10.0))
      .toDF("time", "lat", "value")
    val out = GridAnalytics.percentilesByCell(df, Seq("lat"), "value", Seq(0.5, 0.9))
      .collect().head
    assert(out.getDouble(1) == 30.0) // median of 10..50
    assert(math.abs(out.getDouble(2) - 46.0) < 1e-9) // 0.9*(5-1)=3.6 → 40+0.6*10
  }

  test("shift/diff/cumsum run per cell with null edges, sharing one window sort") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (ts("2024-01-01T00:00"), 0.0, 1.0), (ts("2024-01-02T00:00"), 0.0, 4.0),
      (ts("2024-01-03T00:00"), 0.0, 9.0),
      (ts("2024-01-01T00:00"), 1.0, 100.0), (ts("2024-01-02T00:00"), 1.0, 50.0)
    ).toDF("time", "lat", "value")
    val out = GridAnalytics.cumsumTime(
      GridAnalytics.diffTime(
        GridAnalytics.shiftTime(df, "time", Seq("lat"), "value", 1),
        "time", Seq("lat"), "value"),
      "time", Seq("lat"), "value")
      .orderBy("lat", "time").collect()
      .map(r => (Option(r.get(3)), Option(r.get(4)), r.getDouble(5)))
    assert(out.toSeq == Seq(
      (None, None, 1.0), (Some(1.0), Some(3.0), 5.0), (Some(4.0), Some(5.0), 14.0),
      (None, None, 100.0), (Some(100.0), Some(-50.0), 150.0)))
    // negative shift is a lead
    val led = GridAnalytics.shiftTime(df, "time", Seq("lat"), "value", -1)
      .orderBy("lat", "time").collect().map(r => Option(r.get(3)))
    assert(led.toSeq == Seq(Some(4.0), Some(9.0), None, Some(50.0), None))
    // undimensioned calls are refused (single-partition sort)
    intercept[IllegalArgumentException] {
      GridAnalytics.cumsumTime(df, "time", Seq.empty, "value")
    }
    // the chained frame plans ONE shuffle: a single cell-key exchange
    val plan = GridAnalytics.cumsumTime(
      GridAnalytics.diffTime(
        GridAnalytics.shiftTime(df, "time", Seq("lat"), "value", 1),
        "time", Seq("lat"), "value"),
      "time", Seq("lat"), "value").queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1, plan)
  }

  test("percentRankInCell: ties share ranks, single-obs cells rank 0") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (ts("2024-01-01T00:00"), 0.0, 10.0), (ts("2024-01-02T00:00"), 0.0, 30.0),
      (ts("2024-01-03T00:00"), 0.0, 20.0), (ts("2024-01-04T00:00"), 0.0, 30.0),
      (ts("2024-01-05T00:00"), 0.0, 40.0),
      (ts("2024-01-01T00:00"), 1.0, 7.0)
    ).toDF("time", "lat", "value")
    val out = GridAnalytics.percentRankInCell(df, Seq("lat"), "value")
      .orderBy("lat", "time").collect().map(_.getDouble(3))
    // cell 0: ranks over values 10,20,30,30,40 → (r-1)/4
    assert(out.toSeq == Seq(0.0, 0.5, 0.25, 0.5, 1.0, 0.0))
    intercept[IllegalArgumentException] {
      GridAnalytics.percentRankInCell(df, Seq.empty, "value")
    }
  }

  test("spellsInCell: threshold + calendar gaps both break runs") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      // cell 0: 3-day run, a below-threshold day, then a 2-day run
      (ts("2024-01-01T00:00"), 0.0, 5.0), (ts("2024-01-02T00:00"), 0.0, 6.0),
      (ts("2024-01-03T00:00"), 0.0, 5.0), (ts("2024-01-04T00:00"), 0.0, 1.0),
      (ts("2024-01-05T00:00"), 0.0, 7.0), (ts("2024-01-06T00:00"), 0.0, 5.0),
      // cell 1: two exceedance days separated by a MISSING day → two spells
      (ts("2024-01-01T00:00"), 1.0, 9.0), (ts("2024-01-03T00:00"), 1.0, 9.0)
    ).toDF("time", "lat", "value")
    val out = GridAnalytics.spellsInCell(df, "time", Seq("lat"), "value", 5.0)
      .orderBy("lat", "spell_start")
      .select("lat", "n_steps", "peak").as[(Double, Long, Double)].collect().toSeq
    assert(out == Seq((0.0, 3L, 6.0), (0.0, 2L, 7.0), (1.0, 1L, 9.0), (1.0, 1L, 9.0)))
    // dry-spell direction (CDD): runs BELOW the threshold
    val dry = GridAnalytics.spellsInCell(df, "time", Seq("lat"), "value", 5.0,
        comparison = "<")
      .select("lat", "n_steps").as[(Double, Long)].collect().toSeq
    assert(dry == Seq((0.0, 1L))) // only the day-4 value 1.0 sits below 5
    intercept[IllegalArgumentException] {
      GridAnalytics.spellsInCell(df, "time", Seq("lat"), "value", 5.0,
        comparison = "==")
    }
  }

  test("spellsInCell plan: both windows share one sort; the groupBy's " +
      "exchange sits above a map-side partial agg (one row per spell)") {
    val sp = spark; import sp.implicits._
    val df = Seq((ts("2024-01-01T00:00"), 0.0, 5.0)).toDF("time", "lat", "value")
    val plan = GridAnalytics.spellsInCell(df, "time", Seq("lat"), "value", 1.0)
      .queryExecution.executedPlan.toString
    // one raw-row exchange (the windows') + one spell-row exchange
    assert(plan.split("Exchange hashpartitioning").length - 1 == 2, plan)
    assert(plan.split("\\bSort \\[").length - 1 == 1, plan)
    // the spell-row exchange must sit ABOVE the partial aggregate
    val exIdx = plan.indexOf("Exchange hashpartitioning")
    assert(plan.indexOf("partial_min", exIdx) > exIdx, plan)
  }

  test("idxmaxInCell: earliest time wins ties") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (ts("2024-01-02T00:00"), 0.0, 9.0), (ts("2024-01-01T00:00"), 0.0, 9.0),
      (ts("2024-01-03T00:00"), 0.0, 1.0), (ts("2024-01-01T00:00"), 1.0, 4.0)
    ).toDF("time", "lat", "value")
    val out = GridAnalytics.idxmaxInCell(df, "time", Seq("lat"), "value")
      .orderBy("lat").collect()
    assert(out(0).getDouble(1) == 9.0 &&
      out(0).getAs[java.time.LocalDateTime](2) == ts("2024-01-01T00:00"))
    assert(out(1).getDouble(1) == 4.0)
  }

  test("trendInCell: exact integer slope on a known line") {
    val sp = spark; import sp.implicits._
    // y = 2x + 3 over three consecutive days → slope_num/den == 2 exactly
    val df = Seq(
      (ts("1970-01-01T00:00"), 0.0, 3.0), (ts("1970-01-02T00:00"), 0.0, 5.0),
      (ts("1970-01-03T00:00"), 0.0, 7.0),
      (ts("2024-01-01T00:00"), 1.0, 1.0) // single step: den = 0 marker
    ).toDF("time", "lat", "value")
    val out = GridAnalytics.trendInCell(df, "time", Seq("lat"), "value")
      .orderBy("lat").select("n", "slope_num", "den", "icept_num")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // n=3, x=0,1,2: Σx=3 Σy=15 Σxy=19 Σxx=5 → num=3·19−3·15=12, den=3·5−9=6
    assert(out(0) == ((3L, 12L, 6L, 18L))) // 12/6=2, 18/6=3
    assert(out(1)._3 == 0L)
  }

  test("fillTime: ffill honors the limit, bfill fills backward, edges stay null") {
    val sp = spark; import sp.implicits._
    val df = Seq[(java.time.LocalDateTime, Double, Option[Double])](
      (ts("2024-01-01T00:00"), 0.0, None),       // before first obs
      (ts("2024-01-02T00:00"), 0.0, Some(5.0)),
      (ts("2024-01-03T00:00"), 0.0, None),       // 1 step away
      (ts("2024-01-04T00:00"), 0.0, None),       // 2 steps away
      (ts("2024-01-05T00:00"), 0.0, None),       // 3 steps — beyond limit 2
      (ts("2024-01-06T00:00"), 0.0, Some(9.0))
    ).toDF("time", "lat", "value")
    val ff = GridAnalytics.fillTime(df, "time", Seq("lat"), "value", "ffill", Some(2))
      .orderBy("time").select("value_filled")
      .as[Option[Double]].collect().toSeq
    assert(ff == Seq(None, Some(5.0), Some(5.0), Some(5.0), None, Some(9.0)))
    val bf = GridAnalytics.fillTime(df, "time", Seq("lat"), "value", "bfill")
      .orderBy("time").select("value_filled")
      .as[Option[Double]].collect().toSeq
    assert(bf == Seq(Some(5.0), Some(5.0), Some(9.0), Some(9.0), Some(9.0), Some(9.0)))
    intercept[IllegalArgumentException] {
      GridAnalytics.fillTime(df, "time", Seq("lat"), "value", "sideways")
    }
    intercept[IllegalArgumentException] {
      GridAnalytics.fillTime(df, "time", Seq("lat"), "value", "ffill", Some(0))
    }
  }

  test("zscoreInCell: exact integer rearrangement, constant cells null") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (ts("2024-01-01T00:00"), 0.0, 1.0), (ts("2024-01-02T00:00"), 0.0, 2.0),
      (ts("2024-01-03T00:00"), 0.0, 3.0),
      (ts("2024-01-01T00:00"), 1.0, 7.0), (ts("2024-01-02T00:00"), 1.0, 7.0)
    ).toDF("time", "lat", "value")
    val out = GridAnalytics.zscoreInCell(df, Seq("lat"), "value")
      .orderBy("lat", "time").select("value_zscore")
      .as[Option[Double]].collect().toSeq
    // cell 0: y=1,2,3 → n=3 sy=6 syy=14 varNum=6; z = (3y−6)/√6
    val s6 = math.sqrt(6.0)
    assert(out == Seq(Some(-3.0 / s6), Some(0.0), Some(3.0 / s6), None, None))
  }

  test("focalMean: interior averages the 3×3 block, edges renormalize, " +
      "null neighbors skipped") {
    val sp = spark; import sp.implicits._
    // 2×2 grid at step 1: values 1 2 / 3 null
    val df = Seq(
      (ts("2024-01-01T00:00"), 0.0, 0.0, Some(1.0)),
      (ts("2024-01-01T00:00"), 0.0, 1.0, Some(2.0)),
      (ts("2024-01-01T00:00"), 1.0, 0.0, Some(3.0)),
      (ts("2024-01-01T00:00"), 1.0, 1.0, Option.empty[Double])
    ).toDF("time", "lat", "lon", "value")
    val out = GridAnalytics.focalMean(df, "time", "lat", "lon", "value",
      lat0 = 0.0, latStep = 1.0, lon0 = 0.0, lonStep = 1.0)
      .orderBy("lat", "lon").select("lat", "lon", "value_focal")
      .as[(Double, Double, Option[Double])].collect().toSeq
    // every cell's window covers the whole 2×2 grid → mean of {1,2,3} = 2.0,
    // including the null cell itself (min_periods=1 keeps it)
    assert(out == Seq(
      (0.0, 0.0, Some(2.0)), (0.0, 1.0, Some(2.0)),
      (1.0, 0.0, Some(2.0)), (1.0, 1.0, Some(2.0))))
    intercept[IllegalArgumentException] {
      GridAnalytics.focalMean(df, "time", "lat", "lon", "value",
        0.0, 1.0, 0.0, 1.0, radius = 0)
    }
  }

  test("focalMean: radius-1 window really is 3×3 (a far cell is excluded)") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (ts("2024-01-01T00:00"), 0.0, 0.0, 10.0),
      (ts("2024-01-01T00:00"), 0.0, 1.0, 20.0),
      (ts("2024-01-01T00:00"), 0.0, 5.0, 900.0) // 4 steps away: outside
    ).toDF("time", "lat", "lon", "value")
    val out = GridAnalytics.focalMean(df, "time", "lat", "lon", "value",
      0.0, 1.0, 0.0, 1.0)
      .orderBy("lon").select("value_focal").as[Double].collect().toSeq
    assert(out == Seq(15.0, 15.0, 900.0))
  }

  test("regionWeightedMean: overlapping boxes each get the cell, nulls skipped") {
    val sp = spark; import sp.implicits._
    val grid = Seq(
      (ts("2024-01-01T00:00"), 0.0, 10.0, Some(2.0)),
      (ts("2024-01-01T00:00"), 0.0, 20.0, Some(4.0)),
      (ts("2024-01-01T00:00"), 60.0, 10.0, Some(8.0)),
      (ts("2024-01-01T00:00"), 60.0, 20.0, None) // null: skipna
    ).toDF("time", "lat", "lon", "value")
    val regions = Seq(
      ("low", -10.0, 30.0, 0.0, 30.0),
      ("all", -10.0, 90.0, 0.0, 30.0),
      ("empty", -90.0, -50.0, 0.0, 30.0)
    ).toDF("region", "lat_min", "lat_max", "lon_min", "lon_max")
    val out = GridAnalytics.regionWeightedMean(grid, regions,
      "time", "lat", "lon", "value")
      .orderBy("region").select("region", "mean", "n_cells")
      .as[(String, Double, Long)].collect().toSeq
    // lat 0 → w=1, lat 60 → w=0.5: all = (2+4+8·0.5)/2.5 = 4.0; low = 3.0
    assert(out.map(_._1) == Seq("all", "low")) // empty region yields no row
    assert(math.abs(out(0)._2 - 4.0) < 1e-12 && out(0)._3 == 3L)
    assert(math.abs(out(1)._2 - 3.0) < 1e-12 && out(1)._3 == 2L)
  }

  test("groupbyBins: left-closed uniform bins, out-of-range discarded") {
    val sp = spark; import sp.implicits._
    val df = Seq(0.0, 0.5, 1.0, 1.5, 2.0, 4.5, -0.1, 10.0)
      .toDF("v") // bins [0,1) [1,2) ... ×5; -0.1 and 10.0 fall outside
    val out = GridAnalytics.groupbyBins(df, "v", lo = 0.0, step = 1.0, nBins = 5)
      .orderBy("bin_lo").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((0.0, 2L, 0.25), (1.0, 2L, 1.25), (2.0, 1L, 2.0), (4.0, 1L, 4.5)))
    intercept[IllegalArgumentException] {
      GridAnalytics.groupbyBins(df, "v", 0.0, -1.0, 5)
    }
  }

  test("thresholdIndices accumulates GDD and counts threshold days") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (ts("2024-01-01T00:00"), 0.0, 12.0), // gdd 2, above(>15)? no
      (ts("2024-01-02T00:00"), 0.0, 4.0),  // gdd 0, below(<5)
      (ts("2024-01-03T00:00"), 0.0, 18.0), // gdd 8, above
      (ts("2024-02-01T00:00"), 0.0, 5.0),  // next month: gdd 0, neither
      (ts("2024-01-01T00:00"), 1.0, 10.0)  // other cell: gdd 0 (== base)
    ).toDF("time", "lat", "value")
    val out = GridAnalytics.thresholdIndices(df, "time", Seq("lat"), "value",
      "month", base = 10.0, lowThresh = 5.0, highThresh = 15.0)
      .orderBy("period", "lat").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("period").toLocalDateTime
        .toLocalDate.toString, r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0.0, 10.0, 1L, 1L, 3L),
      ("2024-01-01", 1.0, 0.0, 0L, 0L, 1L),
      ("2024-02-01", 0.0, 0.0, 0L, 0L, 1L)))
    intercept[IllegalArgumentException] {
      GridAnalytics.thresholdIndices(df, "time", Seq("lat"), "value",
        "week", 10.0, 5.0, 15.0)
    }
  }

  test("regridNearest snaps to the closest source cell") {
    val sp = spark; import sp.implicits._
    val t = ts("2024-01-01T00:00")
    val src = Seq(
      (t, 0.0, 0.0, 0.0), (t, 0.0, 1.0, 1.0),
      (t, 1.0, 0.0, 2.0), (t, 1.0, 1.0, 3.0)
    ).toDF("time", "lat", "lon", "value")
    val target = Seq((0.1, 0.9), (0.9, 0.2), (3.0, 0.0)).toDF("lat", "lon")
    val out = GridAnalytics.regridNearest(src, target, Some("time"),
      "lat", "lon", "value", 0.0, 1.0, 2, 0.0, 1.0, 2)
      .orderBy("lat").collect().map(r => (r.getDouble(1), r.getDouble(3)))
    assert(out.toSeq == Seq((0.1, 1.0), (0.9, 2.0)))
  }
}
