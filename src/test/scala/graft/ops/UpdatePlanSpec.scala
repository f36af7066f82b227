package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.TimeSpan

/** Update-planner parity with publish.py:377-404 (classification),
  * 555-620 (islands), 730-822 (gates) — the reference's gap-riddled update
  * fixture shape (tests/unit/conftest.py:137-149) scaled down. */
class UpdatePlanSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def times(days: Int*) =
    days.map(d => Tuple1(ts(f"2024-01-$d%02dT00:00:00"))).toDF("time")

  test("prepareUpdateTimes splits inserts (∩) and appends (−), sorted") {
    val original = times(1 to 10: _*)
    val update = times(8, 9, 10, 11, 12)
    val (ins, app) = UpdatePlan.prepareUpdateTimes(original, update)
    assert(ins.as[java.time.LocalDateTime].collect().toSeq ==
      Seq(ts("2024-01-08T00:00:00"), ts("2024-01-09T00:00:00"), ts("2024-01-10T00:00:00")))
    assert(app.as[java.time.LocalDateTime].collect().toSeq ==
      Seq(ts("2024-01-11T00:00:00"), ts("2024-01-12T00:00:00")))
  }

  test("classifyUpdateTimes tags every update time exactly once") {
    val out = UpdatePlan.classifyUpdateTimes(times(1 to 5: _*), times(4, 5, 6, 7))
      .collect().map(r => (r.get(0).toString, r.getString(1))).toMap
    assert(out.size == 4)
    assert(out("2024-01-04T00:00") == "insert")
    assert(out("2024-01-06T00:00") == "append")
  }

  test("contiguousRanges groups gap-riddled times into islands") {
    // Three runs: 1-3, 7, 10-11 (daily resolution)
    val out = UpdatePlan.contiguousRanges(times(1, 2, 3, 7, 10, 11), "time", TimeSpan.Daily)
      .collect().map(r => (r.getAs[Any]("run_start").toString,
        r.getAs[Any]("run_end").toString, r.getAs[Long]("n_steps")))
    assert(out.toSeq == Seq(
      ("2024-01-01T00:00", "2024-01-03T00:00", 3L),
      ("2024-01-07T00:00", "2024-01-07T00:00", 1L),
      ("2024-01-10T00:00", "2024-01-11T00:00", 2L)))
  }

  test("contiguousRanges single element is one run") {
    val out = UpdatePlan.contiguousRanges(times(5), "time", TimeSpan.Daily).collect()
    assert(out.length == 1 && out.head.getAs[Long]("n_steps") == 1L)
  }

  test("combineFirst prefers update values and fills from original") {
    val upd = Seq((1, 100.0), (2, 200.0)).toDF("k", "v")
    val orig = Seq((2, 2.0), (3, 3.0)).toDF("k", "v")
    val out = UpdatePlan.combineFirst(upd, orig, Seq("k"), "v")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    assert(out == Map(1 -> 100.0, 2 -> 200.0, 3 -> 3.0))
  }

  test("cadenceViolations flags gaps and accepts contiguous series") {
    val ok = UpdatePlan.cadenceViolations(times(1, 2, 3), "time", TimeSpan.Daily)
    assert(ok.count() == 0)
    val bad = UpdatePlan.cadenceViolations(times(1, 2, 5), "time", TimeSpan.Daily)
      .collect().map(r => (r.get(0).toString, r.getDouble(1)))
    assert(bad.toSeq == Seq(("2024-01-05T00:00", 3.0 * 1440)))
  }

  test("cadenceViolations honors irregular cadence bounds") {
    val t = times(1, 3, 6) // gaps of 2 and 3 days
    val within = UpdatePlan.cadenceViolations(t, "time", TimeSpan.Daily,
      Some((TimeSpan.Daily, TimeSpan(graft.model.TimeUnitKind.Days, 3))))
    assert(within.count() == 0)
    val outside = UpdatePlan.cadenceViolations(t, "time", TimeSpan.Daily,
      Some((TimeSpan.Daily, TimeSpan(graft.model.TimeUnitKind.Days, 2))))
    assert(outside.count() == 1)
  }

  test("updateQualityCheck: empty update raises") {
    val e = times()
    assertThrows[IllegalStateException] {
      UpdatePlan.updateQualityCheck(spark, e, e, "time",
        java.sql.Timestamp.valueOf("2024-01-10 00:00:00"), TimeSpan.Daily, None)
    }
  }

  test("updateQualityCheck: non-contiguous append raises (test_chirps.py:305-329 analog)") {
    assertThrows[IllegalStateException] {
      UpdatePlan.updateQualityCheck(spark, times(), times(13), "time",
        java.sql.Timestamp.valueOf("2024-01-10 00:00:00"), TimeSpan.Daily, None)
    }
  }

  test("updateQualityCheck: contiguous append passes") {
    UpdatePlan.updateQualityCheck(spark, times(), times(11), "time",
      java.sql.Timestamp.valueOf("2024-01-10 00:00:00"), TimeSpan.Daily, None)
  }

  test("updateQualityCheck: zone-safe for instant (LTZ) inputs when " +
      "session zone != JVM zone") {
    // ADVICE r8: the pre-fix shim cast LTZ columns to NTZ via the SESSION
    // zone and reconstructed epoch via the JVM zone — a +05:00 session
    // skewed a truly-contiguous daily append by 5h and tripped the gate.
    // The gate now compares in epoch space, so instants never shift.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "+05:00")
    try {
      def ltz(days: Int*) = days.map(d =>
        Tuple1(java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")))
        .toDF("time")
      UpdatePlan.updateQualityCheck(spark, ltz(), ltz(11), "time",
        java.sql.Timestamp.valueOf("2024-01-10 00:00:00"), TimeSpan.Daily, None)
      // And a genuinely non-contiguous append still raises under the
      // skewed session zone.
      assertThrows[IllegalStateException] {
        UpdatePlan.updateQualityCheck(spark, ltz(), ltz(13), "time",
          java.sql.Timestamp.valueOf("2024-01-10 00:00:00"), TimeSpan.Daily, None)
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("updateQualityCheck: zone-safe for wall-time (NTZ) inputs when " +
      "session zone != JVM zone") {
    // ADVICE r9 — the mirror of the LTZ case: an NTZ column goes
    // wall->epoch via the SESSION zone, but existingEnd.getTime reflects
    // the JVM zone its Timestamp was built in (Timestamp.valueOf). Under a
    // +05:00 session zone the pre-fix gap for a truly-contiguous daily
    // append skewed by 5h and tripped the gate. Both sides now derive
    // through the session-zone convention for NTZ inputs.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "+05:00")
    try {
      val sp = spark; import sp.implicits._
      def ntz(days: Int*) = days.map(d =>
        Tuple1(java.time.LocalDateTime.parse(f"2024-01-$d%02dT00:00:00")))
        .toDF("time") // LocalDateTime encodes as TIMESTAMP_NTZ
      UpdatePlan.updateQualityCheck(spark, ntz(), ntz(11), "time",
        java.sql.Timestamp.valueOf("2024-01-10 00:00:00"), TimeSpan.Daily, None)
      // a genuinely non-contiguous NTZ append still raises
      assertThrows[IllegalStateException] {
        UpdatePlan.updateQualityCheck(spark, ntz(), ntz(13), "time",
          java.sql.Timestamp.valueOf("2024-01-10 00:00:00"), TimeSpan.Daily, None)
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
