package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.TimeSpan

class FiltersStatsSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def evts = Seq(
    (1L, ts("2024-01-01T00:00:00"), 1.0),
    (2L, ts("2024-01-02T00:00:00"), 2.0),
    (3L, ts("2024-01-03T00:00:00"), 3.0),
    (4L, ts("2024-01-03T12:00:00"), 4.0)).toDF("id", "time", "v")

  test("timeSlice is inclusive on both ends") {
    val out = Filters.timeSlice(evts, "time",
      lit(ts("2024-01-02T00:00:00")), lit(ts("2024-01-03T00:00:00")))
    assert(out.select("id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("timeMembership keeps exact matches only") {
    val out = Filters.timeMembership(evts, "time",
      Seq(ts("2024-01-01T00:00:00"), ts("2024-01-03T12:00:00")))
    assert(out.select("id").as[Long].collect().toSet == Set(1L, 4L))
  }

  test("semiJoinFilter and antiJoinFilter partition the input") {
    val other = Seq(Tuple1(ts("2024-01-02T00:00:00"))).toDF("time")
    val semi = Filters.semiJoinFilter(evts, other, Seq("time"))
    val anti = Filters.antiJoinFilter(evts, other, Seq("time"))
    assert(semi.count() + anti.count() == evts.count())
    assert(semi.select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("nearestWithTolerance picks the closest row within tolerance") {
    val hit = Filters.nearestWithTolerance(evts, "time",
      lit(ts("2024-01-03T10:00:00")), toleranceSeconds = 3 * 3600.0, Seq("id"))
    assert(hit.select("id").as[Long].head() == 4L)
    val miss = Filters.nearestWithTolerance(evts, "time",
      lit(ts("2024-02-01T00:00:00")), toleranceSeconds = 60.0)
    assert(miss.count() == 0)
  }

  test("pruneManifest keeps overlapping ranges only (publish.py:897-949)") {
    val manifest = Seq(
      ("f1", ts("2024-01-01T00:00:00"), ts("2024-01-05T00:00:00")),
      ("f2", ts("2024-01-06T00:00:00"), ts("2024-01-10T00:00:00")),
      ("f3", ts("2024-01-11T00:00:00"), ts("2024-01-15T00:00:00")))
      .toDF("path", "min_t", "max_t")
    val out = Filters.pruneManifest(manifest, "min_t", "max_t",
      lit(ts("2024-01-04T00:00:00")), lit(ts("2024-01-07T00:00:00")))
    assert(out.select("path").as[String].collect().toSet == Set("f1", "f2"))
  }

  test("dateRange and nextDate") {
    val r = Stats.dateRange(evts, "time").head()
    assert(r.get(0).toString == "2024-01-01T00:00")
    assert(r.get(1).toString == "2024-01-03T12:00")
    val n = Stats.nextDate(evts, "time", TimeSpan.Daily).head()
    assert(n.get(0).toString == "2024-01-04T12:00")
  }

  test("dimSizeStats reports per-dim cardinalities") {
    val r = Stats.dimSizeStats(evts, Seq("time", "id")).head()
    assert(r.getAs[Long]("n_time") == 4L && r.getAs[Long]("n_id") == 4L &&
      r.getAs[Long]("n_rows") == 4L)
  }
}
