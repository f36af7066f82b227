package graft.ops

import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.TimeSpan

/** Randomized differential tests: operators vs brute-force Scala reference
  * implementations on seeded random inputs — the fixed fixtures can't cover
  * run-boundary and tie cases exhaustively. */
class OpDifferentialSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private val base = LocalDateTime.parse("2024-01-01T00:00:00")

  test("contiguousRanges partitions any random day-set into maximal runs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 20) {
      val days = (0 until 60).filter(_ => rnd.nextBoolean()).toList
      if (days.nonEmpty) {
        val times = days.map(d => Tuple1(base.plusDays(d.toLong))).toDF("d")
        val runs = UpdatePlan.contiguousRanges(times, "d", TimeSpan.Daily)
          .orderBy("run_start")
          .collect()
          .map(r => (r.getAs[LocalDateTime]("run_start"), r.getAs[LocalDateTime]("run_end"),
            r.getAs[Long]("n_steps")))

        // brute-force runs
        val expected = days.sorted.foldLeft(List.empty[List[Int]]) {
          case (acc, d) if acc.nonEmpty && acc.head.head == d - 1 =>
            (d :: acc.head) :: acc.tail
          case (acc, d) => List(d) :: acc
        }.reverse.map(run => (base.plusDays(run.min.toLong),
          base.plusDays(run.max.toLong), run.length.toLong))
        assert(runs.toList == expected, s"days=$days")
      }
    }
  }

  test("asofJoinBackward matches brute force on random keyed events") {
    val rnd = new scala.util.Random(13)
    for (iter <- 0 until 10) {
      val keys = Seq("a", "b", "c")
      val leftRows = (0 until 30).map { i =>
        (keys(rnd.nextInt(3)), base.plusHours(rnd.nextInt(200).toLong), i.toLong)
      }
      val rightRows = (0 until 25).map { i =>
        (keys(rnd.nextInt(3)), base.plusHours(rnd.nextInt(200).toLong), i.toDouble)
      }
      // dedup right per (key, time) keeping max value (deterministic)
      val rightDedup = rightRows.groupBy(r => (r._1, r._2))
        .map { case ((k, t), rs) => (k, t, rs.map(_._3).max) }.toSeq

      val left = leftRows.toDF("k", "ts", "lid")
      val right = rightDedup.toDF("k", "rts", "v")
      val got = Filters.asofJoinBackward(left, right, "ts", "rts", Seq("k"), Seq("v"))
        .select("lid", "v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap

      val expected = leftRows.map { case (k, t, lid) =>
        val cands = rightDedup.filter(r => r._1 == k && !r._2.isAfter(t))
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(r => r._2.toString)._3))
      }.toMap
      assert(got == expected, s"iter=$iter")
    }
  }

  test("combineFirst equals map-merge with update priority on random frames") {
    val rnd = new scala.util.Random(99)
    for (_ <- 0 until 10) {
      val upd = (0 until 20).filter(_ => rnd.nextBoolean())
        .map(d => (base.plusDays(d.toLong), rnd.nextInt(100).toLong))
      val orig = (0 until 20).filter(_ => rnd.nextBoolean())
        .map(d => (base.plusDays(d.toLong), 1000L + rnd.nextInt(100)))
      val out = UpdatePlan.combineFirst(
          upd.toDF("d", "n"), orig.toDF("d", "n"), Seq("d"), "n")
        .collect().map(r => r.getAs[LocalDateTime]("d") -> r.getLong(1)).toMap
      val expected = orig.toMap ++ upd.toMap
      assert(out == expected)
    }
  }

  test("asofJoinBackward: null value in the matched row is NOT back-filled") {
    // right rows for key a: (t1, 5.0), (t2, null); left at t3 matches t2,
    // so v must be null and matched_time t2 - not 5.0 from the older row
    val left = Seq(("a", ts("2024-01-03T00:00:00"))).toDF("k", "ts")
    val right = Seq(
      ("a", ts("2024-01-01T00:00:00"), Some(5.0)),
      ("a", ts("2024-01-02T00:00:00"), Option.empty[Double])
    ).toDF("k", "rts", "v")
    val out = Filters.asofJoinBackward(left, right, "ts", "rts", Seq("k"), Seq("v"))
      .select("v", "__matched_time").head()
    assert(out.isNullAt(0), "null value must come from the matched row")
    assert(out.getAs[java.time.LocalDateTime](1) == ts("2024-01-02T00:00:00"))
  }
}
