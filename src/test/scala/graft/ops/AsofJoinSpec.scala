package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** F4 bulk — backward as-of join semantics. */
class AsofJoinSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def t(s: String) = ts(s"2024-01-0${s}")

  test("each left row matches the latest right row at or before it, per key") {
    val left = Seq(
      ("a", t("2T10:00:00")), ("a", t("5T00:00:00")),
      ("b", t("3T00:00:00")), ("c", t("4T00:00:00"))
    ).toDF("k", "ts")
    val right = Seq(
      ("a", t("1T00:00:00"), 1.0), ("a", t("2T10:00:00"), 2.0),
      ("a", t("4T00:00:00"), 3.0), ("b", t("9T00:00:00"), 9.0)
    ).toDF("k", "rts", "v")
    val out = Filters.asofJoinBackward(left, right, "ts", "rts", Seq("k"), Seq("v"))
      .select("k", "ts", "v", "__matched_time")
    val got = collectSet(out)
    assert(got == Set(
      Seq("a", t("2T10:00:00"), 2.0, t("2T10:00:00")), // exact timestamp wins
      Seq("a", t("5T00:00:00"), 3.0, t("4T00:00:00")), // latest earlier
      Seq("b", t("3T00:00:00"), null, null),            // right is later only
      Seq("c", t("4T00:00:00"), null, null)             // key absent on right
    ))
  }

  test("tolerance nulls out matches that are too old") {
    val left = Seq(("a", t("5T00:00:00"))).toDF("k", "ts")
    val right = Seq(("a", t("1T00:00:00"), 1.0)).toDF("k", "rts", "v")
    val strict = Filters.asofJoinBackward(left, right, "ts", "rts", Seq("k"), Seq("v"),
      toleranceSeconds = Some(3600.0))
    assert(collectSet(strict.select("v")) == Set(Seq(null)))
    val loose = Filters.asofJoinBackward(left, right, "ts", "rts", Seq("k"), Seq("v"),
      toleranceSeconds = Some(4 * 86400.0))
    assert(collectSet(loose.select("v")) == Set(Seq(1.0)))
  }

  test("forward: each left row matches the earliest right row at or after " +
      "it, per key; exact timestamps win; tolerance bounds the wait") {
    val left = Seq(
      ("a", t("2T10:00:00")), ("a", t("5T00:00:00")),
      ("b", t("3T00:00:00")), ("c", t("4T00:00:00"))
    ).toDF("k", "ts")
    val right = Seq(
      ("a", t("1T00:00:00"), 1.0), ("a", t("2T10:00:00"), 2.0),
      ("a", t("4T00:00:00"), 3.0), ("b", t("9T00:00:00"), 9.0)
    ).toDF("k", "rts", "v")
    val out = Filters.asofJoinForward(left, right, "ts", "rts", Seq("k"), Seq("v"))
      .select("k", "ts", "v", "__matched_time")
    assert(collectSet(out) == Set(
      Seq("a", t("2T10:00:00"), 2.0, t("2T10:00:00")), // exact timestamp wins
      Seq("a", t("5T00:00:00"), null, null),            // nothing later for a
      Seq("b", t("3T00:00:00"), 9.0, t("9T00:00:00")),  // earliest later
      Seq("c", t("4T00:00:00"), null, null)
    ))
    val strict = Filters.asofJoinForward(left, right, "ts", "rts", Seq("k"), Seq("v"),
      toleranceSeconds = Some(3600.0))
    assert(collectSet(strict.filter(col("k") === "b").select("v")) == Set(Seq(null)))
  }

  test("plan shape: one shuffle on the partition key, no range-join explosion") {
    val left = Seq(("a", t("2T00:00:00"))).toDF("k", "ts")
    val right = Seq(("a", t("1T00:00:00"), 1.0)).toDF("k", "rts", "v")
    val plan = Filters.asofJoinBackward(left, right, "ts", "rts", Seq("k"), Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }
}
