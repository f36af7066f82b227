package graft.store

import java.nio.file.Files
import java.time.ZoneOffset

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{DatasetDescriptor, TimeSpan, TimeUnitKind}

/** Store-scale stress tier: the empirical pin for SCALING.md's "update
  * cost ∝ delta, not store size" claim. Builds the SAME store at two
  * sizes an order of magnitude apart, then times an identical 1-day
  * append and a 2-day historical insert against each — if any update
  * stage scanned the store (classification, combine-first padding,
  * existing-end probe), the big store's delta would pay ~10×; the
  * delta-bound design pays ~1×. Run STANDALONE (own local[32] session,
  * a few minutes):
  *
  *   GRAFT_STRESS_STORE=1 sbt "testOnly graft.store.StoreStressTierSpec"
  *
  * Measured numbers go in SCALING.md §stress-tiers; the assertion here
  * bounds the RATIO generously (3×) so machine noise never flakes it
  * while a store-proportional regression (≈10×) always trips it. */
class StoreStressTierSpec extends AnyFunSuite {

  private def enabled = sys.env.contains("GRAFT_STRESS_STORE")

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-stress-store")
    .getOrCreate()

  private val desc = DatasetDescriptor("stress_store", "value",
    spatialDims = Seq("latitude", "longitude"), timeResolution = TimeSpan.Daily)

  /** 100×100-cell daily grid (10k rows/day), `nDays` days from day
    * `startDay` (0-based, epoch 2020-01-01). Distributed generation —
    * the big tier's build must not be driver-bound. */
  private def grid(startDay: Int, nDays: Int, base: Double): DataFrame = {
    val cells = 100 * 100
    val epoch = java.time.LocalDateTime.of(2020, 1, 1, 0, 0)
      .toEpochSecond(ZoneOffset.UTC)
    spark.range(nDays.toLong * cells).select(
      timestamp_seconds(lit(epoch) +
        (lit(startDay.toLong) + floor(col("id") / cells).cast("long")) * 86400L)
        .cast("timestamp_ntz").as("time"),
      (lit(10.0) + floor(col("id") % cells / 100).cast("double") * 0.25)
        .as("latitude"),
      (lit(100.0) + (col("id") % 100).cast("double") * 0.25).as("longitude"),
      (lit(base) + (col("id") % 977).cast("double")).as("value"))
  }

  private def timed(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  test("append and insert cost is delta-bound: ~flat from a 120-day to " +
      "a 1200-day store") {
    assume(enabled, "set GRAFT_STRESS_STORE=1 to run the store stress tier")
    val root = Files.createTempDirectory("store_stress").toString
    def build(name: String, nDays: Int): GridStore = {
      val store = new GridStore(spark, s"$root/$name", desc,
        bucketSpan = TimeUnitKind.Months)
      val t = timed { store.publish(grid(0, nDays, base = 0.0)) }
      info(f"build $name ($nDays days, ${nDays * 10000} rows): $t%.1f s")
      store
    }
    val small = build("small", 120)
    val large = build("large", 1200)

    // identical 1-day APPEND at each store's tail
    val tAppendSmall = timed { small.publish(grid(120, 1, base = 5000.0)) }
    val tAppendLarge = timed { large.publish(grid(1200, 1, base = 5000.0)) }
    info(f"append 1 day: small $tAppendSmall%.1f s, large $tAppendLarge%.1f s" +
      f" (ratio ${tAppendLarge / tAppendSmall}%.2f)")

    // identical 2-day historical INSERT (days 10-11 correction)
    val tInsertSmall = timed { small.publish(grid(10, 2, base = 9000.0)) }
    val tInsertLarge = timed { large.publish(grid(10, 2, base = 9000.0)) }
    info(f"insert 2 days: small $tInsertSmall%.1f s, large $tInsertLarge%.1f s" +
      f" (ratio ${tInsertLarge / tInsertSmall}%.2f)")

    // correctness: both stores carry their delta and nothing leaked
    assert(small.dataset().count() == 121L * 10000)
    assert(large.dataset().count() == 1201L * 10000)
    def corrected(s: GridStore): Long = s.dataset()
      .filter(col("value") >= 9000.0).count()
    assert(corrected(small) == 2L * 10000)
    assert(corrected(large) == 2L * 10000)

    // THE pin: 10× the store must not make the delta ~10× — 3× bounds
    // noise while a store-proportional path always trips it
    assert(tAppendLarge <= tAppendSmall * 3.0,
      f"append scaled with store size: $tAppendSmall%.1f -> $tAppendLarge%.1f s")
    assert(tInsertLarge <= tInsertSmall * 3.0,
      f"insert scaled with store size: $tInsertSmall%.1f -> $tInsertLarge%.1f s")
  }
}
