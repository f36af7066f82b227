package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def ids(n: Int) = (0L until n.toLong).toDF("id")

  test("thresholdHex endpoints and midpoints") {
    assert(Sampling.thresholdHex(0.0) == "00000000")
    assert(Sampling.thresholdHex(0.5) == "80000000")
    assert(Sampling.thresholdHex(0.25) == "40000000")
    assert(Sampling.thresholdHex(1.0) == "g")
    intercept[IllegalArgumentException](Sampling.thresholdHex(1.5))
  }

  test("fraction 0 keeps nothing, fraction 1 keeps everything") {
    assert(Sampling.sampleByHash(ids(500), "id", 0.0).count() == 0L)
    assert(Sampling.sampleByHash(ids(500), "id", 1.0).count() == 500L)
  }

  test("NULL keys draw deterministically instead of being dropped") {
    val df = Seq(Some(1L), None, Some(3L), None).toDF("id")
    assert(Sampling.sampleByHash(df, "id", 1.0).count() == 4L)
    val kept = Sampling.sampleByHash(df, "id", 0.5, "s").count()
    val keptAgain = Sampling.sampleByHash(df, "id", 0.5, "s").count()
    assert(kept == keptAgain)
  }

  test("sample is deterministic and partitioning-independent") {
    val a = Sampling.sampleByHash(ids(2000).repartition(1), "id", 0.3, "s")
      .as[Long].collect().sorted.toSeq
    val b = Sampling.sampleByHash(ids(2000).repartition(13), "id", 0.3, "s")
      .as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("sampled fraction approximates the target and seeds decorrelate") {
    val n = 20000
    val k1 = Sampling.sampleByHash(ids(n), "id", 0.2, "seedA").count().toDouble
    assert(math.abs(k1 / n - 0.2) < 0.02, s"got ${k1 / n}")
    val s1 = Sampling.sampleByHash(ids(n), "id", 0.2, "seedA").as[Long].collect().toSet
    val s2 = Sampling.sampleByHash(ids(n), "id", 0.2, "seedB").as[Long].collect().toSet
    val overlap = (s1 & s2).size.toDouble / s1.size
    assert(overlap < 0.3, s"seeds should decorrelate; overlap $overlap")
  }

  test("sample at fraction f is a SUBSET of the sample at f' > f (same seed)") {
    // nested samples are what make hash sampling operationally useful:
    // growing the rate only ADDS rows, it never reshuffles the sample
    val small = Sampling.sampleByHash(ids(5000), "id", 0.1, "s").as[Long].collect().toSet
    val big = Sampling.sampleByHash(ids(5000), "id", 0.4, "s").as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("stratified sampling applies per-stratum rates") {
    val df = (0L until 9000L).map(i => (i, s"s${i % 3}")).toDF("id", "stratum")
    val out = Sampling.stratifiedSampleByHash(df, "id", "stratum",
      Map("s0" -> 0.1, "s1" -> 0.9), defaultFraction = 0.5, seed = "x")
    val byStratum = out.groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(byStratum("s0") / 3000.0 - 0.1) < 0.03)
    assert(math.abs(byStratum("s1") / 3000.0 - 0.9) < 0.03)
    assert(math.abs(byStratum("s2") / 3000.0 - 0.5) < 0.03)
  }

  test("capPerStratum keeps at most N per stratum, deterministically") {
    val df = (0L until 300L).map(i => (i, s"src${i % 3}")).toDF("id", "stratum")
    val out = Sampling.capPerStratum(df, "id", "stratum", 7, "s")
    val byStratum = out.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(byStratum.values.forall(_ == 7L) && byStratum.size == 3)
    val again = Sampling.capPerStratum(df.repartition(11), "id", "stratum", 7, "s")
      .select("id").as[Long].collect().sorted.toSeq
    assert(again == out.select("id").as[Long].collect().sorted.toSeq)
    // a stratum under the cap is untouched
    val small = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "stratum")
    assert(Sampling.capPerStratum(small, "id", "stratum", 5).count() == 3L)
  }

  test("temperature mixture flattens domain shares toward the budget") {
    // heavily skewed corpus: 80% / 15% / 5% of the weight
    val df = ((0L until 8000L).map(i => (i, "big", 10L)) ++
      (8000L until 9500L).map(i => (i, "mid", 10L)) ++
      (9500L until 10000L).map(i => (i, "small", 10L))).toDF("id", "dom", "w")
    val rates = Sampling.temperatureMixtureRates(df, "dom", "w",
      alpha = 0.5, budgetFraction = 0.5)
    // α < 1 upweights the tail: keep rates must invert the size order
    assert(rates("small") > rates("mid") && rates("mid") > rates("big"))
    assert(rates.values.forall(r => r > 0 && r <= 1.0))
    // the realized sample hits ~budgetFraction of total weight
    val kept = Sampling.temperatureMixtureSample(df, "id", "dom", "w",
      alpha = 0.5, budgetFraction = 0.5, seed = "t")
    val keptW = kept.agg(sum("w")).as[Long].collect().head
    assert(math.abs(keptW / 100000.0 - 0.5) < 0.05)
    // α = 1 reproduces natural proportions: every rate equals the budget
    val nat = Sampling.temperatureMixtureRates(df, "dom", "w", 1.0, 0.4)
    assert(nat.values.forall(r => math.abs(r - 0.4) < 1e-9))
    // a tiny domain's boosted rate caps at 1.0
    val tiny = ((0L until 9990L).map(i => (i, "big", 100L)) ++
      (9990L until 10000L).map(i => (i, "tiny", 1L))).toDF("id", "dom", "w")
    val capped = Sampling.temperatureMixtureRates(tiny, "dom", "w", 0.3, 0.9)
    assert(capped("tiny") == 1.0 && capped("big") < 1.0)
    // deterministic and partitioning-independent
    val again = Sampling.temperatureMixtureSample(df.repartition(13), "id",
      "dom", "w", 0.5, 0.5, "t").select("id").as[Long].collect().sorted.toSeq
    assert(again == kept.select("id").as[Long].collect().sorted.toSeq)
  }

  test("hashSplit: consecutive ranges, stable under growth, remainder is last") {
    val df = ids(5000)
    val out = Sampling.hashSplit(df, "id",
      Seq("val" -> 0.1, "test" -> 0.1, "train" -> 0.8), seed = "s")
    val byS = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(math.abs(byS("val") / 5000.0 - 0.1) < 0.02)
    assert(math.abs(byS("test") / 5000.0 - 0.1) < 0.02)
    assert(math.abs(byS("train") / 5000.0 - 0.8) < 0.02)
    // growth stability: the first 5000 rows keep their split when 5000 more arrive
    val grown = Sampling.hashSplit(ids(10000), "id",
      Seq("val" -> 0.1, "test" -> 0.1, "train" -> 0.8), seed = "s")
      .filter(col("id") < 5000)
    val a = out.orderBy("id").as[(Long, String)].collect().toSeq
    val b = grown.orderBy("id").as[(Long, String)].collect().toSeq
    assert(a == b)
    // splits are disjoint and exhaustive by construction
    assert(byS.values.sum == 5000L)
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, "id", Seq("only" -> 1.0))
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, "id", Seq("a" -> 0.9, "b" -> 0.3))
    }
  }

  test("topKPerStratum: best k by explicit ordering, deterministic ties") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 30L), (3L, "a", 30L), (4L, "a", 20L),
      (5L, "b", 1L)
    ).toDF("id", "src", "score")
    val kept = Sampling.topKPerStratum(df, "src", 2,
      Seq(col("score").desc, col("id").asc))
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    // a: ties at 30 break toward lower id (2 then 3); b: its single row
    assert(kept == Seq((2L, "a", 30L), (3L, "a", 30L), (5L, "b", 1L)))
    intercept[IllegalArgumentException] {
      Sampling.topKPerStratum(df, "src", 0, Seq(col("score")))
    }
    intercept[IllegalArgumentException] {
      Sampling.topKPerStratum(df, "src", 1, Seq.empty)
    }
  }

  test("the hash predicate is partition-pruning friendly (no shuffle)") {
    val plan = Sampling.sampleByHash(ids(100), "id", 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }
}
