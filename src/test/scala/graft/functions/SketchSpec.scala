package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def exactHeavy(df: org.apache.spark.sql.DataFrame, eps: Double) = {
    val toks = df.select(explode(Text.tokens(col("text"))).as("token"))
    val n = toks.count()
    toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").cast("double") >= lit(eps * n))
      .orderBy("token")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  test("frequentTokens returns the exact heavy-hitter set with exact counts") {
    val rnd = new scala.util.Random(11)
    // zipfian-ish corpus: few hot words, long random tail
    val hot = Seq("the", "of", "and", "data", "model")
    val docs = (1 to 300).map { i =>
      val words = (1 to 40).map { _ =>
        if (rnd.nextInt(3) < 2) hot(rnd.nextInt(hot.length))
        else s"w${rnd.nextInt(5000)}"
      }
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    for (eps <- Seq(0.02, 0.05, 0.12)) {
      val got = Sketch.frequentTokens(docs, "text", eps)
        .orderBy("token")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == exactHeavy(docs, eps), s"eps=$eps")
    }
  }

  test("frequentTokens is partitioning-independent") {
    val docs = (1 to 200).map(i =>
      (i.toLong, (1 to 30).map(j => s"t${(i * j) % 40}").mkString(" ")))
      .toDF("doc_id", "text")
    val a = Sketch.frequentTokens(docs, "text", 0.03)
      .orderBy("token").collect().toSeq
    val b = Sketch.frequentTokens(docs.repartition(17), "text", 0.03)
      .orderBy("token").collect().toSeq
    assert(a == b)
  }

  test("property: frequentTokens equals the exact heavy hitters on arbitrary corpora") {
    import org.scalacheck.{Gen, Prop}
    val gen = for {
      nDocs <- Gen.choose(1, 120)
      vocab <- Gen.choose(3, 400)
      eps <- Gen.oneOf(0.02, 0.05, 0.15)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield (nDocs, vocab, eps, seed)
    val prop = Prop.forAll(gen) { case (nDocs, vocab, eps, seed) =>
      val rnd = new scala.util.Random(seed)
      val docs = (1 to nDocs).map { i =>
        val n = 1 + rnd.nextInt(30)
        (i.toLong, (1 to n).map { _ =>
          // zipf-ish: small ids exponentially more likely
          val r = rnd.nextDouble()
          s"v${(math.pow(r, 3) * vocab).toInt}"
        }.mkString(" "))
      }.toDF("doc_id", "text")
      val got = Sketch.frequentTokens(docs, "text", eps)
        .orderBy("token").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      got == exactHeavy(docs, eps)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("Misra-Gries candidates survive an adversarial decrement-heavy tail") {
    // one token at exactly the threshold frequency inside a sea of
    // singletons — the worst case for the decrement-all step
    val eps = 0.01
    val n = 10000
    val hotCount = math.ceil(eps * n).toInt
    val words = scala.util.Random.shuffle(
      (Seq.fill(hotCount)("needle") ++
        (1 to (n - hotCount)).map(i => s"hay$i")).toVector)
    val docs = words.grouped(50).zipWithIndex
      .map { case (w, i) => (i.toLong, w.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val got = Sketch.frequentTokens(docs, "text", eps)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("needle", hotCount.toLong)))
  }

  test("HLL sketches: one-shot and incremental-union estimates hold the error bound") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 4000).map { i =>
      val src = s"s${i % 4}"
      (i.toLong, src, s"doc-${src}-${rnd.nextInt(900)}")
    }.toDF("id", "source", "text")
    val oneShot = Sketch.distinctEstimates(
      Sketch.distinctSketches(rows, "source", col("text")), "source")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy("source").agg(countDistinct("text").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (s, d) =>
      assert(math.abs(oneShot(s) - d).toDouble / d < 0.05,
        s"$s: ${oneShot(s)} vs $d")
    }
    // batches sketched independently then unioned: every split's merged
    // estimate must sit inside the same error bound as the one-shot
    // sketch (estimator bytes are split-dependent — see Sketch scaladoc —
    // the BOUND is the contract incremental monitoring relies on)
    def mergedBySplit(mod: Int): Map[String, Long] = {
      val parts = (0 until mod).map(m =>
        Sketch.distinctSketches(rows.filter(col("id") % mod === m), "source",
          col("text")))
      Sketch.distinctEstimates(
        parts.reduce(Sketch.unionSketchTables(_, _, "source")), "source")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    for (mod <- Seq(3, 5); (s, d) <- exact) {
      val est = mergedBySplit(mod)(s)
      assert(math.abs(est - d).toDouble / d < 0.05, s"split $mod, $s: $est vs $d")
    }
  }
}
