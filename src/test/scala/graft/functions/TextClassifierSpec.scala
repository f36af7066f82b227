package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** fastText-style quality classifier: hashed-bag scoring parity with
  * the composed xxhash64 form, logistic training separates a synthetic
  * corpus, quantized weights drive the exact integer keep path. */
class TextClassifierSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  test("classifierScoreMicro equals the composed xxhash64/pmod form " +
      "(bucketing parity is what the oracle replays)") {
    val dim = 64
    val w = Seq.tabulate(dim)(k => ((k * 131) % 41 - 20).toLong)
    val docs = Seq("alpha beta gamma", "  spaced\tout\ntokens ", "one",
      "repeated repeated repeated", "").toDF("text")
    val warr = array(w.map(lit): _*)
    val composed = aggregate(
      Text.tokens(col("text")), lit(0L),
      (acc, t) => acc + element_at(warr,
        pmod(xxhash64(t), lit(dim.toLong)).cast("int") + 1))
    val rows = docs.select(
      Text.classifierScoreMicro(col("text"), w).as("native"),
      composed.as("composed")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
  }

  test("trainQualityClassifier separates a synthetic good/spam corpus; " +
      "quantized weights keep every positive and drop every negative") {
    val good = (0 until 60).map(i =>
      (1.0, s"the quick article number $i discusses careful research " +
        "with thorough methods and clear writing"))
    val spam = (0 until 60).map(i =>
      (0.0, s"buy cheap pills now $i click here winner casino " +
        "free free free offer"))
    val df = (good ++ spam).toDF("label", "text")
    val (wd, bias) = Text.trainQualityClassifier(df, "text", "label",
      dim = 256, iters = 60, lr = 2.0)
    assert(wd.length == 256)
    val w = Text.quantizeMicro(wd)
    // the trained boundary sum(w)/n + bias >= 0 replays in the
    // mean form as sum(w) >= (-bias) * n — bias is PER TOKEN there
    // (the scaladoc's replay recipe; passing it as the once-added
    // bias shifts the boundary)
    val thr = -math.round(bias * 1e6)
    val kept = df.select(col("label"),
        Text.classifierKeep(col("text"), w, 0L, thr).as("keep"))
      .collect()
    kept.foreach { r =>
      assert(r.getBoolean(1) == (r.getDouble(0) == 1.0),
        s"label ${r.getDouble(0)} keep ${r.getBoolean(1)}")
    }
    // determinism across repartitionings is NOT claimed for float
    // training (summation order); the decision boundary is — retrain
    // on a shuffled layout and re-check the decisions
    val (wd2, bias2) = Text.trainQualityClassifier(df.repartition(7),
      "text", "label", dim = 256, iters = 60, lr = 2.0)
    val kept2 = df.select(col("label"), Text.classifierKeep(col("text"),
        Text.quantizeMicro(wd2), 0L, -math.round(bias2 * 1e6)).as("keep"))
      .collect()
    kept2.foreach(r => assert(r.getBoolean(1) == (r.getDouble(0) == 1.0)))
  }

  test("empty text never keeps; score of empty is bias only") {
    val w = Seq.fill(8)(5L)
    val r = Seq("").toDF("text").select(
      Text.classifierScoreMicro(col("text"), w, bias = 7L),
      Text.classifierKeep(col("text"), w, 7L, 0L)).collect()(0)
    assert(r.getLong(0) == 7L && !r.getBoolean(1))
  }
}
