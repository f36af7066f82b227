package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqSpec extends SparkSpec {

  private def emb(rows: (Long, Seq[Float])*) = {
    val sp = spark; import sp.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("codebook recovers exact subvectors when each subspace has ≤k " +
      "distinct values, making ADC cosine exact") {
    // dim 4, m 2: subspace values drawn from {(1,0),(0,1)} and {(2,2),(4,0)}
    // — k=2 Lloyd's converges to exactly these points, reconstruction is
    // lossless, so ADC == exact cosine
    val subsA = Seq(Seq(1f, 0f), Seq(0f, 1f))
    val subsB = Seq(Seq(2f, 2f), Seq(4f, 0f))
    val rows = (for { a <- subsA; b <- subsB } yield a ++ b)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = emb(rows: _*)
    val cb = Similarity.pqTrain(df, "vec_id", "embedding", dim = 4, m = 2,
      k = 2, iters = 4)
    val enc = Similarity.pqEncode(df, "embedding", cb)
    val q = rows.head._2
    val adc = Similarity.pqTopKAdc(enc, "vec_id", q, cb, 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = Similarity.cosineToQuery(df, "vec_id", "embedding", q)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    adc.foreach { case (id, s) =>
      assert(math.abs(s - exact(id)) < 1e-5, s"id=$id adc=$s exact=${exact(id)}")
    }
  }

  test("codes are m integers in [0, k) and scores are partitioning-independent") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 40L).map(i => (i, Seq.fill(8)(rnd.nextFloat())))
    val df = emb(rows: _*)
    val cb = Similarity.pqTrain(df, "vec_id", "embedding", 8, m = 4, k = 4,
      iters = 2)
    val enc = Similarity.pqEncode(df, "embedding", cb)
    val codes = enc.select("pq_code").head().getSeq[Int](0)
    assert(codes.length == 4 && codes.forall(c => c >= 0 && c < 4))
    val q = rows.head._2
    val a = Similarity.pqTopKAdc(enc.repartition(1), "vec_id", q, cb, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = Similarity.pqTopKAdc(enc.repartition(7), "vec_id", q, cb, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b, "ADC ranking must not depend on partitioning")
  }

  test("ADC ranking recalls most of the exact top-k on clustered data") {
    val rnd = new scala.util.Random(3)
    // 4 well-separated cluster centers; points jitter around them
    val centers = Seq.fill(4)(Seq.fill(16)(rnd.nextFloat() * 4f))
    val rows = (0L until 80L).map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(x => x + rnd.nextFloat() * 0.1f))
    }
    val df = emb(rows: _*)
    val cb = Similarity.pqTrain(df, "vec_id", "embedding", 16, m = 4, k = 8,
      iters = 3)
    val enc = Similarity.pqEncode(df, "embedding", cb)
    val q = rows.head._2
    val adcTop = Similarity.pqTopKAdc(enc, "vec_id", q, cb, 20)
      .collect().map(_.getLong(0)).toSet
    val exactTop = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, 20)
      .collect().map(_.getLong(0)).toSet
    assert((adcTop & exactTop).size >= 15,
      s"recall@20 too low: ${(adcTop & exactTop).size}")
  }
}
