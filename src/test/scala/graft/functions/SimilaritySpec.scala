package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  test("dot and l2Norm compute known values") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val r = df.select(Similarity.dot(col("a"), col("b")), Similarity.l2Norm(col("a"))).head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-12)
  }

  test("cosine: parallel=1, orthogonal=0, antiparallel=-1, zero-safe") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(2.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 3.0f)),
      (Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f)),
      (Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
    val out = df.select(Similarity.cosine(col("a"), col("b"))).as[Double].collect()
    assert(out(0) == 1.0 && out(1) == 0.0 && out(2) == -1.0 && out(3) == 0.0)
  }

  test("bruteForceTopK returns the k nearest by cosine with id tiebreak") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)),
      (4L, Seq(-1.0f, 0.0f))).toDF("id", "vec")
    val out = Similarity.bruteForceTopK(df, "id", "vec", Seq(1.0f, 0.0f), 2)
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L))
  }

  test("annTopK finds the query's bucket-mates (query vector from data)") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.99f, 0.01f, 0.0f, 0.0f)),
      (3L, Seq(-1.0f, 0.0f, 0.0f, 0.0f))).toDF("id", "vec")
    val out = Similarity.annTopK(df, "id", "vec", Seq(1.0f, 0.0f, 0.0f, 0.0f), 5, 4)
      .select("id").as[Long].collect().toSet
    assert(out.contains(1L)) // its own bucket always contains the query twin
    assert(!out.contains(3L) || out.contains(2L))
  }

  test("embeddingNearDupPairs finds duplicated vectors via bucket join") {
    val df = Seq(
      (1L, Seq(0.5f, 0.5f, 0.1f, 0.9f)),
      (2L, Seq(0.5f, 0.5f, 0.1f, 0.9f)),
      (3L, Seq(-0.5f, 0.4f, -0.9f, 0.2f))).toDF("id", "vec")
    val out = Similarity.embeddingNearDupPairs(df, "id", "vec", 4, 0.999, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L)))
  }

  test("ivfTopK with nProbe == nCentroids matches brute force exactly") {
    val sp2 = spark; import sp2.implicits._
    val vecs = (0 until 200).map { i =>
      (i.toLong, (0 until 8).map(d => math.sin(i * 0.37 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val query = (0 until 8).map(d => math.cos(d * 0.5).toFloat)
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", query, 5)
      .collect().map(_.toSeq).toSeq
    val ivf = Similarity.ivfTopK(vecs, "vec_id", "embedding", query, 5,
      nCentroids = 8, nProbe = 8).collect().map(_.toSeq).toSeq
    assert(ivf == exact)
  }

  test("ivfTopK with few probes returns a subset ranked identically") {
    val sp2 = spark; import sp2.implicits._
    val vecs = (0 until 200).map { i =>
      (i.toLong, (0 until 8).map(d => math.sin(i * 0.37 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val query = (0 until 8).map(d => math.cos(d * 0.5).toFloat)
    val ivf = Similarity.ivfTopK(vecs, "vec_id", "embedding", query, 5,
      nCentroids = 8, nProbe = 2).collect()
    assert(ivf.length <= 5 && ivf.nonEmpty)
    // scores descend
    val scores = ivf.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("annTopK multi-probe widens recall over the single bucket") {
    val sp2 = spark; import sp2.implicits._
    val vecs = (0 until 300).map { i =>
      (i.toLong, (0 until 8).map(d => math.sin(i * 0.91 + d * 1.3).toFloat))
    }.toDF("vec_id", "embedding")
    val query = (0 until 8).map(d => math.sin(d * 1.1).toFloat)
    val r0 = Similarity.annTopK(vecs, "vec_id", "embedding", query, 10,
      nBits = 6, hammingRadius = 0).count()
    val r1 = Similarity.annTopK(vecs, "vec_id", "embedding", query, 10,
      nBits = 6, hammingRadius = 1).count()
    val rAll = Similarity.annTopK(vecs, "vec_id", "embedding", query, 10,
      nBits = 6, hammingRadius = 6)
    assert(r0 <= r1)
    // full-radius probing degenerates to exact brute force
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", query, 10)
    assert(rAll.collect().map(_.toSeq).toSeq == exact.collect().map(_.toSeq).toSeq)
  }

  test("ivfpqTopKAdc with one zero coarse centroid equals plain PQ-ADC") {
    val sp2 = spark; import sp2.implicits._
    val vecs = (0 until 120).map { i =>
      (i.toLong, (0 until 8).map(d => math.sin(i * 0.37 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val query = (0 until 8).map(d => math.cos(d * 0.5).toFloat)
    val codebook: Seq[Seq[Seq[Float]]] =
      Seq.fill(2)(Seq(-0.5f, -0.25f, 0.25f, 0.5f).map(v => Seq.fill(4)(v)))
    // one all-zero coarse centroid: residual = vector, one list, probe all
    val zero = Seq(Seq.fill(8)(0f))
    val composed = Similarity.ivfpqTopKAdc(vecs, "vec_id", "embedding",
      query, 10, zero, codebook, nProbe = 1).collect().map(_.toSeq).toSeq
    val plain = Similarity.pqTopKAdc(
      Similarity.pqEncode(vecs, "embedding", codebook), "vec_id", query,
      codebook, 10).collect().map(_.toSeq).toSeq
    assert(composed == plain)
  }

  test("ivfpqTopKAdc prunes to the probed lists and centers residuals") {
    val sp2 = spark; import sp2.implicits._
    // two well-separated clusters around +10 and -10 in dim 0
    val vecs = ((0 until 50).map(i =>
        (i.toLong, Seq(10f + (i % 7) * 0.1f, (i % 5) * 0.1f, 0f, 0f))) ++
      (50 until 100).map(i =>
        (i.toLong, Seq(-10f - (i % 7) * 0.1f, (i % 5) * 0.1f, 0f, 0f))))
      .toDF("vec_id", "embedding")
    val coarse = Seq(Seq(10f, 0f, 0f, 0f), Seq(-10f, 0f, 0f, 0f))
    val codebook: Seq[Seq[Seq[Float]]] =
      Seq.fill(2)(Seq(-0.5f, -0.25f, 0.25f, 0.5f).map(v => Seq.fill(2)(v)))
    val out = Similarity.ivfpqTopKAdc(vecs, "vec_id", "embedding",
      Seq(10f, 0f, 0f, 0f), 100, coarse, codebook, nProbe = 1).collect()
    // only the +10 cluster's list was scanned
    assert(out.nonEmpty && out.forall(_.getLong(0) < 50))
    // residual-PQ reconstructions score near 1 against the list centroid
    assert(out.forall(_.getDouble(1) > 0.9))
  }

  test("ivfpqTopKAdc scores are partitioning-independent") {
    val sp2 = spark; import sp2.implicits._
    val vecs = (0 until 150).map { i =>
      (i.toLong, (0 until 8).map(d => math.sin(i * 0.53 + d * 0.7).toFloat))
    }.toDF("vec_id", "embedding")
    val query = (0 until 8).map(d => math.sin(d * 1.1).toFloat)
    val coarse = Seq(
      Seq.fill(4)(1f) ++ Seq.fill(4)(0f), Seq.fill(4)(0f) ++ Seq.fill(4)(1f),
      Seq.fill(4)(-1f) ++ Seq.fill(4)(0f), Seq.fill(4)(0f) ++ Seq.fill(4)(-1f))
    val codebook: Seq[Seq[Seq[Float]]] =
      Seq.fill(2)(Seq(-0.5f, -0.25f, 0.25f, 0.5f).map(v => Seq.fill(4)(v)))
    def run(parts: Int) = Similarity.ivfpqTopKAdc(vecs.repartition(parts),
      "vec_id", "embedding", query, 20, coarse, codebook, nProbe = 2)
      .collect().map(_.toSeq).toSeq
    assert(run(1) == run(13))
  }

  test("ivfWriteAssigned → ivfTopKAssigned: partition-pruned probes, exhaustive == brute force") {
    val sp2 = spark; import sp2.implicits._
    val vecs = (0 until 300).map { i =>
      (i.toLong, (0 until 8).map(d => math.sin(i * 0.53 + d * 0.77).toFloat))
    }.toDF("vec_id", "embedding")
    val query = (0 until 8).map(d => math.cos(d * 0.9).toFloat)
    val path = java.nio.file.Files.createTempDirectory("ivf_store").toString + "/ivf"
    val cents = Similarity.ivfWriteAssigned(vecs, "vec_id", "embedding", path,
      nCentroids = 8)
    assert(Similarity.ivfReadCentroids(spark, path) == cents.map(_.map(_.toFloat)))
    // exhaustive probes over the WRITTEN layout match brute force exactly
    val all = Similarity.ivfTopKAssigned(spark, path, "vec_id", "embedding",
      query, 5, nProbe = 8)
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", query, 5)
    assert(all.collect().map(_.toSeq).toSeq == exact.collect().map(_.toSeq).toSeq)
    // restricted probes read ONLY the probed lists' partitions: the bucket
    // filter must appear as a PartitionFilter on the parquet scan, and the
    // scan must touch fewer files than the full layout holds
    val probed = Similarity.ivfTopKAssigned(spark, path, "vec_id", "embedding",
      query, 5, nProbe = 2)
    val plan = probed.queryExecution.executedPlan.toString
    // the bucket predicate must appear in PartitionFilters (dir pruning),
    // NOT as a post-scan data filter (inputFiles can't show this — it
    // reports the unpruned listing)
    assert(plan.contains("PartitionFilters: [__ivf_bucket"),
      s"expected the bucket isin as a partition filter in:\n$plan")
    // and the probed lists hold strictly fewer rows than the corpus
    assert(probed.count() <= 5 &&
      spark.read.parquet(path).filter(col("__ivf_bucket").isin(
        Similarity.ivfProbes(query, cents, 2): _*)).count() < 300)
  }

  test("srpWriteBucketed → annTopKBucketed: partition-pruned, full radius == brute force") {
    val sp2 = spark; import sp2.implicits._
    val vecs = (0 until 300).map { i =>
      (i.toLong, (0 until 8).map(d => math.sin(i * 0.67 + d * 1.19).toFloat))
    }.toDF("vec_id", "embedding")
    val query = (0 until 8).map(d => math.cos(d * 0.7).toFloat)
    val path = java.nio.file.Files.createTempDirectory("srp_store").toString + "/srp"
    Similarity.srpWriteBucketed(vecs, "vec_id", "embedding", path, dim = 8, nBits = 5)
    val all = Similarity.annTopKBucketed(spark, path, "vec_id", "embedding",
      query, 10, hammingRadius = 5)
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", query, 10)
    assert(all.collect().map(_.toSeq).toSeq == exact.collect().map(_.toSeq).toSeq)
    val probed = Similarity.annTopKBucketed(spark, path, "vec_id", "embedding",
      query, 10, hammingRadius = 1)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [__bucket"),
      s"expected the probe isin as a partition filter in:\n$plan")
    // dim mismatch fails loudly
    assertThrows[IllegalArgumentException] {
      Similarity.annTopKBucketed(spark, path, "vec_id", "embedding",
        Seq(1.0f, 2.0f), 10)
    }
  }
}
