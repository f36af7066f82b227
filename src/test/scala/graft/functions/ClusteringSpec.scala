package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  /** Three well-separated 4-d blobs, 20 points each, deterministic jitter. */
  private def blobs = {
    val centers = Seq(
      Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f), Array(0f, 0f, 10f, 0f))
    // jitter residues mod 23 (coprime to the 60-point range) guarantee no
    // two distinct points are identical or near-parallel: every dimension
    // differs by ≥ 0.3, so natural cosine stays ≤ ~0.9987 — taus below pick
    // the gap between that and the exact-twin cosine of 1
    (0 until 60).map { i =>
      val c = centers(i % 3)
      val jit = Array.tabulate(4)(d => ((i * 13 + d * 7) % 23 - 11) * 0.3f)
      (i.toLong, c.zip(jit).map { case (x, j) => x + j }.toSeq)
    }.toDF("id", "vec")
  }

  test("kmeans recovers well-separated blobs") {
    val cents = Clustering.kmeansCentroids(blobs, "id", "vec", k = 3, iters = 5)
    val out = Clustering.kmeansAssign(blobs, "vec", cents)
      .select(col("id"), col("cluster")).as[(Long, Int)].collect()
    // every blob (i % 3) must map to exactly one cluster, and clusters differ
    val mapping = out.groupBy(_._1 % 3).map { case (blob, xs) =>
      blob -> xs.map(_._2).distinct
    }
    assert(mapping.values.forall(_.length == 1), s"split blob: $mapping")
    assert(mapping.values.flatten.toSet.size == 3, s"merged blobs: $mapping")
  }

  test("centroids are deterministic across partitionings") {
    val one = Clustering.kmeansCentroids(blobs.repartition(1), "id", "vec", 3, 4)
    val many = Clustering.kmeansCentroids(blobs.repartition(13), "id", "vec", 3, 4)
    assert(one == many)
  }

  test("k larger than the point count caps at n seed centroids") {
    val tiny = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))).toDF("id", "vec")
    val cents = Clustering.kmeansCentroids(tiny, "id", "vec", k = 5, iters = 3)
    assert(cents.length == 2)
    val assigned = Clustering.kmeansAssign(tiny, "vec", cents)
      .select("cluster").as[Int].collect().toSet
    assert(assigned.size == 2)
  }

  test("semanticDedup drops planted duplicates, keeps distinct docs") {
    val base = blobs
    val doubled = base.unionByName(base.withColumn("id", col("id") + 1000L))
    val kept = Clustering.semanticDedup(doubled, "id", "vec",
        k = 3, iters = 3, tau = 0.9995)
      .select("id").as[Long].collect().toSet
    // exact twins (cosine 1) always share a cluster → every +1000 id drops
    assert(kept == (0L until 60L).toSet)
  }

  test("semanticDedup with tau above all natural similarity keeps everything") {
    val kept = Clustering.semanticDedup(blobs, "id", "vec",
        k = 3, iters = 3, tau = 0.9995)
      .count()
    assert(kept == 60L)
  }

  test("semanticDedupSharded drops planted twins, keeps distinct docs, " +
      "under forced multi-shard execution") {
    val doubled = blobs.unionByName(blobs.withColumn("id", col("id") + 1000L))
    // shardTarget = 16 « n = 120 forces ~8 shards — the web-scale path,
    // not the single-shard delegation
    val kept = Clustering.semanticDedupSharded(doubled, "id", "vec",
        shardTarget = 16, iters = 3, tau = 0.9995)
      .select("id").as[Long].collect().toSet
    assert(kept == (0L until 60L).toSet)
  }

  test("shard-skew guard: a twin pileup past shardTarget x maxShardFactor " +
      "refuses by name (exactDedup-first precondition), normal corpora pass") {
    // 600 copies of ONE vector: content-hash sharding co-shards them all
    val twins = (0 until 600).map(i =>
      (i.toLong, Seq(1f, 2f, 3f, 4f))).toDF("id", "vec")
    val e = intercept[org.apache.spark.SparkException](
      Clustering.semanticDedupSharded(twins, "id", "vec",
        shardTarget = 16, maxShardFactor = 4).count())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("exactDedup FIRST")),
      e.getMessage)
    // the guard does not fire on an ordinary skew-free corpus
    val doubled = blobs.unionByName(blobs.withColumn("id", col("id") + 1000L))
    val kept = Clustering.semanticDedupSharded(doubled, "id", "vec",
        shardTarget = 16, iters = 3, tau = 0.9995, maxShardFactor = 32)
      .select("id").as[Long].collect().toSet
    assert(kept == (0L until 60L).toSet)
  }

  test("semanticDedupSharded at or below shardTarget equals the unsharded form") {
    val doubled = blobs.unionByName(blobs.withColumn("id", col("id") + 1000L))
    val sharded = Clustering.semanticDedupSharded(doubled, "id", "vec",
        shardTarget = 4096, iters = 3, tau = 0.9995)
      .select("id").as[Long].collect().sorted.toSeq
    val plain = Clustering.semanticDedup(doubled, "id", "vec",
        k = Clustering.scaledK(120), iters = 3, tau = 0.9995)
      .select("id").as[Long].collect().sorted.toSeq
    assert(sharded == plain)
  }

  test("sharded per-row assignment cost is bounded by shard-k, not corpus-k") {
    // the scaling pin the registration relies on: expected shard
    // population — and with it k per shard — is CONSTANT as n grows,
    // while the unsharded k = scaledK(n) grows linearly
    val shardTarget = 2048
    for (n <- Seq(10000L, 1000000L, 1000000000L, 1000000000000L)) {
      val shards = Clustering.shardsFor(n, shardTarget)
      val expectedShard = (n + shards - 1) / shards
      assert(expectedShard <= shardTarget, s"n=$n shard=$expectedShard")
      assert(Clustering.scaledK(expectedShard) <= Clustering.scaledK(shardTarget.toLong))
    }
    assert(Clustering.scaledK(2048L) == 8)           // constant shard-k at defaults
    assert(Clustering.scaledK(1000000000000L) == 2000000000) // corpus-k explodes
  }

  test("localDedupDropped mirrors the distributed algorithm on one shard") {
    val doubled = blobs.unionByName(blobs.withColumn("id", col("id") + 1000L))
    val rows = doubled.select(col("id"), col("vec"))
      .as[(Long, Seq[Float])].collect()
      .map { case (id, v) => (id, v.toArray) }.sortBy(_._1)
    val dropped = Clustering.localDedupDropped(rows, target = 20, iters = 3,
      tau = 0.9995, scale = 10000.0).toSet
    assert(dropped == (1000L until 1060L).toSet)
  }

  test("native NearestCentroid is bit-identical to the composed " +
      "array_min(struct(score, idx)) form, ties to the lower index") {
    // the composed reference form the native expression replaced — kept
    // here as the parity oracle (k-wide tree; fine at spec k)
    def composed(qv: org.apache.spark.sql.Column,
        centroids: Seq[Seq[Float]]): org.apache.spark.sql.Column = {
      val scored = centroids.zipWithIndex.map { case (c, i) =>
        val c2 = c.foldLeft(0.0)((a, v) => a + v.toDouble * v.toDouble)
        val cLit = array(c.map(v => lit(v)): _*)
        struct((lit(c2) - lit(2.0) * Similarity.dot(qv, cLit)).as("score"),
          lit(i).as("idx"))
      }
      array_min(array(scored: _*)).getField("idx")
    }
    // 23 deterministic pseudo-random centroids over the blob corpus —
    // includes DUPLICATED centroids (ties must break low) and a far one
    val cents: Seq[Seq[Float]] = (0 until 23).map { ci =>
      if (ci == 7) Seq(0f, 10f, 0f, 0f) // duplicate of a near-blob center
      else Seq.tabulate(4)(d => ((ci * 31 + d * 17) % 29 - 14) * 0.9f)
    } :+ Seq(0f, 10f, 0f, 0f)
    val q = blobs.select(col("id"), Clustering.quantized(col("vec")).as("qv"))
    val both = q.select(col("id"),
        Clustering.assignToCentroids(col("qv"), cents).as("native"),
        composed(col("qv"), cents).as("ref"))
      .as[(Long, Int, Int)].collect()
    assert(both.nonEmpty && both.forall { case (_, n, r) => n == r },
      s"divergent rows: ${both.filter(p => p._2 != p._3).take(5).toSeq}")
  }

  test("labelCentroids: exact quantized means per (label, dim), " +
      "partitioning-independent") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (0, Seq(1.0f, 2.0f)), (0, Seq(3.0f, 4.0f)), (1, Seq(-1.0f, 0.5f))
    ).toDF("label", "vec")
    val out = Clustering.labelCentroids(df, "label", "vec")
      .orderBy("label", "pos")
      .select("label", "pos", "n", "sum_q", "mean")
      .as[(Int, Int, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (0, 0, 2L, 40000L, 2.0), (0, 1, 2L, 60000L, 3.0),
      (1, 0, 1L, -10000L, -1.0), (1, 1, 1L, 5000L, 0.5)))
    // identical under a different partitioning (exact long sums commute)
    val re = Clustering.labelCentroids(df.repartition(7), "label", "vec")
      .orderBy("label", "pos")
      .select("label", "pos", "n", "sum_q", "mean")
      .as[(Int, Int, Long, Long, Double)].collect().toSeq
    assert(re == out)
  }
}
