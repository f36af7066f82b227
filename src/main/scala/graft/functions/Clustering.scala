package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means over embedding columns and the SemDeDup-style
  * semantic dedup built on it (Abbas et al. 2023: cluster the corpus, then
  * drop near-identical members WITHIN each cluster — the cross-cluster
  * pair explosion never happens).
  *
  * Determinism design: Lloyd's over floats is not reproducible across
  * partitionings (double addition is not associative), so vectors are
  * first QUANTIZED to exact small integers (`round(x·scale)` — exactly
  * representable in float up to 2²⁴). Centroid updates then reduce LONG
  * sums (order-independent by construction), seeding takes the k
  * lowest-id vectors, and argmin ties break on centroid index — the same
  * model comes out of 1 partition or 1000.
  *
  * Scale shape per iteration: one scan computing assignments (centroids
  * ride as literals through the codegen'd [[VectorDot]] — no join), one
  * map-side-combined `(cluster, dim)` aggregation of k·d longs. Only k·d
  * values ever reach the driver.
  */
object Clustering {

  /** Exact-integer quantization: `round(x·scale)` as float (integers up to
    * 2²⁴ are exact; embedding components at |x|≤100 with the default scale
    * stay far below that). */
  def quantized(vec: Column, scale: Double = 10000.0): Column =
    transform(vec, x => round(x * scale).cast("float"))

  /** Per-label mean embedding — class prototypes (nearest-class-mean
    * classification, dataset cartography, per-source embedding drift).
    * Sums run over the QUANTIZED vectors as exact longs, so the result is
    * deterministic under any partitioning and engine (float sums are
    * order-sensitive; quantized long sums are not — the same trick that
    * makes [[kmeansCentroids]] reproducible). Output is flat:
    * (labelCol, pos, n, sum_q, mean) with mean = sum_q/n/scale — exact
    * integer inputs into two IEEE divisions, bit-identical anywhere.
    * One map-side-combined shuffle bounded by |labels|·d groups. */
  def labelCentroids(df: DataFrame, labelCol: String, vecCol: String,
      scale: Double = 10000.0): DataFrame =
    df.select(col(labelCol),
        posexplode(quantized(col(vecCol), scale)).as(Seq("pos", "__q")))
      .groupBy(col(labelCol), col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("__q").cast("long")).as("sum_q"))
      .withColumn("mean", col("sum_q").cast("double") / col("n") / lit(scale))

  /** Nearest-centroid index by squared L2 distance: argmin(|c|² − 2·q·c)
    * (the row-constant |q|² cancels); ties break on the LOWER index. The
    * native [[graft.expressions.NearestCentroid]] expression keeps the
    * generated code CONSTANT-size in k (the centroid matrix rides one
    * reference object, the argmin is a tight JVM loop) — the composed
    * `array_min(array(struct…))` form grows a k-wide tree that falls out
    * of codegen at SemDeDup's production k (k ∝ corpus). */
  def assignToCentroids(qv: Column, centroids: Seq[Seq[Float]]): Column = {
    require(centroids.nonEmpty, "assignToCentroids needs at least one centroid")
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.NearestCentroid(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(qv),
        graft.expressions.NearestCentroid.model(centroids)))
  }

  /** Lloyd's iterations over the quantized vectors; returns the final
    * centroids (in QUANTIZED units). Seeds are the min(k, n) lowest-id
    * vectors — fewer than k points yield fewer than k centroids; a cluster
    * that empties keeps its centroid. */
  def kmeansCentroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      scale: Double = 10000.0): Seq[Seq[Float]] = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0; got k=$k iters=$iters")
    // cache the quantized corpus: every Lloyd's iteration re-reads it, and
    // without the cache each of the `iters` actions re-runs the scan +
    // quantization from the source (MEMORY_AND_DISK spills rather than
    // recomputes when the corpus outgrows executor memory)
    val qdf = df.select(col(idCol).as("__id"), quantized(col(vecCol), scale).as("__qv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var centroids: Seq[Seq[Float]] = qdf.orderBy("__id").limit(k)
        .collect().map(_.getSeq[Float](1).toSeq).toSeq
      require(centroids.nonEmpty, "kmeansCentroids: empty input")
      for (_ <- 0 until iters) {
        val sums = qdf
          .select(assignToCentroids(col("__qv"), centroids).as("__c"),
            posexplode(col("__qv")).as(Seq("__pos", "__v")))
          .groupBy("__c", "__pos")
          .agg(sum(col("__v").cast("long")).as("__s"), count(lit(1)).as("__n"))
          .collect()
        val byCluster = sums.groupBy(_.getAs[Int]("__c"))
        centroids = centroids.zipWithIndex.map { case (old, ci) =>
          byCluster.get(ci).fold(old) { rows =>
            val arr = old.toArray.clone()
            rows.foreach { r =>
              arr(r.getAs[Int]("__pos")) =
                (r.getAs[Long]("__s").toDouble / r.getAs[Long]("__n")).toFloat
            }
            arr.toSeq
          }
        }
      }
      centroids
    } finally qdf.unpersist(blocking = false)
  }

  /** Attach a `cluster` column: nearest final centroid per row. */
  def kmeansAssign(
      df: DataFrame,
      vecCol: String,
      centroids: Seq[Seq[Float]],
      scale: Double = 10000.0): DataFrame =
    df.withColumn("cluster",
      assignToCentroids(quantized(col(vecCol), scale), centroids))

  /** SemDeDup's own k policy — k ∝ corpus size (Abbas et al. 2023 scale
    * k with n; a FIXED k makes per-cluster populations, and with them the
    * Σ n_c²/2 pair work, grow linearly with the corpus — quadratic total
    * work at 100×). `target` bounds the EXPECTED cluster population;
    * `kMin` keeps tiny corpora from degenerating to one cluster. Callers
    * pass `df.count()` (one cheap count job at planning). */
  def scaledK(n: Long, target: Int = 500, kMin: Int = 8): Int = {
    require(target > 0 && kMin > 0, s"need target/kMin > 0, got $target/$kMin")
    math.max(kMin.toLong, (n + target - 1) / target).min(Int.MaxValue).toInt
  }

  /** SemDeDup: k-means cluster, then inside each cluster drop every row
    * whose exact cosine to a LOWER-id member is ≥ `tau`. Returns the kept
    * rows of `df` unchanged.
    *
    * The pair join is keyed on the cluster id, so pair work is
    * Σ n_c² / 2 — at corpus scale pick k = [[scaledK]](n) ≈ n / (a few
    * hundred) to bound cluster sizes (the SemDeDup recipe), never k « n.
    * Verification uses the RAW float vectors (quantization only steers
    * clustering). Assignment cost is O(n·k·d) with literal centroids —
    * fine to k in the low thousands; beyond that use
    * [[semanticDedupSharded]], which bounds k per shard (SemDeDup's own
    * recipe at web scale). */
  def semanticDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 4,
      tau: Double = 0.95,
      scale: Double = 10000.0): DataFrame = {
    val cents = kmeansCentroids(df, idCol, vecCol, k, iters, scale)
    // norms are computed ONCE per row before the pair join — cosine's two
    // norm factors would otherwise be recomputed per PAIR (quadratic in
    // cluster size, 3× the VectorDot work)
    // quantize into a COLUMN first: assignToCentroids references its
    // input k times (one VectorDot per centroid) and `transform` is a
    // CodegenFallback higher-order function — inlining the quantization
    // expression re-evaluates it per centroid, k× per row
    val assigned = df
      .select(col(idCol).as("__id"), col(vecCol).as("__v"),
        quantized(col(vecCol), scale).as("__qv"))
      .withColumn("__c", assignToCentroids(col("__qv"), cents))
      .drop("__qv")
      .withColumn("__n", Similarity.l2Norm(col("__v")))
    val a = assigned.select(col("__c"), col("__id").as("__ida"),
      col("__v").as("__va"), col("__n").as("__na"))
    val b = assigned.select(col("__c"), col("__id").as("__idb"),
      col("__v").as("__vb"), col("__n").as("__nb"))
    val denom = col("__na") * col("__nb")
    val cos = when(denom > 0, Similarity.dot(col("__va"), col("__vb")) / denom)
      .otherwise(lit(0.0))
    val dropped = a.join(b, Seq("__c"))
      .filter(col("__ida") < col("__idb") && cos >= tau)
      .select(col("__idb").as("__drop")).distinct()
    df.join(dropped, col(idCol) === col("__drop"), "left_anti")
  }

  /** Shard count so the EXPECTED shard population is ≤ `shardTarget`. */
  private[functions] def shardsFor(n: Long, shardTarget: Int): Int = {
    require(shardTarget > 0, s"need shardTarget > 0, got $shardTarget")
    ((n + shardTarget - 1) / shardTarget).min(Int.MaxValue).toInt
  }

  /** Sharded SemDeDup — the web-scale form [[semanticDedup]]'s own doc
    * names. The unsharded registration's assignment stage is O(n·k·d)
    * with k = [[scaledK]](n) ∝ n, i.e. quadratic in the corpus; here the
    * corpus is CONTENT-hash-sharded into `n / shardTarget` shards and
    * each shard runs the full cluster+dedup locally with
    * k = scaledK(shard n) — a CONSTANT (scaledK(shardTarget), = 8 at the
    * defaults) independent of corpus size, so total work is O(n·d), flat
    * at any scale.
    *
    * Approximation contract: the shard key is `xxhash64` of the QUANTIZED
    * vector, so exact (quantization-identical) duplicates ALWAYS co-shard
    * and are always caught at any shard count; near-duplicates are caught
    * within their shard only — the same boundary-miss class SemDeDup
    * already accepts between k-means clusters (Abbas et al. 2023 run
    * independent per-cluster dedups for exactly this cost reason).
    *
    * Execution shape: ONE shuffle (hash partition by shard), then
    * `flatMapGroups` runs the deterministic local Lloyd's + pair scan
    * per shard — no driver-side loop, no per-shard `collect()`, so shard
    * COUNT is unbounded (at 100 TB it's millions of shards; a
    * driver-seeded per-shard [[kmeansCentroids]] would be a driver loop).
    * Per-group state is O(shardTarget·d) floats — bounded by construction.
    * `flatMapGroups` (not a join/expression) is justified here: Lloyd's
    * iterations over a bounded group are genuine per-group imperative
    * logic with no declarative equivalent that avoids the driver.
    *
    * Corpora of ≤ `shardTarget` rows delegate to [[semanticDedup]]
    * unchanged (single shard ≡ the unsharded algorithm, and the small-SF
    * oracle gates stay on the codegen'd distributed path).
    *
    * `idCol` must be castable to long (the typed group-by needs an
    * encoder); rows with a null vector are never dropped. */
  def semanticDedupSharded(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      shardTarget: Int = 2048,
      target: Int = 500,
      iters: Int = 3,
      tau: Double = 0.95,
      scale: Double = 10000.0,
      maxShardFactor: Int = 32): DataFrame = {
    val n = df.count()
    if (n <= shardTarget)
      return semanticDedup(df, idCol, vecCol, scaledK(n, target), iters, tau, scale)
    val nShards = shardsFor(n, shardTarget)
    val sp = df.sparkSession
    import sp.implicits._
    val proj = df
      .filter(col(vecCol).isNotNull)
      .select(
        pmod(xxhash64(quantized(col(vecCol), scale)), lit(nShards.toLong)).cast("int")
          .as("__shard"),
        col(idCol).cast("long").as("__id"),
        col(vecCol).cast("array<float>").as("__v"))
      .as[(Int, Long, Array[Float])]
    // skew guard: content-hash sharding co-shards exact (quantization-
    // identical) twins BY DESIGN, so a pathologically duplicated corpus
    // (10^6 copies of one page) piles one shard far past the EXPECTED
    // population of shardTarget. That pileup would materialize as one
    // task's in-memory array — an OOM, not a wrong answer — so it
    // refuses BY NAME at `maxShardFactor` times the expected size,
    // checked INCREMENTALLY while draining the group (before the heap
    // is committed, and with zero extra Spark jobs).
    val bound = shardTarget.toLong * maxShardFactor
    val dropped = proj
      .groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
        it.foreach { case (_, id, v) =>
          if (buf.length >= bound) throw new IllegalArgumentException(
            s"semantic dedup shard $shard exceeds $bound rows " +
              s"(shardTarget=$shardTarget x maxShardFactor=$maxShardFactor; " +
              "expected population is shardTarget): content-hash sharding " +
              "co-shards exact duplicates by design, so a pileup this size " +
              "means the corpus needs exactDedup FIRST — SemDeDup's own " +
              "precondition (Abbas et al. 2023) — or a larger maxShardFactor")
          buf += ((id, v))
        }
        val rows = buf.toArray.sortBy(_._1)
        localDedupDropped(rows, target, iters, tau, scale).iterator
      }
      .toDF("__drop")
    df.join(dropped, col(idCol).cast("long") === col("__drop"), "left_anti")
  }

  /** In-memory mirror of [[semanticDedup]] for one id-sorted shard:
    * quantize → seed k = [[scaledK]](n) lowest-id vectors → `iters`
    * Lloyd's rounds (argmin |c|²−2·q·c, double accumulation left-to-right,
    * strict `<` so ties break LOW — [[graft.expressions.NearestCentroid]]'s
    * exact convention; centroid update = exact long sums / count) →
    * within-cluster pair scan on the RAW vectors dropping every member
    * whose cosine to a lower-id member is ≥ tau. Returns dropped ids. */
  private[functions] def localDedupDropped(
      rows: Array[(Long, Array[Float])],
      target: Int,
      iters: Int,
      tau: Double,
      scale: Double): Seq[Long] = {
    val nRows = rows.length
    if (nRows < 2) return Nil
    val d = rows(0)._2.length
    val k = scaledK(nRows.toLong, target).min(nRows)
    // Spark's round() is BigDecimal HALF_UP (away from zero at .5), not
    // JVM math.round (floor(x+0.5)) — mirror it exactly so a shard of
    // the whole corpus reproduces the distributed assignment
    val q = rows.map(_._2.map(x =>
      java.math.BigDecimal.valueOf(x * scale)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toFloat))
    // seeds: k lowest ids (rows arrive id-sorted); a length-mismatched
    // vector can't seed (the distributed model requires a rectangular
    // centroid matrix) — fall back to a zero centroid for that slot
    var cents = Array.tabulate(k)(i =>
      if (q(i).length == d) q(i).clone() else new Array[Float](d))
    val assign = new Array[Int](nRows)
    def assignAll(): Unit = {
      val c2 = cents.map { c =>
        var acc = 0.0; var j = 0
        while (j < d) { acc += c(j).toDouble * c(j).toDouble; j += 1 }
        acc
      }
      var i = 0
      while (i < nRows) {
        if (q(i).length != d) assign(i) = 0 // NearestCentroid's mismatch rule
        else {
          var best = Double.PositiveInfinity; var bi = 0; var ci = 0
          while (ci < k) {
            var dp = 0.0; var j = 0
            while (j < d) { dp += q(i)(j).toDouble * cents(ci)(j).toDouble; j += 1 }
            val s = c2(ci) - 2.0 * dp
            if (s < best) { best = s; bi = ci }
            ci += 1
          }
          assign(i) = bi
        }
        i += 1
      }
    }
    for (_ <- 0 until iters) {
      assignAll()
      val sums = Array.ofDim[Long](k, d)
      val cnt = new Array[Long](k)
      var i = 0
      while (i < nRows) {
        if (q(i).length == d) {
          val c = assign(i); cnt(c) += 1
          var j = 0
          while (j < d) { sums(c)(j) += q(i)(j).toLong; j += 1 }
        }
        i += 1
      }
      cents = Array.tabulate(k) { ci =>
        if (cnt(ci) == 0) cents(ci)
        else Array.tabulate(d)(j => (sums(ci)(j).toDouble / cnt(ci)).toFloat)
      }
    }
    assignAll()
    val norms = rows.map { case (_, v) =>
      var acc = 0.0; var j = 0
      while (j < v.length) { acc += v(j).toDouble * v(j).toDouble; j += 1 }
      math.sqrt(acc)
    }
    val dropped = Array.newBuilder[Long]
    (0 until nRows).groupBy(assign).valuesIterator.foreach { members =>
      val m = members.toArray // ascending row index = ascending id
      var bi = 1
      while (bi < m.length) {
        val b = m(bi)
        var ai = 0
        var hit = false
        while (ai < bi && !hit) {
          val a = m(ai)
          val denom = norms(a) * norms(b)
          if (denom > 0 && rows(a)._2.length == rows(b)._2.length) {
            val len = rows(a)._2.length
            var dp = 0.0; var j = 0
            while (j < len) { dp += rows(a)._2(j).toDouble * rows(b)._2(j).toDouble; j += 1 }
            if (dp / denom >= tau) hit = true
          }
          ai += 1
        }
        if (hit) dropped += rows(b)._1
        bi += 1
      }
    }
    dropped.result().toSeq
  }
}
