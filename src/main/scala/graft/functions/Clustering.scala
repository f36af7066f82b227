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
    * fine to k in the low thousands; beyond that shard the corpus and
    * dedup per shard (SemDeDup's own recipe at web scale). */
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
}
