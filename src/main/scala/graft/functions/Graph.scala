package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative graph analytics over event-derived interaction graphs — the
  * link-quality machinery large-scale corpus curation uses for source
  * ranking (Common-Crawl-style centrality scoring of domains feeding
  * quality filters; cf. the harmonic-centrality/PageRank features of the
  * RefinedWeb/FineWeb pipelines).
  *
  * Everything here is EXACT integer arithmetic in micro-units: rank mass
  * is a BIGINT, per-edge contributions use floor division, and sums of
  * longs are order-independent — so results are bit-identical across
  * engines and partitionings, with no rounding belt. The iteration shape
  * follows [[Dedup.connectedComponents]]: the edge table is materialized
  * and partitioned ONCE and only the (|nodes|-sized) rank frame moves
  * between rounds, with `localCheckpoint` truncating lineage so plans
  * don't grow with the iteration count.
  */
object Graph {

  /** Directed transition edges from per-entity ordered event streams:
    * within each entity's (orderCols)-sorted sequence, each event links
    * its node to the next event's node. Self-loops drop; edges
    * deduplicate with an occurrence count (`weight`).
    *
    * One shuffle on the entity key feeds the lead window; the dedup
    * aggregate shuffles (src, dst) keys only — two bounded exchanges, no
    * self-join. */
  def transitionEdges(
      events: DataFrame,
      entityCol: String,
      orderCols: Seq[String],
      nodeCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(orderCols.map(col): _*)
    events
      .select(col(entityCol), col(nodeCol).cast("long").as("src"),
        lead(col(nodeCol).cast("long"), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull && col("dst") =!= col("src"))
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("weight"))
  }

  /** PageRank in exact micro-unit integer arithmetic.
    *
    * Semantics (fixed, engine-replayable):
    *   - every node starts with `scale` micro-units of rank;
    *   - each round, a node with out-degree g > 0 sends
    *     `rank div g` (floor) along each out-edge — residual mass and
    *     dangling-node mass are retired, the standard lossy
    *     simplification;
    *   - new rank = `((1000 - dampingPermille) * scale) div 1000
    *                 + (dampingPermille * inflow) div 1000`.
    * All operations are BIGINT adds / floor divides: partition order can
    * never perturb a result, and any engine replays it bit-identically.
    * Overflow bound: `dampingPermille * inflow` stays below 2⁶³ while
    * `scale × |nodes| < 9·10¹⁵` (at the 10⁶ default: ~10⁹ nodes — and the
    * bound is pathological, requiring ALL mass on one node).
    *
    * Scale shape: `edges` is deduplicated, 16-byte-keyed, repartitioned by
    * `src` and cached ONCE — each round reuses that layout for the
    * rank-by-src join, so the only recurring movement is the rank frame
    * (|nodes| rows, ≪ |edges|) plus the groupBy(dst) aggregate, which is
    * map-side combined. Out-degrees ride INSIDE the rank frame (computed
    * once), not as a per-round join.
    *
    * Returns (node, rank) with rank in micro-units. */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 3,
      dampingPermille: Int = 850,
      scale: Long = 1000000L): DataFrame = {
    require(iters >= 0 && iters <= 100, s"iters $iters out of [0,100]")
    require(dampingPermille >= 0 && dampingPermille <= 1000,
      s"dampingPermille $dampingPermille out of [0,1000]")
    val spark = edges.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .repartition(nPart, col("src"))
      .localCheckpoint(true)

    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outDeg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))

    val base = (1000L - dampingPermille) * scale / 1000L
    // rank frame carries the static out-degree so rounds never re-join it
    var ranks = nodes.join(outDeg, Seq("node"), "left")
      .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg"),
        lit(scale).as("rank"))
      .localCheckpoint(true)

    for (_ <- 0 until iters) {
      val inflow = ranks
        .filter(col("deg") > 0)
        .select(col("node").as("src"), expr("rank div deg").as("contrib"))
        .join(e, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("contrib")).as("inflow"))
      ranks = ranks
        .join(inflow, Seq("node"), "left")
        .select(col("node"), col("deg"),
          (lit(base) +
            expr(s"($dampingPermille * coalesce(inflow, 0L)) div 1000"))
            .as("rank"))
        .localCheckpoint(true)
    }
    ranks.select("node", "rank")
  }

  /** Personalized PageRank: identical arithmetic, but the teleport mass
    * `base` lands ONLY on the seed nodes (split evenly, floor) — the
    * similarity-to-seeds ranking used for topic-conditioned source
    * selection. Seeds absent from the graph are ignored. */
  def personalizedPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: Seq[Long],
      iters: Int = 3,
      dampingPermille: Int = 850,
      scale: Long = 1000000L): DataFrame = {
    require(seeds.nonEmpty, "personalizedPageRank needs at least one seed")
    val spark = edges.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .repartition(nPart, col("src"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outDeg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))

    val present = nodes.filter(col("node").isInCollection(seeds))
      .count().toInt
    require(present > 0, "no seed node exists in the graph")
    val baseTotal = (1000L - dampingPermille) * scale * seeds.length / 1000L
    val seedBase = baseTotal / present
    val isSeed = col("node").isInCollection(seeds)

    var ranks = nodes.join(outDeg, Seq("node"), "left")
      .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg"),
        when(isSeed, lit(scale)).otherwise(lit(0L)).as("rank"))
      .localCheckpoint(true)
    for (_ <- 0 until iters) {
      val inflow = ranks
        .filter(col("deg") > 0 && col("rank") > 0)
        .select(col("node").as("src"), expr("rank div deg").as("contrib"))
        .join(e, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("contrib")).as("inflow"))
      ranks = ranks
        .join(inflow, Seq("node"), "left")
        .select(col("node"), col("deg"),
          (when(isSeed, lit(seedBase)).otherwise(lit(0L)) +
            expr(s"($dampingPermille * coalesce(inflow, 0L)) div 1000"))
            .as("rank"))
        .localCheckpoint(true)
    }
    ranks.select("node", "rank")
  }
}
