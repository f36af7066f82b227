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
    // keyed repartition WITHOUT a pinned count (r15): AQE sizes the
    // exchange from the actual bytes (advisoryPartitionSizeInBytes), so
    // the cached edge layout is a handful of blocks on a laptop-sized
    // graph and hundreds of right-sized blocks at web scale — an explicit
    // count disables that coalescing (guide §2.2/§2.5: scale-adaptive
    // partitioning, not a constant tuned for one deployment)
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .repartition(col("src"))
      .localCheckpoint(true)

    val base = (1000L - dampingPermille) * scale / 1000L
    // rank frame carries the static out-degree so rounds never re-join it.
    // ONE aggregate builds it (r15, guide §2.4): each edge contributes an
    // out-vote for its src and a zero-vote for its dst, so sum(vote) per
    // node IS the out-degree and every endpoint appears — identical to the
    // former union-distinct + degree-agg + left-join (3 exchanges) shape.
    var ranks: DataFrame = null
    try {
      ranks = e.select(explode(array(
          struct(col("src").as("node"), lit(1L).as("__c")),
          struct(col("dst").as("node"), lit(0L).as("__c")))).as("__e"))
        .select(col("__e.node").as("node"), col("__e.__c").as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("deg"))
        .select(col("node"), col("deg"), lit(scale).as("rank"))
        .localCheckpoint(true)
      for (_ <- 0 until iters) {
        val inflow = ranks
          .filter(col("deg") > 0)
          .select(col("node").as("src"), expr("rank div deg").as("contrib"))
          .join(e, "src")
          .groupBy(col("dst").as("node"))
          .agg(sum(col("contrib")).as("inflow"))
        val next = ranks
          .join(inflow, Seq("node"), "left")
          .select(col("node"), col("deg"),
            (lit(base) +
              expr(s"($dampingPermille * coalesce(inflow, 0L)) div 1000"))
              .as("rank"))
          .localCheckpoint(true)
        // the new round is materialized: the superseded rank frame's blocks
        // are dead — release them now, not at session end
        graft.Housekeeping.release(ranks)
        ranks = next
      }
      // the result's lineage is truncated at the final checkpoint, so the
      // edge table is no longer reachable: release it. The final rank frame
      // is the ONE persisted frame handed to the caller (Housekeeping.release
      // when done).
      graft.Housekeeping.release(e)
      ranks.select("node", "rank")
    } catch {
      case t: Throwable =>
        // a mid-iteration failure must not strand live checkpoints (the
        // retried call would stack a fresh set on top — the exact leak
        // this lifecycle exists to prevent). Double-release is a no-op.
        graft.Housekeeping.release(e)
        if (ranks != null) graft.Housekeeping.release(ranks)
        throw t
    }
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
    // unpinned keyed repartition, as in [[pageRank]] (r15): AQE-coalesced
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .repartition(col("src"))
      .localCheckpoint(true)
    val isSeed = col("node").isInCollection(seeds)

    var ranks: DataFrame = null
    try {
      // same one-aggregate (node, deg) build as [[pageRank]] (r15); the
      // seed-presence count then reads the materialized rank frame instead
      // of running its own union-distinct job over the edge table
      ranks = e.select(explode(array(
          struct(col("src").as("node"), lit(1L).as("__c")),
          struct(col("dst").as("node"), lit(0L).as("__c")))).as("__e"))
        .select(col("__e.node").as("node"), col("__e.__c").as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("deg"))
        .select(col("node"), col("deg"),
          when(isSeed, lit(scale)).otherwise(lit(0L)).as("rank"))
        .localCheckpoint(true)
      val present = ranks.filter(isSeed).count().toInt
      require(present > 0, "no seed node exists in the graph")
      val baseTotal = (1000L - dampingPermille) * scale * seeds.length / 1000L
      val seedBase = baseTotal / present
      for (_ <- 0 until iters) {
        val inflow = ranks
          .filter(col("deg") > 0 && col("rank") > 0)
          .select(col("node").as("src"), expr("rank div deg").as("contrib"))
          .join(e, "src")
          .groupBy(col("dst").as("node"))
          .agg(sum(col("contrib")).as("inflow"))
        val next = ranks
          .join(inflow, Seq("node"), "left")
          .select(col("node"), col("deg"),
            (when(isSeed, lit(seedBase)).otherwise(lit(0L)) +
              expr(s"($dampingPermille * coalesce(inflow, 0L)) div 1000"))
              .as("rank"))
          .localCheckpoint(true)
        graft.Housekeeping.release(ranks)
        ranks = next
      }
      graft.Housekeeping.release(e)
      ranks.select("node", "rank")
    } catch {
      case t: Throwable =>
        graft.Housekeeping.release(e)
        if (ranks != null) graft.Housekeeping.release(ranks)
        throw t
    }
  }

  /** Per-node triangle counts via degree-ordered edge orientation (Suri &
    * Vassilvitskii, "Counting triangles and the curse of the last
    * reducer", WWW'11): each undirected edge points from its lower
    * (degree, id) endpoint to the higher, so every triangle is enumerated
    * exactly once — from its minimum-order vertex — and the wedge count
    * is bounded by O(m^1.5) REGARDLESS of degree skew: a hub's wedges are
    * generated at its low-out-degree neighbors, never at the hub itself.
    * This is the property that makes the plan survive a web-scale graph
    * where the naive neighbor self-join dies on the hottest node.
    *
    * Input edges are treated as undirected (symmetrized + deduplicated).
    * Returns (node, deg, triangles) — all exact BIGINTs, so the gate is
    * hash-stable across engines.
    *
    * Shuffle audit: canonicalize+distinct (1 exchange on the pair key),
    * degree agg (1, map-side combined), two degree joins (reuse the deg
    * frame), wedge self-join on the oriented source (1), closing join on
    * the (a,b) pair key (1), final per-node count (1, map-side combined).
    * Everything is 8/16-byte keys; no row carries payload. */
  def triangleCounts(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    var und: DataFrame = null
    var deg: DataFrame = null
    var ori: DataFrame = null
    try {
      und = edges
        .select(col(srcCol).cast("long").as("s0"), col(dstCol).cast("long").as("d0"))
        .filter(col("s0") =!= col("d0"))
        .select(least(col("s0"), col("d0")).as("a"),
          greatest(col("s0"), col("d0")).as("b"))
        .distinct()
        .localCheckpoint(true)
      deg = und.select(col("a").as("node"))
        .unionAll(und.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
        .localCheckpoint(true)

      val da = deg.select(col("node").as("a"), col("deg").as("da"))
      val db = deg.select(col("node").as("b"), col("deg").as("db"))
      // orient low-(deg, id) → high; ties break toward the smaller id, and
      // a < b by construction, so the tie case is always a → b
      val fwd = col("da") < col("db") || (col("da") === col("db"))
      ori = und.join(da, "a").join(db, "b")
        .select(when(fwd, col("a")).otherwise(col("b")).as("s"),
          when(fwd, col("b")).otherwise(col("a")).as("t"))
        .localCheckpoint(true)

      // wedges at the minimum-order vertex: out-neighbor pairs (t1 < t2);
      // the closing edge (t1, t2) is already canonical for the und join
      val e1 = ori.select(col("s"), col("t").as("t1"))
      val e2 = ori.select(col("s"), col("t").as("t2"))
      val tri = e1.join(e2, Seq("s"))
        .filter(col("t1") < col("t2"))
        .join(und, col("t1") === col("a") && col("t2") === col("b"))
        .select(col("s"), col("t1"), col("t2"))

      val perNode = tri
        .select(explode(array(col("s"), col("t1"), col("t2"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("triangles"))

      // materialize the (node-sized) result, then release every temp — the
      // wedge/closing frames must NOT outlive the call. One persisted frame
      // (the result) is handed to the caller.
      val out = deg.join(perNode, Seq("node"), "left")
        .select(col("node"), col("deg"),
          coalesce(col("triangles"), lit(0L)).as("triangles"))
        .localCheckpoint(true)
      Seq(und, deg, ori).foreach(graft.Housekeeping.release)
      out
    } catch {
      case t: Throwable =>
        // mid-build failure must not strand the temps (double-release of
        // the success path's frames is a no-op)
        Seq(und, deg, ori).filter(_ != null).foreach(graft.Housekeeping.release)
        throw t
    }
  }
}
