package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {

  private def edges(rows: (Long, Long)*) = {
    val sp = spark; import sp.implicits._
    rows.toDF("src", "dst")
  }

  test("transitionEdges: per-entity consecutive pairs, self-loops dropped, " +
      "weights counted") {
    val sp = spark; import sp.implicits._
    val ev = Seq(
      (1L, 1, 10L), (1L, 2, 20L), (1L, 3, 20L), (1L, 4, 10L),
      (2L, 1, 10L), (2L, 2, 20L)
    ).toDF("user", "seq", "page")
    val e = Graph.transitionEdges(ev, "user", Seq("seq"), "page")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // user 1: 10→20, 20→20 (self, dropped), 20→10; user 2: 10→20
    assert(e == Set((10L, 20L, 2L), (20L, 10L, 1L)))
  }

  test("pageRank on a known graph matches hand-computed integer arithmetic") {
    // 1→2, 1→3, 2→3, 3→1 — the classic 3-node example
    val pr = Graph.pageRank(edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)),
      "src", "dst", iters = 2, dampingPermille = 850, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1: contribs: 1 sends 500000 to each of {2,3}; 2 sends 1000000
    //   to 3; 3 sends 1000000 to 1. base = 150*1000000/1000 = 150000.
    //   r1 = {1: 150000+850*1000000/1000 = 1000000,
    //         2: 150000+850*500000/1000  = 575000,
    //         3: 150000+850*1500000/1000 = 1425000}
    // round 2: 1 sends 500000 each; 2 sends 575000; 3 sends 1425000.
    //   r2 = {1: 150000+floor(850*1425000/1000) = 1361250,
    //         2: 150000+425000 = 575000,
    //         3: 150000+floor(850*(500000+575000)/1000) = 1063750}
    assert(pr == Map(1L -> 1361250L, 2L -> 575000L, 3L -> 1063750L))
  }

  test("pageRank is partitioning-independent and mass-bounded") {
    val rnd = new scala.util.Random(7)
    val es = (0 until 400).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val a = Graph.pageRank(edges(es: _*).repartition(1), "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.pageRank(edges(es: _*).repartition(7), "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "rank must not depend on input partitioning")
    val n = a.size
    assert(a.values.sum <= 1000000L * n,
      "retired floor/dangling mass can only shrink the total")
    assert(a.values.forall(_ >= 150000L), "teleport base is a floor")
  }

  test("dangling nodes keep teleport mass only; sinks accumulate") {
    // 1→2, 2 is dangling
    val pr = Graph.pageRank(edges((1L, 2L)), "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr(1L) == 150000L)
    // node 2 receives 850/1000 of node 1's teleport-only rank
    assert(pr(2L) == 150000L + 850L * 150000L / 1000L)
  }

  test("personalized pageRank: teleport mass lands only on seeds") {
    val pr = Graph.personalizedPageRank(
      edges((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)), "src", "dst",
      seeds = Seq(1L), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr(1L) > pr(2L) && pr(2L) > pr(3L),
      s"rank should decay with distance from the seed: $pr")
    // node 4 has no in-edges and is not a seed → zero
    assert(pr(4L) == 0L)
  }

  test("triangleCounts: K4, path, and duplicate/reversed edge input") {
    // K4 has 4 triangles; every node is in 3 of them with degree 3.
    // Feed duplicated + reversed edges to exercise symmetrize/dedup.
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a != b
    } yield (a, b)
    val t = Graph.triangleCounts(edges(k4: _*), "src", "dst")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(t == Map(1L -> ((3L, 3L)), 2L -> ((3L, 3L)),
      3L -> ((3L, 3L)), 4L -> ((3L, 3L))))

    // a path has no triangles but real degrees
    val p = Graph.triangleCounts(edges((1L, 2L), (2L, 3L), (3L, 4L)),
      "src", "dst")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(p == Map(1L -> ((1L, 0L)), 2L -> ((2L, 0L)),
      3L -> ((2L, 0L)), 4L -> ((1L, 0L))))
  }

  test("triangleCounts matches brute-force enumeration on a random graph " +
      "and is partitioning-independent") {
    val rnd = new scala.util.Random(11)
    val es = (0 until 300).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val und = es.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = und.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val expected = nodes.map { n =>
      val nbr = und.collect { case (a, b) if a == n => b
                              case (a, b) if b == n => a }
      val tris = nbr.toSeq.combinations(2).count { case Seq(x, y) =>
        und.contains((math.min(x, y), math.max(x, y)))
      }
      n -> ((nbr.size.toLong, tris.toLong))
    }.toMap
    val got = Graph.triangleCounts(edges(es: _*).repartition(5), "src", "dst")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    val got1 = Graph.triangleCounts(edges(es: _*).repartition(1), "src", "dst")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got1 == expected)
  }
}
