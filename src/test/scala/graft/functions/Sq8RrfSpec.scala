package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Sq8RrfSpec extends SparkSpec {

  private def emb(rows: (Long, Seq[Float])*) = {
    val sp = spark; import sp.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("sq8 codes are lossless on vectors already at the 256-level lattice") {
    // all values lie exactly on the per-dim [min,max]/255 grid, so
    // quantization is exact and SQ8 cosine == exact cosine of the inputs
    val grid = (0 until 4).map { i =>
      (i.toLong, Seq(i * 255.0f / 3.0f, 255.0f - i * 255.0f / 3.0f))
    }
    val df = emb(grid.map { case (id, v) =>
      (id, v.map(x => (math.rint(x * 3.0 / 255.0) * 255.0 / 3.0).toFloat)) }: _*)
    val q = df.filter(col("vec_id") === 0).head().getSeq[Float](1)
    val sq8 = Similarity.sq8TopK(df, "vec_id", "embedding", q, 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = Similarity.cosineToQuery(df, "vec_id", "embedding", q)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    sq8.foreach { case (id, s) => assert(math.abs(s - exact(id)) < 2e-3,
      s"id=$id sq8=$s exact=${exact(id)}") }
  }

  test("sq8 ranking recalls exact top-k on well-separated vectors") {
    val rnd = new scala.util.Random(7)
    val base = Array.fill(16)(rnd.nextFloat())
    val rows = (0L until 50L).map { i =>
      val noise = i.toFloat / 50f
      (i, base.toIndexedSeq.map(x => x + noise * rnd.nextFloat()))
    }
    val df = emb(rows: _*)
    val q = rows.head._2
    val sq8Top = Similarity.sq8TopK(df, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val exactTop = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    assert((sq8Top & exactTop).size >= 8,
      s"recall@10 too low: ${(sq8Top & exactTop).size}")
  }

  test("sq8 clamps out-of-range query values and guards zero norms") {
    val df = emb((0L, Seq(0f, 0f)), (1L, Seq(1f, 2f)), (2L, Seq(2f, 4f)))
    val out = Similarity.sq8TopK(df, "vec_id", "embedding",
      Seq(100f, -100f), 3).collect()
    assert(out.length === 3)
    out.foreach(r => assert(!r.getDouble(1).isNaN))
  }

  test("rrf fuses two rankings with the 1/(k+rank) convention") {
    val sp = spark; import sp.implicits._
    val l1 = Seq((1L, 0.9), (2L, 0.8), (3L, 0.7)).toDF("id", "score")
    val l2 = Seq((2L, 0.95), (3L, 0.5)).toDF("id", "score")
    val out = Rank.rrfFuse(Seq(l1, l2), "id", "score", k = 60)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toList
      .sortBy(_._1)
    val expect = Map(
      1L -> 1.0 / 61, // rank 1 in l1 only
      2L -> (1.0 / 62 + 1.0 / 61), // rank 2 in l1, rank 1 in l2
      3L -> (1.0 / 63 + 1.0 / 62))
    out.foreach { case (id, s, n) =>
      assert(math.abs(s - expect(id)) < 1e-6, s"id=$id")
      assert(n === (if (id == 1L) 1L else 2L))
    }
  }

  test("rrf ties rank deterministically on the id") {
    val sp = spark; import sp.implicits._
    val l = Seq((5L, 0.5), (3L, 0.5), (4L, 0.5)).toDF("id", "score")
    val out = Rank.rrfFuse(Seq(l), "id", "score", k = 60)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(3L) > out(4L) && out(4L) > out(5L))
  }
}
