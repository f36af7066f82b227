package graft.functions

import graft.SparkSpec

class RankSpec extends SparkSpec {

  test("bm25Scores matches an independent driver-side computation") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "spark window spark agg join"),
      (2L, "window table scan scan"),
      (3L, "hash hash hash hash hash hash"),
      (4L, "no matching terms at all here"),
      (5L, "spark")
    )
    val query = Seq("spark", "window", "hash")
    val out = Rank.bm25Scores(docs.toDF("doc_id", "text"), "doc_id", "text", query)
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // independent formulation: plain Scala collections, no Spark
    val tokenized = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val n = tokenized.size.toDouble
    val avgdl = tokenized.map(_._2.size).sum.toDouble / n
    val expected = tokenized.map { case (id, toks) =>
      val dl = toks.size.toDouble
      id -> query.map { w =>
        val tf = toks.count(_ == w).toDouble
        if (tf == 0) 0.0
        else {
          val dft = tokenized.count(_._2.contains(w)).toDouble
          math.log((n - dft + 0.5) / (dft + 0.5) + 1.0) *
            tf / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        }
      }.sum
    }.toMap
    for ((id, s) <- expected)
      assert(math.abs(out(id) - math.rint(s * 10000) / 10000.0) < 1e-9, s"doc $id")
    assert(out(4L) == 0.0)
    // tf saturation: doc 3's six occurrences of its term score well under
    // 6× doc 5's single occurrence of an equally-rare term
    assert(out(3L) < 3 * out(5L))
  }
}
