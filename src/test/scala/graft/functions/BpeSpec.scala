package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Byte-level BPE apply: pre-tokenization, byte→unicode mapping, rank-
  * order merge replay, exact token counts. */
class BpeSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  // a tiny learned table: rank order matters (xy before xyz; the 'Ġx'
  // merge proves space-prefixed symbols participate)
  private val merges = Seq(
    "x" -> "y", // rank 0: xy
    "xy" -> "z", // rank 1: xyz (cascades onto rank 0's output)
    "Ġ" -> "x", // rank 2: Ġx (space-prefixed)
    "l" -> "l", // rank 3: ll (repeated-symbol pair)
    "Ġx" -> "yz", // rank 4: NEVER fires — rank 1 consumes 'z' first
    "n" -> "'", // rank 5: n' — must NOT fire across a pre-token boundary
    "'" -> "t") // rank 6: 't (inside the contraction pre-token)

  private def enc(text: String): Seq[String] =
    Seq(text).toDF("t")
      .select(Text.bpeEncode(col("t"), merges)).as[Seq[String]].head()

  test("merges replay in RANK order and cascade; space prefixes ride the " +
      "byte mapping (0x20 → U+0120)") {
    // "xyz" → [x y z] → rank0 → [xy z] → rank1 → [xyz]
    assert(enc("xyz") == Seq("xyz"))
    // " xyz": pretoken keeps the leading space → [Ġ x y z] → rank0
    // → [Ġ xy z] → rank1 → [Ġ xyz]; rank2 (Ġx) never sees its pair
    // because rank0 fired first — ORDER, not availability
    assert(enc(" xyz") == Seq("Ġ", "xyz"))
    // " xw": no xy to make — rank2 merges Ġx
    assert(enc(" xw") == Seq("Ġx", "w"))
    // repeated-symbol pair merges non-overlapping left-to-right:
    // llll → [ll ll], lll → [ll l]
    assert(enc("llll") == Seq("ll", "ll"))
    assert(enc("lll") == Seq("ll", "l"))
  }

  test("pre-tokenization is the GPT-2 pattern: contractions split, " +
      "letters/digits/punct separate, merges never cross pre-tokens") {
    // digits split from letters: "x9y" → pretokens [x, 9, y] — the
    // x·y merge must NOT fire across those boundaries
    assert(enc("x9y") == Seq("x", "9", "y"))
    // "don't" pre-tokenizes as [don, 't]: rank 6 merges 't INSIDE its
    // pre-token; rank 5 (n·') straddles the boundary and must NOT fire
    assert(enc("don't") == Seq("d", "o", "n", "'t"))
    // punctuation separates with its space prefix
    assert(enc("xy.") == Seq("xy", "."))
    // UNICODE whitespace (Python-regex parity): U+00A0 is \\s, so
    // "!\u00A0!" is THREE pre-tokens and a merge chain spanning the
    // NBSP bytes must not fire; Java's default ASCII \\s would glue
    // the three into one punctuation run and merge straight through.
    // NBSP's UTF-8 bytes C2 A0 map to '\u00C2' (direct) and '\u0142' (shifted)
    val nbspMerges = Seq("!" -> "\u00C2", "!\u00C2" -> "\u0142")
    val got = Seq("!\u00A0!").toDF("t")
      .select(Text.bpeEncode(col("t"), nbspMerges)).as[Seq[String]].head()
    assert(got == Seq("!", "\u00C2", "\u0142", "!"), got)
  }

  test("bpeTrain: weighted merge learning with deterministic tie-breaks; " +
      "the learned table feeds bpeEncode verbatim; dry-out stops early") {
    // the classic low/lower corpus: (l,o) and (o,w) tie at 5 — the
    // ascending tie-break picks (l,o); then (lo,w) at 5; then (Ġ,low)
    // at 3 beats (w,e)/(e,r) at 2
    val df = Seq("low low low", "lower lower").toDF("t")
    val learned = Text.bpeTrain(df, "t", 3)
    assert(learned == Seq("l" -> "o", "lo" -> "w", "Ġ" -> "low"), learned)
    // apply the learned table: " lower" → [Ġlow, e, r]
    val enc = Seq("low lower").toDF("t")
      .select(Text.bpeEncode(col("t"), learned)).as[Seq[String]].head()
    assert(enc == Seq("low", "Ġlow", "e", "r"), enc)
    // dry-out: a single 2-symbol word yields ONE merge then stops
    assert(Text.bpeTrain(Seq("ab").toDF("t"), "t", 100) == Seq("a" -> "b"))
    assert(Text.bpeTrain(df, "t", 0) == Seq.empty)
  }

  test("incremental trainer parity: learnMerges == learnMergesNaive on " +
      "seeded random dicts (ties, repeats, single-symbol words)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val alpha = "abcdef".toCharArray.map(String.valueOf)
      val dict = Array.tabulate(120) { _ =>
        val len = 1 + rnd.nextInt(9)
        (Array.fill(len)(alpha(rnd.nextInt(alpha.length))),
          (1 + rnd.nextInt(7)).toLong)
      }
      val fast = Text.learnMerges(dict.map { case (w, c) => (w.clone(), c) }, 60)
      val slow = Text.learnMergesNaive(dict.map { case (w, c) => (w.clone(), c) }, 60)
      assert(fast == slow, s"trial $trial diverged: $fast vs $slow")
    }
  }

  test("incremental trainer scales: >=1k merges over a 2k-word dict in " +
      "seconds, merge-for-merge identical to the naive loop") {
    val rnd = new scala.util.Random(7)
    val alpha = ('a' to 'z').toArray.map(String.valueOf)
    val dict = Array.tabulate(2000) { _ =>
      (Array.fill(12 + rnd.nextInt(12))(alpha(rnd.nextInt(alpha.length))),
        (1 + rnd.nextInt(100)).toLong)
    }
    val t0 = System.nanoTime()
    val fast = Text.learnMerges(dict.map { case (w, c) => (w.clone(), c) }, 1200)
    val fastMs = (System.nanoTime() - t0) / 1e6
    val slow = Text.learnMergesNaive(dict.map { case (w, c) => (w.clone(), c) }, 1200)
    assert(fast.length == 1200, s"dried out at ${fast.length}")
    assert(fast == slow)
    // generous bound: the point is NOT-hours (naive at 50k merges);
    // incremental does ~1200 rounds of localized updates
    assert(fastMs < 30000, s"incremental trainer took ${fastMs}ms")
  }

  test("token COUNT is exact and non-ASCII is byte-level (no unknowns): " +
      "multi-byte UTF-8 chars count per mapped byte symbol") {
    val cnt = Seq("xyz xyz é").toDF("t")
      .select(Text.bpeTokenCount(col("t"), merges)).as[Int].head()
    // "xyz"=1, " xyz"=2 (Ġ + xyz), " é"=3 (Ġ + 2 bytes of é, no merges)
    assert(cnt == 6)
    assert(enc("") == Seq.empty)
  }
}
