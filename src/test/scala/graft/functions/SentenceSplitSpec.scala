package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Rule-based sentence segmentation: boundaries, guards, paragraphs. */
class SentenceSplitSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def sents(t: String): Seq[String] =
    Seq(t).toDF("t").select(Text.sentences(col("t"))).as[Seq[String]].head()

  test("terminators split before an upper-case/digit/quote opener; " +
      "runs and closing quotes ride the left sentence") {
    assert(sents("One here. Two there! Three? Four.") ==
      Seq("One here.", "Two there!", "Three?", "Four."))
    assert(sents("He said \"stop.\" Then left.") ==
      Seq("He said \"stop.\"", "Then left."))
    assert(sents("Wait... Really? Yes.") ==
      Seq("Wait...", "Really?", "Yes."))
    assert(sents("It ended (fully.) Next one.") ==
      Seq("It ended (fully.)", "Next one."))
  }

  test("no boundary without whitespace, a lower-case continuation, " +
      "or at decimals/versions") {
    assert(sents("v1.2 shipped. then we iterated. Done.") ==
      Seq("v1.2 shipped. then we iterated.", "Done."))
    assert(sents("pi is 3.14 exactly. Next.") ==
      Seq("pi is 3.14 exactly.", "Next."))
    assert(sents("end.Next glued") == Seq("end.Next glued"))
  }

  test("abbreviation and single-initial guards suppress boundaries") {
    assert(sents("Dr. Smith met Mr. Jones. They spoke.") ==
      Seq("Dr. Smith met Mr. Jones.", "They spoke."))
    assert(sents("See fig. 3 for details. Done.") ==
      Seq("See fig. 3 for details.", "Done."))
    assert(sents("Items include apples, e.g. Fuji. Also pears.") ==
      Seq("Items include apples, e.g. Fuji.", "Also pears."))
    assert(sents("A. Smith wrote it. B. Jones read it.") ==
      Seq("A. Smith wrote it.", "B. Jones read it."))
  }

  test("blank lines are paragraph boundaries even without punctuation; " +
      "output trims and drops empties") {
    assert(sents("first para no period\n\nSecond para. And more.") ==
      Seq("first para no period", "Second para.", "And more."))
    assert(sents("  \n\n  ") == Seq.empty)
    assert(sents("one sentence only") == Seq("one sentence only"))
    assert(sents("") == Seq.empty)
  }
}
