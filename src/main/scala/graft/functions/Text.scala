package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * Everything is built from `org.apache.spark.sql.functions` higher-order
  * array functions (codegen'd, no UDFs), so the operators scale with the
  * scan and never serialize rows through Scala closures.
  */
object Text {

  /** Evaluate `c` ONCE and bind it as a lambda variable for `f`.
    *
    * Column expressions referenced inside higher-order-function lambdas are
    * re-evaluated per array element (lambdas block common-subexpression
    * elimination), so e.g. `size(toks)` inside a `transform` re-runs the
    * whole regex split for every token — O(n²·len). Wrapping the value in a
    * single-element array and `transform`-ing over it turns every inner
    * reference into an O(1) bound-variable read. Measured 30× on shingling.
    */
  private[functions] def bind(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** Whitespace tokens with empties removed (handles trailing separators). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= lit(""))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword segmentation: split on whitespace AND punctuation /
    * digit boundaries, the usual pre-tokenization step of BPE tokenizers. */
  def subwordTokens(text: Column): Column =
    filter(split(text, "[\\s\\p{Punct}]+|(?<=\\p{L})(?=\\d)|(?<=\\d)(?=\\p{L})"),
      t => t =!= lit(""))

  /** Byte-level BPE ENCODE with a learned merges table — exact
    * tokenizer-equivalent tokens (GPT-2 recipe: pre-tokenize, map
    * bytes through the printable bijection, replay merges by rank; see
    * [[graft.expressions.BpeEncode]]). Use [[bpeTokenCount]] wherever
    * a token BUDGET matters (chunking, packing, length bounds):
    * whitespace counts drift 1.2-1.5× from real tokenizers on prose
    * and far more on code. The table ships once per task via the plan,
    * not per row. */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.BpeEncode(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text),
        new graft.expressions.BpeTable(merges)))

  /** Exact token count under the merges table — the drop-in for
    * [[tokenCount]] when budgets must match the real tokenizer. */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(bpeEncode(text, merges))

  /** Mapped GPT-2 pre-tokens of a text column
    * ([[graft.expressions.BpePretokenize]]) — the corpus-scale stage of
    * [[bpeTrain]]. */
  def bpePretokens(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.BpePretokenize(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))

  /** TRAIN a byte-level BPE merges table (Sennrich's algorithm over the
    * GPT-2 byte alphabet) — the learning side of [[bpeEncode]], so the
    * engine covers the full tokenizer loop: train here, apply with the
    * returned table.
    *
    * Scale shape: the only corpus-proportional work is ONE distributed
    * pass — explode pre-tokens, groupBy, count — producing the word
    * FREQUENCY dictionary, which is bounded by vocabulary, not corpus
    * (the classic BPE trainer's working set). Merge learning then runs
    * on the driver over that dict INCREMENTALLY: a pair→postings index
    * (which words contain which pair) means each merge round touches
    * ONLY the words containing the merged pair — the textbook BPE
    * trainer shape, O(affected words) per round instead of the naive
    * O(dict symbols) full recount, so a real 32k–50k-merge vocabulary
    * trains in seconds, not hours. Best-pair selection is an ordered
    * set (count desc, then pair ascending — the DETERMINISTIC
    * tie-break), maintained alongside the counts. Parity with the
    * naive full-recount loop is pinned by spec ([[learnMergesNaive]]
    * stays as the reference implementation).
    *
    * `maxDictWords` keeps the driver set bounded by frequency rank
    * (the mass lives in the head). When the cap BINDS it is logged as
    * a warning — a truncated dict can change the learned merges, so
    * the caller gets a signal, never silence. Output pairs are in the
    * mapped alphabet [[bpeEncode]] consumes verbatim. */
  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int,
      maxDictWords: Int = 1 << 20): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges $numMerges")
    // +1 row: detect a binding cap without a second count() job
    val rows = df.select(explode(bpePretokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(maxDictWords + 1)
      .collect()
    if (rows.length > maxDictWords)
      trainLog.warn(
        s"bpeTrain: maxDictWords=$maxDictWords cap binds — merges are " +
          "learned from the head of the frequency-ranked dictionary only; " +
          "raise the cap for tail-sensitive vocabularies")
    val dict0 = rows.take(maxDictWords)
      .map(r => (r.getString(0).toCharArray.map(String.valueOf), r.getLong(1)))
    learnMerges(dict0, numMerges)
  }

  @transient private lazy val trainLog =
    org.slf4j.LoggerFactory.getLogger("graft.Text")

  /** Left-to-right non-overlapping apply of one merge to a symbol
    * array — the same walk the encoder replays. */
  private def applyMerge(syms: Array[String], l: String,
      r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Incremental merge learning over a word-frequency dict: pair
    * counts + pair→postings maintained in place, best pair from an
    * ordered set. Merge-for-merge identical to [[learnMergesNaive]]
    * (spec-pinned parity). */
  private[graft] def learnMerges(dict0: Array[(Array[String], Long)],
      numMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val words: Array[Array[String]] = dict0.map(_._1)
    val wc: Array[Long] = dict0.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val postings = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    implicit val bestFirst: Ordering[(Long, String, String)] =
      Ordering.Tuple3(Ordering[Long].reverse, Ordering[String], Ordering[String])
    val queue = mutable.TreeSet.empty[(Long, String, String)]
    def bump(p: (String, String), delta: Long): Unit = {
      val old = counts.getOrElse(p, 0L)
      if (old != 0L) queue.remove((old, p._1, p._2))
      val nw = old + delta
      if (nw == 0L) counts.remove(p)
      else { counts(p) = nw; queue.add((nw, p._1, p._2)) }
    }
    def pairsOf(syms: Array[String])(f: ((String, String)) => Unit): Unit = {
      var i = 0
      while (i < syms.length - 1) { f((syms(i), syms(i + 1))); i += 1 }
    }
    var wi = 0
    while (wi < words.length) {
      val c = wc(wi)
      pairsOf(words(wi)) { p =>
        bump(p, c)
        postings.getOrElseUpdate(p, mutable.Set.empty) += wi
      }
      wi += 1
    }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < numMerges && queue.nonEmpty) {
      val (_, l, r) = queue.head
      merges += ((l, r))
      val best = (l, r)
      // only words CONTAINING the merged pair change — postings order
      // is irrelevant to the result (each word recounts independently)
      val affected = postings.getOrElse(best, mutable.Set.empty).toArray
      var k = 0
      while (k < affected.length) {
        val w = affected(k)
        val c = wc(w)
        val oldSyms = words(w)
        pairsOf(oldSyms)(p => bump(p, -c))
        pairsOf(oldSyms)(p => postings.get(p).foreach(_ -= w))
        val newSyms = applyMerge(oldSyms, l, r)
        words(w) = newSyms
        pairsOf(newSyms) { p =>
          bump(p, c)
          postings.getOrElseUpdate(p, mutable.Set.empty) += w
        }
        k += 1
      }
      postings.remove(best)
      round += 1
    }
    merges.toSeq
  }

  /** The naive full-recount reference trainer (one weighted pair count
    * + full dict rewrite per round) — kept as the parity oracle for
    * [[learnMerges]]; correct at any scale, O(merges × dict symbols)
    * on the driver. */
  private[graft] def learnMergesNaive(dict0: Array[(Array[String], Long)],
      numMerges: Int): Seq[(String, String)] = {
    var dict: Array[(Array[String], Long)] = dict0
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var dry = false
    while (round < numMerges && !dry) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      dict.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) dry = true
      else {
        var best: (String, String) = null
        var bestC = -1L
        counts.foreach { case (p, c) =>
          if (c > bestC || (c == bestC &&
              (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
            best = p; bestC = c
          }
        }
        merges += best
        dict = dict.map { case (syms, c) => (applyMerge(syms, best._1, best._2), c) }
        round += 1
      }
    }
    merges.toSeq
  }

  /** fastText-style hashed-bag linear score in INTEGER micro-units
    * ([[graft.expressions.HashedBagScore]]): per whitespace token,
    * `xxhash64(token) mod weights.length` buckets into the table, the
    * row's score is the exact BIGINT sum plus `bias`. Weights come
    * from [[trainQualityClassifier]] via [[quantizeMicro]], or any
    * hand-set table. */
  def classifierScoreMicro(text: Column, weights: Seq[Long],
      bias: Long = 0L): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.HashedBagScore(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text),
        new graft.expressions.HashedBagScore.Model(weights.toArray))) +
      lit(bias)

  /** The keep decision in the MEAN form fastText uses (averaged
    * features): keep iff `score >= thresholdMicroPerToken × n_tokens`
    * — all-integer, so the whole classifier replays in an oracle with
    * zero float tolerance. Empty documents never keep. */
  def classifierKeep(text: Column, weights: Seq[Long], bias: Long,
      thresholdMicroPerToken: Long): Column =
    bind(text) { t =>
      val n = tokenCount(t).cast("long")
      (n > 0) && (classifierScoreMicro(t, weights, bias) >=
        lit(thresholdMicroPerToken) * n)
    }

  /** TRAIN the quality classifier: full-batch logistic regression over
    * hashed MEAN bag-of-words features (the fastText recipe minus
    * subword embeddings — a linear model over `dim` hashed buckets).
    * Labels are 0.0/1.0 (1 = the curated/positive seed set, 0 = random
    * corpus — the CCNet setup). One distributed gradient pass per
    * iteration (`treeAggregate` of a dim+1 dense gradient; the model
    * broadcasts with the task closure), so cost is `iters` scans —
    * iters is small (tens) and each pass is corpus-parallel.
    * Summation order makes low-order float bits partition-dependent;
    * the DECISIONS the model drives are spec-gated on separation, and
    * exact-replay inference goes through [[quantizeMicro]] +
    * [[classifierScoreMicro]]. Returns (weights[dim], bias).
    *
    * REPLAY RECIPE: the trained boundary is `sum(w)/n + bias >= 0`,
    * i.e. `sum(w) >= (-bias) × n` — encode it as
    * `classifierKeep(text, quantizeMicro(w), bias = 0,
    * thresholdMicroPerToken = -round(bias × 1e6))`. Passing the
    * logistic bias as classifierKeep's once-added `bias` applies it
    * per DOCUMENT instead of per token and shifts the boundary. */
  def trainQualityClassifier(df: DataFrame, textCol: String,
      labelCol: String, dim: Int, iters: Int = 30,
      lr: Double = 1.0): (Array[Double], Double) = {
    require(dim > 0 && iters >= 0, s"dim $dim iters $iters")
    val data = df.select(
        col(labelCol).cast("double"),
        transform(tokens(col(textCol)), t =>
          pmod(xxhash64(t), lit(dim.toLong)).cast("int")).as("b"))
      .filter(size(col("b")) > 0)
      .rdd.map(r => (r.getDouble(0), r.getSeq[Int](1).toArray))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var w = new Array[Double](dim)
      var b = 0.0
      var it = 0
      while (it < iters) {
        val (gw, gb, m) = data.treeAggregate(
          (new Array[Double](dim), 0.0, 0L))(
          seqOp = { case ((aw, ab, n), (y, buckets)) =>
            var dot = 0.0
            buckets.foreach(k => dot += w(k))
            val p = 1.0 / (1.0 + math.exp(-(dot / buckets.length + b)))
            val g = p - y
            val inv = g / buckets.length
            buckets.foreach(k => aw(k) += inv)
            (aw, ab + g, n + 1)
          },
          combOp = { case ((a1, b1, n1), (a2, b2, n2)) =>
            var i = 0
            while (i < dim) { a1(i) += a2(i); i += 1 }
            (a1, b1 + b2, n1 + n2)
          })
        if (m > 0) {
          var i = 0
          while (i < dim) { w(i) -= lr * gw(i) / m; i += 1 }
          b -= lr * gb / m
        }
        it += 1
      }
      (w, b)
    } finally { data.unpersist(blocking = false); () }
  }

  /** Quantize trained weights to micro-units for the exact-replay
    * inference path: `round(w × 1e6)`. */
  def quantizeMicro(weights: Array[Double]): Seq[Long] =
    weights.toSeq.map(w => math.round(w * 1e6))

  /** Sliding word n-gram shingles, the unit of MinHash/Jaccard dedup.
    * `transform` over index positions keeps this inside codegen. */
  def shingles(text: Column, n: Int): Column =
    bind(tokens(text)) { toks =>
      filter(
        transform(toks, (_, i) =>
          when(i <= size(toks) - n,
            array_join(slice(toks, i + 1, lit(n)), " "))),
        s => s.isNotNull)
    }

  /** Distinct-token ratio: vocabulary richness component of quality score. */
  def distinctRatio(text: Column): Column =
    bind(tokens(text)) { toks =>
      when(size(toks) > 0,
        size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
        .otherwise(lit(0.0))
    }

  /** Ratio of stopwords among tokens — high for natural prose, low for
    * boilerplate/code; a standard quality-filter feature. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    bind(tokens(text)) { toks =>
      val sw = array(stopwords.map(lit): _*)
      when(size(toks) > 0,
        size(filter(toks, t => array_contains(sw, t))).cast("double") /
          size(toks).cast("double"))
        .otherwise(lit(0.0))
    }

  /** Mean token length in characters. */
  def meanTokenLength(text: Column): Column =
    bind(tokens(text)) { toks =>
      when(size(toks) > 0,
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
          size(toks).cast("double"))
        .otherwise(lit(0.0))
    }

  /** Punctuation-character ratio over the raw text. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
        length(text).cast("double"))
      .otherwise(lit(0.0))

  /** Composite document quality score in [0,1]: favors mid-length documents
    * with diverse vocabulary, some stopwords, and modest punctuation —
    * the shape of C4/Gopher-style quality heuristics. */
  def qualityScore(text: Column, stopwords: Seq[String] = DefaultStopwords): Column =
    bind(tokens(text)) { toks =>
      val n = size(toks).cast("double")
      val lengthTerm = least(n / lit(50.0), lit(1.0))
      val diversity = when(size(toks) > 0,
        size(array_distinct(toks)).cast("double") / n).otherwise(lit(0.0))
      val sw = array(stopwords.map(lit): _*)
      val swr = when(size(toks) > 0,
        size(filter(toks, t => array_contains(sw, t))).cast("double") / n)
        .otherwise(lit(0.0))
      val swTerm = least(swr * lit(4.0), lit(1.0))
      val punct = greatest(lit(1.0) - punctRatio(text) * lit(5.0), lit(0.0))
      round((lengthTerm + diversity + swTerm + punct) / lit(4.0), 6)
    }

  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  /** Adjacent character-pair counts over whitespace tokens — the counting
    * core of BPE tokenizer training (each merge step picks the most
    * frequent adjacent pair). Returns `(pair, cnt)` sorted by count desc
    * then pair asc (a deterministic total order, so a top-N cut is stable).
    *
    * Scale shape: pair extraction is per-row; the only shuffle is the
    * map-side-combined count over 2-char keys (vocabulary-bounded — at most
    * |alphabet|² distinct groups, thousands not billions). */
  def charPairCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(col(textCol))).as("w"))
      .select(explode(bind(col("w")) { w =>
        when(length(w) >= 2,
          transform(sequence(lit(1), length(w) - 1), i => w.substr(i, lit(2))))
          .otherwise(array().cast("array<string>"))
      }).as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))

  /** Sequence packing for pretraining batches: assign each document to a
    * fixed-token-budget bin, SHARD-LOCALLY. A global greedy packer needs a
    * corpus-wide ordered window (single-partition — the classic scale
    * anti-pattern); sharding first makes each window partition-local and
    * embarrassingly parallel, at the cost of ≤ one underfull bin per shard.
    * Within a shard, docs fill bins contiguously in id order:
    * `bin = ⌊exclusive-prefix-tokens / budget⌋` (integer arithmetic —
    * engine-portable). Returns (idCol, shard, n_tokens, bin).
    *
    * SIZING `shards`: it caps the window parallelism — each shard's
    * running sum is one task. Real runs set `shards` ≈ the cluster's task
    * slots (e.g. `spark.sparkContext.defaultParallelism`), NOT a small
    * constant; a shard should hold ~100k-1M docs so the per-task sort
    * stays in memory. More shards = more parallelism and at most one
    * extra underfull bin each — the trade is almost free, so err high. */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budgetTokens: Int,
      shards: Int): DataFrame = {
    require(budgetTokens > 0 && shards > 0,
      s"need positive budget/shards, got $budgetTokens/$shards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(idCol)
    df.select(col(idCol),
        pmod(col(idCol), lit(shards.toLong)).as("shard"),
        tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("__cum", sum(col("n_tokens")).over(w) - col("n_tokens"))
      // `div`, not `/`: long / long promotes to double, whose 2⁵³ mantissa
      // would misplace boundary docs once a shard's token prefix sum passes
      // ~9e15 — exactly the regime this operator is for
      .withColumn("bin", expr(s"__cum div ${budgetTokens}L"))
      .drop("__cum")
  }

  /** Unigram-LM surprisal: Σ −ln(count(tok)/N) over each document's tokens
    * in ORIGINAL order — the cheap corpus-trained stand-in for
    * model-perplexity quality filtering (low = generic text, high =
    * rare-token text). Documents with no tokens emit no row.
    *
    * Engine portability: the per-token join order doesn't matter because
    * the final accumulation re-sorts by position and folds sequentially
    * (the q67 reconstruction trick); `ln` may differ from another engine's
    * by an ulp, so the score is rounded to 4 decimals — ~8 orders of
    * magnitude above the worst accumulated drift.
    *
    * Scale shape: one shuffle on token strings for the count (map-side
    * combined, vocabulary-bounded), one broadcast-or-shuffle join of
    * tokens to counts, one per-doc aggregation. N is a driver-side long. */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // tokenize ONCE (r15, guide §5): the count pass and the per-doc score
    // join both read the materialized per-doc token arrays instead of
    // re-scanning and re-tokenizing the corpus per plan reference; the
    // checkpoint backs the returned plan (caller/sweep releases it)
    val toksArr = df.select(col(idCol).as("__id"), tokens(col(textCol)).as("__t"))
      .localCheckpoint(true)
    val toks = toksArr.select(col("__id"),
      posexplode(col("__t")).as(Seq("__pos", "__tok")))
    val counts = toks.groupBy("__tok").agg(count(lit(1)).as("__cnt"))
    // N derives from the counts aggregate IN-PLAN (a one-row broadcast
    // cross join): no driver-side job, no materialized corpus-scale state,
    // and the counts exchange is reused between the join build side and
    // the total — the whole operator is one action with two token scans
    val total = counts.agg(sum(col("__cnt")).as("__n"))
    toks.join(counts, Seq("__tok"))
      .crossJoin(broadcast(total))
      .withColumn("__v", -log(col("__cnt").cast("double") / col("__n").cast("double")))
      .groupBy("__id")
      .agg(
        round(aggregate(
          transform(array_sort(collect_list(struct(col("__pos"), col("__v")))),
            s => s.getField("__v")),
          lit(0.0), (acc, x) => acc + x), 4).as("surprisal"),
        count(lit(1)).as("n_tokens"))
      .withColumnRenamed("__id", idCol)
  }

  /** Bigram-LM surprisal — the conditional upgrade of
    * [[unigramSurprisal]]: per document, the add-one-smoothed negative
    * log-likelihood Σ −ln((c(w₁w₂)+1)/(c(w₁)+|V|)) over its bigrams,
    * the signal CCNet-style perplexity filters threshold on.
    *
    * Scale: bigram and unigram counts are map-side-combined shuffles
    * bounded by the bigram vocabulary; positions join back on the bigram
    * strings (the q67 trade: strings shuffle once for counting, never
    * again); the vocabulary size rides the counts aggregate in-plan as a
    * one-row broadcast. The per-doc sum folds in position order
    * (order-independent of the join), and rounds to 4 decimals to absorb
    * ln()'s cross-engine ulp. Output: (idCol, bigram_surprisal, n_bigrams);
    * single-token documents score 0. */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // tokenize ONCE (r15, guide §5): the bigram stream, the unigram counts,
    // and the final id list all derive from the materialized token arrays
    // (three text scans → one); caller/sweep releases the checkpoint
    val toks = df.select(col(idCol).as("__id"), tokens(col(textCol)).as("__t"))
      .localCheckpoint(true)
    val bi = toks.select(col("__id"), posexplode(
      bind(col("__t")) { t =>
        when(size(t) >= 2,
          transform(sequence(lit(1), size(t) - 1),
            i => struct(element_at(t, i).as("w1"), element_at(t, i + 1).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
      }).as(Seq("__pos", "__b")))
      .select(col("__id"), col("__pos"), col("__b.w1"), col("__b.w2"))
    val c2 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("__c2"))
    val c1 = toks.select(explode(col("__t")).as("__w"))
      .groupBy(col("__w").as("w1")).agg(count(lit(1)).as("__c1"))
    val vocab = c1.agg(count(lit(1)).as("__v"))
    val terms = bi.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("__s", -log((col("__c2").cast("double") + 1.0) /
        (col("__c1").cast("double") + col("__v").cast("double"))))
    val agg = terms.groupBy("__id").agg(
      round(aggregate(
        transform(array_sort(collect_list(struct(col("__pos"), col("__s")))),
          s => s.getField("__s")),
        lit(0.0), (acc, x) => acc + x), 4).as("bigram_surprisal"),
      count(lit(1)).as("n_bigrams"))
    toks.select(col("__id"))
      .join(agg, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("bigram_surprisal"), lit(0.0)).as("bigram_surprisal"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * how target-like its unigram distribution is,
    * `w(x) = Σ_t [ln p̂_target(t) − ln p̂_raw(t)]`, with add-one smoothing
    * over the shared vocabulary. Resampling the corpus proportionally to
    * `exp(w)` (or keeping the top fraction by `w`) then shifts the mix
    * toward the target domain — the standard pre-training data-selection
    * recipe. `isTarget` is the target-domain predicate (e.g. a source or
    * language flag); both distributions are estimated from the input
    * corpus itself, split by that predicate.
    *
    * DSIR's hashed-feature trick (bucketing grams into 10⁴ hash buckets)
    * exists to BOUND the feature space; here the count aggregate is
    * already map-side-combined and bounded by the vocabulary, so exact
    * grams cost the same shuffle shape — pass `hashBuckets` only when the
    * vocabulary itself is cluster-hostile (≫10⁸ distinct tokens).
    *
    * Scale: token counts are one map-side-combined shuffle bounded by
    * |vocab| (conditional sums put target and raw counts in the SAME
    * aggregate — one pass, not two); totals ride in-plan as a one-row
    * broadcast; per-doc sums fold in position order (the q75 determinism
    * trick), rounded to 4 decimals to absorb ln() ulp. Output:
    * (idCol, dsir_weight, n_tokens). */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, hashBuckets: Option[Int] = None): DataFrame = {
    val feat = hashBuckets match {
      case Some(b) => (t: Column) => pmod(xxhash64(t), lit(b)).cast("string")
      case None => (t: Column) => t
    }
    // tokenize ONCE (r15, guide §5): the n-gram counts and the per-doc
    // weight join both read the materialized per-doc token arrays;
    // caller/sweep releases the checkpoint
    val toksArr = df.select(col(idCol).as("__id"), isTarget.as("__tgt"),
        tokens(col(textCol)).as("__t"))
      .localCheckpoint(true)
    val toks = toksArr.select(col("__id"), col("__tgt"),
      posexplode(col("__t")).as(Seq("__pos", "__tok0")))
      .withColumn("__tok", feat(col("__tok0")))
    val counts = toks.groupBy("__tok").agg(
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__ct"),
      sum(when(!col("__tgt"), 1L).otherwise(0L)).as("__cr"))
    val tot = counts.agg(sum(col("__ct")).as("__nt"),
      sum(col("__cr")).as("__nr"), count(lit(1)).as("__v"))
    val terms = toks.join(counts, Seq("__tok"))
      .crossJoin(broadcast(tot))
      .withColumn("__w",
        log((col("__ct").cast("double") + 1.0) /
          (col("__nt").cast("double") + col("__v").cast("double"))) -
        log((col("__cr").cast("double") + 1.0) /
          (col("__nr").cast("double") + col("__v").cast("double"))))
    terms.groupBy("__id").agg(
      round(aggregate(
        transform(array_sort(collect_list(struct(col("__pos"), col("__w")))),
          s => s.getField("__w")),
        lit(0.0), (acc, x) => acc + x), 4).as("dsir_weight"),
      count(lit(1)).as("n_tokens"))
      .withColumnRenamed("__id", idCol)
  }

  /** Gopher-style rule-based quality filter (the pre-training corpus
    * hygiene pass of Rae et al. 2021, table A1): per-document boolean
    * verdicts for each rule plus the conjunctive `keep`.
    *
    * Every rule is expressed in INTEGER arithmetic (`10·dup ≤ 3·lines`
    * instead of `dup/lines ≤ 0.3`), so verdicts are bit-portable across
    * engines — no float-division drift can flip a boundary document.
    *
    * Rules: token count in `[minWords, maxWords]`; mean token length in
    * `[minMeanLen, maxMeanLen]`; ≥80% of tokens contain an alphabetic
    * character; ≥ `minDistinctStopwords` distinct stopwords (prose
    * indicator); duplicate-line fraction ≤ 30%; symbol (`#`/`…`) to word
    * ratio ≤ 10%; ≤90% bullet-point lines; ≤30% of lines ending in an
    * ellipsis. Per-row, shuffle-free, bounded by document length. */
  /** The per-rule verdict struct behind [[gopherQualityFilter]] — also
    * usable standalone as a COLUMN (see [[gopherKeep]]), e.g. on a
    * streaming DataFrame where the row-level gate must run without the
    * id-projection wrapper. */
  def gopherQualityFlags(
      text: Column,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanLen: Int = 3,
      maxMeanLen: Int = 10,
      minDistinctStopwords: Int = 2,
      stopwords: Seq[String] = DefaultStopwords): Column =
    bind(tokens(text)) { toks =>
      bind(filter(split(text, "\n"), l => l =!= lit(""))) { lines =>
        val n = size(toks).cast("long")
        val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
        val nAlpha = size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("long")
        val sw = array(stopwords.map(lit): _*)
        val nSw = size(array_distinct(filter(toks, t => array_contains(sw, t)))).cast("long")
        val nLines = size(lines).cast("long")
        val nDupLines = nLines - size(array_distinct(lines)).cast("long")
        val nSymbols = (length(text) - length(translate(text, "#", ""))).cast("long") +
          ((length(text) - length(replace(text, lit("..."), lit("")))) / 3).cast("long")
        val nBullets = size(filter(lines,
          l => substring(l, 1, 1).isin("-", "*"))).cast("long")
        val nEllLines = size(filter(lines, l => l.endsWith("..."))).cast("long")
        val passes = Seq(
          n.between(minWords, maxWords).as("pass_words"),
          (sumLen >= lit(minMeanLen.toLong) * n &&
            sumLen <= lit(maxMeanLen.toLong) * n).as("pass_mean_len"),
          (nAlpha * 5 >= n * 4).as("pass_alpha"),
          (nSw >= minDistinctStopwords).as("pass_stopwords"),
          (nDupLines * 10 <= nLines * 3).as("pass_dup_lines"),
          (nSymbols * 10 <= n).as("pass_symbols"),
          (nBullets * 10 <= nLines * 9).as("pass_bullets"),
          (nEllLines * 10 <= nLines * 3).as("pass_ellipsis"))
        struct(passes :+ passes.reduce(_ && _).as("keep"): _*)
      }
    }

  /** Row-level conjunction of all Gopher rules — the streaming-safe gate
    * (no projection, no shuffle, usable directly in `filter`). */
  def gopherKeep(
      text: Column,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanLen: Int = 3,
      maxMeanLen: Int = 10,
      minDistinctStopwords: Int = 2,
      stopwords: Seq[String] = DefaultStopwords): Column =
    gopherQualityFlags(text, minWords, maxWords, minMeanLen, maxMeanLen,
      minDistinctStopwords, stopwords).getField("keep")

  def gopherQualityFilter(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanLen: Int = 3,
      maxMeanLen: Int = 10,
      minDistinctStopwords: Int = 2,
      stopwords: Seq[String] = DefaultStopwords): org.apache.spark.sql.DataFrame =
    df.select(col(idCol),
        gopherQualityFlags(col(textCol), minWords, maxWords, minMeanLen,
          maxMeanLen, minDistinctStopwords, stopwords).as("__f"))
      .select(col(idCol), col("__f.*"))

  /** Character n-gram profiles per language for heuristic language ID.
    * Tiny profiles (top trigrams of each language) broadcast as a literal
    * map expression; the scoring is one codegen'd expression per language.
    */
  val LangTrigramProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", " th", "he ", "ing", "ng ", " an", "and", "nd ", " of", "of "),
    "es" -> Seq(" de", "de ", "os ", " la", "la ", "ión", "ció", "es ", " es", "ent"),
    "de" -> Seq("en ", "er ", "ch ", "der", " de", "ein", "ich", "sch", "die", " di"),
    "fr" -> Seq(" de", "de ", "es ", "le ", " le", "ent", "nt ", "la ", " la", "ion"),
    "zh" -> Seq("de ", "shi", "le ", "zai", "you", "he ", "wo ", "ta ", "men", "bu "),
  )

  /** Score one language profile: count of profile trigrams present. */
  private def langScore(text: Column, trigrams: Seq[String]): Column =
    trigrams.map(t => when(text.contains(t), 1).otherwise(0))
      .reduce(_ + _)

  /** Heuristic n-gram language ID: argmax over profile scores.
    * Returns the language code column. */
  def langIdNgram(text: Column,
      profiles: Map[String, Seq[String]] = LangTrigramProfiles): Column =
    bind(lower(text)) { lowered =>
      val scored = profiles.toSeq.sortBy(_._1).map { case (langCode, tris) =>
        struct(langScore(lowered, tris).as("score"), lit(langCode).as("lang"))
      }
      // array_max on (score, lang) structs: ties break toward the
      // lexicographically-largest code — deterministic.
      array_max(array(scored: _*)).getField("lang")
    }

  /** Split a document into fixed-size token windows with overlap — the
    * standard chunking step before tokenization/packing in a training
    * pipeline. Returns an array of chunk strings; the last chunk may be
    * short; documents shorter than one chunk yield a single chunk; empty
    * documents yield an empty array. Pure expression (one bind, no UDF). */
  def chunkDocument(text: Column, chunkTokens: Int, overlap: Int = 0): Column = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap")
    val stride = chunkTokens - overlap
    bind(tokens(text)) { toks =>
      val n = size(toks)
      // number of stride-steps whose window still starts inside the doc;
      // the empty case is guarded explicitly (sequence(0, -1) would emit a
      // DESCENDING sequence, not an empty one)
      val nChunks = greatest(ceil((n - lit(overlap)).cast("double") / lit(stride))
        .cast("int"), lit(1))
      when(n <= 0, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), nChunks - 1),
          i => array_join(slice(toks, i * lit(stride) + 1, lit(chunkTokens)), " ")))
    }
  }

  /** C4-style line + document cleaning (Raffel et al. 2020 §2.2, the
    * public C4 pipeline): keep only lines that end in terminal punctuation
    * (`.` `!` `?` `"`) and carry at least `minWordsPerLine` words, dropping
    * lines that mention any of `dropLineWords` (C4: "javascript"); drop the
    * whole document when it contains any of `dropDocPhrases` ("lorem
    * ipsum"), any curly brace, or fewer than `minLines` surviving lines.
    *
    * Adds `c4_lines` (surviving line count), `c4_keep` (document verdict)
    * and `c4_text` (the cleaned document, null when dropped). The kept-line
    * array is materialized ONCE as a column (Catalyst will not inline the
    * non-cheap HOF into its three consumers), so the per-row cost is one
    * split + one filter pass — embarrassingly parallel, no shuffle. */
  def c4LineFilter(df: DataFrame, textCol: String,
      minWordsPerLine: Int = 3, minLines: Int = 5,
      dropLineWords: Seq[String] = Seq("javascript"),
      dropDocPhrases: Seq[String] = Seq("lorem ipsum")): DataFrame = {
    val text = col(textCol)
    val keptLines = filter(split(text, "\n"), l => bind(trim(l)) { t =>
      val lineClean = dropLineWords
        .map(wd => !contains(lower(t), lit(wd)))
        .foldLeft(lit(true))(_ && _)
      substring(t, -1, 1).isin(".", "!", "?", "\"") &&
        size(filter(split(t, " +"), w => w =!= lit(""))) >= lit(minWordsPerLine) &&
        lineClean
    })
    val docClean = dropDocPhrases
      .map(p => !contains(lower(text), lit(p)))
      .foldLeft(!contains(text, lit("{")) && !contains(text, lit("}")))(_ && _)
    df.withColumn("__c4_kept", keptLines)
      .withColumn("c4_lines", size(col("__c4_kept")))
      .withColumn("c4_keep", docClean && col("c4_lines") >= lit(minLines))
      .withColumn("c4_text", when(col("c4_keep"), array_join(col("__c4_kept"), "\n")))
      .drop("__c4_kept")
  }

  /** Fraction of non-empty lines that are duplicates of an earlier line —
    * the Gopher-style repetition filter (high for boilerplate/spam). */
  def duplicateLineFraction(text: Column): Column =
    bind(filter(split(text, "\n"), l => l =!= lit(""))) { lines =>
      when(size(lines) > 0,
        (size(lines) - size(array_distinct(lines))).cast("double") /
          size(lines).cast("double"))
        .otherwise(lit(0.0))
    }

  /** Fraction of all word bigrams taken up by the single most frequent
    * bigram — the top-n-gram-coverage repetition filter. O(distinct ×
    * total) per row; bounded by document length, not corpus size. */
  def topBigramCoverage(text: Column): Column =
    bind(shingles(text, 2)) { sh =>
      when(size(sh) > 0,
        bind(array_distinct(sh)) { d =>
          array_max(transform(d, x => size(filter(sh, y => y === x))))
            .cast("double") / size(sh).cast("double")
        })
        .otherwise(lit(0.0))
    }

  /** Unicode NFC normalization ([[graft.expressions.UnicodeNormalize]])
    * — run it before [[fingerprint]]/[[shingles]]/exact-dup hashing so
    * composed and decomposed spellings of the same text dedup
    * together. */
  def normalizeNfc(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.UnicodeNormalize(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), "NFC"))

  /** NFKC — NFC plus compatibility folding (ligatures, width variants,
    * superscripts), the aggressive dedup-key variant. */
  def normalizeNfkc(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.UnicodeNormalize(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), "NFKC"))

  /** Generalized top-n-gram coverage (the Gopher repetition table runs
    * n = 2, 3, 4): fraction of all word n-grams taken by the single
    * most frequent one. O(distinct × total) per row, bounded by
    * document length. */
  def topNgramCoverage(text: Column, n: Int): Column =
    bind(shingles(text, n)) { sh =>
      when(size(sh) > 0,
        bind(array_distinct(sh)) { d =>
          array_max(transform(d, x => size(filter(sh, y => y === x))))
            .cast("double") / size(sh).cast("double")
        })
        .otherwise(lit(0.0))
    }

  /** Duplicate-PARAGRAPH fraction (blank-line-separated blocks), the
    * Gopher companion to [[duplicateLineFraction]]. */
  def duplicateParagraphFraction(text: Column): Column =
    bind(filter(split(text, "\n\n"), p => p =!= lit(""))) { paras =>
      when(size(paras) > 0,
        (size(paras) - size(array_distinct(paras))).cast("double") /
          size(paras).cast("double"))
        .otherwise(lit(0.0))
    }

  /** Duplicate n-gram MASS fraction — the Gopher "fraction of
    * characters in duplicate n-grams" family (n = 5..10), under this
    * engine's DETERMINISTIC definition: Σ over n-grams occurring ≥ 2
    * times of occurrences × n-gram char length, over the same sum for
    * ALL occurrences. (Published reproductions disagree on overlap
    * accounting; this weighted-mass form is exactly replayable in an
    * oracle and monotone in the same repetition signal.) */
  def dupNgramMassFraction(text: Column, n: Int): Column =
    bind(shingles(text, n)) { sh =>
      when(size(sh) > 0,
        bind(array_distinct(sh)) { d =>
          val total = aggregate(sh, lit(0L),
            (a, x) => a + length(x).cast("long"))
          val dupMass = aggregate(d, lit(0L), (a, x) =>
            a + bind(size(filter(sh, y => y === x))) { c =>
              when(c >= 2, c.cast("long") * length(x).cast("long"))
                .otherwise(lit(0L))
            })
          dupMass.cast("double") / total.cast("double")
        })
        .otherwise(lit(0.0))
    }

  /** Rolling-hash fingerprint over tokens (document fingerprinting à la
    * winnowing, collapsed to one 64-bit value). The mix step is
    * xxhash64(acc, token): overflow-free under ANSI mode (a multiplicative
    * accumulator would raise ARITHMETIC_OVERFLOW in Spark 4's default ANSI
    * dialect) and order-sensitive, so permuted documents fingerprint apart.
    * aggregate() keeps the accumulation inside the engine. */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(1125899906842597L),
      (acc, t) => xxhash64(acc, t))

  /** PII scrub patterns — deliberately RE2-compatible (no lookarounds, no
    * shorthand classes) so the DuckDB oracle runs the IDENTICAL pattern
    * text; both engines' regexp_replace are global. */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe: String = "https?://[A-Za-z0-9./_%?=&#-]+"

  /** PII masking before training: emails → <EMAIL> first, then URLs →
    * <URL> (an email never contains "://", so the order only matters for
    * URL userinfo, where the email match wins deterministically in both
    * engines). Pure codegen'd regexp_replace — one pass per pattern. */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), UrlRe, "<URL>")

  /** HTML → visible text, the extraction step between a WARC scan
    * ([[Warc.records]]) and the text-quality operators — the WET
    * conversion Common Crawl pipelines start from: drop script/style
    * blocks wholesale, strip remaining tags, decode character
    * references (numeric + core named, ONE native scan so `&amp;#65;`
    * and `&#38;amp;` both decode exactly one level — see
    * [[graft.expressions.HtmlNumericEntityDecode]]), collapse
    * whitespace. The regex stages are codegen'd regexp_replace with
    * RE2-compatible patterns (non-greedy + (?s), no lookarounds), so
    * the same strings replay in an oracle. A real DOM-aware extractor
    * (readability scoring, boilerplate removal) plugs in at the same
    * column position. */
  def htmlToText(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      "(?s)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    // entity decode is ONE native scan (numeric + named together):
    // sequential regexp passes double-decode whichever spelling runs
    // second (&amp;#65; vs &#38;amp;) — the single pass consumes each
    // source reference exactly once and never re-reads its own output,
    // so both decode exactly one level (browser semantics)
    val decoded = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.HtmlNumericEntityDecode(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(noTags)))
    trim(regexp_replace(decoded, "[ \\t\\r\\n]+", " "))
  }

  /** HTML → MAIN content only — the boilerplate-removal extractor
    * ([[graft.expressions.HtmlMainContent]]: block segmentation at
    * block-tag boundaries, per-block word count + link density gate)
    * that [[htmlToText]]'s scaladoc reserves a column position for:
    * nav bars, cookie banners, pagination, and footers drop BEFORE
    * quality filtering, so they never reach token counts, dedup
    * shingles, or the corpus. Same post-processing contract as
    * htmlToText: one native entity-decode scan, then whitespace
    * collapse — the output feeds the same downstream operators. */
  /** Rule-based sentence segmentation
    * ([[graft.expressions.SentenceSplit]]) — the boundary unit
    * token-budget chunking should cut on (mid-sentence chunk splits
    * measurably hurt training): terminator runs + closing quotes,
    * abbreviation and single-initial guards, blank-line paragraph
    * boundaries. Deterministic, so oracles restate output
    * closed-form. */
  def sentences(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.SentenceSplit(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))

  /** HTML → MARKDOWN ([[graft.expressions.HtmlToMarkdown]]): headings,
    * lists, links, emphasis, and code fences survive as structure —
    * the markdown-corpus export shape (htmlToText flattens, this
    * keeps what markdown-trained models consume). Character
    * references decode downstream with the same single-scan
    * expression; markdown's own newline structure is preserved (no
    * whitespace collapse). */
  def htmlToMarkdown(html: Column): Column = {
    val md = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.HtmlToMarkdown(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(html)))
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.HtmlNumericEntityDecode(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(md)))
  }

  def mainContent(html: Column): Column = {
    val blocks = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.HtmlMainContent(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(html)))
    val decoded = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.HtmlNumericEntityDecode(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(blocks)))
    trim(regexp_replace(decoded, "[ \\t\\r\\n]+", " "))
  }
}
