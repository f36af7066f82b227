package graft

/** DuckDB-SQL code generator for Spark's `xxhash64` (XXH64, seed-chained —
  * spark XXH64.java semantics: hashLong/hashInt for integral args, the full
  * byte-stream algorithm for strings/binary). This is what turns the four
  * formerly `no_oracle` queries (q32 simhash, q37 fingerprint, q38 subword
  * count, q51 media fingerprint) into REAL DuckDB oracle gates: the oracle
  * replays the exact hash chains in pure SQL, so rows+schema+hash all
  * compare, engine vs engine.
  *
  * Construction notes:
  *   - all state is UHUGEINT reduced mod 2⁶⁴ after every add/mul/shift
  *     (DuckDB's UBIGINT errors on overflow instead of wrapping; a 64×64
  *     product needs the 128-bit domain anyway);
  *   - every reused subexpression goes through a let-binding rendered as
  *     `list_transform([expr], v -> body)[1]` — without this the nested
  *     rotl/fmix chains blow up exponentially in SQL size;
  *   - loops (32-byte stripes, tail words, token folds) are
  *     `list_reduce(list_prepend(init, items), …)` so empty inputs never
  *     hit list_reduce's non-empty requirement;
  *   - validated against `spark.sql("select xxhash64(…)")` on empty /
  *     short / 8-byte / 32+-byte / unicode inputs and chained-seed forms
  *     (see OracleXxh64Spec).
  */
object OracleXxh64 {
  private val MOD = "18446744073709551616::UHUGEINT"
  private val P1 = "11400714785074694791::UHUGEINT" // 0x9E3779B185EBCA87
  private val P2 = "14029467366897019727::UHUGEINT" // 0xC2B2AE3D27D4EB4F
  private val P3 = "1609587929392839161::UHUGEINT" // 0x165667B19E3779F9
  private val P4 = "9650029242287828579::UHUGEINT" // 0x85EBCA77C2B2AE63
  private val P5 = "2870177450012600261::UHUGEINT" // 0x27D4EB2F165667C5

  private def let(expr: String, v: String, body: String): String =
    s"list_transform([$expr], $v -> $body)[1]"
  private def mul(a: String, b: String) = s"((($a) * ($b)) % $MOD)"
  private def add(a: String, b: String) = s"((($a) + ($b)) % $MOD)"
  private def sub(a: String, b: String) = s"((($a) + $MOD - (($b) % $MOD)) % $MOD)"
  private def rotl(x: String, r: Int) =
    let(x, s"_r$r", s"(((_r$r << $r) | (_r$r >> ${64 - r})) % $MOD)")
  private def xor(a: String, b: String) = s"xor(($a), ($b))"

  private def fmix(h: String): String = {
    val s1 = let(h, "_f1", "xor(_f1, _f1 >> 33)")
    val s2 = let(mul(s1, P2), "_f2", "xor(_f2, _f2 >> 29)")
    let(mul(s2, P3), "_f3", "xor(_f3, _f3 >> 32)")
  }

  /** Little-endian 64-bit word of byte-list `b` at 0-based offset expr `o`. */
  private def le64(b: String, o: String): String =
    "((" + (0 until 8).map(k => s"($b[($o)::INT + ${k + 1}] << ${8 * k})")
      .mkString(" + ") + s") % $MOD)"
  private def le32(b: String, o: String): String =
    "(" + (0 until 4).map(k => s"($b[($o)::INT + ${k + 1}] << ${8 * k})")
      .mkString(" + ") + ")"

  private def round(acc: String, inp: String): String =
    mul(rotl(add(acc, mul(inp, P2)), 31), P1)

  /** Full XXH64 over a LIST<UHUGEINT> byte-list expression with a seed
    * expression — Spark's `hashUnsafeBytes`. */
  def hashBytes(bytes: String, seed: String): String = {
    val b = "_B"
    val n = "_n"
    val init4 = s"[${add(add("_s", P1), P2)}, ${add("_s", P2)}, (_s % $MOD), ${sub("_s", P1)}]"
    val blocks = s"list_transform(range(0, (($n)//32)::BIGINT), _bk -> [32*_bk::UHUGEINT])"
    val step4 = "[" + (0 until 4)
      .map(i => round(s"_a[${i + 1}]", le64(b, s"_x[1] + ${8 * i}"))).mkString(", ") + "]"
    val folded = s"list_reduce(list_prepend($init4, $blocks), (_a, _x) -> $step4)"
    val merge = {
      var h = "_m0"
      for (i <- 0 until 4)
        h = add(mul(xor(h, round("0::UHUGEINT", s"_v[${i + 1}]")), P1), P4)
      h
    }
    val merged = let(folded, "_v",
      let(add(add(add(rotl("_v[1]", 1), rotl("_v[2]", 7)), rotl("_v[3]", 12)),
        rotl("_v[4]", 18)), "_m0", merge))
    val h0 = s"(CASE WHEN ($n) >= 32 THEN $merged ELSE ${add("_s", P5)} END)"
    val h1 = add(h0, n)
    val tail8 = s"list_reduce(list_prepend([$h1], " +
      s"list_transform(range(0, ((($n) % 32) // 8)::BIGINT), _t -> [(($n)//32*32 + 8*_t)::UHUGEINT])), " +
      "(_a, _x) -> [" +
      let(mul(rotl(mul(le64(b, "_x[1]"), P2), 31), P1), "_k1",
        add(mul(rotl(xor("_a[1]", "_k1"), 27), P1), P4)) + "])[1]"
    val o4 = s"(($n)//8*8)"
    val h2 = let(tail8, "_h2",
      s"(CASE WHEN ($n) % 8 >= 4 THEN " +
        add(mul(rotl(xor("_h2", mul(le32(b, o4), P1)), 23), P2), P3) +
        " ELSE _h2 END)")
    val ob = s"(($n)//4*4)"
    val tail1 = s"list_reduce(list_prepend([$h2], " +
      s"list_transform(range(0, (($n) % 4)::BIGINT), _q -> [($ob + _q)::UHUGEINT])), " +
      "(_a, _x) -> [" +
      mul(rotl(xor("_a[1]", mul(s"$b[(_x[1])::INT + 1]", P5)), 11), P1) + "])[1]"
    let(bytes, b, let(s"($seed) % $MOD", "_s",
      let(s"len($b)::UHUGEINT", n, fmix(tail1))))
  }

  /** Spark `XXH64.hashLong` — the integral-argument path of xxhash64. */
  def hashLong(v: String, seed: String): String =
    let(s"($seed) % $MOD", "_s", let(s"($v) % $MOD", "_v",
      fmix(add(mul(rotl(xor(add(add("_s", P5), "8::UHUGEINT"),
        mul(rotl(mul("_v", P2), 31), P1)), 27), P1), P4))))

  /** Spark `XXH64.hashInt` (4-byte path, IntegerType arguments). */
  def hashInt(v: String, seed: String): String =
    let(s"($seed) % $MOD", "_s", let(s"($v) % $MOD", "_v",
      fmix(add(mul(rotl(xor(add(add("_s", P5), "4::UHUGEINT"),
        mul(s"((_v) % 4294967296::UHUGEINT)", P1)), 23), P2), P3))))

  /** UTF-8 bytes of a string expression as LIST<UHUGEINT>, via hex. */
  def strBytes(s: String): String = {
    def digit(pos: String) = s"(strpos('0123456789ABCDEF', substr(_hx, $pos, 1)) - 1)"
    let(s"hex(encode($s))", "_hx",
      s"list_transform(range(0, (length(_hx)//2)::BIGINT), _i -> " +
        s"((${digit("(2*_i+1)::INT")})*16 + ${digit("(2*_i+2)::INT")})::UHUGEINT)")
  }

  /** UHUGEINT (mod 2⁶⁴) → the signed BIGINT Spark emits. */
  def toSigned(u: String): String =
    let(u, "_u", "(CASE WHEN _u >= 9223372036854775808::UHUGEINT THEN " +
      "((_u::HUGEINT) - 18446744073709551616::HUGEINT)::BIGINT ELSE _u::BIGINT END)")

  /** `Text.tokens` in DuckDB: whitespace split, empties dropped. */
  val tokensSql: String =
    "list_filter(string_split_regex(text, '\\s+'), _t0 -> _t0 != '')"

  /** q195: the hashed-bag quality classifier — per token
    * `xxhash64 mod dim` buckets into the micro-unit weight list.
    * `dim` MUST be a power of two: unsigned mod equals Spark's signed
    * pmod exactly when dim divides 2⁶⁴. All-integer, so score and the
    * mean-form keep decision replay with zero float tolerance. */
  def classifierSql(table: String, weights: Seq[Long]): String = {
    require(java.lang.Long.bitCount(weights.length.toLong) == 1,
      s"dim ${weights.length} must be a power of two for signed/unsigned mod parity")
    val wlist = weights.mkString("[", ", ", "]")
    val bucket = s"(((${hashBytes(strBytes("_tk"), "42::UHUGEINT")}) % " +
      s"${weights.length}::UHUGEINT)::INT + 1)"
    val score =
      s"coalesce(list_sum(list_transform(_T, _tk -> ($wlist)[$bucket])), 0)"
    val pair = let(tokensSql, "_T",
      s"[len(_T)::BIGINT, ($score)::BIGINT]")
    s"SELECT doc_id, CAST(_S[1] AS INTEGER) AS n_tokens, " +
      "_S[2] AS score_micro, (_S[1] > 0 AND _S[2] >= 0) AS keep " +
      s"FROM (SELECT doc_id, $pair AS _S FROM $table) ORDER BY doc_id"
  }

  /** q32: 64-bit SimHash — per token xxhash64(seed 42), ±1 votes per bit. */
  def simhashSql(table: String): String = {
    val hashes = s"list_transform($tokensSql, _tk -> " +
      hashBytes(strBytes("_tk"), "42::UHUGEINT") + ")"
    val bits = "list_transform(range(0, 64), _b -> CASE WHEN " +
      "list_sum(list_transform(_H, _h -> CASE WHEN (_h >> _b::UHUGEINT) % 2 = 1 " +
      "THEN 1 ELSE -1 END)) > 0 THEN (1::UHUGEINT << _b::UHUGEINT) ELSE 0::UHUGEINT END)"
    val acc = s"list_reduce(list_prepend(0::UHUGEINT, $bits), (_sa, _sb) -> _sa | _sb)"
    s"SELECT doc_id, ${let(hashes, "_H", toSigned(acc))} AS simhash " +
      s"FROM $table ORDER BY doc_id"
  }

  /** q37: xxhash64 fold over tokens from the 1125899906842597 basis —
    * each step is hashBytes(token, hashLong(acc, 42)), exactly Spark's
    * two-argument xxhash64(acc, token). */
  def fingerprintSql(table: String): String = {
    val step = hashBytes(strBytes("_T[_fx::INT]"), hashLong("_fa", "42::UHUGEINT"))
    val fold = "list_reduce(list_prepend(1125899906842597::UHUGEINT, " +
      "list_transform(range(1, len(_T) + 1), _i0 -> _i0::UHUGEINT)), " +
      s"(_fa, _fx) -> $step)"
    s"SELECT doc_id, ${let(tokensSql, "_T", toSigned(fold))} AS fp " +
      s"FROM $table ORDER BY doc_id"
  }

  /** q38: the lookaround-free re-expression of `Text.subwordTokens` —
    * insert a break at letter↔digit boundaries (two global RE2 replaces),
    * then split on whitespace+punctuation. RE2's `[[:punct:]]` equals
    * Java's ASCII `\p{Punct}`. */
  def subwordCountSql(table: String): String = {
    val s1 = "regexp_replace(text, '(\\p{L})(\\d)', '\\1 \\2', 'g')"
    val s2 = s"regexp_replace($s1, '(\\d)(\\p{L})', '\\1 \\2', 'g')"
    s"SELECT doc_id, len(list_filter(string_split_regex($s2, " +
      "'[\\s[:punct:]]+'), _t0 -> _t0 != ''))::BIGINT AS n_subwords " +
      s"FROM $table ORDER BY doc_id"
  }

  /** q51: Multimodal.mediaFingerprint — 8 evenly-spaced 64-byte windows,
    * each hashed with seed xxhash64-of-window-index (hashInt path), then a
    * left fold of two-argument xxhash64 (hashLong chains). */
  def mediaFingerprintSql(table: String): String = {
    val win = hashBytes(
      "list_slice(_Bm, (_w * len(_Bm) // 8)::INT + 1, (_w * len(_Bm) // 8)::INT + 64)",
      hashInt("_w::UHUGEINT", "42::UHUGEINT"))
    val h8 = s"list_transform(range(0, 8), _w -> $win)"
    val red = s"list_reduce($h8, (_ra, _rb) -> " +
      hashLong("_rb", hashLong("_ra", "42::UHUGEINT")) + ")"
    s"SELECT doc_id, ${let(strBytes("text"), "_Bm", toSigned(red))} AS media_fp " +
      s"FROM $table ORDER BY doc_id"
  }
}
