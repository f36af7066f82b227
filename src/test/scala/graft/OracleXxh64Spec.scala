package graft

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Pins the xxhash64 decomposition [[OracleXxh64]]'s generated DuckDB SQL
  * replays: Spark's multi-argument `xxhash64` is a seed chain — each
  * argument hashed with the running hash as seed, integral args through
  * `hashLong`/`hashInt`, strings/binary through the byte-stream algorithm.
  * If a Spark upgrade ever changed this contract, these tests fail before
  * the DuckDB oracle silently diverges. (The end-to-end equivalence of the
  * generated SQL itself is gated by the driver's DuckDB compare on
  * q32/q37/q38/q51.) */
class OracleXxh64Spec extends SparkSpec {

  private def sql1(q: String): Long = {
    val sp = spark
    sp.sql(s"select $q").head().getLong(0)
  }

  private def hashStr(s: String, seed: Long): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, seed)
  }

  test("two-argument xxhash64(bigint, string) is hashBytes(s, hashLong(v, 42))") {
    val v = 1125899906842597L
    assert(sql1(s"xxhash64(cast($v as bigint), 'hello')") ==
      hashStr("hello", XXH64.hashLong(v, 42L)))
  }

  test("xxhash64(int, binary) is hashBytes(b, hashInt(i, 42))") {
    assert(sql1("xxhash64(cast(3 as int), cast('abcdefgh' as binary))") ==
      hashStr("abcdefgh", XXH64.hashInt(3, 42L)))
  }

  test("string path covers empty/tail/stripe lengths the SQL generator branches on") {
    for (s <- Seq("", "a", "abcd", "abcdefg", "abcdefgh", "abcdefghi",
        "x" * 31, "y" * 32, "z" * 33, "w" * 71, "é†œ unicode")) {
      assert(sql1(s"xxhash64('${s}')") == hashStr(s, 42L), s"len ${s.length}")
    }
  }

  test("generated oracle SQL has the gate-required shape") {
    for ((sql, alias) <- Seq(
        OracleXxh64.simhashSql("documents") -> "simhash",
        OracleXxh64.fingerprintSql("documents") -> "fp",
        OracleXxh64.subwordCountSql("documents") -> "n_subwords",
        OracleXxh64.mediaFingerprintSql("documents") -> "media_fp")) {
      assert(sql.startsWith("SELECT doc_id, ") && sql.endsWith("ORDER BY doc_id"))
      assert(sql.contains(s"AS $alias FROM documents"))
    }
  }
}
