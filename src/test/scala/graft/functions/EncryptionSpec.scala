package graft.functions

import javax.crypto.AEADBadTagException

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** W12 — XChaCha20-Poly1305 chunk codec (encryption.py:31-139 parity). */
class EncryptionSpec extends SparkSpec {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("hchacha20 matches the draft-irtf-cfrg-xchacha test vector") {
    val key = hex("000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f")
    val nonce = hex("000000090000004a0000000031415927")
    val out = Encryption.hchacha20(key, nonce)
    assert(out.map("%02x".format(_)).mkString ==
      "82413b4227b27bfed30e42508a877d73a0f9e4d58a74a853c12ec41326d3ecdc")
  }

  test("decrypts a blob produced by an independent XChaCha implementation") {
    // Generated with libsodium-equivalent HChaCha20 + IETF ChaCha20-Poly1305
    // (python `cryptography`), AAD "dClimate-Zarr" (the reference's header,
    // encryption.py:98), layout nonce|tag|ct.
    val key = (0 until 32).map(_.toByte).toArray
    val kh = Encryption.registerEncryptionKey(key.map("%02x".format(_)).mkString)
    val blob = hex(
      "6465666768696a6b6c6d6e6f707172737475767778797a7b60b59362dcc1986c" +
        "da5dcf9964819286081b9c908e5be0e1ec10ff4dc918d3e93dd42a518e59a7c0" +
        "ff750bd14e2c5864c36363124dcc8ee78e6902")
    val pt = Encryption.decryptChunk(blob, kh)
    assert(new String(pt, "US-ASCII") == "the quick brown fox jumps over the lazy dog")
  }

  test("roundtrip, tamper detection, wrong key, missing key") {
    val kh = Encryption.registerEncryptionKey(Encryption.generateEncryptionKey())
    val plain = "gridded chunk payload".getBytes("UTF-8")
    val enc = Encryption.encryptChunk(plain, kh)
    assert(enc.length == plain.length + 40) // 24 nonce + 16 tag
    assert(Encryption.decryptChunk(enc, kh).sameElements(plain))

    val tampered = enc.clone(); tampered(45) = (tampered(45) ^ 1).toByte
    assertThrows[AEADBadTagException](Encryption.decryptChunk(tampered, kh))

    val otherKh = Encryption.registerEncryptionKey(Encryption.generateEncryptionKey())
    assertThrows[AEADBadTagException](Encryption.decryptChunk(enc, otherKh))

    assertThrows[Encryption.MissingKeyError](
      Encryption.decryptChunk(enc, "deadbeef"))
  }

  test("nonces are unique per chunk (same plaintext encrypts differently)") {
    val kh = Encryption.registerEncryptionKey(Encryption.generateEncryptionKey())
    val p = "same bytes".getBytes("UTF-8")
    val a = Encryption.encryptChunk(p, kh)
    val b = Encryption.encryptChunk(p, kh)
    assert(!a.sameElements(b))
    assert(Encryption.decryptChunk(a, kh).sameElements(p))
    assert(Encryption.decryptChunk(b, kh).sameElements(p))
  }

  test("column-level encrypt/decrypt roundtrip on a binary column") {
    val sp = spark
    import sp.implicits._
    val kh = Encryption.registerEncryptionKey(Encryption.generateEncryptionKey())
    val df = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("id", "s").select(col("id"), col("s").cast("binary").as("media"))
    val enc = df.select(col("id"), Encryption.encryptColumn(col("media"), kh).as("media"))
    val back = enc.select(col("id"),
      Encryption.decryptColumn(col("media"), kh).cast("string").as("s"))
    assert(collectSet(back) == Set(Seq(1L, "alpha"), Seq(2L, "beta"), Seq(3L, "gamma")))
  }
}
