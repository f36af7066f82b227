package graft.functions

import java.security.{MessageDigest, SecureRandom}
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** W12 — XChaCha20-Poly1305 chunk encryption with a key-by-hash registry,
  * the Spark re-expression of the reference's Zarr encryption filter
  * (gridded_etl_tools/utils/encryption.py:31-139).
  *
  * Semantics mirrored: keys are 32-byte hex strings; the runtime registry
  * maps SHA3-256(key) → key so stored data references keys only by hash;
  * the chunk layout is `nonce(24) ‖ tag(16) ‖ ciphertext`; an AAD header
  * binds ciphertexts to this codec.
  *
  * The JDK provides IETF ChaCha20-Poly1305 (12-byte nonce) only, so the
  * XChaCha extended-nonce variant is built the standard way (public
  * construction, draft-irtf-cfrg-xchacha): HChaCha20(key, nonce[0..16))
  * derives a subkey, and the IETF nonce is 4 zero bytes ‖ nonce[16..24).
  *
  * Crypto is inherently JVM library code, so the column API is a UDF pair —
  * the one deliberate exception to the no-UDF rule; it runs only on the
  * binary payload column, never on the hot relational path.
  */
object Encryption {

  final case class MissingKeyError(keyHash: String)
    extends RuntimeException(s"Cannot find encryption key with hash: $keyHash")

  /** AAD header binding ciphertext to this codec — the reference's exact
    * header bytes (encryption.py:98 `header = b"dClimate-Zarr"`), so chunks
    * this engine encrypts verify under the reference's filter and vice
    * versa. The header is part of the on-disk wire format, like a magic
    * number. */
  private val Header = "dClimate-Zarr".getBytes("US-ASCII")

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()

  /** Generate a random 32-byte key as hex (encryption.py:31-40). */
  def generateEncryptionKey(): String = {
    val b = new Array[Byte](32)
    new SecureRandom().nextBytes(b)
    toHex(b)
  }

  /** Register a key; returns its SHA3-256 hash, the only identifier that is
    * ever persisted (encryption.py:43-68). */
  def registerEncryptionKey(keyHex: String): String = {
    val key = fromHex(keyHex)
    require(key.length == 32, s"Key must be 32 bytes, got ${key.length}")
    val h = keyHash(key)
    registry.put(h, key)
    h
  }

  def keyHash(key: Array[Byte]): String =
    toHex(MessageDigest.getInstance("SHA3-256").digest(key))

  /** Drop a key from the runtime registry (rotation hygiene; the inverse
    * of [[registerEncryptionKey]]). Subsequent lookups of the hash fail
    * with the hash named. */
  def removeEncryptionKey(keyHash: String): Unit = registry.remove(keyHash)

  private def lookup(keyHash: String): Array[Byte] = {
    val k = registry.get(keyHash)
    if (k == null) throw MissingKeyError(keyHash)
    k
  }

  /** Resolve a registered key or fail with the hash named — the zarr
    * chunk codec resolves keys DRIVER-SIDE at planning time so the key
    * bytes ride in the task closure and executors never need the registry
    * (same closure model as [[encryptColumn]]). */
  private[graft] def requireKey(keyHash: String): Array[Byte] = lookup(keyHash)

  // ------------------------------------------------------------- primitives

  /** Encrypt one chunk: 24-byte random nonce ‖ 16-byte tag ‖ ciphertext
    * (encryption.py:111-120). */
  def encryptChunk(plain: Array[Byte], keyHash: String): Array[Byte] =
    encryptWithKey(plain, lookup(keyHash))

  private[graft] def encryptWithKey(plain: Array[Byte], key: Array[Byte]): Array[Byte] = {
    val nonce = new Array[Byte](24)
    new SecureRandom().nextBytes(nonce)
    val tagAndCt = xchacha(Cipher.ENCRYPT_MODE, key, nonce, plain)
    // JDK AEAD appends the tag AFTER the ciphertext; the reference stores it
    // before. Reorder to match the reference layout.
    val ct = java.util.Arrays.copyOfRange(tagAndCt, 0, tagAndCt.length - 16)
    val tag = java.util.Arrays.copyOfRange(tagAndCt, tagAndCt.length - 16, tagAndCt.length)
    nonce ++ tag ++ ct
  }

  /** Decrypt one chunk; throws AEADBadTagException on tamper or wrong key
    * (encryption.py:122-134). */
  def decryptChunk(buf: Array[Byte], keyHash: String): Array[Byte] =
    decryptWithKey(buf, lookup(keyHash))

  private[graft] def decryptWithKey(buf: Array[Byte], key: Array[Byte]): Array[Byte] = {
    require(buf.length >= 40, s"Encrypted chunk too short: ${buf.length}")
    val nonce = java.util.Arrays.copyOfRange(buf, 0, 24)
    val tag = java.util.Arrays.copyOfRange(buf, 24, 40)
    val ct = java.util.Arrays.copyOfRange(buf, 40, buf.length)
    xchacha(Cipher.DECRYPT_MODE, key, nonce, ct ++ tag)
  }

  private def xchacha(mode: Int, key: Array[Byte], nonce24: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val subkey = hchacha20(key, java.util.Arrays.copyOfRange(nonce24, 0, 16))
    val iv = new Array[Byte](12) // 4 zero bytes ++ nonce24[16..24)
    System.arraycopy(nonce24, 16, iv, 4, 8)
    val c = Cipher.getInstance("ChaCha20-Poly1305")
    c.init(mode, new SecretKeySpec(subkey, "ChaCha20"), new IvParameterSpec(iv))
    c.updateAAD(Header)
    c.doFinal(data)
  }

  /** HChaCha20 (draft-irtf-cfrg-xchacha §2.2): 20 ChaCha rounds over
    * (constants, key, 16-byte nonce), output = words 0-3 ++ 12-15, no
    * feed-forward. Pure public construction. */
  private[functions] def hchacha20(key: Array[Byte], nonce16: Array[Byte]): Array[Byte] = {
    def le32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    val st = new Array[Int](16)
    st(0) = 0x61707865; st(1) = 0x3320646e; st(2) = 0x79622d32; st(3) = 0x6b206574
    for (i <- 0 until 8) st(4 + i) = le32(key, i * 4)
    for (i <- 0 until 4) st(12 + i) = le32(nonce16, i * 4)
    @inline def rotl(x: Int, n: Int): Int = (x << n) | (x >>> (32 - n))
    @inline def qr(a: Int, b: Int, c: Int, d: Int): Unit = {
      st(a) += st(b); st(d) = rotl(st(d) ^ st(a), 16)
      st(c) += st(d); st(b) = rotl(st(b) ^ st(c), 12)
      st(a) += st(b); st(d) = rotl(st(d) ^ st(a), 8)
      st(c) += st(d); st(b) = rotl(st(b) ^ st(c), 7)
    }
    for (_ <- 0 until 10) {
      qr(0, 4, 8, 12); qr(1, 5, 9, 13); qr(2, 6, 10, 14); qr(3, 7, 11, 15)
      qr(0, 5, 10, 15); qr(1, 6, 11, 12); qr(2, 7, 8, 13); qr(3, 4, 9, 14)
    }
    val out = new Array[Byte](32)
    def putLe32(v: Int, off: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    for (i <- 0 until 4) putLe32(st(i), i * 4)
    for (i <- 0 until 4) putLe32(st(12 + i), 16 + i * 4)
    out
  }

  // ---------------------------------------------------------------- columns

  /** Encrypt a binary column. The key hash is resolved through the runtime
    * registry ON THE DRIVER at column-construction time and the key bytes
    * ride in the task closure — executors never need the registry (the
    * reference gets the same effect from each dask worker importing the
    * registry module). Persisted data carries only the hash. */
  def encryptColumn(bin: Column, keyHashStr: String): Column = {
    val key = lookup(keyHashStr)
    val f = udf((b: Array[Byte]) => if (b == null) null else encryptWithKey(b, key))
    f(bin)
  }

  def decryptColumn(bin: Column, keyHashStr: String): Column = {
    val key = lookup(keyHashStr)
    val f = udf((b: Array[Byte]) => if (b == null) null else decryptWithKey(b, key))
    f(bin)
  }

  private def toHex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  private def fromHex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
}
