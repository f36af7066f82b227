package graft.store

import java.util.zip.Inflater

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Encryption
import graft.model.{DatasetDescriptor, TimeSpan}
import graft.sources.zarr.ZarrCodec

/** W12 — chunk-level store encryption, the reference's defining use of its
  * XChaCha20-Poly1305 codec: `EncryptionFilter` injected into the data
  * array's zarr filter chain (metadata.py:862-868, encryption.py:81-139),
  * system-tested as store roundtrip + wrong-key failure
  * (tests/system/test_chirps_encryption.py). Covers the v2
  * reference-format filter, the v3 codec-chain form composed with
  * sharding + crc32c, update-keeps-encryption, rechunk, and the failure
  * modes (unregistered hash named; wrong key / tamper = AEAD failure,
  * never wrong cells). */
class ZarrEncryptionSpec extends SparkSpec {

  private val desc = DatasetDescriptor("enc_grid", "value",
    spatialDims = Seq("latitude", "longitude"), timeResolution = TimeSpan.Daily)

  private def fresh(tag: String): String = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_zarrenc_$tag"
    GridStore.fileSystem(spark, path).delete(new HPath(path), true)
    path
  }

  private def registeredHash(): String =
    Encryption.registerEncryptionKey(Encryption.generateEncryptionKey())

  private def readFile(path: String): Array[Byte] = {
    val p = new HPath(path)
    val fs = GridStore.fileSystem(spark, path)
    val in = fs.open(p)
    try in.readAllBytes() finally in.close()
  }

  private def writeFile(path: String, bytes: Array[Byte]): Unit = {
    val fs = GridStore.fileSystem(spark, path)
    val out = fs.create(new HPath(path), true)
    try out.write(bytes) finally out.close()
  }

  /** Rewrite the declared key hash in BOTH metadata copies (the per-array
    * `.zarray` and the consolidated `.zmetadata` the scan prefers). */
  private def patchHash(root: String, from: String, to: String): Unit =
    Seq(s"$root/value/.zarray", s"$root/.zmetadata").foreach { f =>
      writeFile(f, new String(readFile(f), "UTF-8").replace(from, to).getBytes("UTF-8"))
    }

  private def inflateAll(buf: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(buf)
    val out = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!inf.finished()) out.write(tmp, 0, inf.inflate(tmp))
    inf.end()
    out.toByteArray
  }

  test("v2 encrypted store: reference filter format on disk, full lifecycle roundtrip") {
    val kh = registeredHash()
    val path = fresh("v2life")
    val store = new ZarrStore(spark, path, desc, timeChunk = 8,
      encryptionKeyHash = Some(kh))
    store.publish(dailyGrid(1, 10))
    // append (tail butt-join) + insert through a NEW handle that does NOT
    // pass the key hash — the persisted filter chain must carry it
    val reopened = new ZarrStore(spark, path, desc, timeChunk = 8)
    reopened.publish(dailyGrid(11, 10, base = 100.0))
    reopened.publish(dailyGrid(9, 3, base = 1000.0))
    // last write wins: days 1-8 initial, 9-11 from the insert, 12-20 append
    val expect = dailyGrid(1, 8)
      .unionByName(dailyGrid(9, 3, base = 1000.0))
      .unionByName(dailyGrid(11, 10, base = 100.0)
        .filter(col("time") >= ts("2024-01-12T00:00:00")))
    assert(collectSet(reopened.dataset()
      .select("time", "latitude", "longitude", "value")) == collectSet(expect))

    // on-disk filter declaration is the reference's serialized numcodecs
    // config: {"id": "xchacha20poly1305", "key_hash": <hash>}
    val zarray = new String(readFile(s"$path/value/.zarray"), "UTF-8")
    assert(zarray.contains("\"id\": \"xchacha20poly1305\"") ||
      zarray.contains("\"id\":\"xchacha20poly1305\""),
      s"filters must declare the reference codec id: $zarray")
    assert(zarray.contains(kh), "filters must carry the key hash, never the key")

    // chunk bytes are zlib(nonce||tag||ct): inflate yields the 40-byte
    // AEAD envelope over the raw chunk, not plaintext cells
    val rawLen = 8 * 2 * 2 * 8 // timeChunk x 2 x 2 cells, f8
    val enc = inflateAll(readFile(s"$path/value/0.0.0"))
    assert(enc.length == rawLen + 40, s"expected envelope, got ${enc.length}")
    // coordinates stay plain (reference encrypts the data var alone)
    val timeZarray = new String(readFile(s"$path/time/.zarray"), "UTF-8")
    assert(!timeZarray.contains("xchacha20poly1305"))
  }

  test("unregistered key hash fails loudly with the hash named") {
    val bogus = Encryption.keyHash(Array.fill[Byte](32)(7))
    val e = intercept[Encryption.MissingKeyError] {
      new ZarrStore(spark, fresh("nokey"), desc, encryptionKeyHash = Some(bogus))
    }
    assert(e.getMessage.contains(bogus))

    // a persisted store whose filter names an unregistered hash refuses at
    // planning time, hash named — the "new runtime without the key" shape
    val kh = registeredHash()
    val path = fresh("nokey2")
    val store = new ZarrStore(spark, path, desc, timeChunk = 8,
      encryptionKeyHash = Some(kh))
    store.publish(dailyGrid(1, 4))
    patchHash(path, kh, bogus)
    val e2 = intercept[Exception] {
      new ZarrStore(spark, path, desc).dataset().collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e2).exists(_.getMessage != null) &&
      chain(e2).exists(c => c.getMessage != null && c.getMessage.contains(bogus)),
      s"failure must name the missing hash: $e2")
  }

  test("wrong key and tampered chunk fail as AEAD errors, never as wrong cells") {
    val kh = registeredHash()
    val otherKh = registeredHash()
    val path = fresh("wrongkey")
    val store = new ZarrStore(spark, path, desc, timeChunk = 8,
      encryptionKeyHash = Some(kh))
    store.publish(dailyGrid(1, 4))
    // swap the declared hash to a DIFFERENT registered key: decode runs
    // with the wrong key and the Poly1305 tag must refuse
    patchHash(path, kh, otherKh)
    val e = intercept[Exception] {
      new ZarrStore(spark, path, desc).dataset().select(sum("value")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(_.isInstanceOf[javax.crypto.AEADBadTagException]),
      s"wrong key must surface the AEAD tag failure: $e")

    // restore the right hash, flip one ciphertext byte → same refusal
    patchHash(path, otherKh, kh)
    val chunk = s"$path/value/0.0.0"
    val bytes = readFile(chunk)
    bytes(bytes.length - 1) = (bytes(bytes.length - 1) ^ 0x01).toByte
    writeFile(chunk, bytes)
    val e2 = intercept[Exception] {
      new ZarrStore(spark, path, desc).dataset().select(sum("value")).collect()
    }
    // the flipped byte trips whichever integrity layer sees it first —
    // zlib's adler32 or the Poly1305 tag — but never decodes to cells
    assert(chain(e2).exists(c => c.isInstanceOf[javax.crypto.AEADBadTagException] ||
      c.isInstanceOf[java.util.zip.DataFormatException] ||
      (c.getMessage != null && (c.getMessage.contains("Truncated") ||
        c.getMessage.contains("data check")))),
      s"tamper must fail loudly: $e2")
  }

  test("v3 encrypted store composes with sharding_indexed + crc32c") {
    val kh = registeredHash()
    val path = fresh("v3shard")
    val store = new ZarrStore(spark, path, desc, timeChunk = 8,
      spatialChunks = Some(Seq(2, 2)),
      codec = ZarrCodec.Crc32cCodec(ZarrCodec.ZstdCodec(3)),
      zarrFormat = 3, shardChunks = Some(Seq(4, 2, 2)),
      encryptionKeyHash = Some(kh))
    store.publish(dailyGrid(1, 10))
    val reopened = new ZarrStore(spark, path, desc, timeChunk = 8)
    reopened.publish(dailyGrid(11, 6, base = 100.0))
    val expect = dailyGrid(1, 10).unionByName(dailyGrid(11, 6, base = 100.0))
    assert(collectSet(reopened.dataset()
      .select("time", "latitude", "longitude", "value")) == collectSet(expect))
    // codec chain order pinned: ... -> zstd -> xchacha20poly1305 -> crc32c
    val doc = new String(readFile(s"$path/value/zarr.json"), "UTF-8")
    val iZstd = doc.indexOf("zstd")
    val iEnc = doc.indexOf("xchacha20poly1305")
    val iCrc = doc.indexOf("crc32c", iEnc) // the chain's crc32c, not the index's
    assert(iZstd >= 0 && iEnc > iZstd && iCrc > iEnc,
      s"chain must be compress->encrypt->crc32c: $doc")
    assert(doc.contains(kh))
  }

  test("rechunk carries values through encryption changes (add, keep, rotate)") {
    val kh = registeredHash()
    val kh2 = registeredHash()
    val src = new ZarrStore(spark, fresh("rcsrc"), desc, timeChunk = 8,
      encryptionKeyHash = Some(kh))
    src.publish(dailyGrid(1, 12))
    // encrypted v2 -> encrypted (rotated key) v3 sharded zstd
    val dst = StoreConvert.rechunkZarr(src, fresh("rcdst"),
      timeChunk = 4, spatialChunks = Some(Seq(2, 2)),
      codec = ZarrCodec.Crc32cCodec(ZarrCodec.ZstdCodec(3)),
      zarrFormat = 3, shardChunks = Some(Seq(4, 2, 2)),
      encryptionKeyHash = Some(kh2))
    assert(collectSet(dst.dataset().select("time", "latitude", "longitude", "value"))
      == collectSet(dailyGrid(1, 12)))
    val doc = new String(readFile(s"${dst.path}/value/zarr.json"), "UTF-8")
    assert(doc.contains(kh2) && !doc.contains(kh), "rotation must persist the new hash")
    // and encrypted -> plain drops the codec entirely
    val plain = StoreConvert.rechunkZarr(src, fresh("rcplain"), timeChunk = 4)
    assert(collectSet(plain.dataset().select("time", "latitude", "longitude", "value"))
      == collectSet(dailyGrid(1, 12)))
    assert(!new String(readFile(s"${plain.path}/value/.zarray"), "UTF-8")
      .contains("xchacha20poly1305"))
  }

  test("a constructor key that contradicts the persisted profile fails " +
      "with both named (ADVICE r8) and points at rechunkZarr") {
    def grid(days: Int) = dailyGrid(1, days)
    // plaintext store + stray key on update
    val plainPath = fresh("mismatchplain")
    new ZarrStore(spark, plainPath, desc, timeChunk = 8).publish(grid(4))
    val kh = registeredHash()
    val e1 = intercept[IllegalStateException] {
      new ZarrStore(spark, plainPath, desc, timeChunk = 8,
        encryptionKeyHash = Some(kh)).publish(dailyGrid(5, 2))
    }
    assert(e1.getMessage.contains(kh) && e1.getMessage.contains("not encrypted")
      && e1.getMessage.contains("rechunkZarr"), e1.getMessage)
    // encrypted store + different key on rebuild (zarr reuses the
    // persisted array doc, so even a rebuild refuses — rechunk re-keys)
    val kh2 = registeredHash()
    val encPath = fresh("mismatchenc")
    new ZarrStore(spark, encPath, desc, timeChunk = 8,
      encryptionKeyHash = Some(kh)).publish(grid(4))
    val e2 = intercept[IllegalStateException] {
      new ZarrStore(spark, encPath, desc, timeChunk = 8,
        encryptionKeyHash = Some(kh2)).publish(grid(4), rebuild = true)
    }
    assert(e2.getMessage.contains(kh) && e2.getMessage.contains(kh2), e2.getMessage)
    // the matching key is of course still fine
    new ZarrStore(spark, encPath, desc, timeChunk = 8,
      encryptionKeyHash = Some(kh)).publish(dailyGrid(5, 2))
    assert(new ZarrStore(spark, encPath, desc).dataset().count() == 6 * 4)
  }

  test("keyless rebuild of an encrypted store keeps the persisted profile " +
      "(ADVICE r9: never a silent decrypt)") {
    val kh = registeredHash()
    val path = fresh("keylessrebuild")
    new ZarrStore(spark, path, desc, timeChunk = 8,
      encryptionKeyHash = Some(kh)).publish(dailyGrid(1, 6))
    // rebuild through a KEYLESS handle: the persisted array document must
    // carry over — pre-fix, writeInitial deleted the array doc before
    // reading it and rebuilt a PLAINTEXT profile from the absent document
    new ZarrStore(spark, path, desc, timeChunk = 8)
      .publish(dailyGrid(1, 8), rebuild = true)
    val zarray = new String(readFile(s"$path/value/.zarray"), "UTF-8")
    assert(zarray.contains("xchacha20poly1305") && zarray.contains(kh),
      s"rebuild must keep the persisted encryption profile: $zarray")
    // chunk bytes still carry the 40-byte AEAD envelope, not plaintext
    val rawLen = 8 * 2 * 2 * 8
    assert(inflateAll(readFile(s"$path/value/0.0.0")).length == rawLen + 40)
    assert(new ZarrStore(spark, path, desc).dataset().count() == 8 * 4)
  }

  test("reads enforce the persisted profile: a contradicting handle " +
      "refuses on dataset() too (ADVICE r9 GridStore symmetry)") {
    val kh = registeredHash()
    val other = registeredHash()
    val path = fresh("readguard")
    new ZarrStore(spark, path, desc, timeChunk = 8,
      encryptionKeyHash = Some(kh)).publish(dailyGrid(1, 4))
    val e = intercept[IllegalStateException] {
      new ZarrStore(spark, path, desc, encryptionKeyHash = Some(other)).dataset()
    }
    assert(e.getMessage.contains(kh) && e.getMessage.contains(other), e.getMessage)
    // plaintext store + stray key on read refuses the same way
    val plain = fresh("readguardplain")
    new ZarrStore(spark, plain, desc, timeChunk = 8).publish(dailyGrid(1, 4))
    val e2 = intercept[IllegalStateException] {
      new ZarrStore(spark, plain, desc, encryptionKeyHash = Some(other))
        .readRange(ts("2024-01-01T00:00:00"), ts("2024-01-04T00:00:00"))
    }
    assert(e2.getMessage.contains(other) &&
      e2.getMessage.contains("not encrypted"), e2.getMessage)
    // the matching key still reads
    assert(new ZarrStore(spark, path, desc, encryptionKeyHash = Some(kh))
      .dataset().count() == 4 * 4)
  }

  test("roundtrip through the raw codec primitives matches the reference layout") {
    val kh = registeredHash()
    val plain = Array.tabulate[Byte](1024)(i => (i * 31).toByte)
    val enc = Encryption.encryptChunk(plain, kh)
    // nonce(24) || tag(16) || ct — ct is same length as plaintext for a
    // stream cipher, so the envelope is exactly 40 bytes
    assert(enc.length == plain.length + 40)
    assert(Encryption.decryptChunk(enc, kh).sameElements(plain))
    // v3 codec object composes the same primitive after the inner codec
    val codec = ZarrCodec.EncryptionCodec(ZarrCodec.ZlibCodec(1), kh)
    val roundtrip = codec.decode(codec.encode(plain), plain.length)
    assert(roundtrip.sameElements(plain))
  }
}
