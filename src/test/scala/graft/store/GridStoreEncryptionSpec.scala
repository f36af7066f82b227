package graft.store

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Encryption
import graft.model.{DatasetDescriptor, TimeSpan}

/** W12, parquet-native: GridStore data files under Parquet Modular
  * Encryption with the registry-backed [[GraftKmsClient]] — footer +
  * every column keyed under the registered master key, hash persisted in
  * the attrs sidecar. Lifecycle roundtrip, on-disk evidence (encrypted
  * footer magic, keyless readers refused), missing-key named failure,
  * named failure when a constructor key contradicts the persisted
  * profile, and key adoption/rotation through a full rebuild (the one
  * path that rewrites every data file). */
class GridStoreEncryptionSpec extends SparkSpec {

  private val desc = DatasetDescriptor("enc_pq", "value",
    spatialDims = Seq("latitude", "longitude"), timeResolution = TimeSpan.Daily)

  private def fresh(tag: String): String = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_gsenc_$tag"
    GridStore.fileSystem(spark, path).delete(new HPath(path), true)
    path
  }

  private def registeredHash(): String =
    Encryption.registerEncryptionKey(Encryption.generateEncryptionKey())

  private def firstDataFile(path: String): HPath = {
    val fs = GridStore.fileSystem(spark, path)
    val it = fs.listFiles(new HPath(s"$path/data"), true)
    var found: HPath = null
    while (found == null && it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) found = f.getPath
    }
    assert(found != null, "no parquet data file written")
    found
  }

  test("encrypted lifecycle: publish, keyless-handle update, reopen, roundtrip") {
    val kh = registeredHash()
    val path = fresh("life")
    val store = new GridStore(spark, path, desc, encryptionKeyHash = Some(kh))
    store.publish(dailyGrid(1, 10))
    assert(store.readAttrs()(GridStore.EncryptionKeyHashAttr) == kh,
      "the hash (never the key) must be persisted in attrs")
    // update through a handle WITHOUT the key param — the persisted
    // profile must keep encrypting
    val reopened = new GridStore(spark, path, desc)
    reopened.publish(dailyGrid(11, 5, base = 100.0))
    val expect = dailyGrid(1, 10).unionByName(dailyGrid(11, 5, base = 100.0))
    assert(collectSet(reopened.dataset()
      .select("time", "latitude", "longitude", "value")) == collectSet(expect))
  }

  test("files carry the encrypted-footer magic and refuse keyless readers") {
    val kh = registeredHash()
    val path = fresh("magic")
    new GridStore(spark, path, desc, encryptionKeyHash = Some(kh))
      .publish(dailyGrid(1, 6))
    val f = firstDataFile(path)
    val fs = GridStore.fileSystem(spark, path)
    val len = fs.getFileStatus(f).getLen
    val head = new Array[Byte](4)
    val in = fs.open(f)
    try in.readFully(0, head) finally in.close()
    assert(new String(head, "US-ASCII") == "PARE",
      "encrypted-footer parquet files start with PARE, not PAR1")
    // a reader without the crypto factory cannot open the store
    val e = intercept[Exception] {
      spark.read.parquet(s"$path/data").collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ").toLowerCase
    assert(msgs.contains("encrypt") || msgs.contains("pare"), msgs)
    assert(len > 0)
  }

  test("an unregistered key fails with the hash named, never wrong rows") {
    val keyHex = Encryption.generateEncryptionKey()
    val kh = Encryption.registerEncryptionKey(keyHex)
    val path = fresh("nokey")
    new GridStore(spark, path, desc, encryptionKeyHash = Some(kh))
      .publish(dailyGrid(1, 4))
    Encryption.removeEncryptionKey(kh)
    try {
      val e = intercept[Exception] {
        new GridStore(spark, path, desc).dataset().select(sum("value")).collect()
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains(kh), s"failure must name the missing hash: $msgs")
    } finally Encryption.registerEncryptionKey(keyHex) // restore for other suites
  }

  private def footerMagic(path: String): String = {
    val f = firstDataFile(path)
    val fs = GridStore.fileSystem(spark, path)
    val head = new Array[Byte](4)
    val in = fs.open(f)
    try in.readFully(0, head) finally in.close()
    new String(head, "US-ASCII")
  }

  test("a stray constructor key on an existing plaintext store fails " +
      "with both named (ADVICE r8), and a full rebuild adopts it") {
    val path = fresh("plain")
    new GridStore(spark, path, desc).publish(dailyGrid(1, 4))
    val kh = registeredHash()
    // an update through the mismatched handle must NOT silently write
    // plaintext — the user asked for encryption
    val e = intercept[IllegalStateException] {
      new GridStore(spark, path, desc, encryptionKeyHash = Some(kh))
        .publish(dailyGrid(5, 2))
    }
    assert(e.getMessage.contains(kh) && e.getMessage.contains("not encrypted"),
      e.getMessage)
    // store untouched and still plaintext
    assert(footerMagic(path) == "PAR1")
    assert(new GridStore(spark, path, desc).dataset().count() == 4 * 4)
    // a full rebuild rewrites every data file, so it adopts the key
    new GridStore(spark, path, desc, encryptionKeyHash = Some(kh))
      .publish(dailyGrid(1, 6), rebuild = true)
    assert(footerMagic(path) == "PARE")
    val reopened = new GridStore(spark, path, desc)
    assert(reopened.readAttrs()(GridStore.EncryptionKeyHashAttr) == kh)
    assert(reopened.dataset().count() == 6 * 4)
  }

  test("key rotation by rebuild: the new key encrypts, the old is gone") {
    val kh1 = registeredHash()
    val path = fresh("rotate")
    new GridStore(spark, path, desc, encryptionKeyHash = Some(kh1))
      .publish(dailyGrid(1, 4))
    val kh2 = registeredHash()
    // an update under the wrong key fails with both hashes named
    val e = intercept[IllegalStateException] {
      new GridStore(spark, path, desc, encryptionKeyHash = Some(kh2))
        .publish(dailyGrid(5, 2))
    }
    assert(e.getMessage.contains(kh1) && e.getMessage.contains(kh2), e.getMessage)
    // rotation = rebuild under the new key
    new GridStore(spark, path, desc, encryptionKeyHash = Some(kh2))
      .publish(dailyGrid(1, 5), rebuild = true)
    val reopened = new GridStore(spark, path, desc)
    assert(reopened.readAttrs()(GridStore.EncryptionKeyHashAttr) == kh2)
    assert(reopened.dataset().count() == 5 * 4)
    // a keyless rebuild keeps the persisted profile — never a silent decrypt
    new GridStore(spark, path, desc).publish(dailyGrid(1, 3), rebuild = true)
    assert(new GridStore(spark, path, desc)
      .readAttrs()(GridStore.EncryptionKeyHashAttr) == kh2)
    assert(footerMagic(path) == "PARE")
  }

  test("a FAILED rotation rebuild leaves the old hash persisted (ADVICE " +
      "r9: attrs never advertise a key the files don't carry)") {
    val kh1 = registeredHash()
    val path = fresh("rotatecrash")
    new GridStore(spark, path, desc, encryptionKeyHash = Some(kh1))
      .publish(dailyGrid(1, 4))
    val kh2 = registeredHash()
    // crash-inject: the rebuild frame throws mid-write, after the handle
    // has already adopted kh2 in memory
    val boom = org.apache.spark.sql.functions.udf { (v: Double) =>
      if (v >= 0) throw new RuntimeException("injected write failure"); v
    }
    val failing = dailyGrid(1, 4).withColumn("value",
      boom(org.apache.spark.sql.functions.col("value")))
    intercept[Exception] {
      new GridStore(spark, path, desc, encryptionKeyHash = Some(kh2))
        .publish(failing, rebuild = true)
    }
    // pre-fix: the sidecar was patched to kh2 BEFORE the job ran, so a
    // later keyless update would encrypt new buckets under kh2 over kh1
    // files — a silent mixed-key store. Post-fix the old profile stands.
    val attrs = new GridStore(spark, path, desc).readAttrs()
    assert(attrs(GridStore.EncryptionKeyHashAttr) == kh1,
      s"failed rotation must keep the OLD hash: $attrs")
    assert(attrs(GridStore.UpdateInProgressKey) == "false")
    // retrying the rotation converges: the new key lands with the data
    new GridStore(spark, path, desc, encryptionKeyHash = Some(kh2))
      .publish(dailyGrid(1, 5), rebuild = true)
    val reopened = new GridStore(spark, path, desc)
    assert(reopened.readAttrs()(GridStore.EncryptionKeyHashAttr) == kh2)
    assert(reopened.dataset().count() == 5 * 4)
  }
}
