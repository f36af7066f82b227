package graft.store

import java.util.Base64

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.crypto.KeyAccessDeniedException
import org.apache.parquet.crypto.keytools.KmsClient

import graft.functions.Encryption

/** Parquet Modular Encryption KMS client backed by the engine's runtime
  * key registry — the parquet-native face of W12 (the reference's
  * encryption keys a user registers by hash, encryption.py:43-68, serve
  * both stores: [[ZarrStore]] wires them into the zarr chunk filter
  * chain; [[GridStore]] hands them to parquet-mr's modular encryption
  * through this client).
  *
  * The "master key identifier" IS the SHA3-256 key hash from
  * [[Encryption.registerEncryptionKey]]; data-encryption keys are wrapped
  * with XChaCha20-Poly1305 under the registered master key (layout
  * nonce ‖ tag ‖ ct, base64). An unregistered hash fails with the hash
  * named — parquet-mr surfaces it as KeyAccessDeniedException, never as
  * wrong rows. Instantiated reflectively by PropertiesDrivenCryptoFactory
  * (zero-arg constructor required).
  */
final class GraftKmsClient extends KmsClient {

  override def initialize(configuration: Configuration, kmsInstanceID: String,
      kmsInstanceURL: String, accessToken: String): Unit = ()

  override def wrapKey(keyBytes: Array[Byte], masterKeyIdentifier: String): String = {
    val master = resolve(masterKeyIdentifier)
    Base64.getEncoder.encodeToString(Encryption.encryptWithKey(keyBytes, master))
  }

  override def unwrapKey(wrappedKey: String, masterKeyIdentifier: String): Array[Byte] = {
    val master = resolve(masterKeyIdentifier)
    Encryption.decryptWithKey(Base64.getDecoder.decode(wrappedKey), master)
  }

  private def resolve(keyHash: String): Array[Byte] =
    try Encryption.requireKey(keyHash)
    catch {
      case Encryption.MissingKeyError(h) =>
        throw new KeyAccessDeniedException(
          s"Cannot find encryption key with hash: $h")
    }
}
