package graft.crypto

import scala.collection.concurrent.TrieMap

/** Result of a server-side key generation (reference
  * encryption/kms/client.rs GeneratedKey): the plaintext key plus the
  * KMS-wrapped form, produced atomically so the plaintext never has to
  * round-trip through a local wrap. */
final case class GeneratedKey(key: Array[Byte], wrappedKey: Array[Byte])

/** Pluggable key-management client — the reference's KeyManagementClient
  * trait (encryption/kms/client.rs:56, mirroring the Java
  * `KeyManagementClient` interface). Implementations talk to AWS KMS,
  * Azure Key Vault, Vault, … ; the engine only ever hands them key BYTES
  * and a wrapping-key id, never key semantics. */
trait KmsClient {
  /** Wrap (encrypt) `key` under the KMS-managed `wrappingKeyId`. */
  def wrapKey(key: Array[Byte], wrappingKeyId: String): Array[Byte]

  /** Unwrap a previously wrapped key. */
  def unwrapKey(wrappedKey: Array[Byte], wrappingKeyId: String): Array[Byte]

  /** Whether [[generateKey]] is available (client.rs:68). */
  def supportsKeyGeneration: Boolean = false

  /** Generate + wrap a fresh key server-side (client.rs:73). */
  def generateKey(wrappingKeyId: String): GeneratedKey =
    throw new UnsupportedOperationException(
      "this KMS does not support server-side key generation")
}

/** Factory creating a [[KmsClient]] from table/catalog properties — the
  * reference's KmsClientFactory (encryption/kms/factory.rs:41), which
  * itself replaces Java's reflection-based `encryption.kms-impl` +
  * `initialize(properties)` pattern. This engine supports BOTH entries:
  * implement this trait and name the factory class in the
  * `encryption.kms-impl` table property. */
trait KmsClientFactory {
  def createKmsClient(properties: Map[String, String]): KmsClient
}

object Kms {
  /** Table property naming a [[KmsClientFactory]] implementation class
    * (no-arg constructor). Absent → the local keyring default. */
  val KmsImplProp = "encryption.kms-impl"

  // one client per (factory, encryption-properties) — factory.rs: "called
  // once during catalog initialization", shared across that scope
  private val clients = TrieMap[(String, Map[String, String]), KmsClient]()

  /** Resolve the KMS client for a table's properties: the factory named
    * by `encryption.kms-impl`, or [[LocalKeyringKmsFactory]] (the
    * dev/test keyring over `encryption.master-keys`) when unset. */
  def clientFor(properties: Map[String, String]): KmsClient = {
    val impl = properties.getOrElse(KmsImplProp, classOf[LocalKeyringKmsFactory].getName)
    val encProps = properties.filter { case (k, _) => k.startsWith("encryption.") }
    clients.getOrElseUpdate((impl, encProps), {
      val factory =
        try Class.forName(impl).getDeclaredConstructor().newInstance()
          .asInstanceOf[KmsClientFactory]
        catch {
          case e: ClassCastException => throw new IllegalArgumentException(
            s"$KmsImplProp class $impl does not implement KmsClientFactory", e)
          case e: ReflectiveOperationException => throw new IllegalArgumentException(
            s"cannot instantiate $KmsImplProp class $impl", e)
        }
      factory.createKmsClient(encProps)
    })
  }
}

/** Default factory: the local keyring. */
final class LocalKeyringKmsFactory extends KmsClientFactory {
  override def createKmsClient(properties: Map[String, String]): KmsClient =
    new LocalKeyringKms(properties)
}

/** Local/dev KMS over the `encryption.master-keys` keyring property
  * ("id:base64Key[,id2:...]"), wrapping with AES-GCM (12-byte nonce ‖
  * ciphertext‖tag — byte-identical to the pre-seam inline wrap, so
  * registries written before the factory existed still unwrap). */
final class LocalKeyringKms(properties: Map[String, String]) extends KmsClient {

  private lazy val ring: Map[String, Array[Byte]] =
    properties.get(Encryption.MasterKeysProp) match {
      case None => throw new IllegalStateException(
        s"no ${Encryption.MasterKeysProp} keyring and no ${Kms.KmsImplProp} KMS")
      case Some(list) => list.split(",").map { e =>
        val Array(id, b64) = e.trim.split(":", 2)
        id -> java.util.Base64.getDecoder.decode(b64)
      }.toMap
    }

  private def key(id: String): Array[Byte] =
    ring.getOrElse(id, throw new IllegalArgumentException(s"unknown master key: $id"))

  override def wrapKey(k: Array[Byte], wrappingKeyId: String): Array[Byte] =
    AesGcmWrap.encrypt(key(wrappingKeyId), k)

  override def unwrapKey(wrapped: Array[Byte], wrappingKeyId: String): Array[Byte] =
    AesGcmWrap.decrypt(key(wrappingKeyId), wrapped)
}
