package graft.crypto

import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

import org.apache.hadoop.conf.Configuration

/** Parquet Modular Encryption for graft tables (the reference's
  * crates/iceberg/src/encryption subsystem re-expressed over parquet-mr's
  * built-in PME: PropertiesDrivenCryptoFactory + the KeyToolkit envelope
  * scheme, which Spark's parquet reader/writer honor natively through
  * hadoop conf).
  *
  * Table properties:
  *   - `encryption.master-keys`   "keyId:base64Key[,keyId2:...]" (16/24/32
  *     byte AES keys) — REQUIRED to enable encryption
  *   - `encryption.footer-key-id` master key for footer + default columns
  *     (defaults to the first listed key)
  *   - `encryption.column-keys`   optional parquet-format per-column map
  *     "keyId:colA,colB;keyId2:colC"; without it the table is uniformly
  *     encrypted under the footer key
  *   - `encryption.plaintext-footer` "true" → footer readable without keys
  *     (column data still encrypted)
  *
  * DEK/KEK generation and footer key material live inside parquet-mr
  * (KeyToolkit double wrapping, key material stored in the footer); graft
  * supplies only the master-key KMS. [[LocalWrapKms]] is the local/dev
  * keyring holding master keys in the job conf — production deployments
  * point `parquet.encryption.kms.client.class` at their real KMS client
  * via the same property passthrough.
  */
object Encryption {

  val MasterKeysProp = "encryption.master-keys"
  val FooterKeyProp = "encryption.footer-key-id"
  val ColumnKeysProp = "encryption.column-keys"
  val PlaintextFooterProp = "encryption.plaintext-footer"

  /** Conf key LocalWrapKms reads its keyring from. */
  val KeyListConfKey = "graft.encryption.key.list"

  /** Parquet/hadoop conf entries to read or write this table's files;
    * empty for unencrypted tables. Safe to apply as Spark reader/writer
    * options or directly on a hadoop Configuration. */
  def confFor(properties: Map[String, String]): Map[String, String] =
    properties.get(MasterKeysProp) match {
      case None => Map.empty
      case Some(keys) =>
        val footerKey = properties.getOrElse(FooterKeyProp,
          keys.split(",").head.split(":").head.trim)
        val base = Map(
          "parquet.crypto.factory.class" ->
            "org.apache.parquet.crypto.keytools.PropertiesDrivenCryptoFactory",
          "parquet.encryption.kms.client.class" -> classOf[LocalWrapKms].getName,
          KeyListConfKey -> keys)
        val keying = properties.get(ColumnKeysProp) match {
          case Some(ck) => Map(
            "parquet.encryption.footer.key" -> footerKey,
            "parquet.encryption.column.keys" -> ck)
          case None => Map("parquet.encryption.uniform.key" -> footerKey)
        }
        val footerMode = properties.get(PlaintextFooterProp)
          .map("parquet.encryption.plaintext.footer" -> _)
        base ++ keying ++ footerMode
    }

  def enabled(properties: Map[String, String]): Boolean =
    properties.contains(MasterKeysProp)

  /** Apply the entries onto a hadoop Configuration (reader factories,
    * footer harvests). */
  def applyTo(conf: Configuration, properties: Map[String, String]): Configuration = {
    confFor(properties).foreach { case (k, v) => conf.set(k, v) }
    conf
  }
}

/** Master-key KMS backed by the job configuration — the local/dev keyring
  * (same role as parquet's test InMemoryKMS). KEKs arrive from parquet's
  * KeyToolkit; we AES-GCM wrap them under the named master key. */
final class LocalWrapKms extends org.apache.parquet.crypto.keytools.KmsClient {

  private var masterKeys: Map[String, Array[Byte]] = Map.empty

  override def initialize(conf: Configuration, kmsInstanceID: String,
      kmsInstanceURL: String, accessToken: String): Unit = {
    val list = Option(conf.getTrimmed(Encryption.KeyListConfKey)).getOrElse(
      throw new IllegalStateException(
        s"${Encryption.KeyListConfKey} unset: no master keys available"))
    masterKeys = list.split(",").map { e =>
      val Array(id, b64) = e.trim.split(":", 2)
      id -> java.util.Base64.getDecoder.decode(b64)
    }.toMap
  }

  private def key(id: String): SecretKeySpec =
    new SecretKeySpec(masterKeys.getOrElse(id,
      throw new org.apache.parquet.crypto.KeyAccessDeniedException(
        s"unknown master key: $id")), "AES")

  override def wrapKey(keyBytes: Array[Byte], masterKeyIdentifier: String): String = {
    val iv = new Array[Byte](12)
    new java.security.SecureRandom().nextBytes(iv)
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.ENCRYPT_MODE, key(masterKeyIdentifier),
      new GCMParameterSpec(128, iv))
    java.util.Base64.getEncoder.encodeToString(iv ++ cipher.doFinal(keyBytes))
  }

  override def unwrapKey(wrappedKey: String, masterKeyIdentifier: String): Array[Byte] = {
    val all = java.util.Base64.getDecoder.decode(wrappedKey)
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.DECRYPT_MODE, key(masterKeyIdentifier),
      new GCMParameterSpec(128, all.take(12)))
    cipher.doFinal(all.drop(12))
  }
}
