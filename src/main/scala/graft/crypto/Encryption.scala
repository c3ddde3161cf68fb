package graft.crypto

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

  /** Conf prefix carrying the table's encryption.* properties to the
    * parquet-side KMS bridge (executors see only the hadoop conf). */
  val PropConfPrefix = "graft.encryption.prop."

  /** Parquet/hadoop conf entries to read or write this table's files;
    * empty for unencrypted tables. Safe to apply as Spark reader/writer
    * options or directly on a hadoop Configuration. */
  def confFor(properties: Map[String, String]): Map[String, String] =
    properties.get(MasterKeysProp) match {
      case None => Map.empty
      case Some(keys) =>
        val footerKey = properties.getOrElse(FooterKeyProp,
          keys.split(",").head.split(":").head.trim)
        // a custom KMS factory (encryption.kms-impl) rides along so the
        // parquet bridge resolves the same client as the metadata layer
        val kmsPassthrough = properties.view
          .filterKeys(_.startsWith("encryption."))
          .map { case (k, v) => s"$PropConfPrefix$k" -> v }.toMap
        val base = Map(
          "parquet.crypto.factory.class" ->
            "org.apache.parquet.crypto.keytools.PropertiesDrivenCryptoFactory",
          "parquet.encryption.kms.client.class" -> classOf[LocalWrapKms].getName,
          KeyListConfKey -> keys) ++ kmsPassthrough
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

/** Parquet-side KMS bridge (parquet-mr KmsClient): delegates master-key
  * wrap/unwrap to the [[KmsClient]] the table's properties resolve —
  * custom factory via `encryption.kms-impl` (carried through the conf by
  * [[Encryption.PropConfPrefix]]) or the local keyring from the conf's
  * key list (byte-identical to the pre-seam inline AES-GCM wrap, so
  * existing encrypted files keep reading). KEKs arrive from parquet's
  * KeyToolkit; only the outermost wrap crosses this boundary. */
final class LocalWrapKms extends org.apache.parquet.crypto.keytools.KmsClient {

  private var delegate: KmsClient = _

  override def initialize(conf: Configuration, kmsInstanceID: String,
      kmsInstanceURL: String, accessToken: String): Unit = {
    val props = {
      val b = Map.newBuilder[String, String]
      conf.iterator().forEachRemaining { e =>
        if (e.getKey.startsWith(Encryption.PropConfPrefix))
          b += e.getKey.substring(Encryption.PropConfPrefix.length) -> e.getValue
      }
      Option(conf.getTrimmed(Encryption.KeyListConfKey))
        .foreach(list => b += Encryption.MasterKeysProp -> list)
      b.result()
    }
    if (!props.contains(Encryption.MasterKeysProp) && !props.contains(Kms.KmsImplProp))
      throw new IllegalStateException(
        s"${Encryption.KeyListConfKey} unset: no master keys available")
    delegate = Kms.clientFor(props)
  }

  override def wrapKey(keyBytes: Array[Byte], masterKeyIdentifier: String): String =
    java.util.Base64.getEncoder.encodeToString(
      try delegate.wrapKey(keyBytes, masterKeyIdentifier)
      catch { case e: IllegalArgumentException =>
        throw new org.apache.parquet.crypto.KeyAccessDeniedException(e.getMessage)
      })

  override def unwrapKey(wrappedKey: String, masterKeyIdentifier: String): Array[Byte] =
    try delegate.unwrapKey(
      java.util.Base64.getDecoder.decode(wrappedKey), masterKeyIdentifier)
    catch { case e: IllegalArgumentException =>
      throw new org.apache.parquet.crypto.KeyAccessDeniedException(e.getMessage)
    }
}
