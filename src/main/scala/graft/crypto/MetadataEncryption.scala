package graft.crypto

import java.security.SecureRandom

import graft.spec.{EncryptedKey, Snapshot, TableMetadata}

/** Envelope key management for AGS1-encrypted metadata files — the
  * reference's EncryptionManager (encryption/manager.rs) over the v3
  * table-metadata key registry:
  *
  *   - each manifest gets a fresh DEK; its [[StandardKeyMetadata]] rides
  *     the manifest-list entry `key_metadata` column (inside the
  *     encrypted list, so DEKs are never exposed in plaintext files);
  *   - the manifest LIST's key metadata is AES-GCM-wrapped by a KEK and
  *     stored in `encryption-keys`; the snapshot records the wrapped
  *     entry's id as `key-id` (snapshot.rs:112);
  *   - the KEK is wrapped by the master key named by table property
  *     `encryption.key-id` and stored in `encryption-keys` with a
  *     `KEY_TIMESTAMP` property (manager.rs:49); the timestamp doubles
  *     as the wrap AAD so it cannot be tampered to dodge rotation, and
  *     KEKs older than 730 days (NIST SP 800-57) are rotated.
  *
  * The master key never touches this module: wrap/unwrap of the KEK is
  * delegated to the [[KmsClient]] resolved by [[Kms.clientFor]] — the
  * local keyring by default, or any [[KmsClientFactory]] named in
  * `encryption.kms-impl` (the reference's kms/factory.rs seam), so
  * production swaps in a real KMS without touching the envelope layout.
  * A KMS that supports server-side generation gets the KEK generated
  * atomically (generate_key, client.rs:73) instead of wrap-after-random. */
object MetadataEncryption {

  val KeyIdProp = "encryption.key-id"
  val DataKeyLengthProp = "encryption.data-key-length"
  val KekTimestampProp = "KEY_TIMESTAMP" // manager.rs KEK_CREATED_AT_PROPERTY
  val KekLifespanMs: Long = 730L * 24 * 60 * 60 * 1000
  val AadPrefixLength = 16 // manager.rs AAD_PREFIX_LENGTH

  private val rng = new SecureRandom()

  /** Unwrapped-KEK cache (manager.rs DEFAULT_CACHE_TTL: 1 h TTL on
    * `kek_cache`): one KMS round-trip per KEK per hour instead of one
    * per snapshot-key resolution. Keyed by (KEK id, encryption
    * properties) — STRICTER than the reference's id-only key: dropping
    * or rotating the keyring/KMS config misses immediately instead of
    * serving a stale unwrap for up to the TTL. Expiry sweep on insert
    * bounds the size. */
  private val KekCacheTtlMs = 3600L * 1000
  private type KekKey = (String, Map[String, String])
  private val kekCache =
    scala.collection.concurrent.TrieMap[KekKey, (Long, Array[Byte])]()

  private def unwrapKekCached(md: TableMetadata, kek: EncryptedKey,
      masterKeyId: String): Array[Byte] = {
    val now = System.currentTimeMillis()
    val key: KekKey = (kek.keyId,
      md.properties.filter { case (k, _) => k.startsWith("encryption.") })
    kekCache.get(key).filter(now - _._1 < KekCacheTtlMs) match {
      case Some((_, bytes)) => bytes
      case None =>
        val bytes = Kms.clientFor(md.properties)
          .unwrapKey(kek.encryptedKeyMetadata, masterKeyId)
        kekCache.filterInPlace { case (_, (ts, _)) => now - ts < KekCacheTtlMs }
        kekCache.put(key, (now, bytes))
        bytes
    }
  }

  /** Test/ops hook: drop all cached unwrapped KEKs immediately. */
  def invalidateKekCache(): Unit = kekCache.clear()

  def enabled(md: TableMetadata): Boolean =
    md.properties.contains(KeyIdProp) && {
      // refuse silently-unencrypted v2 tables: the key registry and
      // snapshot key-id are v3 metadata surfaces
      require(md.formatVersion >= 3,
        s"$KeyIdProp requires format-version >= 3 (table is v${md.formatVersion})")
      true
    }

  private def randomBytes(n: Int): Array[Byte] = {
    val a = new Array[Byte](n)
    rng.synchronized(rng.nextBytes(a))
    a
  }

  private def dekLength(md: TableMetadata): Int = {
    val n = md.properties.get(DataKeyLengthProp).map(_.toInt).getOrElse(16)
    require(Set(16, 24, 32).contains(n),
      s"$DataKeyLengthProp must be 16, 24 or 32: $n")
    n
  }

  /** Fresh per-file key metadata: random DEK + random 16-byte AAD
    * prefix (manager.rs:153-158). */
  def newFileKey(md: TableMetadata): StandardKeyMetadata =
    StandardKeyMetadata(randomBytes(dekLength(md)),
      aadPrefix = Some(randomBytes(AadPrefixLength)))

  private def kekIsActive(md: TableMetadata, nowMs: Long)(k: EncryptedKey): Boolean =
    k.encryptedById.contains(md.properties(KeyIdProp)) &&
      k.properties.get(KekTimestampProp).flatMap(_.toLongOption)
        .exists(ts => nowMs - ts < KekLifespanMs)

  /** Wrap the manifest-list key metadata for the registry. Returns the
    * wrapped entry's id (→ snapshot `key-id`) and the FULL key list to
    * store in metadata (existing ++ any new KEK ++ the wrapped entry). */
  def wrapListKey(md: TableMetadata, listMeta: StandardKeyMetadata)
      : (String, Seq[EncryptedKey]) = {
    val nowMs = System.currentTimeMillis()
    val masterKeyId = md.properties(KeyIdProp)
    val kms = Kms.clientFor(md.properties)
    val (kek, kekBytes, withKek) =
      md.encryptionKeys.filter(kekIsActive(md, nowMs))
        .sortBy(_.properties(KekTimestampProp).toLong).lastOption match {
        case Some(existing) =>
          (existing, kms.unwrapKey(existing.encryptedKeyMetadata, masterKeyId),
            md.encryptionKeys)
        case None =>
          val (bytes, wrappedBytes) =
            if (kms.supportsKeyGeneration) {
              val g = kms.generateKey(masterKeyId)
              (g.key, g.wrappedKey)
            } else {
              val b = randomBytes(dekLength(md))
              (b, kms.wrapKey(b, masterKeyId))
            }
          val fresh = EncryptedKey(
            keyId = java.util.UUID.randomUUID().toString,
            encryptedKeyMetadata = wrappedBytes,
            encryptedById = Some(masterKeyId),
            properties = Map(KekTimestampProp -> nowMs.toString))
          (fresh, bytes, md.encryptionKeys :+ fresh)
      }
    // KEK timestamp as wrap AAD (manager.rs:179-181)
    val aad = kek.properties(KekTimestampProp).getBytes("UTF-8")
    val wrapped = EncryptedKey(
      keyId = java.util.UUID.randomUUID().toString,
      encryptedKeyMetadata =
        AesGcmWrap.encrypt(kekBytes, listMeta.encode, Some(aad)),
      encryptedById = Some(kek.keyId))
    (wrapped.keyId, withKek :+ wrapped)
  }

  /** Resolve a snapshot's manifest-list key metadata through the
    * registry chain: snapshot key-id → wrapped entry → KEK → master
    * key (manager.rs:196-232). None when the snapshot is unencrypted. */
  def listKeyFor(md: TableMetadata, snap: Snapshot): Option[Array[Byte]] =
    snap.keyId.map { id =>
      val wrapped = md.encryptionKeyById(id).getOrElse(
        throw new IllegalArgumentException(s"encryption key '$id' not found"))
      val kekId = wrapped.encryptedById.getOrElse(
        throw new IllegalArgumentException(s"key '$id' has no encrypted-by-id"))
      val kek = md.encryptionKeyById(kekId).getOrElse(
        throw new IllegalArgumentException(s"KEK '$kekId' not found"))
      val masterKeyId = kek.encryptedById.getOrElse(
        throw new IllegalArgumentException(s"KEK '$kekId' has no encrypted-by-id"))
      val kekBytes = unwrapKekCached(md, kek, masterKeyId)
      val aad = kek.properties.get(KekTimestampProp).map(_.getBytes("UTF-8"))
        .getOrElse(throw new IllegalArgumentException(
          s"KEK '$kekId' missing $KekTimestampProp"))
      AesGcmWrap.decrypt(kekBytes, wrapped.encryptedKeyMetadata, Some(aad))
    }
}
