package graft.crypto

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.security.SecureRandom

import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

/** Single-shot AES-GCM wrap in the reference's layout
  * (crates/iceberg/src/encryption/crypto.rs:220-246):
  * `[12-byte nonce][ciphertext][16-byte tag]`, optional AAD. Used for
  * KEK-wrapping serialized key metadata and master-key-wrapping KEKs. */
object AesGcmWrap {

  val NonceLen = 12
  val TagLenBits = 128

  private val rng = new SecureRandom()

  def encrypt(key: Array[Byte], plain: Array[Byte],
      aad: Option[Array[Byte]] = None): Array[Byte] = {
    val nonce = new Array[Byte](NonceLen)
    rng.synchronized(rng.nextBytes(nonce))
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"),
      new GCMParameterSpec(TagLenBits, nonce))
    aad.foreach(c.updateAAD)
    nonce ++ c.doFinal(plain)
  }

  def decrypt(key: Array[Byte], cipher: Array[Byte],
      aad: Option[Array[Byte]] = None): Array[Byte] = {
    require(cipher.length >= NonceLen + TagLenBits / 8,
      s"ciphertext too short: ${cipher.length}")
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
      new GCMParameterSpec(TagLenBits, cipher.take(NonceLen)))
    aad.foreach(c.updateAAD)
    c.doFinal(cipher, NonceLen, cipher.length - NonceLen)
  }
}

/** The AGS1 block-based AES-GCM stream file format
  * (crates/iceberg/src/encryption/stream.rs; Java `Ciphers` /
  * AesGcmInputFile — the format Iceberg uses for encrypted metadata
  * files):
  *
  * {{{
  * magic "AGS1" (4) | plain block size u32 LE (4)
  * block 0: nonce (12) | ciphertext (<= block size) | tag (16)
  * ... final block may be shorter; empty plaintext = one empty block
  * }}}
  *
  * Per-block AAD is `aadPrefix || blockIndex (u32 LE)` so blocks cannot
  * be reordered or transplanted between files sharing a key. Whole-file
  * byte-array API: graft only AGS1-encrypts manifests and manifest
  * lists, which are MB-scale. */
object AgsStream {

  val PlainBlockSize: Int = 1024 * 1024
  val NonceLen = 12
  val TagLen = 16
  val CipherBlockSize: Int = PlainBlockSize + NonceLen + TagLen
  val Magic: Array[Byte] = "AGS1".getBytes("UTF-8")
  val HeaderLen = 8

  private val rng = new SecureRandom()

  private def blockAad(aadPrefix: Array[Byte], index: Int): Array[Byte] =
    aadPrefix ++ ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(index).array()

  def isAgs(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && java.util.Arrays.equals(bytes.take(4), Magic)

  def encrypt(plain: Array[Byte], key: Array[Byte],
      aadPrefix: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(HeaderLen + plain.length +
      (plain.length / PlainBlockSize + 1) * (NonceLen + TagLen))
    out.write(Magic)
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(PlainBlockSize).array())
    val numBlocks = math.max(1,
      (plain.length + PlainBlockSize - 1) / PlainBlockSize)
    val sk = new SecretKeySpec(key, "AES")
    var i = 0
    while (i < numBlocks) {
      val from = i * PlainBlockSize
      val len = math.min(PlainBlockSize, plain.length - from)
      val nonce = new Array[Byte](NonceLen)
      rng.synchronized(rng.nextBytes(nonce))
      val c = Cipher.getInstance("AES/GCM/NoPadding")
      c.init(Cipher.ENCRYPT_MODE, sk, new GCMParameterSpec(8 * TagLen, nonce))
      c.updateAAD(blockAad(aadPrefix, i))
      out.write(nonce)
      out.write(c.doFinal(plain, from, len))
      i += 1
    }
    out.toByteArray
  }

  def decrypt(cipher: Array[Byte], key: Array[Byte],
      aadPrefix: Array[Byte]): Array[Byte] = {
    require(isAgs(cipher), "not an AGS1 stream (bad magic)")
    val declaredBlock = ByteBuffer.wrap(cipher, 4, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt
    require(declaredBlock == PlainBlockSize,
      s"unsupported AGS1 block size: $declaredBlock")
    val streamLen = cipher.length - HeaderLen
    if (streamLen == 0) return Array.emptyByteArray
    val rem = streamLen % CipherBlockSize
    require(rem == 0 || rem >= NonceLen + TagLen,
      s"truncated AGS1 stream: $rem trailing bytes")
    val numBlocks = streamLen / CipherBlockSize + (if (rem == 0) 0 else 1)
    val sk = new SecretKeySpec(key, "AES")
    val out = new ByteArrayOutputStream(streamLen)
    var i = 0
    while (i < numBlocks) {
      val from = HeaderLen + i * CipherBlockSize
      val len = math.min(CipherBlockSize, cipher.length - from)
      val c = Cipher.getInstance("AES/GCM/NoPadding")
      c.init(Cipher.DECRYPT_MODE, sk,
        new GCMParameterSpec(8 * TagLen, cipher, from, NonceLen))
      c.updateAAD(blockAad(aadPrefix, i))
      out.write(c.doFinal(cipher, from + NonceLen, len - NonceLen))
      i += 1
    }
    out.toByteArray
  }
}

/** Iceberg standard key metadata — the per-file envelope stored in the
  * manifest-list entry `key_metadata` column (for manifests) or
  * KEK-wrapped in the table-metadata key registry (for the manifest
  * list itself). Wire format (encryption/key_metadata.rs:122-211):
  * one version byte (1) followed by a single Avro binary datum of
  * record {encryption_key: bytes, aad_prefix: bytes?, file_length:
  * long?}. */
final case class StandardKeyMetadata(
    encryptionKey: Array[Byte],
    aadPrefix: Option[Array[Byte]] = None,
    fileLength: Option[Long] = None) {

  require(Set(16, 24, 32).contains(encryptionKey.length),
    s"invalid AES key length: ${encryptionKey.length}")

  def withFileLength(len: Long): StandardKeyMetadata =
    copy(fileLength = Some(len))

  def encode: Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    out.write(StandardKeyMetadata.V1)
    val enc = org.apache.avro.io.EncoderFactory.get()
      .binaryEncoder(out, null)
    val rec = new org.apache.avro.generic.GenericData.Record(
      StandardKeyMetadata.AvroSchema)
    rec.put("encryption_key", ByteBuffer.wrap(encryptionKey))
    rec.put("aad_prefix", aadPrefix.map(ByteBuffer.wrap).orNull)
    rec.put("file_length", fileLength.map(java.lang.Long.valueOf).orNull)
    new org.apache.avro.generic.GenericDatumWriter[
      org.apache.avro.generic.GenericRecord](StandardKeyMetadata.AvroSchema)
      .write(rec, enc)
    enc.flush()
    out.toByteArray
  }
}

object StandardKeyMetadata {

  val V1: Int = 1

  /** Avro schema matching key_metadata.rs AVRO_SCHEMA_V1: required
    * bytes + two optional (union-with-null) fields. */
  lazy val AvroSchema: org.apache.avro.Schema = {
    import org.apache.avro.Schema
    val rec = Schema.createRecord("StandardKeyMetadata", null, null, false)
    def nullable(s: Schema) =
      Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), s))
    rec.setFields(java.util.List.of(
      new Schema.Field("encryption_key", Schema.create(Schema.Type.BYTES), null, null),
      new Schema.Field("aad_prefix", nullable(Schema.create(Schema.Type.BYTES)),
        null, Schema.Field.NULL_DEFAULT_VALUE),
      new Schema.Field("file_length", nullable(Schema.create(Schema.Type.LONG)),
        null, Schema.Field.NULL_DEFAULT_VALUE)))
    rec
  }

  private def toBytes(v: Any): Array[Byte] = {
    val bb = v.asInstanceOf[ByteBuffer]
    val a = new Array[Byte](bb.remaining())
    bb.duplicate().get(a)
    a
  }

  def decode(bytes: Array[Byte]): StandardKeyMetadata = {
    require(bytes.nonEmpty, "empty key metadata buffer")
    require(bytes(0) == V1.toByte,
      s"unsupported key metadata version: ${bytes(0)}")
    val dec = org.apache.avro.io.DecoderFactory.get()
      .binaryDecoder(bytes, 1, bytes.length - 1, null)
    val rec = new org.apache.avro.generic.GenericDatumReader[
      org.apache.avro.generic.GenericRecord](AvroSchema).read(null, dec)
    StandardKeyMetadata(
      encryptionKey = toBytes(rec.get("encryption_key")),
      aadPrefix = Option(rec.get("aad_prefix")).map(toBytes),
      fileLength = Option(rec.get("file_length")).map(_.asInstanceOf[Long]))
  }
}
