package graft.puffin

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.io.FileIO
import graft.spec.Json
import graft.spec.Json._

/** Puffin container format (iceberg puffin spec; reference
  * puffin/{writer,reader,metadata}.rs):
  *
  * {{{
  * "PFA1" | blob₀ | blob₁ | … | "PFA1" | footer-payload (JSON) |
  * payload-size (u32 LE) | flags (u32) | "PFA1"
  * }}}
  *
  * Footer payload: {"blobs": [{type, fields, snapshot-id,
  * sequence-number, offset, length, compression-codec?, properties}],
  * "properties": {}}. The footer itself is written uncompressed (flag
  * bit 0 = 0; a compressed footer is refused on read, like the
  * reference refuses its lz4-only footer codec). Blobs compress per
  * their `compression-codec` entry: zstd on write when requested, zstd
  * AND lz4-frame on read (foreign Java/Rust stats files default to
  * zstd).
  */
object Puffin {

  val Magic: Array[Byte] = Array(0x50, 0x46, 0x41, 0x31).map(_.toByte)

  /** Deletion vector blob type (v3 spec; puffin/blob.rs:25). */
  val DeletionVectorV1 = "deletion-vector-v1"
  /** KMV distinct-count sketch (engine-private portable companion blob:
    * deterministic md5-based formulation reproducible in plain SQL). */
  val KmvDistinctV1 = "graft-kmv-distinct-v1"
  /** The spec'd NDV blob type (puffin/blob.rs:23) — DataSketches theta
    * CompactSketch bytes, written/read via [[ThetaSketch]] for
    * mixed-engine stats interop. */
  val ThetaV1 = "apache-datasketches-theta-v1"

  final case class Blob(
      blobType: String,
      fields: Seq[Int],
      snapshotId: Long,
      sequenceNumber: Long,
      data: Array[Byte],
      properties: Map[String, String] = Map.empty,
      /** Per-blob compression (puffin spec `compression-codec`):
        * None = store raw; Some("zstd") compresses on write. */
      codec: Option[String] = None,
      /** Already-ENCODED payload bytes (as stored in a source file,
        * i.e. compressed per `codec`): when set, [[write]] copies them
        * byte-for-byte instead of re-compressing `data` — the
        * carry-forward path for blobs moving between files undecoded
        * (`data` is ignored and may be empty). */
      storedData: Option[Array[Byte]] = None)

  final case class BlobMetadata(
      blobType: String,
      fields: Seq[Int],
      snapshotId: Long,
      sequenceNumber: Long,
      offset: Long,
      length: Long,
      properties: Map[String, String],
      codec: Option[String] = None)

  /** Blob codec registry (reference compression.rs + puffin/mod.rs:31
    * validate_puffin_compression: None/lz4/zstd are the legal Puffin
    * codecs). This engine reads BOTH zstd and lz4-frame (the reference
    * currently refuses lz4 reads) and writes zstd on request. */
  private def compress(codec: Option[String], data: Array[Byte]): Array[Byte] =
    codec match {
      case None => data
      case Some("zstd") => com.github.luben.zstd.Zstd.compress(data)
      case Some(other) => throw new IllegalArgumentException(
        s"Compression codec $other is not supported for Puffin writes " +
          "(zstd or uncompressed)")
    }

  private def decompress(codec: Option[String], data: Array[Byte]): Array[Byte] =
    codec match {
      case None => data
      case Some("zstd") =>
        val in = new com.github.luben.zstd.ZstdInputStream(
          new java.io.ByteArrayInputStream(data))
        try in.readAllBytes() finally in.close()
      case Some("lz4") =>
        val in = new net.jpountz.lz4.LZ4FrameInputStream(
          new java.io.ByteArrayInputStream(data))
        try in.readAllBytes() finally in.close()
      case Some(other) => throw new IllegalArgumentException(
        s"Compression codec $other is not supported for Puffin files. " +
          "Only uncompressed, lz4, and zstd are supported.")
    }

  /** Write a Puffin file; returns the blob descriptors (with offsets). */
  def write(io: FileIO, path: String, blobs: Seq[Blob],
      fileProperties: Map[String, String] = Map.empty): Seq[BlobMetadata] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    val metas = blobs.map { b =>
      val offset = out.size().toLong
      val stored = b.storedData.getOrElse(compress(b.codec, b.data))
      out.write(stored)
      BlobMetadata(b.blobType, b.fields, b.snapshotId, b.sequenceNumber,
        offset, stored.length.toLong, b.properties, b.codec)
    }
    out.write(Magic)
    val payload = footerJson(metas, fileProperties).getBytes(StandardCharsets.UTF_8)
    out.write(payload)
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(payload.length).array())
    out.write(Array[Byte](0, 0, 0, 0)) // flags: uncompressed footer
    out.write(Magic)
    io.writeBytes(path, out.toByteArray, overwrite = true)
    metas
  }

  /** Read footer metadata + file properties. */
  def readMetadata(io: FileIO, path: String): (Seq[BlobMetadata], Map[String, String]) = {
    val bytes = io.readBytes(path)
    require(bytes.length >= 2 * Magic.length + 12, s"not a puffin file: $path")
    require(bytes.startsWith(Magic), s"bad puffin header magic: $path")
    require(bytes.slice(bytes.length - 4, bytes.length).sameElements(Magic),
      s"bad puffin trailing magic: $path")
    val flags = bytes(bytes.length - 8)
    require((flags & 1) == 0, "compressed puffin footer not supported")
    val size = ByteBuffer.wrap(bytes, bytes.length - 12, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt
    val payloadEnd = bytes.length - 12
    val payload = new String(bytes, payloadEnd - size, size, StandardCharsets.UTF_8)
    require(bytes.slice(payloadEnd - size - Magic.length, payloadEnd - size)
      .sameElements(Magic), s"bad puffin footer magic: $path")
    parseFooter(payload)
  }

  /** Read one blob's payload bytes (decompressed per its
    * `compression-codec` footer entry — zstd and lz4-frame supported;
    * reader.rs:70-75 shape, plus the lz4 read the reference refuses). */
  def readBlob(io: FileIO, path: String, meta: BlobMetadata): Array[Byte] =
    decompress(meta.codec, readBlobStored(io, path, meta))

  /** Read one blob's STORED bytes (no decompression) — pairs with
    * [[Blob.storedData]] so an untouched blob moves between files
    * byte-for-byte without a decode/re-encode round trip. */
  def readBlobStored(io: FileIO, path: String,
      meta: BlobMetadata): Array[Byte] = {
    val in = io.open(path)
    try {
      in.skip(meta.offset)
      in.readNBytes(meta.length.toInt)
    } finally in.close()
  }

  private def footerJson(metas: Seq[BlobMetadata], props: Map[String, String]): String = {
    val o = obj()
    val ba = arr()
    metas.foreach { m =>
      val bo = obj()
      bo.put("type", m.blobType)
      val fa = arr(); m.fields.foreach(fa.add); bo.set[ObjectNode]("fields", fa)
      bo.put("snapshot-id", m.snapshotId)
      bo.put("sequence-number", m.sequenceNumber)
      bo.put("offset", m.offset)
      bo.put("length", m.length)
      m.codec.foreach(c => bo.put("compression-codec", c))
      if (m.properties.nonEmpty) {
        val po = obj()
        m.properties.toSeq.sortBy(_._1).foreach { case (k, v) => po.put(k, v) }
        bo.set[ObjectNode]("properties", po)
      }
      ba.add(bo)
    }
    o.set[ObjectNode]("blobs", ba)
    if (props.nonEmpty) {
      val po = obj()
      props.toSeq.sortBy(_._1).foreach { case (k, v) => po.put(k, v) }
      o.set[ObjectNode]("properties", po)
    }
    Json.writePretty(o)
  }

  private def parseFooter(payload: String): (Seq[BlobMetadata], Map[String, String]) = {
    val n = Json.parse(payload)
    val blobs = n("blobs").elems.map { b =>
      BlobMetadata(
        blobType = b("type").asText(),
        fields = b("fields").elems.map(_.asInt()),
        snapshotId = b.opt("snapshot-id").map(_.asLong()).getOrElse(0L),
        sequenceNumber = b.opt("sequence-number").map(_.asLong()).getOrElse(0L),
        offset = b("offset").asLong(),
        length = b("length").asLong(),
        properties = b.opt("properties").map(_.fieldsMap.map { case (k, v) =>
          k -> v.asText()
        }).getOrElse(Map.empty),
        codec = b.opt("compression-codec").map(_.asText()))
    }
    val props = n.opt("properties").map(_.fieldsMap.map { case (k, v) => k -> v.asText() })
      .getOrElse(Map.empty[String, String])
    (blobs, props)
  }

  // ---- deletion-vector blob payload (v3 spec framing) ----

  /** DV blob payload: u32 BE length of (magic+bitmap), magic D1 D3 39 64,
    * portable 64-bit roaring bitmap, u32 BE CRC-32 of magic+bitmap. */
  def dvSerialize(bitmap: Roaring64): Array[Byte] = {
    val body = DvMagic ++ bitmap.serialize()
    val crc = new java.util.zip.CRC32()
    crc.update(body)
    ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(body.length).array() ++
      body ++
      ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(crc.getValue.toInt).array()
  }

  def dvDeserialize(payload: Array[Byte]): Roaring64 = {
    val len = ByteBuffer.wrap(payload, 0, 4).order(ByteOrder.BIG_ENDIAN).getInt
    val body = payload.slice(4, 4 + len)
    require(body.take(4).sameElements(DvMagic), "bad deletion-vector magic")
    val crc = new java.util.zip.CRC32()
    crc.update(body)
    val stored = ByteBuffer.wrap(payload, 4 + len, 4).order(ByteOrder.BIG_ENDIAN).getInt
    require(stored == crc.getValue.toInt, "deletion-vector CRC mismatch")
    Roaring64.deserialize(body.drop(4))
  }

  private val DvMagic: Array[Byte] = Array(0xD1, 0xD3, 0x39, 0x64).map(_.toByte)
}
