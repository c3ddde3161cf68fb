package graft.meta

import org.scalatest.funsuite.AnyFunSuite

import graft.io.FileIO
import graft.puffin.Puffin
import graft.spec.TableMetadata

/** Foreign-bytes interop: parse the reference's JAVA-GENERATED golden
  * binaries (not fixtures this repo wrote itself) — the same files
  * iceberg-rust reads in its own reader tests.
  *
  *  - manifest-list-v2-1.avro: Java Iceberg 1.4.0, deflate codec, LEGACY
  *    field names (`added_data_files_count` …), no key_metadata field
  *    (manifest_list/_serde.rs:586-612).
  *  - manifest-list-v2-2.avro: Java Iceberg 1.5.0, current names.
  *  - manifest-list-v3-encrypted.avro: AGS1-encrypted EMPTY list; key
  *    chain (master → KEK → DEK) from TableMetadataV3ValidEncryption.json
  *    (testdata/manifests_lists/README.md).
  *  - the three puffin java-generated .bin files: expectations from
  *    puffin/test_utils.rs.
  */
class GoldenBinariesSpec extends AnyFunSuite {

  private val refBase = "/root/reference/crates/iceberg/testdata"
  private val io = FileIO.local()

  private def haveGoldens = new java.io.File(refBase).isDirectory

  // ---------------- manifest lists ----------------

  test("golden manifest-list-v2-1 (Java 1.4.0: legacy count names, deflate)") {
    assume(haveGoldens)
    val ms = ManifestIO.readManifestList(io,
      s"$refBase/manifests_lists/manifest-list-v2-1.avro", Map.empty)
    assert(ms.nonEmpty)
    ms.foreach { m =>
      assert(m.manifestPath.nonEmpty)
      assert(m.manifestLength > 0)
      // the legacy-alias counts must materialize (a reader missing the
      // alias silently unboxes null → 0 while rows stay > 0)
      assert(m.addedFilesCount + m.existingFilesCount + m.deletedFilesCount > 0)
      assert(m.addedRowsCount + m.existingRowsCount + m.deletedRowsCount > 0)
      assert(m.keyMetadata.isEmpty) // field absent from the 1.4.0 schema
    }
  }

  test("golden manifest-list-v2-2 (Java 1.5.0: current names)") {
    assume(haveGoldens)
    val ms = ManifestIO.readManifestList(io,
      s"$refBase/manifests_lists/manifest-list-v2-2.avro", Map.empty)
    assert(ms.nonEmpty)
    ms.foreach { m =>
      assert(m.manifestPath.nonEmpty)
      assert(m.addedFilesCount + m.existingFilesCount + m.deletedFilesCount > 0)
    }
  }

  test("golden manifest-list-v3-encrypted decrypts through the AGS1 key chain") {
    assume(haveGoldens)
    val mdJson = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        s"$refBase/table_metadata/TableMetadataV3ValidEncryption.json")),
      "UTF-8")
    // seed the dev keyring with the README's master key (bytes 0x00..0x0f)
    val masterB64 = java.util.Base64.getEncoder
      .encodeToString(Array.tabulate[Byte](16)(_.toByte))
    val md0 = TableMetadata.fromJsonString(mdJson)
    val md = md0.copy(properties = md0.properties +
      (graft.crypto.Encryption.MasterKeysProp -> s"master-1:$masterB64"))
    val snap = md.currentSnapshot.get
    val keyMeta = graft.crypto.MetadataEncryption.listKeyFor(md, snap)
    assert(keyMeta.nonEmpty, "snapshot must resolve a wrapped DEK")
    val ms = ManifestIO.readManifestList(io,
      s"$refBase/manifests_lists/manifest-list-v3-encrypted.avro",
      Map.empty, keyMeta)
    assert(ms.isEmpty) // the golden is an encrypted EMPTY list
  }

  // ---------------- puffin ----------------

  test("golden empty-puffin-uncompressed.bin") {
    assume(haveGoldens)
    val (blobs, props) = Puffin.readMetadata(io,
      s"$refBase/puffin/java-generated/empty-puffin-uncompressed.bin")
    assert(blobs.isEmpty)
    assert(props.isEmpty)
  }

  private val blob1Data = "some blob \u0000 binary data 🤯 " +
    "that is not very very very very very very long, is it?"

  test("golden sample-metric-data-uncompressed.bin") {
    assume(haveGoldens)
    val path = s"$refBase/puffin/java-generated/sample-metric-data-uncompressed.bin"
    val (blobs, props) = Puffin.readMetadata(io, path)
    assert(props === Map("created-by" -> "Test 1234"))
    assert(blobs.map(b => (b.blobType, b.fields, b.snapshotId, b.sequenceNumber,
      b.offset, b.length, b.codec)) === Seq(
      ("some-blob", Seq(1), 2L, 1L, 4L, 9L, None),
      ("some-other-blob", Seq(2), 2L, 1L, 13L, 83L, None)))
    assert(new String(Puffin.readBlob(io, path, blobs(0)), "UTF-8") === "abcdefghi")
    assert(new String(Puffin.readBlob(io, path, blobs(1)), "UTF-8") === blob1Data)
  }

  test("golden sample-metric-data-compressed-zstd.bin") {
    assume(haveGoldens)
    val path = s"$refBase/puffin/java-generated/sample-metric-data-compressed-zstd.bin"
    val (blobs, props) = Puffin.readMetadata(io, path)
    assert(props === Map("created-by" -> "Test 1234"))
    assert(blobs.map(b => (b.blobType, b.offset, b.length, b.codec)) === Seq(
      ("some-blob", 4L, 22L, Some("zstd")),
      ("some-other-blob", 26L, 77L, Some("zstd"))))
    assert(new String(Puffin.readBlob(io, path, blobs(0)), "UTF-8") === "abcdefghi")
    assert(new String(Puffin.readBlob(io, path, blobs(1)), "UTF-8") === blob1Data)
  }
}
