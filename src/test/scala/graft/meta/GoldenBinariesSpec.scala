package graft.meta

import scala.jdk.CollectionConverters._

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

  test("v1 list with NO count fields reads explicit defaults, not null-unbox") {
    // v1 makes the file counts optional; a list written without either
    // the primary or the legacy field names must read as the documented
    // default 0 — and must NOT throw or silently misparse (r9 ADVICE:
    // getAliased returned null and .asInstanceOf[Int] unboxed it to an
    // accidental 0).
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = SchemaBuilder.record("manifest_file").fields()
      .requiredString("manifest_path")
      .requiredLong("manifest_length")
      .requiredInt("partition_spec_id")
      .requiredLong("added_snapshot_id")
      .requiredLong("added_rows_count")
      .requiredLong("existing_rows_count")
      .requiredLong("deleted_rows_count")
      .endRecord()
    val rec = new GenericData.Record(schema)
    rec.put("manifest_path", "m1.avro")
    rec.put("manifest_length", 123L)
    rec.put("partition_spec_id", 0)
    rec.put("added_snapshot_id", 7L)
    rec.put("added_rows_count", 5L)
    rec.put("existing_rows_count", 0L)
    rec.put("deleted_rows_count", 0L)
    val tmp = java.nio.file.Files.createTempFile("nocounts-", ".avro")
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, tmp.toFile); w.append(rec); w.close()

    val ms = ManifestIO.readManifestList(io, tmp.toString, Map.empty)
    assert(ms.size === 1)
    val m = ms.head
    assert(m.manifestPath === "m1.avro")
    assert(m.addedFilesCount === 0 && m.existingFilesCount === 0 &&
      m.deletedFilesCount === 0)
    assert(m.addedRowsCount === 5L)
    assert(m.content === 0 && m.sequenceNumber === 0L) // v1 defaults
    java.nio.file.Files.delete(tmp)
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

  test("our Avro writer schemas carry the Java field-id layout") {
    assume(haveGoldens)
    import org.apache.avro.Schema
    def prop(f: Schema.Field): String = String.valueOf(f.getObjectProp("field-id"))
    // manifest list schema vs the Java v2 fixture: every fixture field
    // must exist in ours with the SAME spec field-id
    val fileFix = new Schema.Parser().parse(
      new java.io.File(s"$refBase/avro_schema_manifest_file_v2.json"))
    fileFix.getFields.forEach { f =>
      val mine = ManifestIO.manifestFileSchema.getField(f.name)
      assert(mine != null, s"missing manifest_file field ${f.name}")
      assert(prop(mine) === prop(f), s"manifest_file field-id for ${f.name}")
    }
    // manifest entry + data_file: the fixture is v1-flavored, so assert
    // the intersection carries identical ids
    val entryFix = new Schema.Parser().parse(
      new java.io.File(s"$refBase/avro_schema_manifest_entry.json"))
    val ourEntry = ManifestIO.manifestEntrySchema(
      graft.spec.IcebergType.StructT(Nil))
    entryFix.getFields.forEach { f =>
      Option(ourEntry.getField(f.name)).foreach { mine =>
        assert(prop(mine) === prop(f), s"manifest_entry field-id for ${f.name}")
      }
    }
    def nonNull(s: Schema): Schema =
      if (s.getType == Schema.Type.UNION)
        s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
      else s
    val dfFix = nonNull(entryFix.getField("data_file").schema())
    val ourDf = nonNull(ourEntry.getField("data_file").schema())
    dfFix.getFields.forEach { f =>
      Option(ourDf.getField(f.name)).foreach { mine =>
        assert(prop(mine) === prop(f), s"data_file field-id for ${f.name}")
      }
    }
  }

  // ---------------- table / view metadata JSON goldens ----------------
  // Expectations mirror table_metadata.rs:3340-3530 / view_metadata.rs
  // tests over the same files.

  private def tableMd(name: String): TableMetadata =
    TableMetadata.fromJsonString(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$refBase/table_metadata/$name")), "UTF-8"))

  test("golden TableMetadataV1Compat (Glue-written modern-shape v1)") {
    assume(haveGoldens)
    val md = tableMd("TableMetadataV1Compat.json")
    assert(md.formatVersion === 1)
    assert(md.tableUuid === "3276010d-7b1d-488c-98d8-9025fc4fde6b")
    assert(md.location === "s3://bucket/warehouse/iceberg/glue.db/table_name")
    assert(md.lastUpdatedMs === 1727773114005L)
    assert(md.currentSchemaId === 0)
  }

  test("golden TableMetadataV1Valid (legacy singular schema/partition-spec)") {
    assume(haveGoldens)
    val md = tableMd("TableMetadataV1Valid.json")
    assert(md.formatVersion === 1)
    assert(md.currentSchema.fields.map(_.name) === Seq("x", "y", "z"))
    assert(md.defaultSpec.fields.map(f => (f.name, f.fieldId)) === Seq(("x", 1000)))
    assert(md.currentSnapshotId.isEmpty) // -1 reads as None
  }

  test("golden TableMetadataV1SchemasWithoutCurrentId falls back to `schema`") {
    assume(haveGoldens)
    val md = tableMd("TableMetadataV1SchemasWithoutCurrentId.json")
    assert(md.tableUuid === "d20125c8-7284-442c-9aea-15fee620737c")
    assert(md.currentSchema.fields.map(_.name) === Seq("x", "y", "z"))
  }

  test("golden TableMetadataV1PartitionSpecsWithoutDefaultId infers MAX spec id") {
    assume(haveGoldens)
    val md = tableMd("TableMetadataV1PartitionSpecsWithoutDefaultId.json")
    assert(md.defaultSpecId === 2)
    assert(md.partitionSpecs.size === 2)
    assert(md.defaultSpec.fields.map(f => (f.name, f.sourceId)) === Seq(("y", 2)))
  }

  test("golden invalid table metadata fixtures are rejected") {
    assume(haveGoldens)
    val e1 = intercept[IllegalArgumentException](tableMd("TableMetadataV1NoValidSchema.json"))
    assert(e1.getMessage.contains("No valid schema configuration"))
    val e2 = intercept[IllegalArgumentException](tableMd("TableMetadataV2CurrentSchemaNotFound.json"))
    assert(e2.getMessage.contains("current schema id 2"))
    intercept[IllegalArgumentException](tableMd("TableMetadataV2MissingSortOrder.json"))
    intercept[IllegalArgumentException](tableMd("TableMetadataV2MissingPartitionSpecs.json"))
    intercept[IllegalArgumentException](tableMd("TableMetadataV2MissingLastPartitionId.json"))
    intercept[Exception](tableMd("TableMetadataV2MissingSchemas.json"))
    intercept[IllegalArgumentException](tableMd("TableMetadataUnsupportedVersion.json"))
  }

  test("golden valid v2/v3 table metadata parses") {
    assume(haveGoldens)
    val v2 = tableMd("TableMetadataV2Valid.json")
    assert(v2.tableUuid === "9c12d441-03fe-4693-9a96-a0705ddf69c1")
    assert(v2.schemas.size === 2 && v2.currentSchemaId === 1)
    assert(tableMd("TableMetadataV2ValidMinimal.json").formatVersion === 2)
    assert(tableMd("TableMetadataV3ValidMinimal.json").formatVersion === 3)
    // the wider example fixtures one level up
    Seq("example_table_metadata_v2.json",
      "example_table_metadata_v2_deep_history.json",
      "example_table_metadata_v2_partition_evolution.json",
      "example_empty_table_metadata_v2.json").foreach { f =>
      val md = TableMetadata.fromJsonString(
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$refBase/$f")), "UTF-8"))
      assert(md.formatVersion === 2, f)
    }
  }

  private def viewMd(name: String): graft.spec.ViewMetadata =
    graft.spec.ViewMetadata.fromJsonString(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$refBase/view_metadata/$name")), "UTF-8"))

  test("golden view metadata: valid parses, four invalids rejected") {
    assume(haveGoldens)
    val v = viewMd("ViewMetadataV1Valid.json")
    assert(v.viewUuid === "fa6506c3-7681-40c8-86dc-e36561f83385")
    assert(v.currentVersionId === 1 && v.versions.size === 1 && v.schemas.size === 1)
    intercept[IllegalArgumentException](viewMd("ViewMetadataUnsupportedVersion.json"))
    intercept[IllegalArgumentException](viewMd("ViewMetadataV1CurrentVersionNotFound.json"))
    intercept[IllegalArgumentException](viewMd("ViewMetadataV1SchemaNotFound.json"))
    intercept[Exception](viewMd("ViewMetadataV1MissingSchema.json"))
    intercept[Exception](viewMd("ViewMetadataV1MissingCurrentVersion.json"))
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
