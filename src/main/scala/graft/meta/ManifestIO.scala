package graft.meta

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}

import graft.io.FileIO
import graft.spec.{IcebergSchema, IcebergType, PartitionSpec}
import graft.spec.IcebergType._

/** Avro reader/writer for manifests and manifest lists, mirroring the v2
  * layouts of /root/reference/crates/iceberg/src/spec/manifest (writer.rs:198)
  * and spec/manifest_list (schemas per testdata/avro_schema_manifest_*.json).
  *
  * Stats maps are written as arrays of key/value records (Avro maps require
  * string keys; the Iceberg spec uses k/v arrays for the same reason);
  * bounds are [[SingleValue]] bytes keyed by field id.
  */
object ManifestIO {

  /** Bound types for the reserved position-delete schema ids, which are
    * outside every table schema (ReservedFieldIds). */
  private def reservedBoundType(id: Int): Option[IcebergType] = id match {
    case ReservedFieldIds.FilePath => Some(StringT)
    case ReservedFieldIds.Pos => Some(LongT)
    case _ => None
  }

  // ---------------- Avro schema construction ----------------

  private def nullable(s: Schema): Schema =
    Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), s))

  private def prim(t: Schema.Type): Schema = Schema.create(t)

  // Spec field-ids ride the Avro schema as `field-id` props (and
  // `element-id` on plain arrays) — the layout Java Iceberg writes
  // (testdata/avro_schema_manifest_{entry,file_v2}.json), so id-based
  // foreign readers can project our manifests.
  private def fld(name: String, s: Schema, id: Int): Schema.Field = {
    val f = new Schema.Field(name, s, null, null)
    f.addProp("field-id", Integer.valueOf(id))
    f
  }
  private def fldOpt(name: String, s: Schema, id: Int): Schema.Field = {
    val f = new Schema.Field(name, nullable(s), null, Schema.Field.NULL_DEFAULT_VALUE)
    f.addProp("field-id", Integer.valueOf(id))
    f
  }
  private def arr(elem: Schema, elementId: Int): Schema = {
    val a = Schema.createArray(elem)
    a.addProp("element-id", Integer.valueOf(elementId))
    a
  }

  private def kvArray(name: String, valueType: Schema.Type,
      keyId: Int, valueId: Int): Schema = {
    val rec = Schema.createRecord(name, null, "iceberg", false)
    rec.setFields(java.util.List.of(
      fld("key", prim(Schema.Type.INT), keyId),
      fld("value", prim(valueType), valueId)))
    Schema.createArray(rec)
  }

  /** Avro type for one partition-field value (by its result IcebergType).
    * int-ish types map natively; everything else stores SingleValue bytes. */
  private def partitionFieldAvro(t: IcebergType): Schema = t match {
    case IntT | DateT => prim(Schema.Type.INT)
    case LongT | TimeT | TimestampT | TimestamptzT => prim(Schema.Type.LONG)
    case StringT => prim(Schema.Type.STRING)
    case BooleanT => prim(Schema.Type.BOOLEAN)
    case FloatT => prim(Schema.Type.FLOAT)
    case DoubleT => prim(Schema.Type.DOUBLE)
    case _ => prim(Schema.Type.BYTES)
  }

  def partitionAvroSchema(partType: StructT): Schema = {
    val rec = Schema.createRecord("r102", null, "iceberg", false)
    rec.setFields(partType.fields.map { f =>
      fldOpt(avroSafe(f.name), partitionFieldAvro(f.fieldType), f.id)
    }.asJava)
    rec
  }

  /** Avro field names must match [A-Za-z_][A-Za-z0-9_]*; partition names
    * come from user columns so sanitize deterministically. */
  private def avroSafe(name: String): String = {
    val s = name.map(c => if (c.isLetterOrDigit || c == '_') c else '_')
    if (s.isEmpty || s(0).isDigit) "_" + s else s
  }

  def dataFileSchema(partType: StructT): Schema = {
    val rec = Schema.createRecord("r2", null, "iceberg", false)
    rec.setFields(java.util.List.of(
      fld("content", prim(Schema.Type.INT), 134),
      fld("file_path", prim(Schema.Type.STRING), 100),
      fld("file_format", prim(Schema.Type.STRING), 101),
      fld("partition", partitionAvroSchema(partType), 102),
      fld("record_count", prim(Schema.Type.LONG), 103),
      fld("file_size_in_bytes", prim(Schema.Type.LONG), 104),
      fldOpt("column_sizes", kvArray("k117_v118", Schema.Type.LONG, 117, 118), 108),
      fldOpt("value_counts", kvArray("k119_v120", Schema.Type.LONG, 119, 120), 109),
      fldOpt("null_value_counts", kvArray("k121_v122", Schema.Type.LONG, 121, 122), 110),
      fldOpt("nan_value_counts", kvArray("k138_v139", Schema.Type.LONG, 138, 139), 137),
      fldOpt("lower_bounds", kvArray("k126_v127", Schema.Type.BYTES, 126, 127), 125),
      fldOpt("upper_bounds", kvArray("k129_v130", Schema.Type.BYTES, 129, 130), 128),
      fldOpt("split_offsets", arr(prim(Schema.Type.LONG), 133), 132),
      fldOpt("equality_ids", arr(prim(Schema.Type.INT), 136), 135),
      fldOpt("sort_order_id", prim(Schema.Type.INT), 140),
      fldOpt("referenced_data_file", prim(Schema.Type.STRING), 143),
      fldOpt("content_offset", prim(Schema.Type.LONG), 144),
      fldOpt("content_size_in_bytes", prim(Schema.Type.LONG), 145),
      fldOpt("first_row_id", prim(Schema.Type.LONG), 142)))
    rec
  }

  def manifestEntrySchema(partType: StructT): Schema = {
    val rec = Schema.createRecord("manifest_entry", null, "iceberg", false)
    rec.setFields(java.util.List.of(
      fld("status", prim(Schema.Type.INT), 0),
      fldOpt("snapshot_id", prim(Schema.Type.LONG), 1),
      fldOpt("sequence_number", prim(Schema.Type.LONG), 3),
      fldOpt("file_sequence_number", prim(Schema.Type.LONG), 4),
      fld("data_file", dataFileSchema(partType), 2)))
    rec
  }

  lazy val fieldSummarySchema: Schema = {
    val rec = Schema.createRecord("r508", null, "iceberg", false)
    rec.setFields(java.util.List.of(
      fld("contains_null", prim(Schema.Type.BOOLEAN), 509),
      fldOpt("contains_nan", prim(Schema.Type.BOOLEAN), 518),
      fldOpt("lower_bound", prim(Schema.Type.BYTES), 510),
      fldOpt("upper_bound", prim(Schema.Type.BYTES), 511)))
    rec
  }

  lazy val manifestFileSchema: Schema = {
    val rec = Schema.createRecord("manifest_file", null, "iceberg", false)
    rec.setFields(java.util.List.of(
      fld("manifest_path", prim(Schema.Type.STRING), 500),
      fld("manifest_length", prim(Schema.Type.LONG), 501),
      fld("partition_spec_id", prim(Schema.Type.INT), 502),
      fld("content", prim(Schema.Type.INT), 517),
      fld("sequence_number", prim(Schema.Type.LONG), 515),
      fld("min_sequence_number", prim(Schema.Type.LONG), 516),
      fld("added_snapshot_id", prim(Schema.Type.LONG), 503),
      fld("added_files_count", prim(Schema.Type.INT), 504),
      fld("existing_files_count", prim(Schema.Type.INT), 505),
      fld("deleted_files_count", prim(Schema.Type.INT), 506),
      fld("added_rows_count", prim(Schema.Type.LONG), 512),
      fld("existing_rows_count", prim(Schema.Type.LONG), 513),
      fld("deleted_rows_count", prim(Schema.Type.LONG), 514),
      fldOpt("partitions", arr(fieldSummarySchema, 508), 507),
      fldOpt("key_metadata", prim(Schema.Type.BYTES), 519)))
    rec
  }

  // ---------------- write ----------------

  private def kvRecords(schema: Schema, m: Map[Int, Long]): GenericData.Array[GenericRecord] = {
    val arrSchema = schema
    val a = new GenericData.Array[GenericRecord](m.size, arrSchema)
    m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val r = new GenericData.Record(arrSchema.getElementType)
      r.put("key", k)
      r.put("value", v)
      a.add(r)
    }
    a
  }

  private def kvBytesRecords(schema: Schema, m: Map[Int, Array[Byte]]): GenericData.Array[GenericRecord] = {
    val a = new GenericData.Array[GenericRecord](m.size, schema)
    m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val r = new GenericData.Record(schema.getElementType)
      r.put("key", k)
      r.put("value", java.nio.ByteBuffer.wrap(v))
      a.add(r)
    }
    a
  }

  private def nonNullBranch(unionSchema: Schema): Schema =
    unionSchema.getTypes.asScala.find(_.getType != Schema.Type.NULL).get

  /** Avro block codec from `write.avro.compression-codec` (reference
    * compression.rs: deflate|null). Reads need nothing — DataFileStream
    * resolves the codec from the container header, so deflate-compressed
    * manifests from foreign writers already deserialize. */
  private[graft] def avroCodec(codec: String)
      : Option[org.apache.avro.file.CodecFactory] = codec match {
    case "deflate" | "gzip" => Some(org.apache.avro.file.CodecFactory.deflateCodec(
      org.apache.avro.file.CodecFactory.DEFAULT_DEFLATE_LEVEL))
    case "uncompressed" | "null" | "none" | "" => None
    case other => throw new IllegalArgumentException(
      s"unsupported write.avro.compression-codec: $other (deflate|uncompressed)")
  }

  /** AGS1-encrypt `plain` under `key` and write it to `path`; returns
    * the encrypted length (the manifest_length / file_length value). */
  private def writeEncrypted(io: FileIO, path: String,
      plain: Array[Byte], key: graft.crypto.StandardKeyMetadata): Long = {
    val cipher = graft.crypto.AgsStream.encrypt(plain, key.encryptionKey,
      key.aadPrefix.getOrElse(Array.emptyByteArray))
    io.writeBytes(path, cipher, overwrite = true)
    cipher.length.toLong
  }

  /** Open `path` for Avro streaming, transparently decrypting AGS1
    * content with the serialized [[graft.crypto.StandardKeyMetadata]]
    * from the manifest-list entry / key registry. Plain files stream
    * straight through (key ignored); an AGS1 file without a key is a
    * hard error — never a silent garbled read. */
  private def openMaybeEncrypted(io: FileIO, path: String,
      keyMeta: Option[Array[Byte]]): java.io.InputStream = {
    val in = new java.io.PushbackInputStream(io.open(path), 4)
    val head = new Array[Byte](4)
    val n = in.readNBytes(head, 0, 4)
    if (n == 4 && java.util.Arrays.equals(head, graft.crypto.AgsStream.Magic)) {
      val key = graft.crypto.StandardKeyMetadata.decode(keyMeta.getOrElse(
        throw new IllegalStateException(
          s"$path is AGS1-encrypted but no key metadata was provided")))
      val cipher = try head ++ in.readAllBytes() finally in.close()
      key.fileLength.foreach(l => require(l == cipher.length,
        s"$path: encrypted length ${cipher.length} != recorded $l (truncated?)"))
      new java.io.ByteArrayInputStream(graft.crypto.AgsStream.decrypt(
        cipher, key.encryptionKey,
        key.aadPrefix.getOrElse(Array.emptyByteArray)))
    } else {
      in.unread(head, 0, n)
      in
    }
  }

  /** Write one manifest file; returns (path, length). With `encrypt`
    * set the Avro content is AGS1-wrapped under that key (the caller
    * records the key metadata on the manifest-list entry). */
  def writeManifest(
      io: FileIO,
      path: String,
      entries: Seq[ManifestEntry],
      schema: IcebergSchema,
      spec: PartitionSpec,
      codec: String = "uncompressed",
      encrypt: Option[graft.crypto.StandardKeyMetadata] = None): (String, Long) = {
    val partType = spec.partitionType(schema)
    val entrySchema = manifestEntrySchema(partType)
    val dfSchema = entrySchema.getField("data_file").schema()
    val partSchema = dfSchema.getField("partition").schema()

    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](entrySchema))
    avroCodec(codec).foreach(writer.setCodec)
    writer.setMeta("schema", graft.spec.Json.write(schema.toJson))
    writer.setMeta("partition-spec", graft.spec.Json.write(spec.toJson.get("fields")))
    writer.setMeta("partition-spec-id", spec.specId.toString)
    writer.setMeta("format-version", "2")
    val buffer = encrypt.map(_ => new java.io.ByteArrayOutputStream(1 << 16))
    val out: java.io.OutputStream =
      buffer.getOrElse(io.create(path, overwrite = true))
    writer.create(entrySchema, out)

    entries.foreach { e =>
      val rec = new GenericData.Record(entrySchema)
      rec.put("status", e.status)
      rec.put("snapshot_id", e.snapshotId.map(java.lang.Long.valueOf).orNull)
      rec.put("sequence_number", e.sequenceNumber.map(java.lang.Long.valueOf).orNull)
      rec.put("file_sequence_number", e.fileSequenceNumber.map(java.lang.Long.valueOf).orNull)

      val df = e.dataFile
      val dfRec = new GenericData.Record(dfSchema)
      dfRec.put("content", df.content)
      dfRec.put("file_path", df.filePath)
      dfRec.put("file_format", df.fileFormat)

      val partRec = new GenericData.Record(partSchema)
      partType.fields.zip(df.partition).foreach { case (f, v) =>
        partRec.put(partRec.getSchema.getFields.get(partType.fields.indexOf(f)).name(),
          partitionValueToAvro(f.fieldType, v))
      }
      dfRec.put("partition", partRec)
      dfRec.put("record_count", df.recordCount)
      dfRec.put("file_size_in_bytes", df.fileSizeInBytes)

      def kvSchema(field: String) = nonNullBranch(dfSchema.getField(field).schema())
      if (df.columnSizes.nonEmpty) dfRec.put("column_sizes", kvRecords(kvSchema("column_sizes"), df.columnSizes))
      if (df.valueCounts.nonEmpty) dfRec.put("value_counts", kvRecords(kvSchema("value_counts"), df.valueCounts))
      if (df.nullValueCounts.nonEmpty) dfRec.put("null_value_counts", kvRecords(kvSchema("null_value_counts"), df.nullValueCounts))
      if (df.nanValueCounts.nonEmpty) dfRec.put("nan_value_counts", kvRecords(kvSchema("nan_value_counts"), df.nanValueCounts))
      // pos-delete files carry file_path/pos bounds under the reserved
      // delete-schema ids, which are never in the table schema
      val boundType = (id: Int) =>
        schema.idToField.get(id).map(_.fieldType).orElse(reservedBoundType(id))
      if (df.lowerBounds.nonEmpty)
        dfRec.put("lower_bounds", kvBytesRecords(kvSchema("lower_bounds"),
          df.lowerBounds.flatMap { case (k, v) => boundType(k).map(t => k -> SingleValue.toBytes(t, v)) }))
      if (df.upperBounds.nonEmpty)
        dfRec.put("upper_bounds", kvBytesRecords(kvSchema("upper_bounds"),
          df.upperBounds.flatMap { case (k, v) => boundType(k).map(t => k -> SingleValue.toBytes(t, v)) }))
      if (df.splitOffsets.nonEmpty)
        dfRec.put("split_offsets", df.splitOffsets.map(java.lang.Long.valueOf).asJava)
      if (df.equalityIds.nonEmpty)
        dfRec.put("equality_ids", df.equalityIds.map(java.lang.Integer.valueOf).asJava)
      dfRec.put("sort_order_id", df.sortOrderId.map(java.lang.Integer.valueOf).orNull)
      dfRec.put("referenced_data_file", df.referencedDataFile.orNull)
      dfRec.put("content_offset", df.contentOffset.map(java.lang.Long.valueOf).orNull)
      dfRec.put("content_size_in_bytes", df.contentSizeInBytes.map(java.lang.Long.valueOf).orNull)
      dfRec.put("first_row_id", df.firstRowId.map(java.lang.Long.valueOf).orNull)

      rec.put("data_file", dfRec)
      writer.append(rec)
    }
    writer.close()
    (encrypt, buffer) match {
      case (Some(key), Some(buf)) =>
        (path, writeEncrypted(io, path, buf.toByteArray, key))
      case _ => (path, io.size(path))
    }
  }

  private def partitionValueToAvro(t: IcebergType, v: Any): Any =
    if (v == null) null
    else t match {
      case IntT | DateT | LongT | TimeT | TimestampT | TimestamptzT |
           BooleanT | FloatT | DoubleT => v
      case StringT => v.asInstanceOf[String]
      case other => java.nio.ByteBuffer.wrap(SingleValue.toBytes(other, v))
    }

  private def partitionValueFromAvro(t: IcebergType, v: Any): Any =
    if (v == null) null
    else t match {
      case StringT => v.toString // Avro Utf8 → String
      case IntT | DateT | LongT | TimeT | TimestampT | TimestamptzT |
           BooleanT | FloatT | DoubleT => v
      case other => SingleValue.fromBytes(other, bytes(v))
    }

  private def bytes(v: Any): Array[Byte] = {
    val bb = v.asInstanceOf[java.nio.ByteBuffer]
    val a = new Array[Byte](bb.remaining())
    bb.duplicate().get(a)
    a
  }

  def readManifest(
      io: FileIO,
      path: String,
      schema: IcebergSchema,
      spec: PartitionSpec,
      keyMeta: Option[Array[Byte]] = None): Seq[ManifestEntry] = {
    val partType = spec.partitionType(schema)
    val reader = new DataFileStream[GenericRecord](
      openMaybeEncrypted(io, path, keyMeta), new GenericDatumReader[GenericRecord]())
    val out = Seq.newBuilder[ManifestEntry]
    try {
      while (reader.hasNext) {
        val rec = reader.next()
        val dfRec = rec.get("data_file").asInstanceOf[GenericRecord]
        val partRec = dfRec.get("partition").asInstanceOf[GenericRecord]
        val partition = partType.fields.zipWithIndex.map { case (f, i) =>
          partitionValueFromAvro(f.fieldType, partRec.get(i))
        }
        def kvLong(field: String): Map[Int, Long] = Option(dfRec.get(field)) match {
          case Some(a: java.util.List[_]) =>
            a.asScala.map { r0 =>
              val r = r0.asInstanceOf[GenericRecord]
              r.get("key").asInstanceOf[Int] -> r.get("value").asInstanceOf[Long]
            }.toMap
          case _ => Map.empty
        }
        def kvBound(field: String): Map[Int, Any] = Option(dfRec.get(field)) match {
          case Some(a: java.util.List[_]) =>
            a.asScala.flatMap { r0 =>
              val r = r0.asInstanceOf[GenericRecord]
              val id = r.get("key").asInstanceOf[Int]
              schema.idToField.get(id).map(_.fieldType).orElse(reservedBoundType(id))
                .map(t => id -> SingleValue.fromBytes(t, bytes(r.get("value"))))
            }.toMap
          case _ => Map.empty
        }
        val df = DataFile(
          content = dfRec.get("content").asInstanceOf[Int],
          filePath = dfRec.get("file_path").toString,
          fileFormat = dfRec.get("file_format").toString,
          partition = partition,
          recordCount = dfRec.get("record_count").asInstanceOf[Long],
          fileSizeInBytes = dfRec.get("file_size_in_bytes").asInstanceOf[Long],
          columnSizes = kvLong("column_sizes"),
          valueCounts = kvLong("value_counts"),
          nullValueCounts = kvLong("null_value_counts"),
          nanValueCounts = kvLong("nan_value_counts"),
          lowerBounds = kvBound("lower_bounds"),
          upperBounds = kvBound("upper_bounds"),
          splitOffsets = Option(dfRec.get("split_offsets")) match {
            case Some(a: java.util.List[_]) => a.asScala.toSeq.map(_.asInstanceOf[Long])
            case _ => Nil
          },
          equalityIds = Option(dfRec.get("equality_ids")) match {
            case Some(a: java.util.List[_]) => a.asScala.toSeq.map(_.asInstanceOf[Int])
            case _ => Nil
          },
          sortOrderId = Option(dfRec.get("sort_order_id")).map(_.asInstanceOf[Int]),
          referencedDataFile = Option(dfRec.get("referenced_data_file")).map(_.toString),
          contentOffset = Option(dfRec.get("content_offset")).map(_.asInstanceOf[Long]),
          contentSizeInBytes = Option(dfRec.get("content_size_in_bytes")).map(_.asInstanceOf[Long]),
          firstRowId = Option(dfRec.get("first_row_id")).map(_.asInstanceOf[Long]))
        out += ManifestEntry(
          status = rec.get("status").asInstanceOf[Int],
          snapshotId = Option(rec.get("snapshot_id")).map(_.asInstanceOf[Long]),
          sequenceNumber = Option(rec.get("sequence_number")).map(_.asInstanceOf[Long]),
          fileSequenceNumber = Option(rec.get("file_sequence_number")).map(_.asInstanceOf[Long]),
          dataFile = df)
      }
    } finally reader.close()
    out.result()
  }

  // ---------------- manifest list ----------------

  /** Write the manifest list; returns the on-disk length. With
    * `encrypt` set the content is AGS1-wrapped (the caller wraps that
    * key with a KEK into the table-metadata registry). */
  def writeManifestList(io: FileIO, path: String, manifests: Seq[ManifestFile],
      partTypes: Map[Int, StructT], codec: String = "uncompressed",
      encrypt: Option[graft.crypto.StandardKeyMetadata] = None): Long = {
    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](manifestFileSchema))
    avroCodec(codec).foreach(writer.setCodec)
    writer.setMeta("format-version", "2")
    val buffer = encrypt.map(_ => new java.io.ByteArrayOutputStream(1 << 16))
    val out: java.io.OutputStream =
      buffer.getOrElse(io.create(path, overwrite = true))
    writer.create(manifestFileSchema, out)
    manifests.foreach { m =>
      val rec = new GenericData.Record(manifestFileSchema)
      rec.put("manifest_path", m.manifestPath)
      rec.put("manifest_length", m.manifestLength)
      rec.put("partition_spec_id", m.partitionSpecId)
      rec.put("content", m.content)
      rec.put("sequence_number", m.sequenceNumber)
      rec.put("min_sequence_number", m.minSequenceNumber)
      rec.put("added_snapshot_id", m.addedSnapshotId)
      rec.put("added_files_count", m.addedFilesCount)
      rec.put("existing_files_count", m.existingFilesCount)
      rec.put("deleted_files_count", m.deletedFilesCount)
      rec.put("added_rows_count", m.addedRowsCount)
      rec.put("existing_rows_count", m.existingRowsCount)
      rec.put("deleted_rows_count", m.deletedRowsCount)
      val partType = partTypes.get(m.partitionSpecId)
      if (m.partitions.nonEmpty && partType.isDefined) {
        val arrSchema = nonNullBranch(manifestFileSchema.getField("partitions").schema())
        val a = new GenericData.Array[GenericRecord](m.partitions.size, arrSchema)
        m.partitions.zip(partType.get.fields).foreach { case (s, f) =>
          val r = new GenericData.Record(fieldSummarySchema)
          r.put("contains_null", s.containsNull)
          r.put("contains_nan", s.containsNan.map(java.lang.Boolean.valueOf).orNull)
          r.put("lower_bound", s.lowerBound.map(v => java.nio.ByteBuffer.wrap(SingleValue.toBytes(f.fieldType, v))).orNull)
          r.put("upper_bound", s.upperBound.map(v => java.nio.ByteBuffer.wrap(SingleValue.toBytes(f.fieldType, v))).orNull)
          a.add(r)
        }
        rec.put("partitions", a)
      }
      rec.put("key_metadata",
        m.keyMetadata.map(java.nio.ByteBuffer.wrap).orNull)
      writer.append(rec)
    }
    writer.close()
    (encrypt, buffer) match {
      case (Some(key), Some(buf)) =>
        writeEncrypted(io, path, buf.toByteArray, key)
      case _ => io.size(path)
    }
  }

  def readManifestList(io: FileIO, path: String,
      partTypes: Map[Int, StructT],
      keyMeta: Option[Array[Byte]] = None): Seq[ManifestFile] = {
    val reader = new DataFileStream[GenericRecord](
      openMaybeEncrypted(io, path, keyMeta), new GenericDatumReader[GenericRecord]())
    val out = Seq.newBuilder[ManifestFile]
    try {
      while (reader.hasNext) {
        val rec = reader.next()
        // Field-name aliases: Java Iceberg ≤1.4 wrote the v2 counts as
        // `added_data_files_count` etc. (renamed in 1.5 —
        // manifest_list/_serde.rs:586-612 reads both); v1 lists lack
        // content/sequence numbers entirely (default 0 = Data).
        // `rec.get` on an absent field returns null, which unboxes to a
        // silent 0 — resolve through the schema instead.
        // The file counts are OPTIONAL in v1 lists (the reference models
        // them as Option<u32>, manifest_list/_serde.rs:269-281). When
        // neither name exists in the schema — or the value is null — we
        // take an EXPLICIT default rather than letting `null` unbox to a
        // silent 0 downstream; callers only use these for planning
        // heuristics and summary metrics, where 0 ("unknown, assume
        // nothing") is the safe direction.
        def getAliased(primary: String, alias: String, dflt: AnyRef): AnyRef = {
          val v =
            if (rec.getSchema.getField(primary) != null) rec.get(primary)
            else if (rec.getSchema.getField(alias) != null) rec.get(alias)
            else null
          if (v != null) v else dflt
        }
        def getOrDefault(name: String, dflt: AnyRef): AnyRef = {
          val v = if (rec.getSchema.getField(name) != null) rec.get(name) else null
          if (v != null) v else dflt
        }
        val specId = rec.get("partition_spec_id").asInstanceOf[Int]
        val partType = partTypes.get(specId)
        // v1 makes partitions, the row counts, and (via aliases) the
        // file counts all OPTIONAL — and Avro's GenericData.Record.get
        // THROWS on a name absent from the schema, so every optional
        // access must resolve through the schema first.
        val partitions = Option(getOrDefault("partitions", null)) match {
          case Some(a: java.util.List[_]) if partType.isDefined =>
            a.asScala.toSeq.zip(partType.get.fields).map { case (r0, f) =>
              val r = r0.asInstanceOf[GenericRecord]
              FieldSummary(
                containsNull = r.get("contains_null").asInstanceOf[Boolean],
                containsNan = Option(r.get("contains_nan")).map(_.asInstanceOf[Boolean]),
                lowerBound = Option(r.get("lower_bound")).map(b => SingleValue.fromBytes(f.fieldType, bytes(b))),
                upperBound = Option(r.get("upper_bound")).map(b => SingleValue.fromBytes(f.fieldType, bytes(b))))
            }
          case _ => Nil
        }
        out += ManifestFile(
          manifestPath = rec.get("manifest_path").toString,
          manifestLength = rec.get("manifest_length").asInstanceOf[Long],
          partitionSpecId = specId,
          content = getOrDefault("content", Integer.valueOf(0)).asInstanceOf[Int],
          sequenceNumber =
            getOrDefault("sequence_number", java.lang.Long.valueOf(0L)).asInstanceOf[Long],
          minSequenceNumber =
            getOrDefault("min_sequence_number", java.lang.Long.valueOf(0L)).asInstanceOf[Long],
          addedSnapshotId = rec.get("added_snapshot_id").asInstanceOf[Long],
          addedFilesCount =
            getAliased("added_files_count", "added_data_files_count",
              Integer.valueOf(0)).asInstanceOf[Int],
          existingFilesCount =
            getAliased("existing_files_count", "existing_data_files_count",
              Integer.valueOf(0)).asInstanceOf[Int],
          deletedFilesCount =
            getAliased("deleted_files_count", "deleted_data_files_count",
              Integer.valueOf(0)).asInstanceOf[Int],
          addedRowsCount = getOrDefault("added_rows_count",
            java.lang.Long.valueOf(0L)).asInstanceOf[Long],
          existingRowsCount = getOrDefault("existing_rows_count",
            java.lang.Long.valueOf(0L)).asInstanceOf[Long],
          deletedRowsCount = getOrDefault("deleted_rows_count",
            java.lang.Long.valueOf(0L)).asInstanceOf[Long],
          partitions = partitions,
          keyMetadata = Option(rec.getSchema.getField("key_metadata"))
            .flatMap(_ => Option(rec.get("key_metadata"))).map(bytes))
      }
    } finally reader.close()
    out.result()
  }
}
