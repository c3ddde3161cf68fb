package graft.spec

import org.apache.spark.sql.types.{LongType, Metadata, MetadataBuilder, StructField}

/** v3 row-lineage reserved columns (metadata_columns.rs:62-66,99-102):
  * `_row_id` (field id i32.MAX-107) and `_last_updated_sequence_number`
  * (field id i32.MAX-108). Both nullable — a data file with a null
  * first_row_id and no materialized column serves null lineage.
  *
  * Lineage values come from one of two places, in preference order:
  *   1. a MATERIALIZED column in the data file (written by compaction —
  *      a rewrite shuffles rows across files, so first_row_id inheritance
  *      cannot reconstruct ids; the spec requires rewriters to persist
  *      per-row lineage instead), read by reserved field id;
  *   2. inheritance: `first_row_id + position-in-file` for `_row_id` and
  *      the file's data sequence number for `_last_updated_sequence_number`.
  */
object RowLineage {
  val RowIdName = "_row_id"
  val LastUpdatedName = "_last_updated_sequence_number"
  val RowIdFieldId: Int = Int.MaxValue - 107
  val LastUpdatedFieldId: Int = Int.MaxValue - 108

  private def fieldIdMeta(id: Int): Metadata =
    new MetadataBuilder().putLong(IcebergSchema.FieldIdKey, id.toLong).build()

  /** Spark fields carrying the reserved parquet field ids — used both to
    * WRITE materialized lineage (compaction) and to READ it back (field-id
    * projection null-fills files without the columns). */
  val rowIdField: StructField =
    StructField(RowIdName, LongType, nullable = true, fieldIdMeta(RowIdFieldId))
  val lastUpdatedField: StructField =
    StructField(LastUpdatedName, LongType, nullable = true,
      fieldIdMeta(LastUpdatedFieldId))
  val sparkFields: Seq[StructField] = Seq(rowIdField, lastUpdatedField)
}
