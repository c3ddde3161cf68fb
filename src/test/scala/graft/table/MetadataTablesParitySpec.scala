package graft.table

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.io.FileIO
import graft.spec.IcebergSchema

/** Pins the inspect-table column sets to the reference's
  * inspect/{snapshots,manifests,history}.rs schemas, field for field —
  * name, order, and Spark type. Engine extensions (snapshots.sequence_
  * number) may only APPEND after the reference prefix, so a reference
  * user's positional reads keep working. */
class MetadataTablesParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("metadata-parity-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val table: GraftTable = {
    val catalog = new HadoopCatalog(
      java.nio.file.Files.createTempDirectory("graft-mtp").toString,
      FileIO.fromSpark(spark))
    val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    var t = GraftTable.create("mtp", catalog, IcebergSchema.fromSpark(src.schema))
    t = t.append(src.limit(100)).append(src.limit(50))
    t
  }

  private def shape(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
    df.schema.fields.map(f => f.name -> f.dataType.simpleString).toSeq

  test("snapshots: inspect/snapshots.rs:47-74 prefix + sequence_number extension") {
    assert(shape(table.snapshotsDf(spark)) === Seq(
      "committed_at" -> "timestamp",
      "snapshot_id" -> "bigint",
      "parent_id" -> "bigint",
      "operation" -> "string",
      "manifest_list" -> "string",
      "summary" -> "map<string,string>",
      "sequence_number" -> "bigint")) // engine extension, appended last
    val rows = table.snapshotsDf(spark).orderBy("committed_at").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getString(3) == "append"))
    assert(rows(1).getLong(2) == rows(0).getLong(1), "parent chain")
    assert(rows.forall(!_.isNullAt(5)), "summary map present")
  }

  test("manifests: inspect/manifests.rs:46-139 exact column set") {
    assert(shape(table.manifestsDf(spark)) === Seq(
      "content" -> "int",
      "path" -> "string",
      "length" -> "bigint",
      "partition_spec_id" -> "int",
      "added_snapshot_id" -> "bigint",
      "added_data_files_count" -> "int",
      "existing_data_files_count" -> "int",
      "deleted_data_files_count" -> "int",
      "added_delete_files_count" -> "int",
      "existing_delete_files_count" -> "int",
      "deleted_delete_files_count" -> "int",
      "partition_summaries" ->
        ("array<struct<contains_null:boolean,contains_nan:boolean," +
          "lower_bound:string,upper_bound:string>>")))
    val rows = table.manifestsDf(spark).collect()
    assert(rows.nonEmpty)
    // the reference fills data and delete count columns with the same
    // triple (manifests.rs:171-182) — pin that mirroring
    assert(rows.forall(r => r.getInt(5) == r.getInt(8) &&
      r.getInt(6) == r.getInt(9) && r.getInt(7) == r.getInt(10)))
    assert(rows.forall(_.getLong(4) != 0L), "added_snapshot_id populated")
  }

  test("history: inspect/history.rs:55-76 exact column set") {
    assert(shape(table.historyDf(spark)) === Seq(
      "made_current_at" -> "timestamp",
      "snapshot_id" -> "bigint",
      "parent_id" -> "bigint",
      "is_current_ancestor" -> "boolean"))
    val rows = table.historyDf(spark).orderBy("made_current_at").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getBoolean(3)), "both snapshots on the live lineage")
    assert(rows(0).isNullAt(2) && rows(1).getLong(2) == rows(0).getLong(1),
      "parent_id resolved per snapshot")
  }
}
