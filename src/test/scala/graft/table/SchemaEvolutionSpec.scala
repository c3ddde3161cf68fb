package graft.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.io.FileIO
import graft.spec.{IcebergSchema, IcebergType, PartitionSpec, Transform}
import graft.spec.IcebergType._

/** Evolved-schema round trips: write → evolve → write → read both
  * (reference read_evolved_schema discipline: resolution is by field id,
  * old files null-fill added columns and serve renamed/promoted ones). */
class SchemaEvolutionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("schema-evolution-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshCatalog() = new HadoopCatalog(
    java.nio.file.Files.createTempDirectory("graft-evo-").toString,
    FileIO.fromSpark(spark))

  test("add column: old files null-fill, new files carry values") {
    import spark.implicits._
    val catalog = freshCatalog()
    val schema = IcebergSchema(0, Seq(
      NestedFieldOf(1, "id", LongT), NestedFieldOf(2, "v", StringT)))
    var t = GraftTable.create("evo_add", catalog, schema)
    t = t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))

    t = t.updateSchema().addColumn("score", DoubleT).commit()
    assert(t.schema.fields.map(_.name) === Seq("id", "v", "score"))
    assert(t.schema.fields.last.id === 3) // fresh field id
    assert(t.metadata.schemas.size === 2) // old schema retained

    t = t.append(Seq((3L, "c", 1.5), (4L, "d", 2.5)).toDF("id", "v", "score"))

    val rows = t.newScan().toDF(spark)
      .orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(rows.take(2).forall(_.isNullAt(2)), "old files must null-fill")
    assert(rows.drop(2).map(_.getDouble(2)).toSeq === Seq(1.5, 2.5))
  }

  test("rename column: field-id resolution keeps serving old files") {
    import spark.implicits._
    val catalog = freshCatalog()
    val schema = IcebergSchema(0, Seq(
      NestedFieldOf(1, "id", LongT), NestedFieldOf(2, "old_name", StringT)))
    var t = GraftTable.create("evo_rename", catalog, schema)
    t = t.append(Seq((1L, "x"), (2L, "y")).toDF("id", "old_name"))

    t = t.updateSchema().renameColumn("old_name", "new_name").commit()
    val rows = t.newScan().toDF(spark).orderBy("id").collect()
    assert(t.schema.fields.map(_.name) === Seq("id", "new_name"))
    assert(rows.map(_.getString(1)).toSeq === Seq("x", "y"))
    // filter on the new name reaches metrics pruning against old files
    val filtered = t.newScan()
      .withFilter(graft.expr.Predicate.eqTo("new_name", "x")).toDF(spark).collect()
    assert(filtered.map(_.getString(1)).toSeq === Seq("x"))

    // renaming onto an existing column would make name-based binding
    // ambiguous — refused, schema unchanged
    val clash = intercept[IllegalArgumentException] {
      t.updateSchema().renameColumn("new_name", "id").commit()
    }
    assert(clash.getMessage.contains("duplicate column name"))
    // same for a rename colliding with an added column
    val clash2 = intercept[IllegalArgumentException] {
      t.updateSchema().addColumn("z", LongT).renameColumn("new_name", "z").commit()
    }
    assert(clash2.getMessage.contains("duplicate column name"))
    assert(GraftTable.load("evo_rename", catalog).schema.fields.map(_.name)
      === Seq("id", "new_name"))
  }

  test("drop column: excluded from scans, partition sources protected") {
    import spark.implicits._
    val catalog = freshCatalog()
    val schema = IcebergSchema(0, Seq(
      NestedFieldOf(1, "id", LongT), NestedFieldOf(2, "junk", StringT),
      NestedFieldOf(3, "keep", DoubleT)))
    var t = GraftTable.create("evo_drop", catalog, schema,
      PartitionSpec.build(schema, Seq("id" -> Transform.Identity)))
    t = t.append(Seq((1L, "x", 0.5), (2L, "y", 1.5)).toDF("id", "junk", "keep"))

    t = t.updateSchema().dropColumn("junk").commit()
    val df = t.newScan().toDF(spark)
    assert(df.columns.toSeq === Seq("id", "keep"))
    assert(df.orderBy("id").collect().map(_.getDouble(1)).toSeq === Seq(0.5, 1.5))

    val err = intercept[IllegalArgumentException] {
      t.updateSchema().dropColumn("id").commit()
    }
    assert(err.getMessage.contains("partition source"))
  }

  test("promote int->long and widen decimal; illegal promotions refused") {
    import spark.implicits._
    val catalog = freshCatalog()
    val schema = IcebergSchema(0, Seq(
      NestedFieldOf(1, "id", IntT), NestedFieldOf(2, "f", FloatT)))
    var t = GraftTable.create("evo_promote", catalog, schema)
    t = t.append(Seq((1, 1.5f), (2, 2.5f)).toDF("id", "f"))

    t = t.updateSchema()
      .updateColumnType("id", LongT)
      .updateColumnType("f", DoubleT)
      .commit()
    // appends in the widened schema coexist with int32/float files
    t = t.append(Seq((3L, 3.5), (4L, 4.5)).toDF("id", "f"))

    val rows = t.newScan().toDF(spark).orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(rows.map(_.getDouble(1)).toSeq === Seq(1.5, 2.5, 3.5, 4.5))

    val err = intercept[IllegalArgumentException] {
      t.updateSchema().updateColumnType("f", StringT).commit()
    }
    assert(err.getMessage.contains("illegal promotion"))
  }

  test("v3 field defaults: initial-default on old files, write-default on writes") {
    import spark.implicits._
    val catalog = freshCatalog()
    val schema = IcebergSchema(0, Seq(
      NestedFieldOf(1, "id", LongT), NestedFieldOf(2, "v", StringT)))
    var t = GraftTable.create("evo_default", catalog, schema)
    t = t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))

    // defaults are a v3 feature: rejected on a v2 table
    val err = intercept[IllegalArgumentException] {
      t.updateSchema().addColumnWithDefault("score", DoubleT, 9.5).commit()
    }
    assert(err.getMessage.contains("format-version 3"))

    t = Transactions.upgradeFormatVersion(t, 3)
    t = t.updateSchema().addColumnWithDefault("score", DoubleT, 9.5).commit()

    // serde: defaults survive the metadata.json round trip
    val f = GraftTable.load("evo_default", catalog).schema.findField("score").get
    assert(f.initialDefault === Some(9.5) && f.writeDefault === Some(9.5))

    // pre-evolution files serve the initial-default, not null
    assert(t.newScan().toDF(spark).orderBy("id").collect()
      .map(_.getDouble(2)).toSeq === Seq(9.5, 9.5))

    // an append omitting the column materializes the write-default;
    // explicit values are untouched (per-file default grouping)
    t = t.append(Seq((3L, "c")).toDF("id", "v"))
    t = t.append(Seq((4L, "d", 1.25)).toDF("id", "v", "score"))
    assert(t.newScan().toDF(spark).orderBy("id").collect()
      .map(_.getDouble(2)).toSeq === Seq(9.5, 9.5, 9.5, 1.25))

    // updateColumnDefault changes the write-default only
    t = t.updateSchema().updateColumnDefault("score", 2.5).commit()
    t = t.append(Seq((5L, "e")).toDF("id", "v"))
    assert(t.newScan().toDF(spark).orderBy("id").collect()
      .map(_.getDouble(2)).toSeq === Seq(9.5, 9.5, 9.5, 1.25, 2.5))
    assert(t.schema.findField("score").get.initialDefault === Some(9.5))

    // filters over the defaulted column apply to default-served rows too
    assert(t.newScan().toDF(spark).filter(col("score") === 9.5).count() === 3)
  }

  private def NestedFieldOf(id: Int, name: String, t: IcebergType) =
    graft.spec.NestedField(id, name, t, required = false)
}
