package graft.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.expr.Predicate
import graft.io.FileIO
import graft.spec._
import graft.spec.IcebergType._

/** Migration path: addFiles registers foreign parquet (no field ids)
  * without rewriting; name mapping keeps the scan id-addressed across
  * renames. */
class AddFilesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("addfiles-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("name mapping JSON round-trips") {
    val nm = NameMapping(Seq(MappedField(1, Seq("id")), MappedField(2, Seq("v", "value"))))
    val round = NameMapping.fromJsonString(nm.toJsonString)
    assert(round === nm)
    assert(round.byName("value") === 2)
    assert(round.namesOf(2) === Seq("v", "value"))
  }

  test("addFiles registers foreign parquet; scan + stats pruning work") {
    import spark.implicits._
    // plain Spark write: NO field ids in the footers
    val dir = java.nio.file.Files.createTempDirectory("foreign-").toString
    (1L to 50L).map(i => (i, i * 2.0)).toDF("id", "v")
      .repartition(2).write.parquet(s"$dir/raw")
    val files = FileIO.fromSpark(spark).listFiles(s"$dir/raw")
      .map(_._1).filter(_.endsWith(".parquet"))

    val catalog = new HadoopCatalog(
      java.nio.file.Files.createTempDirectory("graft-add-").toString,
      FileIO.fromSpark(spark))
    val schema = IcebergSchema(0, Seq(
      NestedField(1, "id", LongT, required = false),
      NestedField(2, "v", DoubleT, required = false)))
    var t = GraftTable.create("migrated", catalog, schema)
    t = t.addFiles(spark, files)

    assert(t.metadata.properties.contains(NameMapping.PropertyKey))
    val df = t.newScan().toDF(spark)
    assert(df.count() === 50)
    assert(df.agg(sum("id")).head.getLong(0) === (1L to 50L).sum)

    // harvested stats drive metrics pruning on the foreign files
    val (planned, all) = t.newScan()
      .withFilter(Predicate.eqTo("id", 1L)).planSummary()
    assert(all === files.size)
    assert(planned <= all)
  }

  test("rename after migration: mapping alias keeps old files readable") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("foreign2-").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "old_name").write.parquet(s"$dir/raw")
    val files = FileIO.fromSpark(spark).listFiles(s"$dir/raw")
      .map(_._1).filter(_.endsWith(".parquet"))

    val catalog = new HadoopCatalog(
      java.nio.file.Files.createTempDirectory("graft-add2-").toString,
      FileIO.fromSpark(spark))
    val schema = IcebergSchema(0, Seq(
      NestedField(1, "id", LongT, required = false),
      NestedField(2, "old_name", StringT, required = false)))
    var t = GraftTable.create("migrated2", catalog, schema)
    t = t.addFiles(spark, files)
    // rename: canonical name changes, mapping still lists the physical one
    t = t.updateSchema().renameColumn("old_name", "new_name").commit()

    val rows = t.newScan().toDF(spark).orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq === Seq("a", "b"))
    assert(t.newScan().toDF(spark).columns.toSeq === Seq("id", "new_name"))
  }
}
