package graft.catalog

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.io.FileIO
import graft.spec._
import graft.spec.IcebergType._
import graft.table.GraftTable

/** HMS catalog over the real thrift wire (HmsStubMetastore serves
  * `ThriftHiveMetastore` on a socket; every call here crosses
  * TBinaryProtocol serialization): table CRUD + pointer layout, full
  * append/scan through the catalog, and the lock-bracketed commit CAS
  * under concurrency. */
class HmsCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("hms-catalog-spec")
    .getOrCreate()

  private lazy val ms = new HmsStubMetastore()
  private lazy val wh = java.nio.file.Files.createTempDirectory("graft-hms-").toString
  private def newCatalog() =
    new HmsCatalog(ms.connect(), "graftdb", wh, FileIO.fromSpark(spark))
  private lazy val catalog = { ms.start(); newCatalog() }

  override def afterAll(): Unit = { ms.stop(); spark.stop() }

  private val schema = IcebergSchema(0, Seq(
    NestedField(1, "id", LongT, required = false),
    NestedField(2, "seg", StringT, required = false),
    NestedField(3, "v", DoubleT, required = false)))

  test("create/load/list/exists/drop over the thrift wire") {
    catalog.createTable("h1", schema)
    assert(catalog.tableExists("h1"))
    assert(catalog.listTables() === Seq("h1"))
    val (md, v) = catalog.loadTable("h1")
    assert(v === 1 && md.currentSchema.fields.map(_.name) === Seq("id", "seg", "v"))

    // the HMS object carries the Iceberg pointer layout + Hive columns
    val t = ms.iface.get_table("graftdb", "h1")
    assert(t.getParameters.get("table_type") === "ICEBERG")
    assert(t.getParameters.get("metadata_location").endsWith("v1.metadata.json"))
    assert(t.getTableType === "EXTERNAL_TABLE")
    import scala.jdk.CollectionConverters._
    assert(t.getSd.getCols.asScala.map(c => (c.getName, c.getType)) ===
      Seq(("id", "bigint"), ("seg", "string"), ("v", "double")))

    assert(catalog.dropTable("h1"))
    assert(!catalog.tableExists("h1"))
  }

  test("append + scan + schema evolution through the HMS catalog") {
    import spark.implicits._
    var t = GraftTable.create("h2", catalog, schema)
    t = t.append((1L to 100L).map(i => (i, s"s${i % 4}", i * 0.5)).toDF("id", "seg", "v"))
    t = t.append((101L to 150L).map(i => (i, s"s${i % 4}", i * 0.5)).toDF("id", "seg", "v"))
    assert(t.newScan().toDF(spark).count() === 150)
    assert(GraftTable.load("h2", catalog).metadata.snapshots.size === 2)
    // alter_table moved the pointer and kept the trail
    val hm = ms.iface.get_table("graftdb", "h2")
    assert(hm.getParameters.get("metadata_location").endsWith("v3.metadata.json"))
    assert(hm.getParameters.containsKey("previous_metadata_location"))

    t = t.updateSchema().addColumn("note", StringT).commit()
    assert(GraftTable.load("h2", catalog).schema.findField("note").isDefined)
    assert(t.newScan().toDF(spark).columns.contains("note"))
  }

  test("concurrent commits serialize on the HMS lock; stale base aborts + retries") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    import spark.implicits._
    implicit val ec: ExecutionContext = ExecutionContext.global

    GraftTable.create("h3", catalog, schema)
    // 6 concurrent appenders, each with its OWN thrift connection (the
    // client is not thread-safe — same as any HMS deployment)
    val futures = (0 until 6).map { i =>
      Future {
        val cat = newCatalog()
        GraftTable.load("h3", cat).append(
          Seq((i.toLong, s"s$i", i * 1.0)).toDF("id", "seg", "v"))
      }
    }
    Await.result(Future.sequence(futures), 120.seconds)
    val t = GraftTable.load("h3", catalog)
    assert(t.metadata.snapshots.size === 6, "every commit must land exactly once")
    assert(t.newScan().toDF(spark).count() === 6)
    // the version chain advanced one CAS at a time
    val (_, v) = catalog.loadTable("h3")
    assert(v === 7)
  }

  test("rename moves the HMS binding under the table lock") {
    import spark.implicits._
    var t = GraftTable.create("h5", catalog, schema)
    t = t.append(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "seg", "v"))
    catalog.renameTable("h5", "h5r")
    assert(!catalog.tableExists("h5") && catalog.tableExists("h5r"))
    val moved = GraftTable.load("h5r", catalog)
    assert(moved.metadata.snapshots.size === 1)
    assert(moved.newScan().toDF(spark).count() === 2)
    // taken destination refuses; missing source refuses
    GraftTable.create("h5b", catalog, schema)
    intercept[IllegalArgumentException] { catalog.renameTable("h5b", "h5r") }
    intercept[IllegalArgumentException] { catalog.renameTable("h5", "x") }
  }

  test("register adopts an existing table; conflicting create refuses") {
    import spark.implicits._
    var src = GraftTable.create("h4src", catalog, schema)
    src = src.append(Seq((1L, "a", 1.0)).toDF("id", "seg", "v"))
    val loc = ms.iface.get_table("graftdb", "h4src")
      .getParameters.get("metadata_location")
    val md = catalog.registerTable("h4reg", loc)
    assert(md.snapshots.size === 1)
    assert(GraftTable.load("h4reg", catalog).newScan().toDF(spark).count() === 1)
    intercept[IllegalArgumentException] {
      catalog.registerTable("h4reg", loc)
    }
  }
}
