package graft.catalog

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.io.FileIO
import graft.spec._
import graft.spec.IcebergType._
import graft.table.GraftTable

/** S3Tables catalog over the REST wire (S3TablesStubServer on a real
  * socket): service-owned table locations, the no-metadata-until-first-
  * update lifecycle, and versionToken CAS commits under concurrency. */
class S3TablesCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("s3tables-catalog-spec")
    .getOrCreate()

  private lazy val wh = java.nio.file.Files.createTempDirectory("graft-s3t-").toString
  private lazy val server = new S3TablesStubServer(wh)
  private lazy val endpoint = { val port = server.start(); s"http://127.0.0.1:$port" }
  private def newCatalog() =
    new S3TablesCatalog(endpoint, "ns1", FileIO.fromSpark(spark))
  private lazy val catalog = newCatalog()

  override def afterAll(): Unit = { server.stop(); spark.stop() }

  private val schema = IcebergSchema(0, Seq(
    NestedField(1, "id", LongT, required = false),
    NestedField(2, "seg", StringT, required = false),
    NestedField(3, "v", DoubleT, required = false)))

  test("create adopts the SERVICE-minted location; CRUD over the wire") {
    val md = catalog.createTable("t1", schema)
    // the catalog did not get to choose the directory: location is the
    // service's opaque path, not warehouse/<name>
    assert(md.location.startsWith(s"$wh/ns1/t1-"))
    assert(md.location !== s"$wh/t1")
    assert(catalog.tableExists("t1"))
    assert(catalog.listTables() === Seq("t1"))
    val (loaded, v) = catalog.loadTable("t1")
    assert(v === 1 && loaded.currentSchema.fields.map(_.name) === Seq("id", "seg", "v"))
    assert(catalog.dropTable("t1"))
    assert(!catalog.tableExists("t1"))
    assert(!catalog.dropTable("t1"))
  }

  test("append + scan + schema evolution through the s3tables catalog") {
    import spark.implicits._
    var t = GraftTable.create("t2", catalog, schema)
    t = t.append((1L to 100L).map(i => (i, s"s${i % 4}", i * 0.5)).toDF("id", "seg", "v"))
    t = t.append((101L to 150L).map(i => (i, s"s${i % 4}", i * 0.5)).toDF("id", "seg", "v"))
    assert(t.newScan().toDF(spark).count() === 150)
    assert(GraftTable.load("t2", catalog).metadata.snapshots.size === 2)
    val (_, ver) = catalog.loadTable("t2")
    assert(ver === 3)
    t = t.updateSchema().addColumn("note", StringT).commit()
    assert(GraftTable.load("t2", catalog).schema.findField("note").isDefined)
  }

  test("concurrent commits serialize on the versionToken CAS") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    import spark.implicits._
    implicit val ec: ExecutionContext = ExecutionContext.global

    GraftTable.create("t3", catalog, schema)
    val futures = (0 until 6).map { i =>
      Future {
        val cat = newCatalog()
        GraftTable.load("t3", cat).append(
          Seq((i.toLong, s"s$i", i * 1.0)).toDF("id", "seg", "v"))
      }
    }
    Await.result(Future.sequence(futures), 120.seconds)
    val t = GraftTable.load("t3", catalog)
    assert(t.metadata.snapshots.size === 6, "every commit must land exactly once")
    assert(t.newScan().toDF(spark).count() === 6)
    val (_, v) = catalog.loadTable("t3")
    assert(v === 7)
  }

  test("stale version token conflicts; register adopts external metadata") {
    catalog.createTable("t4", schema)
    val (md, v1) = catalog.loadTable("t4")
    catalog.commitTable("t4", v1, md)
    intercept[CommitConflict] {
      catalog.commitTable("t4", v1, md)
    }

    import spark.implicits._
    var src = GraftTable.create("t5src", catalog, schema)
    src = src.append(Seq((1L, "a", 1.0)).toDF("id", "seg", "v"))
    val srcLoc = catalog.currentMetadataLocation("t5src").get
    val reg = catalog.registerTable("t5reg", srcLoc)
    assert(reg.snapshots.size === 1)
    assert(GraftTable.load("t5reg", catalog).newScan().toDF(spark).count() === 1)
  }
}
