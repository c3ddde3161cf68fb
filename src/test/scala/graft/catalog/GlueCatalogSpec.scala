package graft.catalog

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.io.FileIO
import graft.spec._
import graft.spec.IcebergType._
import graft.table.GraftTable

/** Glue catalog over the public AWS JSON wire (GlueStubServer serves the
  * target-prefixed JSON-1.1 protocol on a real socket; every call here is
  * an HTTP round-trip): table CRUD + Iceberg pointer layout, full
  * append/scan through the catalog, and the VersionId-optimistic commit
  * CAS under concurrency — Glue's lock-free protocol, unlike the HMS
  * lock bracket. */
class GlueCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("glue-catalog-spec")
    .getOrCreate()

  private lazy val server = new GlueStubServer()
  private lazy val wh = java.nio.file.Files.createTempDirectory("graft-glue-").toString
  private lazy val endpoint = { val port = server.start(); s"http://127.0.0.1:$port" }
  private def newCatalog() =
    new GlueCatalog(endpoint, "graftdb", wh, FileIO.fromSpark(spark))
  private lazy val catalog = newCatalog()

  override def afterAll(): Unit = { server.stop(); spark.stop() }

  private val schema = IcebergSchema(0, Seq(
    NestedField(1, "id", LongT, required = false),
    NestedField(2, "seg", StringT, required = false),
    NestedField(3, "v", DoubleT, required = false)))

  test("create/load/list/exists/drop over the Glue JSON wire") {
    catalog.createTable("g1", schema)
    assert(catalog.tableExists("g1"))
    assert(catalog.listTables() === Seq("g1"))
    val (md, v) = catalog.loadTable("g1")
    assert(v === 1 && md.currentSchema.fields.map(_.name) === Seq("id", "seg", "v"))

    // raw GetTable: Iceberg pointer parameters + Glue-typed columns with
    // the iceberg.field.* column parameters (glue schema.rs contract)
    val req = Json.obj(); req.put("DatabaseName", "graftdb"); req.put("Name", "g1")
    val conn = java.net.URI.create(endpoint).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setRequestProperty("X-Amz-Target", "AWSGlue.GetTable")
    conn.setDoOutput(true)
    conn.getOutputStream.write(Json.write(req).getBytes("UTF-8"))
    import Json.NodeOps
    val t = Json.parse(new String(conn.getInputStream.readAllBytes(), "UTF-8"))("Table")
    assert(t("Parameters")("table_type").asText() === "ICEBERG")
    // UUID-suffixed so racing committers never share a path
    assert(t("Parameters")("metadata_location").asText()
      .matches(""".*/metadata/v1-[0-9a-f]{8}\.metadata\.json"""))
    assert(t("TableType").asText() === "EXTERNAL_TABLE")
    val cols = t("StorageDescriptor")("Columns").elems
    assert(cols.map(c => (c("Name").asText(), c("Type").asText())) ===
      Seq(("id", "bigint"), ("seg", "string"), ("v", "double")))
    assert(cols.forall(c => c("Parameters").opt("iceberg.field.id").isDefined))

    assert(catalog.dropTable("g1"))
    assert(!catalog.tableExists("g1"))
  }

  test("append + scan + schema evolution through the Glue catalog") {
    import spark.implicits._
    var t = GraftTable.create("g2", catalog, schema)
    t = t.append((1L to 100L).map(i => (i, s"s${i % 4}", i * 0.5)).toDF("id", "seg", "v"))
    t = t.append((101L to 150L).map(i => (i, s"s${i % 4}", i * 0.5)).toDF("id", "seg", "v"))
    assert(t.newScan().toDF(spark).count() === 150)
    assert(GraftTable.load("g2", catalog).metadata.snapshots.size === 2)
    // UpdateTable moved the pointer and kept the previous-location trail
    val (tn, _) = {
      val c = newCatalog()
      val (md, v) = c.loadTable("g2"); (md, v)
    }
    assert(tn.snapshots.size === 2)
    val (_, ver) = catalog.loadTable("g2")
    assert(ver === 3)

    t = t.updateSchema().addColumn("note", StringT).commit()
    assert(GraftTable.load("g2", catalog).schema.findField("note").isDefined)
    assert(t.newScan().toDF(spark).columns.contains("note"))
  }

  test("concurrent commits serialize on Glue VersionId CAS; stale base aborts + retries") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    import spark.implicits._
    implicit val ec: ExecutionContext = ExecutionContext.global

    GraftTable.create("g3", catalog, schema)
    val futures = (0 until 6).map { i =>
      Future {
        val cat = newCatalog()
        GraftTable.load("g3", cat).append(
          Seq((i.toLong, s"s$i", i * 1.0)).toDF("id", "seg", "v"))
      }
    }
    Await.result(Future.sequence(futures), 120.seconds)
    val t = GraftTable.load("g3", catalog)
    assert(t.metadata.snapshots.size === 6, "every commit must land exactly once")
    assert(t.newScan().toDF(spark).count() === 6)
    val (_, v) = catalog.loadTable("g3")
    assert(v === 7)
  }

  test("register adopts an existing table; conflicting create refuses") {
    import spark.implicits._
    var src = GraftTable.create("g4src", catalog, schema)
    src = src.append(Seq((1L, "a", 1.0)).toDF("id", "seg", "v"))
    val loc = catalog.currentMetadataLocation("g4src").get
    val md = catalog.registerTable("g4reg", loc)
    assert(md.snapshots.size === 1)
    assert(GraftTable.load("g4reg", catalog).newScan().toDF(spark).count() === 1)
    intercept[IllegalArgumentException] {
      catalog.registerTable("g4reg", loc)
    }
  }

  test("stale VersionId answers ConcurrentModificationException on the wire") {
    catalog.createTable("g5", schema)
    val (md, v1) = catalog.loadTable("g5")
    // first commit from base v1 wins...
    catalog.commitTable("g5", v1, md)
    // ...a second commit from the SAME stale base must conflict
    intercept[CommitConflict] {
      catalog.commitTable("g5", v1, md)
    }
  }
}
