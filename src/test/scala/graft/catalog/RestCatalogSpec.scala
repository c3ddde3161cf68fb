package graft.catalog

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.io.FileIO
import graft.spec._
import graft.spec.IcebergType._
import graft.table.GraftTable

/** REST catalog client against an in-process CAS server (JDK HttpServer):
  * create/load/commit/conflict/drop, plus a full append+scan through the
  * remote catalog. */
class RestCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("rest-catalog-spec")
    .getOrCreate()

  // ---- in-memory REST catalog server (CAS on metadata-location) ----
  private val tables = new ConcurrentHashMap[String, (String, String)]() // name -> (location, metadataJson)
  private var server: HttpServer = _
  private var port: Int = _

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    port = server.getAddress.getPort
    server.createContext("/v1/namespaces/default/tables", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath.stripPrefix("/v1/namespaces/default/tables")
      val name = path.stripPrefix("/")
      try (ex.getRequestMethod, name) match {
        case ("GET", "") =>
          val ids = tables.keySet().toArray.toSeq.map(n =>
            s"""{"namespace":["default"],"name":"$n"}""").mkString(",")
          respond(ex, 200, s"""{"identifiers":[$ids]}""")
        case ("POST", "") => // create
          val body = Json.parse(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
          val n = body.get("name").asText()
          val loc = s"mem://$n/v1"
          val prev = tables.putIfAbsent(n, (loc, body.get("metadata").toString))
          if (prev != null) respond(ex, 409, """{"error":"exists"}""")
          else respond(ex, 200, s"""{"metadata-location":"$loc"}""")
        case ("GET", n) =>
          Option(tables.get(n)) match {
            case Some((loc, md)) =>
              respond(ex, 200, s"""{"metadata-location":"$loc","metadata":$md}""")
            case None => respond(ex, 404, """{"error":"nope"}""")
          }
        case ("HEAD", n) =>
          val code = if (tables.containsKey(n)) 200 else 404
          ex.sendResponseHeaders(code, -1); ex.close()
        case ("DELETE", n) =>
          val code = if (tables.remove(n) != null) 204 else 404
          ex.sendResponseHeaders(code, -1); ex.close()
        case ("POST", n) => // commit (CAS on metadata-location)
          val body = Json.parse(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
          val base = body.get("base-metadata-location").asText()
          val newMd = body.get("metadata").toString
          val updated = tables.computeIfPresent(n, (_, cur) =>
            if (cur._1 == base) {
              val ver = base.split("/v").last.toInt + 1
              (s"mem://$n/v$ver", newMd)
            } else cur)
          if (updated == null) respond(ex, 404, """{"error":"nope"}""")
          else if (updated._2 eq newMd) respond(ex, 200,
            s"""{"metadata-location":"${updated._1}"}""")
          else respond(ex, 409, """{"error":"stale base"}""")
        case _ => respond(ex, 405, "{}")
      } catch {
        case e: Throwable => respond(ex, 500, s"""{"error":"${e.getMessage}"}""")
      }
    })
    server.start()
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def afterAll(): Unit = {
    server.stop(0)
    spark.stop()
  }

  private def catalog = new RestCatalog(s"http://127.0.0.1:$port", "default",
    FileIO.fromSpark(spark))

  private val schema = IcebergSchema(0, Seq(
    NestedField(1, "id", LongT, required = false),
    NestedField(2, "v", DoubleT, required = false)))

  test("create/load/list/exists/drop round-trip") {
    val cat = catalog
    GraftTable.create("r1", cat, schema)
    assert(cat.tableExists("r1"))
    assert(cat.listTables() === Seq("r1"))
    val (md, v) = cat.loadTable("r1")
    assert(md.currentSchema.fields.map(_.name) === Seq("id", "v"))
    assert(v >= 1) // client-side load counter (ETag analogue), not table version
    assert(cat.dropTable("r1"))
    assert(!cat.tableExists("r1"))
    intercept[IllegalArgumentException] { cat.loadTable("r1") }
  }

  test("commit CAS: stale base is a CommitConflict and retry succeeds") {
    val cat = catalog
    GraftTable.create("r2", cat, schema)
    val (md, v) = cat.loadTable("r2")
    cat.commitTable("r2", v, md.copy(lastUpdatedMs = 111L))
    // second commit against the consumed base version conflicts
    intercept[CommitConflict] {
      cat.commitTable("r2", v, md.copy(lastUpdatedMs = 222L))
    }
    // CommitRetry-driven actions recover by re-loading
    val t = GraftTable.load("r2", cat)
    val t2 = t.updateProperties(Map("owner" -> "rest"))
    assert(t2.metadata.properties("owner") === "rest")
  }

  test("full append + scan through the REST catalog") {
    import spark.implicits._
    val cat = catalog
    // metadata lives on the server; data/manifests go through FileIO to a
    // local warehouse dir (the server-assigned location is virtual, so
    // create through a real location via the table's metadata)
    var t = GraftTable.create("r3", cat, schema)
    // patch location to a writable dir through a property-free commit
    val dir = java.nio.file.Files.createTempDirectory("rest-wh-").toString
    val (md, v) = cat.loadTable("r3")
    cat.commitTable("r3", v, md.copy(location = dir))
    t = GraftTable.load("r3", cat)
    t = t.append(Seq((1L, 0.5), (2L, 1.5), (3L, 2.5)).toDF("id", "v"))
    assert(t.newScan().toDF(spark).count() === 3)
    assert(t.newScan().toDF(spark).orderBy("id").collect().map(_.getLong(0)).toSeq
      === Seq(1L, 2L, 3L))
  }
}
