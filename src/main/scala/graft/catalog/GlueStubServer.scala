package graft.catalog

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.spec.Json
import graft.spec.Json._
import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode

/** Embedded metastore speaking the PUBLIC AWS Glue Data Catalog wire
  * protocol — the JSON-RPC surface the reference's Glue client calls
  * (crates/catalog/glue; AWS "target-prefixed" JSON 1.1: one POST per
  * operation with `X-Amz-Target: AWSGlue.<Operation>`). Serves the subset
  * the Iceberg-on-Glue protocol touches:
  *
  *   CreateDatabase / GetDatabase
  *   CreateTable / GetTable / GetTables / UpdateTable / DeleteTable
  *
  * Faithful semantics under test:
  *   - every table carries a server-assigned `VersionId` that bumps on
  *     each UpdateTable;
  *   - UpdateTable with a stale `VersionId` answers
  *     `ConcurrentModificationException` — Glue's OPTIMISTIC commit lock
  *     (no metastore-side table lock, unlike HMS);
  *   - CreateTable on an existing name answers `AlreadyExistsException`,
  *     lookups of unknown names `EntityNotFoundException`.
  *
  * Errors use the service JSON error shape: HTTP 400 with
  * `{"__type": "<Exception>", "Message": ...}`.
  */
final class GlueStubServer {

  /** (db, table) -> (versionId, table JSON incl. Parameters + SD). */
  private val tables = new ConcurrentHashMap[(String, String), (Long, ObjectNode)]()
  private val databases = new ConcurrentHashMap[String, ObjectNode]()
  private var server: HttpServer = _

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", handle _)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def handle(ex: HttpExchange): Unit = {
    val target = Option(ex.getRequestHeaders.getFirst("X-Amz-Target")).getOrElse("")
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val req = if (body.isEmpty) Json.obj() else Json.parse(body)
    try {
      val resp: JsonNode = target.stripPrefix("AWSGlue.") match {
        case "CreateDatabase" =>
          val in = req("DatabaseInput").asInstanceOf[ObjectNode]
          databases.put(in("Name").asText(), in)
          Json.obj()
        case "GetDatabase" =>
          val name = req("Name").asText()
          val db = databases.get(name)
          if (db == null) throw Err("EntityNotFoundException", s"Database $name not found")
          val o = Json.obj(); o.set[ObjectNode]("Database", db); o
        case "CreateTable" =>
          val db = req("DatabaseName").asText()
          requireDb(db)
          val in = req("TableInput").deepCopy[ObjectNode]()
          val name = in("Name").asText()
          val prev = tables.putIfAbsent((db, name), (1L, stamp(in, db, 1L)))
          if (prev != null) throw Err("AlreadyExistsException", s"Table $name already exists")
          Json.obj()
        case "GetTable" =>
          val key = (req("DatabaseName").asText(), req("Name").asText())
          val t = tables.get(key)
          if (t == null) throw Err("EntityNotFoundException", s"Table ${key._2} not found")
          val o = Json.obj(); o.set[ObjectNode]("Table", t._2); o
        case "GetTables" =>
          val db = req("DatabaseName").asText()
          val o = Json.obj()
          val a = Json.arr()
          tables.forEach { (k, v) => if (k._1 == db) a.add(v._2) }
          o.set[ObjectNode]("TableList", a); o
        case "DeleteTable" =>
          val key = (req("DatabaseName").asText(), req("Name").asText())
          if (tables.remove(key) == null)
            throw Err("EntityNotFoundException", s"Table ${key._2} not found")
          Json.obj()
        case "UpdateTable" =>
          val db = req("DatabaseName").asText()
          val in = req("TableInput").deepCopy[ObjectNode]()
          val name = in("Name").asText()
          val key = (db, name)
          // CAS bracket: Glue's optimistic locking on VersionId
          tables.synchronized {
            val cur = tables.get(key)
            if (cur == null) throw Err("EntityNotFoundException", s"Table $name not found")
            req.opt("VersionId").map(_.asText()).foreach { v =>
              if (v != cur._1.toString)
                throw Err("ConcurrentModificationException",
                  s"Table $name version $v is stale (current ${cur._1})")
            }
            val next = cur._1 + 1
            tables.put(key, (next, stamp(in, db, next)))
          }
          Json.obj()
        case other =>
          throw Err("InvalidInputException", s"Unsupported operation: $other")
      }
      respond(ex, 200, Json.write(resp))
    } catch {
      case Err(t, m) =>
        val o = Json.obj(); o.put("__type", t); o.put("Message", m)
        respond(ex, 400, Json.write(o))
      case e: Exception =>
        val o = Json.obj()
        o.put("__type", "InternalServiceException")
        o.put("Message", String.valueOf(e.getMessage))
        respond(ex, 500, Json.write(o))
    }
  }

  private def requireDb(db: String): Unit =
    if (!databases.containsKey(db))
      throw Err("EntityNotFoundException", s"Database $db not found")

  /** Server-owned fields Glue adds to a stored table. */
  private def stamp(in: ObjectNode, db: String, version: Long): ObjectNode = {
    val t = in.deepCopy[ObjectNode]()
    t.put("DatabaseName", db)
    t.put("VersionId", version.toString)
    t
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/x-amz-json-1.1")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private case class Err(errType: String, message: String)
    extends RuntimeException(message)
}
