package graft.catalog

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.spec.{IcebergSchema, Json, PartitionSpec, TableMetadata,
  TableRequirement, TableUpdate, TableUpdates}
import graft.spec.Json._

/** In-process REST catalog service speaking the spec's commit protocol —
  * the server half the reference's REST client (crates/catalog/rest) talks
  * to. JDK HttpServer, zero extra dependencies.
  *
  * The service OWNS the metadata: create builds the initial document and
  * assigns the location under `warehouse`; commit validates the request's
  * `requirements` against the CURRENT metadata, applies its `updates` via
  * `TableUpdate.applyTo` (recomputing derived fields — nothing derived is
  * trusted from the client), appends the metadata log, and answers 409 on
  * any violated assert so clients refresh-and-retry. Because validation is
  * per-requirement rather than a whole-document CAS, two non-overlapping
  * commits from the same base (say set-properties and add-snapshot) BOTH
  * land — the concurrency model the update-action protocol exists for.
  *
  * Routes (REST spec shape):
  * {{{
  *   GET    /v1/namespaces/{ns}/tables            list
  *   POST   /v1/namespaces/{ns}/tables            create (CreateTableRequest)
  *   GET    /v1/namespaces/{ns}/tables/{t}        load   (LoadTableResult)
  *   HEAD   /v1/namespaces/{ns}/tables/{t}        exists
  *   DELETE /v1/namespaces/{ns}/tables/{t}        drop
  *   POST   /v1/namespaces/{ns}/tables/{t}        commit (requirements+updates)
  * }}}
  */
final class RestCatalogServer(warehouse: String, namespace: String = "default") {

  /** name -> (metadata-location, version, metadata); mutated only inside
    * per-name synchronized commits. Tables live in the server's default
    * namespace; additional namespaces (below) hold their own table maps
    * via dynamically-registered routes. */
  private val tables = new ConcurrentHashMap[String, (String, Int, TableMetadata)]()

  /** Namespace registry: name -> properties. The REST spec's namespace
    * surface (list with pagination, create with properties, properties
    * update with updated/removed/missing echo, drop-if-empty) — the
    * routes the reference client drives (rest/src/catalog.rs:570-740). */
  private val namespaces = new ConcurrentHashMap[String, Map[String, String]]()
  namespaces.put(namespace, Map.empty)
  private var server: HttpServer = _

  // ---- optional OAuth2 (the server half of the reference client's
  //      client-credentials flow, client.rs:113-245) ----
  private var authClientId: Option[String] = None
  private var authClientSecret: Option[String] = None
  private val issuedTokens = ConcurrentHashMap.newKeySet[String]()
  private val tokenCounter = new java.util.concurrent.atomic.AtomicInteger()

  /** Demand `Authorization: Bearer <issued>` on every catalog route;
    * `/v1/oauth/tokens` mints tokens for this client-credentials pair. */
  def requireAuth(clientId: Option[String], clientSecret: String): Unit = {
    authClientId = clientId
    authClientSecret = Some(clientSecret)
  }

  /** Provision a bearer out of band (the static-`token` client mode). */
  def issueToken(): String = {
    val t = s"tok-${tokenCounter.incrementAndGet()}"
    issuedTokens.add(t)
    t
  }

  /** Test/ops hook: revoke every issued token (expiry simulation). */
  def invalidateTokens(): Unit = issuedTokens.clear()

  /** Config advertised at GET /v1/config (ConfigResponse: the client
    * merges defaults ++ its props ++ overrides). */
  @volatile var configDefaults: Map[String, String] = Map.empty
  @volatile var configOverrides: Map[String, String] = Map.empty

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext(s"/v1/namespaces/$namespace/tables", handle _)
    server.createContext(s"/v1/namespaces/$namespace/register", register _)
    server.createContext("/v1/namespaces", handleNamespaces _)
    server.createContext("/v1/tables/rename", handleRename _)
    server.createContext("/v1/oauth/tokens", handleTokens _)
    server.createContext("/v1/config", handleConfig _)
    server.start()
    server.getAddress.getPort
  }

  /** POST /v1/oauth/tokens: the client-credentials grant, form-encoded
    * (grant_type/client_id/client_secret) → `{"access_token": ...}`.
    * Never itself bearer-guarded. */
  private def handleTokens(ex: HttpExchange): Unit = try {
    if (ex.getRequestMethod != "POST") { respond(ex, 405, "{}"); return }
    val form = readBody(ex).split("&").filter(_.contains("="))
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
    val ok = authClientSecret.nonEmpty &&
      form.get("grant_type").contains("client_credentials") &&
      form.get("client_secret") == authClientSecret &&
      authClientId.forall(id => form.get("client_id").contains(id))
    if (!ok) respond(ex, 401, """{"error":"invalid_client"}""")
    else {
      val t = issueToken()
      respond(ex, 200,
        s"""{"access_token":"$t","token_type":"bearer","expires_in":3600}""")
    }
  } catch {
    case e: Throwable => respond(ex, 500, s"""{"error":${quote(e.toString)}}""")
  }

  private def handleConfig(ex: HttpExchange): Unit = try {
    if (!authorized(ex)) return
    val o = obj()
    def m(props: Map[String, String]) = {
      val p = obj()
      props.toSeq.sortBy(_._1).foreach { case (k, v) => p.put(k, v) }
      p
    }
    o.set[com.fasterxml.jackson.databind.node.ObjectNode]("defaults",
      m(configDefaults))
    o.set[com.fasterxml.jackson.databind.node.ObjectNode]("overrides",
      m(configOverrides))
    respond(ex, 200, Json.write(o))
  } catch {
    case e: Throwable => respond(ex, 500, s"""{"error":${quote(e.toString)}}""")
  }

  /** Bearer gate for catalog routes; 401 closes the exchange. */
  private def authorized(ex: HttpExchange): Boolean = {
    if (authClientSecret.isEmpty) return true
    val h = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
    val ok = h.startsWith("Bearer ") && issuedTokens.contains(h.stripPrefix("Bearer "))
    if (!ok) respond(ex, 401, """{"error":"unauthorized"}""")
    ok
  }

  /** Namespace CRUD + paginated listing. Longest-prefix routing sends
    * `/v1/namespaces/<default>/tables*` to the table handler; everything
    * else under `/v1/namespaces` lands here. */
  private def handleNamespaces(ex: HttpExchange): Unit = try {
    if (!authorized(ex)) return
    val rest = ex.getRequestURI.getPath.stripPrefix("/v1/namespaces")
      .stripPrefix("/")
    val query = Option(ex.getRequestURI.getQuery).getOrElse("")
    val params = query.split("&").filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
    (ex.getRequestMethod, rest.split("/").filter(_.nonEmpty).toList) match {
      case ("GET", Nil) =>
        // paginated: sorted names, pageToken = resume-after name
        val all = namespaces.keySet().toArray(Array.empty[String]).toSeq.sorted
        val after = params.get("pageToken").map(t =>
          all.dropWhile(_ <= t)).getOrElse(all)
        val size = params.get("pageSize").flatMap(_.toIntOption).getOrElse(all.size)
        val page = after.take(math.max(size, 0))
        val o = obj()
        val a = arr()
        page.foreach { n => val e = arr(); e.add(n); a.add(e) }
        o.set[com.fasterxml.jackson.databind.node.ArrayNode]("namespaces", a)
        if (page.nonEmpty && after.size > page.size)
          o.put("next-page-token", page.last)
        respond(ex, 200, Json.write(o))
      case ("POST", Nil) =>
        val body = Json.parse(readBody(ex))
        val ns = body("namespace").elems.map(_.asText()).mkString(".")
        val props = body.opt("properties")
          .map(_.fieldsMap.map { case (k, v) => k -> v.asText() }).getOrElse(Map.empty)
        if (namespaces.putIfAbsent(ns, props) != null)
          respond(ex, 409, """{"error":"namespace already exists"}""")
        else {
          val o = obj()
          val e = arr(); e.add(ns)
          o.set[com.fasterxml.jackson.databind.node.ArrayNode]("namespace", e)
          respond(ex, 200, Json.write(o))
        }
      case ("GET", ns :: Nil) =>
        Option(namespaces.get(ns)) match {
          case None => respond(ex, 404, """{"error":"no such namespace"}""")
          case Some(props) =>
            val o = obj()
            val e = arr(); e.add(ns)
            o.set[com.fasterxml.jackson.databind.node.ArrayNode]("namespace", e)
            val p = obj()
            props.toSeq.sortBy(_._1).foreach { case (k, v) => p.put(k, v) }
            o.set[com.fasterxml.jackson.databind.node.ObjectNode]("properties", p)
            respond(ex, 200, Json.write(o))
        }
      case ("HEAD", ns :: Nil) =>
        ex.sendResponseHeaders(if (namespaces.containsKey(ns)) 200 else 404, -1)
        ex.close()
      case ("DELETE", ns :: Nil) =>
        if (!namespaces.containsKey(ns)) { respond(ex, 404, "{}"); return }
        // drop-if-empty: the default namespace owns `tables`
        if (ns == namespace && !tables.isEmpty)
          respond(ex, 409, """{"error":"namespace is not empty"}""")
        else { namespaces.remove(ns); ex.sendResponseHeaders(204, -1); ex.close() }
      case ("POST", ns :: "properties" :: Nil) =>
        val body = Json.parse(readBody(ex))
        namespaces.synchronized {
          Option(namespaces.get(ns)) match {
            case None => respond(ex, 404, """{"error":"no such namespace"}""")
            case Some(props) =>
              val removals = body.opt("removals")
                .map(_.elems.map(_.asText())).getOrElse(Nil)
              val updates = body.opt("updates")
                .map(_.fieldsMap.map { case (k, v) => k -> v.asText() })
                .getOrElse(Map.empty)
              val missing = removals.filterNot(props.contains)
              val next = (props -- removals) ++ updates
              namespaces.put(ns, next)
              val o = obj()
              def strArr(xs: Iterable[String]) = {
                val a = arr(); xs.toSeq.sorted.foreach(a.add); a
              }
              o.set[com.fasterxml.jackson.databind.node.ArrayNode]("updated",
                strArr(updates.keys))
              o.set[com.fasterxml.jackson.databind.node.ArrayNode]("removed",
                strArr(removals.filter(props.contains)))
              o.set[com.fasterxml.jackson.databind.node.ArrayNode]("missing",
                strArr(missing))
              respond(ex, 200, Json.write(o))
          }
        }
      case _ => respond(ex, 405, "{}")
    }
  } catch {
    case e: Throwable => respond(ex, 500, s"""{"error":${quote(e.toString)}}""")
  }

  /** POST /v1/tables/rename {source, destination} (REST spec; reference
    * rename_table catalog.rs:965). 404 unknown source, 409 taken
    * destination; metadata and location are untouched — rename is a
    * catalog-pointer move. */
  private def handleRename(ex: HttpExchange): Unit = try {
    if (!authorized(ex)) return
    if (ex.getRequestMethod != "POST") { respond(ex, 405, "{}"); return }
    val body = Json.parse(readBody(ex))
    val src = body("source")("name").asText()
    val dst = body("destination")("name").asText()
    tables.synchronized {
      Option(tables.get(src)) match {
        case None => respond(ex, 404, """{"error":"no such table"}""")
        case Some(entry) =>
          if (tables.containsKey(dst))
            respond(ex, 409, """{"error":"destination exists"}""")
          else {
            tables.remove(src)
            tables.put(dst, entry)
            ex.sendResponseHeaders(204, -1); ex.close()
          }
      }
    }
  } catch {
    case e: Throwable => respond(ex, 500, s"""{"error":${quote(e.toString)}}""")
  }

  /** POST /register {name, metadata-location}: adopt an existing table's
    * metadata file as this catalog's current version (REST spec
    * RegisterTableRequest). */
  private def register(ex: HttpExchange): Unit =
    try {
      if (!authorized(ex)) return
      if (ex.getRequestMethod != "POST") { respond(ex, 405, "{}"); return }
      val body = Json.parse(readBody(ex))
      val n = body("name").asText()
      val loc = body("metadata-location").asText()
      val md = TableMetadata.fromJsonString(
        graft.io.FileIO.local().readString(loc))
      if (tables.putIfAbsent(n, (loc, 1, md)) != null)
        respond(ex, 409, """{"error":"table already exists"}""")
      else respond(ex, 200, loadResult(loc, md))
    } catch {
      case e: Throwable => respond(ex, 400, s"""{"error":${quote(e.getMessage)}}""")
    }

  def stop(): Unit = if (server != null) server.stop(0)

  def uri: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  /** Direct metadata peek for tests/ops tooling. */
  def currentMetadata(name: String): Option[TableMetadata] =
    Option(tables.get(name)).map(_._3)

  private def metadataLocation(name: String, v: Int) =
    s"$warehouse/$name/metadata/v$v.metadata.json"

  private def handle(ex: HttpExchange): Unit = {
    if (!authorized(ex)) return
    val name = ex.getRequestURI.getPath
      .stripPrefix(s"/v1/namespaces/$namespace/tables").stripPrefix("/")
    try (ex.getRequestMethod, name) match {
      case ("GET", "") =>
        // paginated (REST spec pageToken/pageSize; reference
        // catalog.rs:742-764 loops until next-page-token disappears)
        val query = Option(ex.getRequestURI.getQuery).getOrElse("")
        val params = query.split("&").filter(_.contains("="))
          .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
        val all = tables.keySet().toArray(Array.empty[String]).toSeq.sorted
        val after = params.get("pageToken").map(t =>
          all.dropWhile(_ <= t)).getOrElse(all)
        val size = params.get("pageSize").flatMap(_.toIntOption).getOrElse(all.size)
        val page = after.take(math.max(size, 0))
        val ids = page.map(n =>
          s"""{"namespace":["$namespace"],"name":"$n"}""").mkString(",")
        val tok =
          if (page.nonEmpty && after.size > page.size)
            s""","next-page-token":"${page.last}""""
          else ""
        respond(ex, 200, s"""{"identifiers":[$ids]$tok}""")

      case ("POST", "") => create(ex)

      case ("GET", n) =>
        Option(tables.get(n)) match {
          case Some((loc, _, md)) => respond(ex, 200, loadResult(loc, md))
          case None => respond(ex, 404, """{"error":"no such table"}""")
        }

      case ("HEAD", n) =>
        ex.sendResponseHeaders(if (tables.containsKey(n)) 200 else 404, -1)
        ex.close()

      case ("DELETE", n) =>
        ex.sendResponseHeaders(if (tables.remove(n) != null) 204 else 404, -1)
        ex.close()

      case ("POST", n) => commit(ex, n)

      case _ => respond(ex, 405, "{}")
    } catch {
      case e: Throwable =>
        respond(ex, 500, s"""{"error":${quote(e.toString)}}""")
    }
  }

  private def create(ex: HttpExchange): Unit = {
    val body = Json.parse(readBody(ex))
    val n = body("name").asText()
    val schema = IcebergSchema.schemaFromJson(body("schema"))
    val spec = body.opt("partition-spec").map(PartitionSpec.fromJson)
      .getOrElse(PartitionSpec.unpartitioned)
    val props = body.opt("properties")
      .map(_.fieldsMap.map { case (k, v) => k -> v.asText() }).getOrElse(Map.empty)
    // the service assigns the location — clients never pick paths
    val md = TableMetadata.newTable(s"$warehouse/$n", schema, spec, props)
    val loc = metadataLocation(n, 1)
    if (tables.putIfAbsent(n, (loc, 1, md)) != null)
      respond(ex, 409, """{"error":"table already exists"}""")
    else respond(ex, 200, loadResult(loc, md))
  }

  private def commit(ex: HttpExchange, n: String): Unit = {
    val body = Json.parse(readBody(ex))
    val reqs = body.opt("requirements").map(_.elems.map(TableRequirement.fromJson))
      .getOrElse(Nil)
    val updates = body.opt("updates").map(_.elems.map(TableUpdate.fromJson))
      .getOrElse(Nil)
    // per-table critical section: requirement checks and apply must see a
    // stable current metadata (the DB-transaction analogue)
    val result = tables.synchronized {
      Option(tables.get(n)) match {
        case None => Left((404, """{"error":"no such table"}"""))
        case Some((loc, v, current)) =>
          try {
            reqs.foreach(_.check(current))
            val applied = TableUpdates.applyAll(current, updates)
            // the metadata log is service-owned: record the predecessor,
            // capped by write.metadata.previous-versions-max
            val cap = applied.properties.get("write.metadata.previous-versions-max")
              .flatMap(_.toIntOption).getOrElse(100)
            val now = System.currentTimeMillis()
            val stamped = applied.copy(
              metadataLog = (applied.metadataLog :+ (loc, current.lastUpdatedMs))
                .takeRight(cap),
              lastUpdatedMs = math.max(applied.lastUpdatedMs, now))
            val newLoc = metadataLocation(n, v + 1)
            tables.put(n, (newLoc, v + 1, stamped))
            Right(loadResult(newLoc, stamped))
          } catch {
            // violated requirement / non-monotonic update => concurrent
            // writer won; client refreshes and retries
            case e: IllegalStateException => Left((409, conflictBody(e)))
            case e: IllegalArgumentException => Left((400, conflictBody(e)))
          }
      }
    }
    result match {
      case Right(bodyOut) => respond(ex, 200, bodyOut)
      case Left((code, bodyOut)) => respond(ex, code, bodyOut)
    }
  }

  private def conflictBody(e: Throwable) = s"""{"error":${quote(e.getMessage)}}"""

  private def loadResult(loc: String, md: TableMetadata): String = {
    val o = obj()
    o.put("metadata-location", loc)
    o.set[com.fasterxml.jackson.databind.node.ObjectNode]("metadata", md.toJson)
    Json.write(o)
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def quote(s: String): String =
    Json.write(Json.obj().put("m", if (s == null) "" else s)("m"))

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }
}
