package graft.catalog

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.io.FileIO
import graft.spec.{IcebergSchema, Json, PartitionSpec, TableMetadata, TableUpdates}
import graft.spec.Json._

/** REST catalog client (reference crates/catalog/rest): table state lives
  * behind an HTTP service; commits are server-side, which is what makes
  * optimistic concurrency safe on object stores where a rename-based
  * Hadoop catalog is not atomic.
  *
  * Speaks the spec's commit model (catalog/mod.rs:382-404 CommitTableRequest):
  *   - create: `CreateTableRequest {name, schema, partition-spec, properties}`
  *     — the SERVICE assigns the location and builds the initial metadata.
  *   - commit: `{"requirements": [...], "updates": [...]}` — the client
  *     diffs its base against the updated metadata into declarative update
  *     actions (`TableUpdates.diff`) guarded by requirement asserts; the
  *     service validates the asserts against ITS current metadata, applies
  *     the actions, and answers 409 on violation (`CommitConflict` here,
  *     which `CommitRetry` resolves by re-loading). Derived fields and the
  *     metadata log are service-owned — the full document never crosses the
  *     wire on commit.
  *
  * Versioning: the `Catalog` trait speaks integer versions; this client maps
  * them to (metadata-location, metadata) pairs per load (the REST analogue
  * of an ETag) so `commitTable(baseVersion)` can diff from the right base.
  *
  * Auth (reference rest/src/client.rs:34-245): three modes — none, a static
  * bearer `token`, or OAuth2 client-credentials (`credential` =
  * `client_id:client_secret` or bare secret) exchanged at
  * `oauth2-server-uri` (default `{uri}/v1/oauth/tokens`) and cached. The
  * static token takes precedence over the credential. With a credential, a
  * 401 invalidates the cached token and retries once on a fresh one (the
  * reference's invalidate/regenerate pair).
  */
final class RestCatalog(baseUri: String, namespace: String, val io: FileIO,
    props: Map[String, String] = Map.empty) extends Catalog {

  private val http = HttpClient.newHttpClient()

  private val staticToken: Option[String] = props.get("token")
  /** (client_id?, client_secret) per the reference's split-once parse
    * (catalog.rs:254-263). */
  private val credential: Option[(Option[String], String)] =
    props.get("credential").map { c =>
      c.split(":", 2) match {
        case Array(id, secret) => (Some(id), secret)
        case _ => (None, c)
      }
    }
  private val tokenEndpoint: String =
    props.getOrElse("oauth2-server-uri", s"$baseUri/v1/oauth/tokens")
  @volatile private var cachedToken: Option[String] = staticToken

  /** form-POST `grant_type=client_credentials` (client.rs:113-180). */
  private def exchangeCredentialForToken(): String = {
    val (id, secret) = credential.getOrElse(throw new IllegalStateException(
      "credential must be provided for authentication"))
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val form = (Seq("grant_type" -> "client_credentials") ++
      id.map("client_id" -> _) ++ Seq("client_secret" -> secret))
      .map { case (k, v) => s"$k=${enc(v)}" }.mkString("&")
    val req = HttpRequest.newBuilder(URI.create(tokenEndpoint))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(form, StandardCharsets.UTF_8))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200,
      s"token exchange failed (${resp.statusCode()}): ${resp.body()}")
    Json.parse(resp.body())("access_token").asText()
  }

  private def bearer(): Option[String] =
    if (staticToken.isEmpty && credential.isEmpty) None
    else cachedToken.orElse {
      val t = exchangeCredentialForToken()
      cachedToken = Some(t)
      Some(t)
    }

  /** Server-advertised config (reference config_endpoint + ConfigResponse):
    * effective props = server defaults ++ client props ++ server overrides.
    * A service without the endpoint just yields the client props. */
  lazy val effectiveProps: Map[String, String] = {
    val resp = send(get(s"$baseUri/v1/config"))
    if (resp.statusCode() != 200) props
    else {
      val n = Json.parse(resp.body())
      def m(f: String) = n.opt(f)
        .map(_.fieldsMap.map { case (k, v) => k -> v.asText() })
        .getOrElse(Map.empty[String, String])
      m("defaults") ++ props ++ m("overrides")
    }
  }
  private val versions =
    new ConcurrentHashMap[String, ConcurrentHashMap[Int, (String, TableMetadata)]]()
  private val counters = new ConcurrentHashMap[String, AtomicInteger]()

  private def tablesUri = s"$baseUri/v1/namespaces/$namespace/tables"

  /** REST register sends the LOCATION — the service reads the metadata
    * (RegisterTableRequest), so the default read-then-adopt path is
    * bypassed. */
  override def registerTable(name: String, metadataLocation: String): TableMetadata = {
    val body = obj()
    body.put("name", name)
    body.put("metadata-location", metadataLocation)
    val resp = send(post(s"$baseUri/v1/namespaces/$namespace/register", body.toString))
    require(resp.statusCode() == 200 || resp.statusCode() == 201,
      s"register failed: ${resp.statusCode()} ${resp.body()}")
    loadTable(name)._1
  }

  override protected def registerParsed(name: String, md: TableMetadata): Unit =
    throw new UnsupportedOperationException("REST register goes through registerTable")

  private def record(name: String, location: String, md: TableMetadata): Int = {
    val v = counters.computeIfAbsent(name, _ => new AtomicInteger()).incrementAndGet()
    val m = versions.computeIfAbsent(name,
      _ => new ConcurrentHashMap[Int, (String, TableMetadata)]())
    m.put(v, (location, md))
    // retain a short window of bases (commit must follow a recent load)
    m.keySet().removeIf(k => k < v - 16)
    v
  }

  override def createTable(name: String, schema: IcebergSchema, spec: PartitionSpec,
      properties: Map[String, String]): TableMetadata = {
    val body = obj()
    body.put("name", name)
    body.set[ObjectNode]("schema", schema.toJson)
    body.set[ObjectNode]("partition-spec", spec.toJson)
    val props = obj()
    properties.toSeq.sortBy(_._1).foreach { case (k, v) => props.put(k, v) }
    body.set[ObjectNode]("properties", props)
    val resp = send(post(tablesUri, body.toString))
    require(resp.statusCode() == 200 || resp.statusCode() == 201,
      s"create failed (${resp.statusCode()}): ${resp.body()}")
    val n = Json.parse(resp.body())
    val md = TableMetadata.fromJson(n("metadata"))
    record(name, n("metadata-location").asText(), md)
    md
  }

  override def loadTable(name: String): (TableMetadata, Int) = {
    val resp = send(get(s"$tablesUri/$name"))
    if (resp.statusCode() == 404)
      throw new IllegalArgumentException(s"no such table: $name")
    require(resp.statusCode() == 200, s"load failed (${resp.statusCode()})")
    val n = Json.parse(resp.body())
    val md = TableMetadata.fromJson(n("metadata"))
    val v = record(name, n("metadata-location").asText(), md)
    (md, v)
  }

  override def tableExists(name: String): Boolean =
    send(head(s"$tablesUri/$name")).statusCode() == 200 ||
      send(get(s"$tablesUri/$name")).statusCode() == 200

  override def dropTable(name: String): Boolean =
    send(delete(s"$tablesUri/$name")).statusCode() == 204

  override def listTables(): Seq[String] = {
    // page through next-page-token exactly like the reference client
    // (catalog.rs:742-764) — a 100k-table namespace never arrives as one
    // response body
    val out = Seq.newBuilder[String]
    var token: Option[String] = None
    var more = true
    while (more) {
      val uri = tablesUri + s"?pageSize=$PageSize" +
        token.map(t => s"&pageToken=$t").getOrElse("")
      val resp = send(get(uri))
      require(resp.statusCode() == 200, s"list failed (${resp.statusCode()})")
      val n = Json.parse(resp.body())
      out ++= n("identifiers").elems.map(_("name").asText())
      token = n.opt("next-page-token").map(_.asText())
      more = token.isDefined
    }
    out.result().sorted
  }

  private val PageSize = 1000

  // ---- namespace surface (REST spec; reference catalog.rs:570-740) ----

  override def createNamespace(ns: String, properties: Map[String, String]): Unit = {
    val body = obj()
    val e = Json.arr(); e.add(ns)
    body.set[ArrayNode]("namespace", e)
    val props = obj()
    properties.toSeq.sortBy(_._1).foreach { case (k, v) => props.put(k, v) }
    body.set[ObjectNode]("properties", props)
    val resp = send(post(s"$baseUri/v1/namespaces", body.toString))
    require(resp.statusCode() == 200, s"createNamespace failed: ${resp.body()}")
  }

  override def listNamespaces(): Seq[String] = {
    val out = Seq.newBuilder[String]
    var token: Option[String] = None
    var more = true
    while (more) {
      val uri = s"$baseUri/v1/namespaces?pageSize=$PageSize" +
        token.map(t => s"&pageToken=$t").getOrElse("")
      val resp = send(get(uri))
      require(resp.statusCode() == 200, s"listNamespaces failed (${resp.statusCode()})")
      val n = Json.parse(resp.body())
      out ++= n("namespaces").elems.map(_.elems.map(_.asText()).mkString("."))
      token = n.opt("next-page-token").map(_.asText())
      more = token.isDefined
    }
    withAncestors(out.result()).sorted
  }

  override def namespaceExists(ns: String): Boolean =
    send(head(s"$baseUri/v1/namespaces/$ns")).statusCode() == 200

  override def namespaceProperties(ns: String): Map[String, String] =
    loadNamespace(ns)

  def loadNamespace(ns: String): Map[String, String] = {
    val resp = send(get(s"$baseUri/v1/namespaces/$ns"))
    require(resp.statusCode() == 200, s"no such namespace: $ns")
    Json.parse(resp.body()).opt("properties")
      .map(_.fieldsMap.map { case (k, v) => k -> v.asText() }).getOrElse(Map.empty)
  }

  override def updateNamespaceProperties(ns: String, sets: Map[String, String],
      removes: Set[String]): Unit = {
    updateNamespaceProperties(ns, sets, removes.toSeq); ()
  }

  /** Returns (updated, removed, missing) keys as echoed by the service. */
  def updateNamespaceProperties(ns: String, updates: Map[String, String],
      removals: Seq[String] = Nil): (Seq[String], Seq[String], Seq[String]) = {
    val body = obj()
    val rem = Json.arr(); removals.foreach(rem.add)
    body.set[ArrayNode]("removals", rem)
    val upd = obj()
    updates.toSeq.sortBy(_._1).foreach { case (k, v) => upd.put(k, v) }
    body.set[ObjectNode]("updates", upd)
    val resp = send(post(s"$baseUri/v1/namespaces/$ns/properties", body.toString))
    require(resp.statusCode() == 200, s"updateNamespaceProperties failed: ${resp.body()}")
    val n = Json.parse(resp.body())
    def ss(f: String) = n(f).elems.map(_.asText())
    (ss("updated"), ss("removed"), ss("missing"))
  }

  override def dropNamespace(ns: String): Boolean = {
    val resp = send(delete(s"$baseUri/v1/namespaces/$ns"))
    if (resp.statusCode() == 409)
      throw new IllegalStateException(s"namespace $ns is not empty")
    resp.statusCode() == 204
  }

  /** Catalog-pointer rename (reference catalog.rs:965 rename_table). */
  override def renameTable(src: String, dst: String): Unit = {
    val body = obj()
    def ident(n: String) = {
      val o = obj()
      val e = Json.arr(); e.add(namespace)
      o.set[ArrayNode]("namespace", e)
      o.put("name", n)
      o
    }
    body.set[ObjectNode]("source", ident(src))
    body.set[ObjectNode]("destination", ident(dst))
    val resp = send(post(s"$baseUri/v1/tables/rename", body.toString))
    resp.statusCode() match {
      case 204 | 200 => ()
      case 404 => throw new IllegalArgumentException(s"no such table: $src")
      case 409 => throw new IllegalArgumentException(s"destination exists: $dst")
      case other => throw new IllegalStateException(s"rename failed ($other): ${resp.body()}")
    }
  }

  override def commitTable(name: String, baseVersion: Int, updated: TableMetadata): Int = {
    val (_, base) = Option(versions.get(name)).flatMap(m => Option(m.get(baseVersion)))
      .getOrElse(throw new IllegalStateException(
        s"unknown base version $baseVersion for $name (commit must follow a load)"))
    val updates = TableUpdates.diff(base, updated)
    val reqs = TableUpdates.requirements(base, updates)
    val body = obj()
    body.set[ArrayNode]("requirements", TableUpdates.requirementsToJson(reqs))
    body.set[ArrayNode]("updates", TableUpdates.updatesToJson(updates))
    val resp = send(post(s"$tablesUri/$name", body.toString))
    resp.statusCode() match {
      case 200 | 204 =>
        val n = Json.parse(resp.body())
        record(name, n("metadata-location").asText(),
          TableMetadata.fromJson(n("metadata")))
      case 409 | 412 => throw CommitConflict(s"stale base for $name: ${resp.body()}")
      case other => throw new IllegalStateException(s"commit failed ($other): ${resp.body()}")
    }
  }

  private def get(uri: String) = HttpRequest.newBuilder(URI.create(uri)).GET()
  private def head(uri: String) =
    HttpRequest.newBuilder(URI.create(uri)).method("HEAD", HttpRequest.BodyPublishers.noBody())
  private def delete(uri: String) = HttpRequest.newBuilder(URI.create(uri)).DELETE()
  private def post(uri: String, body: String) =
    HttpRequest.newBuilder(URI.create(uri))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
  private def send(b: HttpRequest.Builder): HttpResponse[String] = {
    def doSend(): HttpResponse[String] = {
      val req = bearer() match {
        case Some(t) => b.copy().setHeader("Authorization", s"Bearer $t").build()
        case None => b.copy().build()
      }
      http.send(req, HttpResponse.BodyHandlers.ofString())
    }
    val r = doSend()
    // expired/revoked bearer: with a credential we can mint a fresh token
    // and replay once (client.rs invalidate_token/regenerate_token roles)
    if (r.statusCode() == 401 && credential.isDefined && staticToken.isEmpty) {
      cachedToken = None
      doSend()
    } else r
  }
}
