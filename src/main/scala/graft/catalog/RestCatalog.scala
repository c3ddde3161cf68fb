package graft.catalog

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.node.ObjectNode

import graft.io.FileIO
import graft.spec.{IcebergSchema, Json, PartitionSpec, TableMetadata}
import graft.spec.Json._

/** REST catalog client (reference crates/catalog/rest): table state lives
  * behind an HTTP service; commits are server-side CAS, which is what
  * makes optimistic concurrency safe on object stores where a
  * rename-based Hadoop catalog is not atomic.
  *
  * Routes follow the Iceberg REST spec shape
  * (`/v1/namespaces/{ns}/tables[/{table}]`, LoadTableResult with
  * `metadata-location` + `metadata`). Two deviations, documented here:
  * create ships the full initial metadata document, and the commit body
  * carries `{"base-metadata-location": …, "metadata": …}` instead of the
  * spec's update-action list — the CAS contract (HTTP 409 on a stale
  * base) is the same.
  *
  * Versioning: the `Catalog` trait speaks integer versions; this client
  * maps them to metadata locations per load (the REST analogue of an
  * ETag) so `commitTable(baseVersion)` can assert the right base.
  */
final class RestCatalog(baseUri: String, namespace: String, val io: FileIO)
    extends Catalog {

  private val http = HttpClient.newHttpClient()
  private val versions = new ConcurrentHashMap[String, ConcurrentHashMap[Int, String]]()
  private val counters = new ConcurrentHashMap[String, AtomicInteger]()

  private def tablesUri = s"$baseUri/v1/namespaces/$namespace/tables"

  override def createTable(name: String, schema: IcebergSchema, spec: PartitionSpec,
      properties: Map[String, String]): TableMetadata = {
    val md = TableMetadata.newTable(s"$baseUri-warehouse/$name", schema, spec, properties)
    val body = obj()
    body.put("name", name)
    body.set[ObjectNode]("metadata", md.toJson)
    val resp = send(post(tablesUri, body.toString))
    require(resp.statusCode() == 200 || resp.statusCode() == 201,
      s"create failed (${resp.statusCode()}): ${resp.body()}")
    md
  }

  override def loadTable(name: String): (TableMetadata, Int) = {
    val resp = send(get(s"$tablesUri/$name"))
    if (resp.statusCode() == 404)
      throw new IllegalArgumentException(s"no such table: $name")
    require(resp.statusCode() == 200, s"load failed (${resp.statusCode()})")
    val n = Json.parse(resp.body())
    val md = TableMetadata.fromJson(n("metadata"))
    val location = n("metadata-location").asText()
    val v = counters.computeIfAbsent(name, _ => new AtomicInteger()).incrementAndGet()
    versions.computeIfAbsent(name, _ => new ConcurrentHashMap[Int, String]())
      .put(v, location)
    (md, v)
  }

  override def tableExists(name: String): Boolean =
    send(head(s"$tablesUri/$name")).statusCode() == 200 ||
      send(get(s"$tablesUri/$name")).statusCode() == 200

  override def dropTable(name: String): Boolean =
    send(delete(s"$tablesUri/$name")).statusCode() == 204

  override def listTables(): Seq[String] = {
    val resp = send(get(tablesUri))
    require(resp.statusCode() == 200, s"list failed (${resp.statusCode()})")
    Json.parse(resp.body())("identifiers").elems.map(_("name").asText()).sorted
  }

  override def commitTable(name: String, baseVersion: Int, updated: TableMetadata): Int = {
    val baseLocation = Option(versions.get(name)).flatMap(m => Option(m.get(baseVersion)))
      .getOrElse(throw new IllegalStateException(
        s"unknown base version $baseVersion for $name (commit must follow a load)"))
    val body = obj()
    body.put("base-metadata-location", baseLocation)
    body.set[ObjectNode]("metadata", updated.toJson)
    val resp = send(post(s"$tablesUri/$name", body.toString))
    resp.statusCode() match {
      case 200 | 204 =>
        val v = counters.get(name).incrementAndGet()
        val newLocation = Json.parse(resp.body())("metadata-location").asText()
        versions.get(name).put(v, newLocation)
        v
      case 409 | 412 => throw CommitConflict(s"stale base for $name: ${resp.body()}")
      case other => throw new IllegalStateException(s"commit failed ($other): ${resp.body()}")
    }
  }

  private def get(uri: String) = HttpRequest.newBuilder(URI.create(uri)).GET().build()
  private def head(uri: String) =
    HttpRequest.newBuilder(URI.create(uri)).method("HEAD", HttpRequest.BodyPublishers.noBody()).build()
  private def delete(uri: String) = HttpRequest.newBuilder(URI.create(uri)).DELETE().build()
  private def post(uri: String, body: String) =
    HttpRequest.newBuilder(URI.create(uri))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8)).build()
  private def send(r: HttpRequest): HttpResponse[String] =
    http.send(r, HttpResponse.BodyHandlers.ofString())
}
