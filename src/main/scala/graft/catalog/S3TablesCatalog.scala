package graft.catalog

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import graft.io.FileIO
import graft.spec.{IcebergSchema, Json, PartitionSpec, TableMetadata}
import graft.spec.Json._
import com.fasterxml.jackson.databind.JsonNode

/** Iceberg-on-S3Tables catalog (crates/catalog/s3tables) against any
  * service speaking the S3 Tables REST surface — here the embedded
  * [[S3TablesStubServer]]. Protocol facts mirrored from the reference:
  *
  *   - the SERVICE mints each table's location (catalog.rs:547: a user
  *     location is an error) — `createTable` adopts the service's
  *     `warehouseLocation` as the metadata root, so table directories
  *     are catalog-assigned, not name-derived;
  *   - a commit is `UpdateTableMetadataLocation` conditioned on the
  *     `versionToken` from the paired GetTable (catalog.rs:248
  *     load_table_with_version_token); a `ConflictException` surfaces as
  *     [[CommitConflict]] for [[CommitRetry]] — the same lock-free
  *     optimistic family as Glue's VersionId, distinct from the HMS
  *     lock bracket.
  */
final class S3TablesCatalog(endpoint: String, namespace: String,
    val io: FileIO) extends Catalog {

  // ---- wire ------------------------------------------------------------

  private def call(method: String, path: String,
      body: Option[JsonNode] = None): (Int, JsonNode) = {
    val conn = URI.create(s"$endpoint$path").toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      conn.getOutputStream.write(Json.write(b).getBytes(StandardCharsets.UTF_8))
    }
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val text = new String(is.readAllBytes(), StandardCharsets.UTF_8)
    is.close()
    (code, Json.parse(if (text.isEmpty) "{}" else text))
  }

  private def fail(node: JsonNode, fallback: String): Nothing = {
    val t = node.opt("__type").map(_.asText()).getOrElse("UnknownError")
    val m = node.opt("message").map(_.asText()).getOrElse(fallback)
    if (t == "ConflictException") throw CommitConflict(s"s3tables: $m")
    throw new IllegalArgumentException(s"$t: $m")
  }

  /** UUID-suffixed, like Iceberg's `00001-<uuid>.metadata.json`: two
    * committers racing from the same base each write their OWN file and
    * let the versionToken CAS arbitrate — a shared deterministic path
    * would let the loser clobber the winner's committed metadata (readers
    * catch a torn file). The loser's file is an orphan, reclaimed by
    * remove_orphan_files. */
  private def versionPath(tableLocation: String, v: Int,
      suffix: String = ".metadata.json") =
    s"$tableLocation/metadata/v$v-${java.util.UUID.randomUUID().toString.take(8)}$suffix"
  private def versionOf(location: String): Int = {
    val file = location.substring(location.lastIndexOf('/') + 1)
    file.stripPrefix("v").stripSuffix(".metadata.json").takeWhile(_ != '-').toInt
  }

  /** (warehouseLocation, metadataLocation option, versionToken). */
  private def getTable(name: String): Option[(String, Option[String], String)] = {
    val (code, node) = call("GET", s"/tables/$namespace/$name")
    if (code == 404) None
    else if (code >= 400) fail(node, s"GetTable $name")
    else Some((node("warehouseLocation").asText(),
      node.opt("metadataLocation").map(_.asText()),
      node("versionToken").asText()))
  }

  private def updateMetadataLocation(name: String, loc: String,
      token: String): Unit = {
    val b = Json.obj()
    b.put("metadataLocation", loc)
    b.put("versionToken", token)
    val (code, node) = call("PUT", s"/tables/$namespace/$name/metadata-location",
      Some(b))
    if (code >= 400) fail(node, s"UpdateTableMetadataLocation $name")
  }

  // ---- Catalog ---------------------------------------------------------

  override def createTable(name: String, schema: IcebergSchema,
      spec: PartitionSpec, properties: Map[String, String]): TableMetadata = {
    val (code, node) = call("PUT", s"/tables/$namespace/$name")
    if (code >= 400) fail(node, s"CreateTable $name")
    // the service owns the location — adopt it (catalog.rs:547-567)
    val tableLocation = node("warehouseLocation").asText()
    val token = node("versionToken").asText()
    val md = TableMetadata.newTable(tableLocation, schema, spec, properties)
    val loc = versionPath(tableLocation, 1, metadataSuffix(md))
    io.writeBytes(loc, metadataBytes(md), overwrite = false)
    updateMetadataLocation(name, loc, token)
    md
  }

  override protected def registerParsed(name: String, md: TableMetadata): Unit = {
    val (code, node) = call("PUT", s"/tables/$namespace/$name")
    if (code >= 400) fail(node, s"CreateTable $name")
    val tableLocation = node("warehouseLocation").asText()
    val token = node("versionToken").asText()
    // metadata generations live under the SERVICE's location; the
    // adopted table's data/manifests stay at md.location untouched
    val loc = versionPath(tableLocation, 1, metadataSuffix(md))
    io.writeBytes(loc, metadataBytes(md), overwrite = false)
    updateMetadataLocation(name, loc, token)
  }

  override def loadTable(name: String): (TableMetadata, Int) = {
    val (_, metaLoc, _) = getTable(name).getOrElse(
      throw new IllegalArgumentException(s"no such table: $namespace.$name"))
    val loc = metaLoc.getOrElse(throw new IllegalStateException(
      s"table $name has no metadata location yet"))
    (TableMetadata.fromJsonString(io.readString(loc)), versionOf(loc))
  }

  override def tableExists(name: String): Boolean = getTable(name).isDefined

  /** The service's current metadata pointer (GetTable.metadataLocation) —
    * the handle register/ops tooling passes around. */
  def currentMetadataLocation(name: String): Option[String] =
    getTable(name).flatMap(_._2)

  override def dropTable(name: String): Boolean = {
    val (code, node) = call("DELETE", s"/tables/$namespace/$name")
    if (code == 404) false
    else if (code >= 400) fail(node, s"DeleteTable $name")
    else true
  }

  override def listTables(): Seq[String] = {
    val (code, node) = call("GET", s"/tables/$namespace")
    if (code >= 400) fail(node, "ListTables")
    node("tables").elems.map(_.asText())
  }

  override def commitTable(name: String, baseVersion: Int,
      updated: TableMetadata): Int = {
    val (_, metaLoc, token) = getTable(name).getOrElse(
      throw new IllegalArgumentException(s"no such table: $namespace.$name"))
    val currentLoc = metaLoc.getOrElse(throw new IllegalStateException(
      s"table $name has no metadata location yet"))
    val cur = versionOf(currentLoc)
    if (cur != baseVersion)
      throw CommitConflict(s"base version $baseVersion is stale (current: $cur)")
    val next = baseVersion + 1
    val tableLocation = currentLoc.substring(0, currentLoc.lastIndexOf("/metadata/"))
    val nextLoc = versionPath(tableLocation, next, metadataSuffix(updated))
    io.writeBytes(nextLoc, metadataBytes(updated), overwrite = false)
    updateMetadataLocation(name, nextLoc, token) // CAS; conflict → retry
    next
  }
}
