package graft.catalog

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import graft.io.FileIO
import graft.spec.{IcebergSchema, IcebergType, Json, NestedField, PartitionSpec,
  TableMetadata}
import graft.spec.Json._
import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode

/** Iceberg-on-Glue catalog speaking the PUBLIC AWS Glue wire protocol
  * (crates/catalog/glue/src/catalog.rs) against any Glue-compatible
  * endpoint — here the embedded [[GlueStubServer]]; against real AWS only
  * signing would differ (out of scope in this sandbox).
  *
  * Protocol facts mirrored from the reference:
  *   - a table IS its parameters: `table_type=ICEBERG` +
  *     `metadata_location` (+ `previous_metadata_location` after the
  *     first commit), with a Hive-typed column list in the storage
  *     descriptor carrying `iceberg.field.id` / `.optional` / `.current`
  *     per column (glue/src/schema.rs:19-23) so non-Iceberg readers see
  *     a usable schema;
  *   - commits are OPTIMISTIC on Glue's `VersionId` (catalog.rs:900-961
  *     update_table): read table + version, write the next metadata file,
  *     UpdateTable conditioned on the version; a
  *     `ConcurrentModificationException` surfaces as [[CommitConflict]]
  *     so [[CommitRetry]] refreshes and retries — no metastore lock
  *     bracket (that is the HMS protocol, [[HmsCatalog]]).
  */
final class GlueCatalog(endpoint: String, db: String, warehouse: String,
    val io: FileIO) extends Catalog {

  ensureDatabase()

  // ---- wire ------------------------------------------------------------

  private def call(op: String, payload: ObjectNode): JsonNode = {
    val conn = URI.create(endpoint).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Content-Type", "application/x-amz-json-1.1")
    conn.setRequestProperty("X-Amz-Target", s"AWSGlue.$op")
    conn.setDoOutput(true)
    conn.getOutputStream.write(Json.write(payload).getBytes(StandardCharsets.UTF_8))
    val code = conn.getResponseCode
    val body = {
      val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val s = new String(is.readAllBytes(), StandardCharsets.UTF_8)
      is.close(); s
    }
    val node = Json.parse(body)
    if (code >= 400) {
      val t = node.opt("__type").map(_.asText()).getOrElse("UnknownError")
      val m = node.opt("Message").map(_.asText()).getOrElse(body)
      throw GlueServiceError(t, m)
    }
    node
  }

  private case class GlueServiceError(errType: String, message: String)
    extends RuntimeException(s"$errType: $message")

  private def ensureDatabase(): Unit = {
    val get = Json.obj(); get.put("Name", db)
    try { call("GetDatabase", get); () }
    catch {
      case GlueServiceError("EntityNotFoundException", _) =>
        val in = Json.obj(); in.put("Name", db); in.put("LocationUri", warehouse)
        val req = Json.obj(); req.set[ObjectNode]("DatabaseInput", in)
        call("CreateDatabase", req)
        ()
    }
  }

  // ---- table input construction ---------------------------------------

  private def tableDir(name: String) = s"$warehouse/$name"
  /** UUID-suffixed (Iceberg's `00001-<uuid>.metadata.json` shape): racing
    * committers each write their own file and the VersionId CAS picks the
    * winner — a shared deterministic path would let the loser clobber the
    * winner's committed metadata. The loser's file is an orphan for
    * remove_orphan_files. */
  private def versionPath(name: String, v: Int,
      suffix: String = ".metadata.json") =
    s"${tableDir(name)}/metadata/v$v-${java.util.UUID.randomUUID().toString.take(8)}$suffix"
  private def versionOf(location: String): Int = {
    val file = location.substring(location.lastIndexOf('/') + 1)
    file.stripPrefix("v").stripSuffix(".metadata.json").takeWhile(_ != '-').toInt
  }

  /** Iceberg → Glue column type string (glue schema.rs GlueSchemaBuilder —
    * same Hive type language as HMS). */
  private def glueType(t: IcebergType): String = {
    import IcebergType._
    t match {
      case BooleanT => "boolean"
      case IntT => "int"
      case LongT => "bigint"
      case FloatT => "float"
      case DoubleT => "double"
      case DecimalT(p, s) => s"decimal($p,$s)"
      case DateT => "date"
      case TimestampT | TimestamptzT => "timestamp"
      case TimeT | TimestampNsT | TimestamptzNsT => "bigint"
      case StringT | UuidT | VariantT => "string"
      case BinaryT | FixedT(_) => "binary"
      case StructT(fs) =>
        fs.map(f => s"${f.name}:${glueType(f.fieldType)}").mkString("struct<", ",", ">")
      case ListT(_, e, _) => s"array<${glueType(e)}>"
      case MapT(_, k, _, v, _) => s"map<${glueType(k)},${glueType(v)}>"
    }
  }

  private def columnNode(f: NestedField): ObjectNode = {
    val c = Json.obj()
    c.put("Name", f.name)
    c.put("Type", glueType(f.fieldType))
    f.doc.foreach(c.put("Comment", _))
    val p = Json.obj()
    p.put("iceberg.field.id", f.id.toString)
    p.put("iceberg.field.optional", (!f.required).toString)
    p.put("iceberg.field.current", "true")
    c.set[ObjectNode]("Parameters", p)
    c
  }

  private def tableInput(name: String, md: TableMetadata,
      metadataLocation: String, previous: Option[String]): ObjectNode = {
    val sd = Json.obj()
    val cols = Json.arr()
    md.currentSchema.fields.foreach(f => cols.add(columnNode(f)))
    sd.set[ObjectNode]("Columns", cols)
    sd.put("Location", md.location)
    val params = Json.obj()
    params.put("table_type", "ICEBERG")
    params.put("metadata_location", metadataLocation)
    previous.foreach(params.put("previous_metadata_location", _))
    val in = Json.obj()
    in.put("Name", name)
    in.put("TableType", "EXTERNAL_TABLE")
    in.set[ObjectNode]("StorageDescriptor", sd)
    in.set[ObjectNode]("Parameters", params)
    in
  }

  // ---- Catalog ---------------------------------------------------------

  override def createTable(name: String, schema: IcebergSchema,
      spec: PartitionSpec, properties: Map[String, String]): TableMetadata = {
    val md = TableMetadata.newTable(tableDir(name), schema, spec, properties)
    val loc = versionPath(name, 1, metadataSuffix(md))
    io.writeBytes(loc, metadataBytes(md), overwrite = false)
    val req = Json.obj()
    req.put("DatabaseName", db)
    req.set[ObjectNode]("TableInput", tableInput(name, md, loc, None))
    call("CreateTable", req)
    md
  }

  override protected def registerParsed(name: String, md: TableMetadata): Unit = {
    val loc = versionPath(name, 1, metadataSuffix(md))
    io.writeBytes(loc, metadataBytes(md), overwrite = false)
    val req = Json.obj()
    req.put("DatabaseName", db)
    req.set[ObjectNode]("TableInput", tableInput(name, md, loc, None))
    call("CreateTable", req)
  }

  /** (table node, glue VersionId). */
  private def getTable(name: String): Option[(JsonNode, String)] = {
    val req = Json.obj(); req.put("DatabaseName", db); req.put("Name", name)
    try {
      val t = call("GetTable", req)("Table")
      Some((t, t("VersionId").asText()))
    } catch {
      case GlueServiceError("EntityNotFoundException", _) => None
    }
  }

  private def metadataLocationOf(t: JsonNode, name: String): String = {
    val params = t.opt("Parameters").getOrElse(
      throw new IllegalArgumentException(s"$db.$name has no parameters"))
    require(params.opt("table_type").map(_.asText()).contains("ICEBERG"),
      s"$db.$name is not an Iceberg table")
    params.opt("metadata_location").map(_.asText()).getOrElse(
      throw new IllegalArgumentException(s"$db.$name has no metadata_location"))
  }

  override def loadTable(name: String): (TableMetadata, Int) = {
    val (t, _) = getTable(name).getOrElse(
      throw new IllegalArgumentException(s"no such table: $db.$name"))
    val loc = metadataLocationOf(t, name)
    (TableMetadata.fromJsonString(io.readString(loc)), versionOf(loc))
  }

  /** The catalog's current metadata pointer (`metadata_location` table
    * parameter) — the handle register/ops tooling passes around. */
  def currentMetadataLocation(name: String): Option[String] =
    getTable(name).map { case (t, _) => metadataLocationOf(t, name) }

  override def tableExists(name: String): Boolean = getTable(name).isDefined

  override def dropTable(name: String): Boolean =
    getTable(name) match {
      case None => false
      case Some(_) =>
        val req = Json.obj(); req.put("DatabaseName", db); req.put("Name", name)
        call("DeleteTable", req); true
    }

  override def listTables(): Seq[String] = {
    val req = Json.obj(); req.put("DatabaseName", db)
    call("GetTables", req)("TableList").elems.map(_("Name").asText())
  }

  override def commitTable(name: String, baseVersion: Int,
      updated: TableMetadata): Int = {
    val (t, glueVersion) = getTable(name).getOrElse(
      throw new IllegalArgumentException(s"no such table: $db.$name"))
    val currentLoc = metadataLocationOf(t, name)
    val cur = versionOf(currentLoc)
    if (cur != baseVersion)
      throw CommitConflict(s"base version $baseVersion is stale (current: $cur)")
    val next = baseVersion + 1
    val nextLoc = versionPath(name, next, metadataSuffix(updated))
    io.writeBytes(nextLoc, metadataBytes(updated), overwrite = false)
    val req = Json.obj()
    req.put("DatabaseName", db)
    req.put("VersionId", glueVersion) // optimistic lock (catalog.rs:934)
    req.set[ObjectNode]("TableInput",
      tableInput(name, updated, nextLoc, Some(currentLoc)))
    try call("UpdateTable", req)
    catch {
      case GlueServiceError("ConcurrentModificationException", m) =>
        throw CommitConflict(s"glue commit conflict: $m")
      case GlueServiceError("EntityNotFoundException", m) =>
        throw new IllegalArgumentException(s"no such table: $m")
    }
    next
  }
}
