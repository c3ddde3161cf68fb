package graft.spec

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import Json._

/** One SQL representation of a view version
  * (view_version.rs:209 SqlViewRepresentation; only the "sql" type exists
  * in the v1 spec). */
final case class SqlRepresentation(sql: String, dialect: String) {
  def toJson: ObjectNode = {
    val o = obj()
    o.put("type", "sql")
    o.put("sql", sql)
    o.put("dialect", dialect)
    o
  }
}

/** One immutable version of a view definition (view_version.rs:46). */
final case class ViewVersion(
    versionId: Int,
    schemaId: Int,
    timestampMs: Long,
    summary: Map[String, String],
    representations: Seq[SqlRepresentation],
    defaultCatalog: Option[String],
    defaultNamespace: Seq[String]) {

  def toJson: ObjectNode = {
    val o = obj()
    o.put("version-id", versionId)
    o.put("timestamp-ms", timestampMs)
    o.put("schema-id", schemaId)
    defaultCatalog.foreach(o.put("default-catalog", _))
    val ns = arr(); defaultNamespace.foreach(ns.add); o.set[ObjectNode]("default-namespace", ns)
    val s = obj(); summary.toSeq.sortBy(_._1).foreach { case (k, v) => s.put(k, v) }
    o.set[ObjectNode]("summary", s)
    val ra = arr(); representations.foreach(r => ra.add(r.toJson))
    o.set[ObjectNode]("representations", ra)
    o
  }

  /** The SQL text for `dialect`, if this version carries one. */
  def sqlFor(dialect: String): Option[String] =
    representations.find(_.dialect.equalsIgnoreCase(dialect)).map(_.sql)
}

object ViewVersion {
  def fromJson(n: JsonNode): ViewVersion = ViewVersion(
    versionId = n("version-id").asInt(),
    schemaId = n("schema-id").asInt(),
    timestampMs = n("timestamp-ms").asLong(),
    summary = n.opt("summary").map(_.fieldsMap.map { case (k, v) => k -> v.asText() })
      .getOrElse(Map.empty),
    representations = n.opt("representations").map(_.elems.collect {
      case r if r("type").asText() == "sql" =>
        SqlRepresentation(r("sql").asText(), r("dialect").asText())
    }).getOrElse(Nil),
    defaultCatalog = n.opt("default-catalog").map(_.asText()),
    defaultNamespace = n.opt("default-namespace").map(_.elems.map(_.asText()))
      .getOrElse(Nil))
}

/** View metadata tree (view_metadata.rs:59), format v1: versioned SQL
  * definitions with their result schemas and a version history log.
  * Serialized like table metadata and committed with the same versioned
  * CAS, so views get time travel and atomic replace for free. */
final case class ViewMetadata(
    viewUuid: String,
    formatVersion: Int,
    location: String,
    currentVersionId: Int,
    versions: Seq[ViewVersion],
    schemas: Seq[IcebergSchema],
    properties: Map[String, String],
    versionLog: Seq[(Long, Int)]) { // (timestampMs, versionId)

  require(formatVersion == 1, s"unsupported view format-version $formatVersion")

  def currentVersion: ViewVersion =
    versions.find(_.versionId == currentVersionId).getOrElse(
      throw new IllegalStateException(s"current view version $currentVersionId not found"))

  def schemaById(id: Int): Option[IcebergSchema] = schemas.find(_.schemaId == id)

  def toJson: ObjectNode = {
    val o = obj()
    o.put("view-uuid", viewUuid)
    o.put("format-version", formatVersion)
    o.put("location", location)
    o.put("current-version-id", currentVersionId)
    val p = obj(); properties.toSeq.sortBy(_._1).foreach { case (k, v) => p.put(k, v) }
    o.set[ObjectNode]("properties", p)
    val va = arr(); versions.foreach(v => va.add(v.toJson)); o.set[ObjectNode]("versions", va)
    val sa = arr(); schemas.foreach(s => sa.add(s.toJson)); o.set[ObjectNode]("schemas", sa)
    val vl = arr()
    versionLog.foreach { case (ts, id) =>
      val e = obj(); e.put("timestamp-ms", ts); e.put("version-id", id); vl.add(e)
    }
    o.set[ObjectNode]("version-log", vl)
    o
  }

  def toJsonString: String = Json.writePretty(toJson)
}

object ViewMetadata {
  def fromJsonString(s: String): ViewMetadata = fromJson(Json.parse(s))

  def fromJson(n: JsonNode): ViewMetadata = {
    // validation mirrors view_metadata.rs: v1 only; the current version
    // id must resolve; every version's schema id must resolve
    val fv = n("format-version").asInt()
    require(fv == 1, s"unsupported view format-version $fv")
    val md = ViewMetadata(
      viewUuid = n("view-uuid").asText(),
      formatVersion = fv,
      location = n("location").asText(),
      currentVersionId = n("current-version-id").asInt(),
      versions = n("versions").elems.map(ViewVersion.fromJson),
      schemas = n.opt("schemas").map(_.elems.map(IcebergSchema.schemaFromJson)).getOrElse(Nil),
      properties = n.opt("properties").map(_.fieldsMap.map { case (k, v) => k -> v.asText() })
        .getOrElse(Map.empty),
      versionLog = n.opt("version-log").map(_.elems.map(e =>
        (e("timestamp-ms").asLong(), e("version-id").asInt()))).getOrElse(Nil))
    require(md.versions.exists(_.versionId == md.currentVersionId),
      s"No version exists with the current version id ${md.currentVersionId}")
    md.versions.foreach { v =>
      require(md.schemas.exists(_.schemaId == v.schemaId),
        s"No schema exists with the schema id ${v.schemaId}")
    }
    md
  }

  /** Fresh v1 view metadata with one SQL version. */
  def newView(location: String, sql: String, dialect: String,
      schema: IcebergSchema, defaultCatalog: Option[String],
      defaultNamespace: Seq[String],
      properties: Map[String, String] = Map.empty): ViewMetadata = {
    val now = System.currentTimeMillis()
    val version = ViewVersion(
      versionId = 1, schemaId = schema.schemaId, timestampMs = now,
      summary = Map("engine-name" -> "graft"),
      representations = Seq(SqlRepresentation(sql, dialect)),
      defaultCatalog = defaultCatalog, defaultNamespace = defaultNamespace)
    ViewMetadata(
      viewUuid = java.util.UUID.randomUUID().toString,
      formatVersion = 1,
      location = location,
      currentVersionId = 1,
      versions = Seq(version),
      schemas = Seq(schema),
      properties = properties,
      versionLog = Seq((now, 1)))
  }
}
