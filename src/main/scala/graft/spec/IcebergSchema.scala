package graft.spec

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.types.StructType
import Json._
import IcebergType._

/** Id-addressed table schema (spec/schema/mod.rs:64) with the lazily-built
  * lookup indexes the reference maintains (id_to_field, name_to_id).
  * Names are aliases; all projection/evolution is by field id.
  */
final case class IcebergSchema(
    schemaId: Int,
    fields: Seq[NestedField],
    identifierFieldIds: Seq[Int] = Nil) {

  def asStruct: StructT = StructT(fields)

  /** id → field, flattened over nested structs/lists/maps. */
  lazy val idToField: Map[Int, NestedField] = {
    val b = Map.newBuilder[Int, NestedField]
    def walk(fs: Seq[NestedField]): Unit = fs.foreach { f =>
      b += f.id -> f
      f.fieldType match {
        case StructT(nested) => walk(nested)
        case ListT(eid, e, req) => walk(Seq(NestedField(eid, "element", e, req)))
        case MapT(kid, k, vid, v, vreq) =>
          walk(Seq(NestedField(kid, "key", k, required = true),
            NestedField(vid, "value", v, vreq)))
        case _ =>
      }
    }
    walk(fields)
    b.result()
  }

  /** top-level name → id (dotted paths for nested fields). */
  lazy val nameToId: Map[String, Int] = {
    val b = Map.newBuilder[String, Int]
    def walk(prefix: String, fs: Seq[NestedField]): Unit = fs.foreach { f =>
      val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      b += path -> f.id
      f.fieldType match {
        case StructT(nested) => walk(path, nested)
        case _ =>
      }
    }
    walk("", fields)
    b.result()
  }

  lazy val lowercaseNameToId: Map[String, Int] =
    nameToId.map { case (k, v) => k.toLowerCase -> v }

  lazy val highestFieldId: Int = if (idToField.isEmpty) 0 else idToField.keys.max

  def findField(name: String, caseSensitive: Boolean = true): Option[NestedField] = {
    val id = if (caseSensitive) nameToId.get(name) else lowercaseNameToId.get(name.toLowerCase)
    id.flatMap(idToField.get)
  }

  def fieldNameById(id: Int): Option[String] =
    nameToId.collectFirst { case (n, i) if i == id => n }

  def toSpark: StructType =
    IcebergType.toSpark(asStruct).asInstanceOf[StructType]

  def toJson: ObjectNode = IcebergSchema.schemaToJson(this)
}

object IcebergSchema {
  /** Spark StructField metadata key carrying the Iceberg/parquet field id —
    * the key Spark's parquet writer/reader honors when
    * spark.sql.parquet.fieldId.{write,read}.enabled is set. */
  val FieldIdKey = "parquet.field.id"

  /** Derive a fresh schema (ids assigned depth-first from 1, like the
    * reference's schema builder) from a Spark schema. */
  def fromSpark(st: StructType, schemaId: Int = 0): IcebergSchema = {
    var next = 0
    val counter = () => { next += 1; next }
    val StructT(fs) = IcebergType.fromSpark(st, counter): @unchecked
    IcebergSchema(schemaId, fs)
  }

  // ---- JSON serde (metadata.json "schemas" entries) ----

  def typeToJson(t: IcebergType): JsonNode = t match {
    case p: PrimitiveIcebergType => Json.mapper.getNodeFactory.textNode(p.jsonName)
    case IcebergType.VariantT => // v3: serialized like a primitive ("variant")
      Json.mapper.getNodeFactory.textNode(IcebergType.VariantT.jsonName)
    case StructT(fields) =>
      val o = obj()
      o.put("type", "struct")
      val a = arr()
      fields.foreach(f => a.add(fieldToJson(f)))
      o.set[ObjectNode]("fields", a)
      o
    case ListT(eid, e, ereq) =>
      val o = obj()
      o.put("type", "list")
      o.put("element-id", eid)
      o.set[ObjectNode]("element", typeToJson(e))
      o.put("element-required", ereq)
      o
    case MapT(kid, k, vid, v, vreq) =>
      val o = obj()
      o.put("type", "map")
      o.put("key-id", kid)
      o.set[ObjectNode]("key", typeToJson(k))
      o.put("value-id", vid)
      o.set[ObjectNode]("value", typeToJson(v))
      o.put("value-required", vreq)
      o
  }

  def fieldToJson(f: NestedField): ObjectNode = {
    val o = obj()
    o.put("id", f.id)
    o.put("name", f.name)
    o.put("required", f.required)
    o.set[ObjectNode]("type", typeToJson(f.fieldType))
    f.doc.foreach(o.put("doc", _))
    // v3 field defaults (datatypes.rs:589-591 initial_default/write_default)
    f.initialDefault.foreach(v =>
      o.set[ObjectNode]("initial-default", graft.meta.SingleValue.toJsonValue(f.fieldType, v)))
    f.writeDefault.foreach(v =>
      o.set[ObjectNode]("write-default", graft.meta.SingleValue.toJsonValue(f.fieldType, v)))
    o
  }

  def typeFromJson(n: JsonNode): IcebergType =
    if (n.isTextual && n.asText() == "variant") IcebergType.VariantT
    else if (n.isTextual) IcebergType.parsePrimitive(n.asText())
    else n("type").asText() match {
      case "struct" => StructT(n("fields").elems.map(fieldFromJson))
      case "list" =>
        ListT(n("element-id").asInt(), typeFromJson(n("element")),
          n("element-required").asBoolean())
      case "map" =>
        MapT(n("key-id").asInt(), typeFromJson(n("key")),
          n("value-id").asInt(), typeFromJson(n("value")),
          n("value-required").asBoolean())
      case other => throw new IllegalArgumentException(s"unknown type: $other")
    }

  def fieldFromJson(n: JsonNode): NestedField = {
    val t = typeFromJson(n("type"))
    NestedField(
      id = n("id").asInt(),
      name = n("name").asText(),
      fieldType = t,
      required = n("required").asBoolean(),
      doc = n.opt("doc").map(_.asText()),
      initialDefault = n.opt("initial-default").map(graft.meta.SingleValue.fromJsonValue(t, _)),
      writeDefault = n.opt("write-default").map(graft.meta.SingleValue.fromJsonValue(t, _)))
  }

  def schemaToJson(s: IcebergSchema): ObjectNode = {
    val o = obj()
    o.put("type", "struct")
    o.put("schema-id", s.schemaId)
    if (s.identifierFieldIds.nonEmpty) {
      val ids = arr()
      s.identifierFieldIds.foreach(ids.add)
      o.set[ObjectNode]("identifier-field-ids", ids)
    }
    val a = arr()
    s.fields.foreach(f => a.add(fieldToJson(f)))
    o.set[ObjectNode]("fields", a)
    o
  }

  def schemaFromJson(n: JsonNode): IcebergSchema =
    IcebergSchema(
      schemaId = n.opt("schema-id").map(_.asInt()).getOrElse(0),
      fields = n("fields").elems.map(fieldFromJson),
      identifierFieldIds = n.opt("identifier-field-ids").map(_.elems.map(_.asInt())).getOrElse(Nil))
}
