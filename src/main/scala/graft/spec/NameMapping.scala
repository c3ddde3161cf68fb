package graft.spec

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructField, StructType}
import Json._

/** Name mapping (`schema.name-mapping.default` table property; reference
  * spec/name_mapping/mod.rs:31-51): assigns field ids to data files
  * written WITHOUT embedded parquet field ids (migrated Hive/plain
  * parquet data). Each entry maps a field id to the set of column names
  * that may carry that field in legacy files, and RECURSES into
  * struct/list/map children (list element maps under "element", map
  * entries under "key"/"value") — projection stays id-based even when the
  * physical files only have names, at every nesting level.
  */
final case class MappedField(fieldId: Int, names: Seq[String],
    fields: Seq[MappedField] = Nil)

final case class NameMapping(fields: Seq[MappedField]) {

  /** top-level name (any alias) → field id. */
  lazy val byName: Map[String, Int] =
    fields.flatMap(f => f.names.map(_ -> f.fieldId)).toMap

  /** The top-level alias list for a field id ([] if unmapped). */
  def namesOf(fieldId: Int): Seq[String] =
    fields.find(_.fieldId == fieldId).map(_.names).getOrElse(Nil)

  /** The Spark read schema for legacy id-less files: every field — nested
    * ones included — renamed to its first mapped physical alias, field-id
    * metadata stripped (ids present would make Spark null-fill id-less
    * files instead of name-matching). The scan reads with this schema and
    * casts back to the canonical one (struct casts rename positionally). */
  def physicalSchema(schema: IcebergSchema): StructType = {
    def convert(t: IcebergType, mapped: Seq[MappedField]): DataType = t match {
      case IcebergType.StructT(fs) =>
        StructType(fs.map { f =>
          val m = mapped.find(_.fieldId == f.id)
          StructField(
            m.flatMap(_.names.headOption).getOrElse(f.name),
            convert(f.fieldType, m.map(_.fields).getOrElse(Nil)),
            nullable = !f.required)
        })
      case IcebergType.ListT(eid, elem, elemRequired) =>
        val m = mapped.find(_.fieldId == eid)
        ArrayType(convert(elem, m.map(_.fields).getOrElse(Nil)),
          containsNull = !elemRequired)
      case IcebergType.MapT(kid, k, vid, v, vRequired) =>
        val mk = mapped.find(_.fieldId == kid)
        val mv = mapped.find(_.fieldId == vid)
        MapType(
          convert(k, mk.map(_.fields).getOrElse(Nil)),
          convert(v, mv.map(_.fields).getOrElse(Nil)),
          valueContainsNull = !vRequired)
      case prim => IcebergType.toSpark(prim)
    }
    convert(IcebergType.StructT(schema.fields), fields).asInstanceOf[StructType]
  }

  def toJsonString: String = {
    def fieldJson(f: MappedField): ObjectNode = {
      val o = obj()
      o.put("field-id", f.fieldId)
      val names = arr(); f.names.foreach(names.add)
      o.set[ObjectNode]("names", names)
      if (f.fields.nonEmpty) {
        val ch = arr(); f.fields.foreach(c => ch.add(fieldJson(c)))
        o.set[ObjectNode]("fields", ch)
      }
      o
    }
    val a = arr()
    fields.foreach(f => a.add(fieldJson(f)))
    Json.write(a)
  }
}

object NameMapping {
  val PropertyKey = "schema.name-mapping.default"

  def fromJsonString(s: String): NameMapping = fromJson(Json.parse(s))

  def fromJson(n: JsonNode): NameMapping = {
    def field(f: JsonNode): MappedField =
      MappedField(f("field-id").asInt(), f("names").elems.map(_.asText()),
        f.opt("fields").map(_.elems.map(field)).getOrElse(Nil))
    NameMapping(n.elems.map(field))
  }

  /** Default mapping of a schema: every field (recursively) maps to its
    * current name; list elements as "element", map entries "key"/"value"
    * (mod.rs:31-51 naming). */
  def fromSchema(schema: IcebergSchema): NameMapping = {
    def children(t: IcebergType): Seq[MappedField] = t match {
      case IcebergType.StructT(fs) =>
        fs.map(f => MappedField(f.id, Seq(f.name), children(f.fieldType)))
      case IcebergType.ListT(eid, elem, _) =>
        Seq(MappedField(eid, Seq("element"), children(elem)))
      case IcebergType.MapT(kid, k, vid, v, _) =>
        Seq(MappedField(kid, Seq("key"), children(k)),
          MappedField(vid, Seq("value"), children(v)))
      case _ => Nil
    }
    NameMapping(schema.fields.map(f =>
      MappedField(f.id, Seq(f.name), children(f.fieldType))))
  }

  def fromTable(metadata: TableMetadata): Option[NameMapping] =
    metadata.properties.get(PropertyKey).map(fromJsonString)
}
