package graft.spec

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import Json._

/** Name mapping (`schema.name-mapping.default` table property; reference
  * spec/name_mapping/mod.rs:31-51): assigns field ids to data files
  * written WITHOUT embedded parquet field ids (migrated Hive/plain
  * parquet data). Each entry maps a field id to the set of column names
  * that may carry that field in legacy files — projection stays id-based
  * even when the physical files only have names.
  *
  * Flat (top-level) fields only in v0 — nested mapping follows the same
  * recursion and can be added when nested migrated data shows up.
  */
final case class MappedField(fieldId: Int, names: Seq[String])

final case class NameMapping(fields: Seq[MappedField]) {

  /** name (any alias) → field id. */
  lazy val byName: Map[String, Int] =
    fields.flatMap(f => f.names.map(_ -> f.fieldId)).toMap

  /** The alias list for a field id ([] if unmapped). */
  def namesOf(fieldId: Int): Seq[String] =
    fields.find(_.fieldId == fieldId).map(_.names).getOrElse(Nil)

  def toJsonString: String = {
    val a = arr()
    fields.foreach { f =>
      val o = obj()
      o.put("field-id", f.fieldId)
      val names = arr(); f.names.foreach(names.add)
      o.set[ObjectNode]("names", names)
      a.add(o)
    }
    Json.write(a)
  }
}

object NameMapping {
  val PropertyKey = "schema.name-mapping.default"

  def fromJsonString(s: String): NameMapping = fromJson(Json.parse(s))

  def fromJson(n: JsonNode): NameMapping =
    NameMapping(n.elems.map { f =>
      MappedField(f("field-id").asInt(), f("names").elems.map(_.asText()))
    })

  /** Default mapping of a schema: every field maps to its current name. */
  def fromSchema(schema: IcebergSchema): NameMapping =
    NameMapping(schema.fields.map(f => MappedField(f.id, Seq(f.name))))

  def fromTable(metadata: TableMetadata): Option[NameMapping] =
    metadata.properties.get(PropertyKey).map(fromJsonString)
}
