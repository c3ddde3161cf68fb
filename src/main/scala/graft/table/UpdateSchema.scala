package graft.table

import graft.spec.{IcebergSchema, IcebergType, NestedField}
import graft.spec.IcebergType._

/** Schema-evolution action (reference transaction/update_schema.rs:116-147):
  * add / drop / rename columns and widen primitive types, committed as a
  * metadata-only CAS (no snapshot — data files are untouched; the read
  * side resolves by field id, so old files null-fill added columns and
  * keep serving renamed ones).
  *
  * Allowed type promotions follow the Iceberg spec: int→long,
  * float→double, decimal(P,S)→decimal(P'>P,S).
  */
final class UpdateSchema private[table] (table: GraftTable) {

  private var adds = Vector.empty[(String, IcebergType, Option[String], Option[Any])]
  private var drops = Set.empty[String]
  private var renames = Map.empty[String, String]
  private var promotions = Map.empty[String, IcebergType]
  private var newWriteDefaults = Map.empty[String, Option[Any]]
  private var newDocs = Map.empty[String, Option[String]]
  private var optionals = Set.empty[String]

  def addColumn(name: String, t: IcebergType, doc: Option[String] = None): UpdateSchema = {
    adds :+= ((name, t, doc, None)); this
  }

  /** Add a column with a v3 default: rows written before the column
    * existed read back `default` (initial-default), and writers omitting
    * the column get it too (write-default). datatypes.rs:573-575,681-687. */
  def addColumnWithDefault(name: String, t: IcebergType, default: Any,
      doc: Option[String] = None): UpdateSchema = {
    adds :+= ((name, t, doc, Some(default))); this
  }

  /** Change an existing column's WRITE default (initial-default is
    * immutable once set — it defines what already-written rows mean). */
  def updateColumnDefault(name: String, default: Any): UpdateSchema = {
    newWriteDefaults += name -> Some(default); this
  }
  /** DROP DEFAULT: writers omitting the column get null again
    * (initial-default stays — it defines already-written rows). */
  def clearColumnDefault(name: String): UpdateSchema = {
    newWriteDefaults += name -> None; this
  }
  def dropColumn(name: String): UpdateSchema = { drops += name; this }
  def renameColumn(from: String, to: String): UpdateSchema = { renames += from -> to; this }
  def updateColumnType(name: String, t: IcebergType): UpdateSchema = {
    promotions += name -> t; this
  }
  /** Set (Some) or clear (None) a column's doc string. */
  def updateColumnDoc(name: String, doc: Option[String]): UpdateSchema = {
    newDocs += name -> doc; this
  }
  /** required → optional is always safe; the reverse cannot be proven
    * against already-written files and is refused (Iceberg rule). */
  def makeColumnOptional(name: String): UpdateSchema = {
    optionals += name; this
  }

  private def canPromote(from: IcebergType, to: IcebergType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (IntT, LongT) => true
    case (FloatT, DoubleT) => true
    case (DecimalT(p1, s1), DecimalT(p2, s2)) => s1 == s2 && p2 >= p1
    case _ => false
  }

  /** Apply the pending changes against `base`'s current schema. Called
    * once per commit attempt (optimistic retry re-applies on conflict). */
  private[table] def applyTo(base: graft.spec.TableMetadata):
      (IcebergSchema, Int) = {
    val cur = base.currentSchema

    // validation: every referenced column must exist
    (drops ++ renames.keySet ++ promotions.keySet ++ newWriteDefaults.keySet ++
      newDocs.keySet ++ optionals).foreach { n =>
      require(cur.findField(n).isDefined, s"cannot evolve unknown column: $n")
    }
    adds.foreach { case (n, _, _, d) =>
      require(cur.findField(n).isEmpty, s"column already exists: $n")
      require(!drops.contains(n), s"cannot add and drop the same column: $n")
      require(d.isEmpty || base.formatVersion >= 3,
        s"field defaults require format-version 3 (table is v${base.formatVersion}): $n")
    }
    require(newWriteDefaults.isEmpty || base.formatVersion >= 3,
      s"field defaults require format-version 3 (table is v${base.formatVersion})")
    // partition-spec source columns are load-bearing for pruning
    val specSources = base.partitionSpecs.flatMap(_.fields.map(_.sourceId)).toSet
    drops.foreach { n =>
      val id = cur.findField(n).get.id
      require(!specSources.contains(id), s"cannot drop partition source column: $n")
      require(!cur.identifierFieldIds.contains(id), s"cannot drop identifier column: $n")
    }

    var nextId = base.lastColumnId
    val evolved: Seq[NestedField] = cur.fields.flatMap { f =>
      if (drops.contains(f.name)) None
      else {
        val renamed = renames.getOrElse(f.name, f.name)
        val newType = promotions.get(f.name) match {
          case Some(t) =>
            require(canPromote(f.fieldType, t),
              s"illegal promotion ${f.fieldType} -> $t for ${f.name}")
            t
          case None => f.fieldType
        }
        val newWriteDefault = newWriteDefaults.get(f.name) match {
          case Some(opt) => opt // Some(v) = new default, None = cleared
          case None => f.writeDefault
        }
        val newDoc = newDocs.getOrElse(f.name, f.doc)
        val newRequired = if (optionals.contains(f.name)) false else f.required
        Some(f.copy(name = renamed, fieldType = newType,
          writeDefault = newWriteDefault, doc = newDoc, required = newRequired))
      }
    }
    val added: Seq[NestedField] = adds.map { case (n, t, doc, default) =>
      nextId += 1
      // added columns are optional: existing files null-fill them (or
      // serve the initial-default when one is declared)
      NestedField(nextId, n, t, required = false, doc = doc,
        initialDefault = default, writeDefault = default)
    }

    // name-based binding (Predicate.bind, Spark reads) requires unique names:
    // reject renames/adds that collide with a surviving or added column
    val finalFields = evolved ++ added
    val dupes = finalFields.groupBy(_.name).filter(_._2.size > 1).keys
    require(dupes.isEmpty,
      s"schema evolution produces duplicate column name(s): ${dupes.mkString(", ")}")

    val newSchemaId = base.schemas.map(_.schemaId).max + 1
    (IcebergSchema(newSchemaId, finalFields, cur.identifierFieldIds), nextId)
  }

  /** Metadata-only commit with optimistic retry. */
  def commit(): GraftTable =
    graft.catalog.CommitRetry.run(table.catalog, table.name) { (base, _) =>
      val (schema, lastCol) = applyTo(base)
      val updated = base.copy(
        schemas = base.schemas :+ schema,
        currentSchemaId = schema.schemaId,
        lastColumnId = lastCol,
        lastUpdatedMs = System.currentTimeMillis())
      (updated, (_: Int) => table.refresh())
    }
}
