package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, SupportsRead, Table => SparkTable, TableCatalog, TableChange, View, ViewCatalog, ViewChange, ViewInfo}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.{Catalog => GraftCatalog, CatalogLoader, ViewStore}
import graft.io.FileIO
import graft.spec.{IcebergSchema, PartitionSpec, ViewMetadata}
import graft.table.GraftTable

/** Spark catalog plugin: registers the engine as a DSv2 `TableCatalog` so
  * plain SQL works end-to-end —
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalogPlugin")
  * spark.conf.set("spark.sql.catalog.graft.warehouse", "/path/to/wh")
  * spark.sql("SELECT * FROM graft.my_table WHERE id = 7")
  * }}}
  *
  * The returned tables are the same `GraftSparkTable` the TableProvider
  * serves, so filter pushdown → metadata pruning applies identically
  * (the reference's SQL surface is the DataFusion TableProvider;
  * table/mod.rs:68-151).
  */
final class GraftCatalogPlugin extends CatalogPlugin with TableCatalog with ViewCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.SupportsNamespaces {

  /** Multi-part identifiers flatten to dotted names in the underlying
    * catalog: `cat.ns1.t` → table "ns1.t" — so same-named tables in
    * different namespaces never collide. */
  private def flatName(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  /** `CALL <cat>.system.<proc>(...)` — SQL maintenance procedures
    * (GraftProcedures: rewrite/expire/orphans/rollback/branch/tag/stats). */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    val ok = ident.namespace().isEmpty ||
      ident.namespace().sameElements(GraftProcedures.Namespace)
    (if (ok) GraftProcedures.load(ident.name(), catalog) else None).getOrElse(
      throw new RuntimeException(s"unknown procedure: $ident"))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.Names
      .map(n => Identifier.of(GraftProcedures.Namespace, n)).toArray

  private var catalogName: String = _
  /** Conf key the warehouse is re-read from per operation (dynamic
    * mode); None = warehouse frozen at initialize (the normal shape). */
  private var warehouseConfKey: Option[String] = None
  private var initProps: Map[String, String] = Map.empty
  private var catalogType: String = "hadoop"

  @volatile private var state: GraftCatalogPlugin.Resolved = _
  private def Resolved(wh: String, cat: GraftCatalog, vs: ViewStore) =
    new GraftCatalogPlugin.Resolved(wh, cat, vs)

  /** Spark's CatalogManager caches plugin instances BY NAME for the
    * session lifetime, so a warehouse bound at initialize pins every
    * later `cat.table` reference to the first warehouse. Harnesses that
    * build a FRESH throwaway warehouse per invocation under ONE catalog
    * name (the bench write family — r11 ADVICE item 4: a unique name
    * per invocation leaked two conf entries + a cached plugin instance
    * each) set `spark.sql.catalog.<name>.warehouse-conf = <key>` once
    * and re-point `<key>` per invocation; the plugin re-reads it per
    * operation and swaps its backend only when the value moves.
    *
    * Consistency scope: each `resolve()` returns ONE atomic
    * (warehouse, catalog, views) triple, but a multi-accessor operation
    * that races a concurrent key re-point can still mix triples across
    * its accessor calls — dynamic mode is a SERIAL-harness feature
    * (one invocation at a time re-points, then operates); concurrent
    * multi-warehouse work belongs in separately named catalogs. */
  private def resolve(): GraftCatalogPlugin.Resolved = synchronized {
    val wh = warehouseConfKey match {
      case Some(k) =>
        org.apache.spark.sql.SparkSession.active.conf.getOption(k).getOrElse(
          throw new IllegalArgumentException(
            s"catalog $catalogName reads its warehouse from session conf " +
              s"'$k', which is unset"))
      case None => state.warehouse
    }
    if (state == null || wh != state.warehouse)
      state = Resolved(wh,
        CatalogLoader.load(catalogType,
          initProps ++ Map("warehouse" -> wh, "name" -> catalogName)),
        new ViewStore(wh, FileIO.local()))
    state
  }
  private def warehouse: String = resolve().warehouse
  private def catalog: GraftCatalog = resolve().catalog
  private def views: ViewStore = resolve().views

  /** `spark.sql.catalog.<name>.type` selects the backend through
    * CatalogLoader (hadoop | memory | jdbc/sql | rest — the reference's
    * catalog/loader registry); hadoop is the default. */
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    import scala.jdk.CollectionConverters._
    initProps = options.asCaseSensitiveMap.asScala.toMap
    catalogType = Option(options.get("type")).getOrElse("hadoop")
    warehouseConfKey = Option(options.get("warehouse-conf"))
    if (warehouseConfKey.isEmpty) {
      // static mode: resolve once, eagerly — resolve()'s None branch
      // reads state.warehouse, which this initialization establishes
      val wh = Option(options.get("warehouse")).getOrElse(
        throw new IllegalArgumentException(
          s"spark.sql.catalog.$name.warehouse is required"))
      state = Resolved(wh,
        CatalogLoader.load(catalogType,
          initProps ++ Map("warehouse" -> wh, "name" -> name)),
        new ViewStore(wh, FileIO.local()))
    }
    // Capacity of the process-wide parsed-manifest cache (reference
    // ObjectCache size, io/object_cache.rs:28); 0 disables caching.
    // Preferred source is the ONE session-level key (a per-catalog
    // option on a process-global cache is initialization-order-
    // dependent across catalogs); the catalog option stays honored as a
    // fallback for single-catalog configs.
    val cacheSize = scala.util.Try(org.apache.spark.sql.SparkSession.active)
      .toOption
      .flatMap(_.conf.getOption("spark.graft.manifest-cache-size-bytes"))
      .orElse(Option(options.get("manifest-cache-size-bytes")))
    cacheSize.foreach { v =>
      val parsed = v.toLongOption.filter(_ >= 0).getOrElse(
        throw new IllegalArgumentException(
          s"spark.graft.manifest-cache-size-bytes must be a non-negative " +
            s"byte count, got '$v'"))
      graft.meta.ManifestCache.configure(parsed)
    }
  }

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val prefix = if (namespace.isEmpty) "" else namespace.mkString(".") + "."
    catalog.listTables()
      .filter(t => t.startsWith(prefix) && !t.stripPrefix(prefix).contains('.'))
      .map(t => Identifier.of(namespace, t.stripPrefix(prefix))).toArray
  }

  override def loadTable(ident: Identifier): SparkTable = {
    // metadata tables: `SELECT * FROM <cat>.<table>.<meta>` (Iceberg's
    // inspect surface in SQL; inspect/metadata_table.rs)
    if (ident.namespace().nonEmpty &&
        GraftMetadataSparkTable.Names(ident.name()) &&
        catalog.tableExists(ident.namespace().mkString(".")))
      return new GraftMetadataSparkTable(
        GraftTable.load(ident.namespace().mkString("."), catalog), ident.name())
    // NoSuchTableException (not a generic error) so Spark's analyzer falls
    // through to loadView for identifiers that name a view
    if (!catalog.tableExists(flatName(ident)))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    new GraftSparkTable(GraftTable.load(flatName(ident), catalog))
  }

  /** SQL time travel: `FOR SYSTEM_VERSION AS OF <snapshot-id|ref>` —
    * Spark routes VERSION AS OF here with the version string. */
  override def loadTable(ident: Identifier, version: String): SparkTable = {
    val t = GraftTable.load(flatName(ident), catalog)
    val snapId = t.metadata.refs.get(version).map(_.snapshotId)
      .orElse(scala.util.Try(version.toLong).toOption)
      .getOrElse(throw new IllegalArgumentException(
        s"version '$version' is neither a ref nor a snapshot id"))
    new GraftSparkTable(t.atSnapshot(snapId))
  }

  /** SQL time travel: `FOR SYSTEM_TIME AS OF <ts>` — Spark passes the
    * timestamp in MICROseconds. */
  override def loadTable(ident: Identifier, timestamp: Long): SparkTable = {
    val t = GraftTable.load(flatName(ident), catalog)
    new GraftSparkTable(t.asOfTimestamp(timestamp / 1000L))
  }

  override def tableExists(ident: Identifier): Boolean =
    catalog.tableExists(flatName(ident))

  /** CREATE-time DDL abilities: declaring `DEFAULT <literal>` columns is
    * supported (v3 field defaults) — without this capability Spark
    * refuses the statement before the catalog ever sees it. */
  override def capabilities()
      : util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  /** `CREATE TABLE ... PARTITIONED BY (identity | bucket(N, c) |
    * truncate(W, c) | years/months/days/hours(c))` → the Iceberg
    * partition spec (spec/transform.rs names). `DEFAULT <lit>` columns
    * become v3 initial+write defaults (format-version 3 required — the
    * same rule the ALTER path enforces). */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): SparkTable = {
    import scala.jdk.CollectionConverters._
    val iceSchema0 = IcebergSchema.fromSpark(schema)
    // Spark stores a declared DEFAULT as SQL text in the field metadata;
    // fold the literal and record it as the Iceberg field default
    val defaults: Map[String, Any] = schema.fields.flatMap { f =>
      if (!f.metadata.contains("CURRENT_DEFAULT")) None
      else Some(f.name -> GraftCatalogPlugin.foldDefaultLiteral(
        f.metadata.getString("CURRENT_DEFAULT"), f.dataType))
    }.toMap
    val iceSchema =
      if (defaults.isEmpty) iceSchema0
      else {
        require(Option(properties.get("format-version")).contains("3"),
          "DEFAULT columns require format-version 3: add " +
            "TBLPROPERTIES ('format-version'='3')")
        iceSchema0.copy(fields = iceSchema0.fields.map { f =>
          defaults.get(f.name) match {
            case Some(v) =>
              val d = graft.meta.SingleValue.fromCatalyst(f.fieldType, v)
              f.copy(initialDefault = Some(d), writeDefault = Some(d))
            case None => f
          }
        })
      }
    val spec =
      if (partitions.isEmpty) PartitionSpec.unpartitioned
      else PartitionSpec(0, partitions.toSeq.zipWithIndex.map { case (t, i) =>
        GraftCatalogPlugin.toPartitionField(iceSchema, t, 1000 + i)
      })
    val t = GraftTable.create(flatName(ident), catalog, iceSchema, spec,
      properties.asScala.toMap)
    new GraftSparkTable(t)
  }

  /** ALTER TABLE via SQL DDL → the schema-evolution / properties actions
    * (transaction/update_schema.rs semantics): ADD/DROP/RENAME COLUMN,
    * ALTER COLUMN TYPE (widening only), SET/UNSET TBLPROPERTIES. Nested
    * column paths are refused (top-level evolution only, SURVEY §8). */
  override def alterTable(ident: Identifier, changes: TableChange*): SparkTable = {
    import org.apache.spark.sql.connector.catalog.TableChange._
    val t = GraftTable.load(flatName(ident), catalog)
    def topLevel(fieldNames: Array[String]): String = {
      require(fieldNames.length == 1,
        s"nested column evolution not supported: ${fieldNames.mkString(".")}")
      fieldNames.head
    }
    val schemaChanges = changes.collect {
      case _: AddColumn | _: DeleteColumn | _: RenameColumn |
          _: UpdateColumnType | _: UpdateColumnComment |
          _: UpdateColumnNullability | _: UpdateColumnDefaultValue => ()
    }
    if (schemaChanges.nonEmpty) {
      val u = t.updateSchema()
      changes.foreach {
        case a: AddColumn =>
          val it = graft.spec.IcebergType.fromSpark(a.dataType(), () => 0)
          Option(a.defaultValue()) match {
            case Some(dv) => // v3 field default via SQL DDL (DEFAULT <lit>)
              u.addColumnWithDefault(topLevel(a.fieldNames()), it,
                graft.meta.SingleValue.fromCatalyst(it, dv.getValue().value()),
                Option(a.comment()))
            case None =>
              u.addColumn(topLevel(a.fieldNames()), it, Option(a.comment()))
          }
        case d: DeleteColumn => u.dropColumn(topLevel(d.fieldNames()))
        case r: RenameColumn => u.renameColumn(topLevel(r.fieldNames()), r.newName())
        case tt: UpdateColumnType =>
          u.updateColumnType(topLevel(tt.fieldNames()),
            graft.spec.IcebergType.fromSpark(tt.newDataType(), () => 0))
        case c: UpdateColumnComment =>
          u.updateColumnDoc(topLevel(c.fieldNames()), Option(c.newComment()))
        case dv: UpdateColumnDefaultValue =>
          val name = topLevel(dv.fieldNames())
          val ft = t.schema.findField(name).getOrElse(throw
            new IllegalArgumentException(s"no such column: $name")).fieldType
          Option(dv.newCurrentDefault())
            .flatMap(d => Option(d.getSql()).filter(_.nonEmpty)) match {
            case Some(sqlText) =>
              val v = GraftCatalogPlugin.foldDefaultLiteral(sqlText,
                graft.spec.IcebergType.toSpark(ft))
              u.updateColumnDefault(name,
                graft.meta.SingleValue.fromCatalyst(ft, v))
            case None => u.clearColumnDefault(name) // DROP DEFAULT
          }
        case n: UpdateColumnNullability =>
          if (n.nullable()) u.makeColumnOptional(topLevel(n.fieldNames()))
          else throw new UnsupportedOperationException(
            "cannot make an existing column NOT NULL: already-written rows " +
              "cannot be proven non-null (Iceberg rule)")
        case _ => ()
      }
      u.commit()
    }
    val sets = changes.collect { case s: SetProperty => s.property() -> s.value() }.toMap
    val removes = changes.collect { case r: RemoveProperty => r.property() }.toSet
    // 'format-version' is Iceberg's conventional upgrade knob, not a plain
    // property: route it through the guarded upgrade transaction
    sets.get("format-version").foreach(v =>
      graft.table.Transactions.upgradeFormatVersion(
        GraftTable.load(flatName(ident), catalog), v.toInt))
    val plainSets = sets - "format-version"
    if (plainSets.nonEmpty || removes.nonEmpty)
      GraftTable.load(flatName(ident), catalog).updateProperties(plainSets, removes)
    new GraftSparkTable(GraftTable.load(flatName(ident), catalog))
  }

  override def dropTable(ident: Identifier): Boolean =
    if (!catalog.tableExists(flatName(ident))) false
    else catalog.dropTable(flatName(ident))

  /** SQL `ALTER TABLE x RENAME TO y`: delegated to the catalog's pointer
    * rename (jdbc/memory/rest/hms support it; hadoop refuses — name is
    * path-coupled, same as the reference). */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    // Spark hands the `RENAME TO` target through RAW (catalog part not
    // stripped): a leading segment equal to this catalog's name is the
    // catalog qualifier, not a namespace
    val dst =
      if (newIdent.namespace().headOption.contains(catalogName))
        Identifier.of(newIdent.namespace().drop(1), newIdent.name())
      else newIdent
    catalog.renameTable(flatName(oldIdent), flatName(dst))
  }

  // ---- ViewCatalog (view_metadata.rs:59 surface over the ViewStore) ----

  /** FunctionCatalog: resolves the `bucket` transform that bucket-
    * partitioned scans report in KeyGroupedPartitioning, so Spark can
    * plan storage-partitioned joins over bucket layouts (identity
    * transforms resolve without a function catalog). */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    ("bucket" +: graft.functions.GraftTemporalFunctions.byName.keys.toSeq.sorted)
      .map(Identifier.of(namespace, _)).toArray

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    ident.name() match {
      case "bucket" => graft.functions.GraftBucketFunction
      case n if graft.functions.GraftTemporalFunctions.byName.contains(n) =>
        graft.functions.GraftTemporalFunctions.byName(n)
      case _ => throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident)
    }

  override def listViews(namespace: String*): Array[Identifier] = {
    val prefix = if (namespace.isEmpty) "" else namespace.mkString(".") + "."
    views.list()
      .filter(v => v.startsWith(prefix) && !v.stripPrefix(prefix).contains('.'))
      .map(v => Identifier.of(namespace.toArray, v.stripPrefix(prefix))).toArray
  }

  override def viewExists(ident: Identifier): Boolean = views.exists(flatName(ident))

  override def loadView(ident: Identifier): View = {
    if (!views.exists(flatName(ident)))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    val (md, _) = views.load(flatName(ident))
    new GraftSparkView(flatName(ident), md)
  }

  override def createView(info: ViewInfo): View = {
    val name = flatName(info.ident())
    if (views.exists(name))
      throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(info.ident())
    val md = ViewMetadata.newView(
      location = s"$warehouse/$name",
      sql = info.sql(),
      dialect = "spark",
      schema = IcebergSchema.fromSpark(info.schema()),
      defaultCatalog = Option(info.currentCatalog()),
      defaultNamespace = Option(info.currentNamespace()).map(_.toSeq).getOrElse(Nil),
      properties = {
        import scala.jdk.CollectionConverters._
        info.properties().asScala.toMap
      })
    views.create(name, md)
    new GraftSparkView(name, md)
  }

  /** Property changes only — they don't create a new view version
    * (view spec: properties are metadata, versions are definitions). */
  override def alterView(ident: Identifier, changes: ViewChange*): View = {
    val (md, v) = views.load(flatName(ident))
    val props = changes.foldLeft(md.properties) {
      case (p, s: ViewChange.SetProperty) => p + (s.property() -> s.value())
      case (p, r: ViewChange.RemoveProperty) => p - r.property()
      case (p, _) => p
    }
    val updated = md.copy(properties = props)
    views.update(flatName(ident), v, updated)
    new GraftSparkView(flatName(ident), updated)
  }

  override def dropView(ident: Identifier): Boolean = views.drop(flatName(ident))

  override def renameView(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("view rename is not supported")

  // ---- SupportsNamespaces (catalog/mod.rs namespace surface; dotted in
  //      the underlying catalog, arrays at the Spark boundary) ----

  private def dotted(ns: Array[String]): String = ns.mkString(".")

  // Spark contract: the no-arg form lists TOP-LEVEL namespaces only —
  // nested ones surface through listNamespaces(parent). Backends list
  // every ancestor of an explicit namespace (Catalog.withAncestors), so
  // a nested-only 'a.b' is reachable through 'a' with plain filters.
  override def listNamespaces(): Array[Array[String]] =
    catalog.listNamespaces().filterNot(_.contains('.'))
      .map(Array(_)).toArray

  override def listNamespaces(parent: Array[String]): Array[Array[String]] = {
    if (parent.isEmpty) return listNamespaces()
    if (!catalog.namespaceExists(dotted(parent)))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(parent)
    val prefix = dotted(parent) + "."
    catalog.listNamespaces()
      .filter(n => n.startsWith(prefix) && !n.stripPrefix(prefix).contains('.'))
      .map(_.split('.').asInstanceOf[Array[String]]).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    catalog.namespaceExists(dotted(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!catalog.namespaceExists(dotted(namespace)))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace)
    import scala.jdk.CollectionConverters._
    catalog.namespaceProperties(dotted(namespace)).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    import scala.jdk.CollectionConverters._
    catalog.createNamespace(dotted(namespace), metadata.asScala.toMap)
  }

  override def alterNamespace(namespace: Array[String],
      changes: org.apache.spark.sql.connector.catalog.NamespaceChange*): Unit = {
    import org.apache.spark.sql.connector.catalog.NamespaceChange._
    val sets = changes.collect { case s: SetProperty => s.property() -> s.value() }.toMap
    val removes = changes.collect { case r: RemoveProperty => r.property() }.toSet
    catalog.updateNamespaceProperties(dotted(namespace), sets, removes)
  }

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val ns = dotted(namespace)
    if (!catalog.namespaceExists(ns)) return false
    val prefix = ns + "."
    val tables = catalog.listTables().filter(_.startsWith(prefix))
    val childNs = catalog.listNamespaces().filter(_.startsWith(prefix))
    val childViews = views.list().filter(_.startsWith(prefix))
    // non-cascade refuses on ANY content — tables, views, or child
    // namespaces (the backend's raw require would otherwise surface as an
    // IllegalArgumentException instead of Spark's typed error)
    if (!cascade && (tables.nonEmpty || childNs.nonEmpty || childViews.nonEmpty))
      throw new org.apache.spark.sql.catalyst.analysis
        .NonEmptyNamespaceException(namespace)
    if (cascade) {
      tables.foreach(catalog.dropTable)
      childViews.foreach(views.drop) // orphaned view metadata still resolves
      // deepest-first so each explicit child namespace is empty when its
      // own drop runs (implicit ones vanished with their tables — their
      // drop returns false, which is fine)
      childNs.sortBy(n => -n.count(_ == '.')).foreach(catalog.dropNamespace)
    }
    // an implicit (derived-only) namespace vanishes WITH its tables: the
    // backend then reports "didn't exist", but from the caller's view it
    // existed and is gone — report true
    catalog.dropNamespace(ns) || cascade
  }
}

object GraftCatalogPlugin {
  import graft.spec.{PartitionField, Transform => IceTransform}

  /** One immutable resolved backend: warehouse + catalog + view store
    * always swap TOGETHER, so any single accessor read is internally
    * consistent even if another thread re-points the dynamic key. */
  private[sources] final class Resolved(val warehouse: String,
      val catalog: GraftCatalog, val views: ViewStore)

  /** Fold a DEFAULT clause's SQL text to a Catalyst value of the column
    * type (literal defaults only — non-foldable expressions throw). Folds
    * in the SESSION timezone — the same zone Spark's analyzer will use
    * when it evaluates the stored CURRENT_DEFAULT text on INSERT — so a
    * zone-less timestamptz default maps to the same instant in the
    * Iceberg metadata as in the analyzer-filled rows. */
  private[sources] def foldDefaultLiteral(sqlText: String,
      dataType: org.apache.spark.sql.types.DataType): Any = {
    val parsed = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(sqlText)
    val zone = org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone
    org.apache.spark.sql.catalyst.expressions
      .Cast(parsed, dataType, Some(zone)).eval(null)
  }

  /** One Spark DDL transform → one Iceberg partition field (Iceberg's
    * Spark-DDL naming conventions: `c`, `c_bucket`, `c_trunc`,
    * `c_year|month|day|hour`). */
  private[sources] def toPartitionField(schema: IcebergSchema,
      t: Transform, fieldId: Int): PartitionField = {
    val (name, arg, path) =
      org.apache.spark.sql.GraftTransformBridge.destructure(t)
    require(path.length == 1,
      s"nested partition source unsupported: ${path.mkString(".")}")
    val f = schema.findField(path.head).getOrElse(
      throw new IllegalArgumentException(
        s"partition source column not found: ${path.head}"))
    name match {
      case "identity" => PartitionField(f.id, fieldId, f.name, IceTransform.Identity)
      case "bucket" =>
        PartitionField(f.id, fieldId, s"${f.name}_bucket", IceTransform.Bucket(arg.get))
      case "truncate" =>
        PartitionField(f.id, fieldId, s"${f.name}_trunc", IceTransform.Truncate(arg.get))
      case "year" => PartitionField(f.id, fieldId, s"${f.name}_year", IceTransform.Year)
      case "month" => PartitionField(f.id, fieldId, s"${f.name}_month", IceTransform.Month)
      case "day" => PartitionField(f.id, fieldId, s"${f.name}_day", IceTransform.Day)
      case "hour" => PartitionField(f.id, fieldId, s"${f.name}_hour", IceTransform.Hour)
    }
  }
}

/** Spark DSv2 View over graft ViewMetadata: the current version's Spark
  * SQL representation plus its recorded result schema. */
/** Read-only DSv2 table serving one metadata table of a graft table —
  * lets plain SQL inspect snapshots/manifests/files/… exactly like
  * Iceberg's `db.table.snapshots` surface. Metadata tables are O(commits)
  * rows, so the V1 row-conversion bridge costs nothing measurable. */
final class GraftMetadataSparkTable(table: GraftTable, metaName: String)
    extends SparkTable with SupportsRead {

  private def df(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame =
    metaName match {
      case "snapshots" => table.snapshotsDf(spark)
      case "manifests" => table.manifestsDf(spark)
      case "history" => table.historyDf(spark)
      case "files" | "data_files" => table.filesDf(spark)
      case "delete_files" => table.deleteFilesDf(spark)
      case "position_deletes" => table.positionDeletesDf(spark)
      case "entries" => table.entriesDf(spark)
      case "partitions" => table.partitionsDf(spark)
      case "refs" => table.refsDf(spark)
      case "metadata_log_entries" => table.metadataLogEntriesDf(spark)
      case "all_manifests" => table.allManifestsDf(spark)
      case "all_files" => table.allFilesDf(spark)
      case "all_data_files" =>
        table.allFilesDf(spark).filter(org.apache.spark.sql.functions
          .col("content") === graft.meta.FileContent.Data)
      case "all_delete_files" =>
        table.allFilesDf(spark).filter(org.apache.spark.sql.functions
          .col("content") =!= graft.meta.FileContent.Data)
      case "all_entries" => table.allEntriesDf(spark)
      case other => throw new IllegalArgumentException(s"no metadata table $other")
    }

  override def name(): String = s"${table.name}.$metaName"
  override def schema(): StructType =
    df(org.apache.spark.sql.SparkSession.active).schema
  override def capabilities(): util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
    util.EnumSet.of(org.apache.spark.sql.connector.catalog.TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    () => new org.apache.spark.sql.connector.read.V1Scan {
      override def readSchema(): StructType = schema()
      override def toV1TableScan[T <: org.apache.spark.sql.sources.BaseRelation
          with org.apache.spark.sql.sources.TableScan](
          context: org.apache.spark.sql.SQLContext): T = {
        val relation = new org.apache.spark.sql.sources.BaseRelation
            with org.apache.spark.sql.sources.TableScan {
          override def sqlContext: org.apache.spark.sql.SQLContext = context
          override def schema: StructType = readSchema()
          override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
            df(context.sparkSession).rdd
        }
        relation.asInstanceOf[T]
      }
    }
}

object GraftMetadataSparkTable {
  val Names: Set[String] = Set("snapshots", "manifests", "history", "files",
    "data_files", "delete_files", "position_deletes",
    "entries", "partitions", "refs", "metadata_log_entries",
    "all_manifests", "all_files", "all_data_files", "all_delete_files",
    "all_entries")
}

final class GraftSparkView(viewName: String, md: graft.spec.ViewMetadata) extends View {
  private val cur = md.currentVersion
  override def name(): String = viewName
  override def query(): String = cur.sqlFor("spark").getOrElse(
    throw new IllegalStateException(s"view $viewName has no spark representation"))
  override def currentCatalog(): String = cur.defaultCatalog.orNull
  override def currentNamespace(): Array[String] = cur.defaultNamespace.toArray
  override def schema(): StructType =
    md.schemaById(cur.schemaId).map(_.toSpark).getOrElse(new StructType())
  override def queryColumnNames(): Array[String] = Array.empty
  override def columnAliases(): Array[String] = Array.empty
  override def columnComments(): Array[String] = Array.empty
  override def properties(): util.Map[String, String] = {
    import scala.jdk.CollectionConverters._
    md.properties.asJava
  }
}
