package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, SupportsRead, Table => SparkTable, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.HadoopCatalog
import graft.io.FileIO
import graft.spec.{IcebergSchema, PartitionSpec}
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
final class GraftCatalogPlugin extends CatalogPlugin with TableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _
  private var catalog: HadoopCatalog = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"spark.sql.catalog.$name.warehouse is required"))
    catalog = new HadoopCatalog(warehouse, new FileIO(new Configuration()))
  }

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    catalog.listTables().map(t => Identifier.of(namespace, t)).toArray

  override def loadTable(ident: Identifier): SparkTable =
    new GraftSparkTable(GraftTable.load(ident.name(), catalog))

  override def tableExists(ident: Identifier): Boolean =
    catalog.tableExists(ident.name())

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): SparkTable = {
    require(partitions.isEmpty,
      "CREATE TABLE ... PARTITIONED BY is not wired; use GraftTable.create with a PartitionSpec")
    import scala.jdk.CollectionConverters._
    val t = GraftTable.create(ident.name(), catalog,
      IcebergSchema.fromSpark(schema), PartitionSpec.unpartitioned,
      properties.asScala.toMap)
    new GraftSparkTable(t)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): SparkTable =
    throw new UnsupportedOperationException(
      "ALTER TABLE via SQL is not wired; use GraftTable.updateSchema")

  override def dropTable(ident: Identifier): Boolean =
    catalog.dropTable(ident.name())

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("rename is not supported")
}
