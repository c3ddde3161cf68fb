package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table => SparkTable, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, Filter, TableScan => V1TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.HadoopCatalog
import graft.expr.{AlwaysTrue, Predicate, SparkFilters}
import graft.io.FileIO
import graft.table.GraftTable

/** DSv2 read surface: `spark.read.format("graft")
  * .option("warehouse", dir).option("table", name).load()` — the SQL scan
  * bridge the reference exposes as a DataFusion `TableProvider`
  * (crates/integrations/datafusion/src/table/mod.rs:68-151).
  *
  * Filter pushdown: Spark lowers `df.filter(...)` to `sources.Filter`s;
  * `SparkFilters` lifts the translatable subset into the metadata AST so
  * `planFiles()` prunes manifests/files BEFORE any data is read. All
  * filters are also kept as residuals (inexact pushdown, exactly the
  * reference's `TableProviderFilterPushDown::Inexact` contract), so
  * correctness never depends on pruning precision.
  *
  * Execution delegates to `TableScan.toDF` through a `V1Scan` relation:
  * the actual reads stay Spark's vectorized parquet source (codegen,
  * row-group pruning, 100 TB split planning) rather than a bespoke
  * `PartitionReader` — the DSv2 layer contributes table resolution,
  * pushdown bookkeeping, and column pruning.
  */
final class GraftSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def load(options: CaseInsensitiveStringMap): GraftTable = {
    val warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException("option 'warehouse' is required"))
    val table = Option(options.get("table")).getOrElse(
      throw new IllegalArgumentException("option 'table' is required"))
    GraftTable.load(table, new HadoopCatalog(warehouse, new FileIO(new Configuration())))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    load(options).schema.toSpark

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): SparkTable =
    new GraftSparkTable(load(new CaseInsensitiveStringMap(properties)))
}

final class GraftSparkTable(table: GraftTable) extends SparkTable
    with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = table.name
  override def schema(): StructType = table.schema.toSpark
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(table, options.asCaseSensitiveMap.asScala.toMap)

  /** INSERT INTO via the V1 write fallback: the insert plan hands us the
    * materialized DataFrame and the append commit path does the rest
    * (executor writes + stats harvest + CAS commit). */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var truncateFirst = false
      override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
        truncateFirst = true; this
      }
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation =
            (data: org.apache.spark.sql.DataFrame, overwrite: Boolean) => {
              // refresh: the handle may be stale relative to the session
              val live = GraftTable.load(table.name, table.catalog)
              if (truncateFirst || overwrite)
                // INSERT OVERWRITE = full-table overwrite commit: every
                // current file strict-matches AlwaysTrue, so it's a
                // whole-file drop + append (no data rewrite of old rows)
                live.overwriteWhere(AlwaysTrue, data, data.sparkSession)
              else live.append(data)
              ()
            }
        }
    }
}

final class GraftScanBuilder(table: GraftTable, options: Map[String, String] = Map.empty)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var predicate: Predicate = AlwaysTrue
  private var required: Option[StructType] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => SparkFilters.toPredicate(f, table.schema).isDefined)
    predicate = SparkFilters.toPredicate(filters.toSeq, table.schema)
    filters // inexact: every filter is re-evaluated above the scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = Some(requiredSchema)

  /** Native DSv2 Batch for the common shapes (clean scans, position
    * deletes, DVs); V1 relation fallback for the join-shaped features —
    * name-mapping resolution and equality deletes — whose distributed
    * anti-join plans don't fit a per-file reader. */
  override def build(): Scan = {
    val usesNameMapping =
      table.metadata.properties.get("graft.read.use-name-mapping").contains("true")
    lazy val hasEqDeletes = table.newScan().planDeletes()
      .exists(_.file.content == graft.meta.FileContent.EqualityDeletes)
    if (usesNameMapping || hasEqDeletes) new GraftV1Scan(table, predicate, required)
    else new GraftBatchScan(table, predicate, pushed.toSeq, required, options)
  }
}

final class GraftV1Scan(table: GraftTable, predicate: Predicate,
    required: Option[StructType]) extends V1Scan {

  private val projected: Seq[String] = required match {
    case Some(s) if s.fields.nonEmpty => s.fieldNames.toSeq
    case _ => table.schema.fields.map(_.name)
  }

  override def readSchema(): StructType = {
    val full = table.schema.toSpark
    StructType(projected.flatMap(n => full.fields.find(_.name == n)))
  }

  override def toV1TableScan[T <: BaseRelation with V1TableScan](
      context: SQLContext): T = {
    val relation = new BaseRelation with V1TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = readSchema()
      override def buildScan(): RDD[Row] = scanDf(context.sparkSession).rdd
    }
    relation.asInstanceOf[T]
  }

  /** Pruned scan DataFrame (shared with tests asserting plan pruning). */
  def scanDf(spark: SparkSession): DataFrame = {
    val s = table.newScan()
    val filtered = predicate match {
      case AlwaysTrue => s
      case p => s.withFilter(p)
    }
    filtered.select(projected: _*).toDF(spark)
  }
}
