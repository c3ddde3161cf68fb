package graft.sources

import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, ShowViews, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** Session extensions wiring Iceberg-style VIEW DDL + resolution onto the
  * graft catalog plugin. Vanilla Spark 4.1 parses `CREATE VIEW` /
  * `DROP VIEW` / view reads but routes them only to the session catalog —
  * `ResolveSessionCatalog` rejects v2 catalogs and nothing in the stock
  * analyzer calls `ViewCatalog.loadView`. Exactly like the Iceberg Spark
  * runtime, the missing semantics are injected here: a delegating parser
  * rewrites view DDL aimed at a graft catalog into runnable commands, and
  * a resolution rule expands reads of graft views into their stored SQL.
  *
  * {{{
  * spark.conf: spark.sql.extensions=graft.sources.GraftSparkExtensions
  * spark.sql("CREATE VIEW graft.v AS SELECT ...")
  * spark.sql("SELECT * FROM graft.v")
  * spark.sql("DROP VIEW graft.v")
  * }}}
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(spark => new ResolveGraftViews(spark))
    ext.injectParser((spark, delegate) => new GraftViewDdlParser(spark, delegate))
  }
}

private object GraftViews {
  /** The graft ViewCatalog named `cat`, if registered and of our type. */
  def plugin(spark: SparkSession, cat: String): Option[GraftCatalogPlugin] = {
    val cm = spark.sessionState.catalogManager
    if (!cm.isCatalogRegistered(cat)) None
    else cm.catalog(cat) match {
      case g: GraftCatalogPlugin => Some(g)
      case _ => None
    }
  }
}

/** Delegating parser: view DDL over a graft catalog becomes a runnable
  * command; everything else passes through untouched. */
final class GraftViewDdlParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(sqlText) match {
      case cv: CreateView => cv.child match {
        case UnresolvedIdentifier(cat +: rest, _)
            if rest.nonEmpty && GraftViews.plugin(spark, cat).isDefined =>
          GraftCreateViewCommand(cat, rest.mkString("."),
            cv.originalText.getOrElse(throw new IllegalArgumentException(
              "CREATE VIEW without query text")),
            cv.properties, cv.comment, cv.allowExisting, cv.replace)
        case _ => cv
      }
      case dv: DropView => dv.child match {
        case UnresolvedIdentifier(cat +: rest, _)
            if rest.nonEmpty && GraftViews.plugin(spark, cat).isDefined =>
          GraftDropViewCommand(cat, rest.mkString("."), dv.ifExists)
        case _ => dv
      }
      case sv: ShowViews => sv.namespace match {
        case org.apache.spark.sql.catalyst.analysis.UnresolvedNamespace(cat +: ns, _)
            if GraftViews.plugin(spark, cat).isDefined =>
          GraftShowViewsCommand(cat, ns, sv.pattern)
        case _ => sv
      }
      case other => other
    }

  override def parseExpression(sqlText: String) = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) = delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) = delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) = delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String) = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) = delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String) = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String) = delegate.parseRoutineParam(sqlText)
}

/** CREATE [OR REPLACE] VIEW over a graft ViewCatalog: analyze the query
  * for its result schema, then persist spec-shaped view metadata. */
final case class GraftCreateViewCommand(catalogName: String, viewName: String,
    viewSql: String, properties: Map[String, String], comment: Option[String],
    allowExisting: Boolean, replace: Boolean) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val plugin = GraftViews.plugin(spark, catalogName).get
    val ident = Identifier.of(Array.empty[String], viewName)
    if (plugin.viewExists(ident)) {
      if (allowExisting) return Nil
      if (replace) plugin.dropView(ident)
      else throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(ident)
    }
    val schema = spark.sql(viewSql).schema
    import scala.jdk.CollectionConverters._
    val props = (properties ++ comment.map("comment" -> _)).asJava
    plugin.createView(new ViewInfo(ident, viewSql, catalogName,
      Array.empty[String], schema, Array.empty[String], Array.empty[String],
      Array.empty[String], props))
    Nil
  }
}

/** SHOW VIEWS over a graft ViewCatalog (vanilla Spark rejects v2
  * catalogs for this command; same injection as the DDL). */
final case class GraftShowViewsCommand(catalogName: String,
    ns: Seq[String], pattern: Option[String]) extends LeafRunnableCommand {

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] = Seq(
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "namespace", org.apache.spark.sql.types.StringType, nullable = false)(),
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "viewName", org.apache.spark.sql.types.StringType, nullable = false)(),
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "isTemporary", org.apache.spark.sql.types.BooleanType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val plugin = GraftViews.plugin(spark, catalogName).get
    plugin.listViews(ns: _*).toSeq
      .filter(id => pattern.forall(p =>
        org.apache.spark.sql.catalyst.util.StringUtils
          .filterPattern(Seq(id.name()), p).nonEmpty))
      .map(id => Row(ns.mkString("."), id.name(), false))
  }
}

/** DROP VIEW over a graft ViewCatalog. */
final case class GraftDropViewCommand(catalogName: String, viewName: String,
    ifExists: Boolean) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val plugin = GraftViews.plugin(spark, catalogName).get
    val ident = Identifier.of(Array.empty[String], viewName)
    if (!plugin.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    Nil
  }
}

/** Read-side resolution: a reference to `cat.view` where `cat` is a graft
  * ViewCatalog expands to the view's stored Spark SQL (the role of
  * Iceberg's ResolveViews rule; stock ResolveRelations leaves these
  * unresolved after loadTable misses). */
final class ResolveGraftViews(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        u.multipartIdentifier match {
          case cat +: rest if rest.nonEmpty =>
            val ident = Identifier.of(rest.dropRight(1).toArray, rest.last)
            GraftViews.plugin(spark, cat)
              .filter(_.viewExists(ident))
              .map { plugin =>
                val view = plugin.loadView(ident)
                SubqueryAlias(rest.last,
                  spark.sessionState.sqlParser.parsePlan(view.query()))
              }
              .getOrElse(u)
          case _ => u
        }
    }
}
