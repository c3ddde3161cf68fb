package graft.catalog

import org.apache.hadoop.conf.Configuration

import graft.io.FileIO

/** Property-driven catalog construction — the reference's
  * `crates/catalog/loader/src/lib.rs` registry (`type` → builder). `glue`
  * takes any Glue-protocol endpoint via `uri` (AWS or the embedded stub);
  * `hms` is constructed directly (needs a live thrift client), s3tables
  * needs a cloud endpoint.
  *
  * {{{
  * CatalogLoader.load("hadoop", Map("warehouse" -> "/wh"))
  * CatalogLoader.load("jdbc",   Map("uri" -> "jdbc:derby:/wh/cat;create=true",
  *                                  "warehouse" -> "/wh"))
  * CatalogLoader.load("rest",   Map("uri" -> "http://host:8181",
  *                                  "warehouse" -> "/wh"))
  * }}}
  *
  * The same keys configure the Spark catalog plugin:
  * `spark.sql.catalog.<name>.type` / `.uri` / `.warehouse`.
  */
object CatalogLoader {

  val SupportedTypes: Seq[String] =
    Seq("hadoop", "memory", "jdbc", "sql", "rest", "glue", "s3tables")

  def load(catalogType: String, props: Map[String, String]): Catalog = {
    def req(k: String): String = props.getOrElse(k,
      throw new IllegalArgumentException(
        s"catalog type '$catalogType' requires property '$k'"))
    val io = FileIO.local()
    catalogType.toLowerCase match {
      case "hadoop" => new HadoopCatalog(req("warehouse"), io)
      case "memory" => new MemoryCatalog(req("warehouse"), io)
      case "jdbc" | "sql" => new JdbcCatalog(req("uri"), req("warehouse"), io,
        catalogName = props.getOrElse("name", "graft"),
        namespace = props.getOrElse("namespace", "default"))
      case "rest" => new RestCatalog(req("uri"),
        props.getOrElse("namespace", "default"), io,
        // auth passthrough: `token` / `credential` / `oauth2-server-uri`
        props.view.filterKeys(
          Set("token", "credential", "oauth2-server-uri")).toMap)
      case "glue" => new GlueCatalog(req("uri"),
        props.getOrElse("database", "default"), req("warehouse"), io)
      case "s3tables" => new S3TablesCatalog(req("uri"),
        props.getOrElse("namespace", "default"), io)
      case other => throw new IllegalArgumentException(
        s"unknown catalog type '$other'; supported: ${SupportedTypes.mkString(", ")}")
    }
  }
}
