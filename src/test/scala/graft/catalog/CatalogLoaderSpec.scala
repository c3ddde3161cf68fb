package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** CatalogLoader registry (reference catalog/loader) + the Spark plugin's
  * `type` option: the whole SQL surface against a JDBC-backed catalog. */
class CatalogLoaderSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("catalog-loader-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("loader dispatches by type and validates required properties") {
    val wh = Files.createTempDirectory("cl-wh").toString
    assert(CatalogLoader.load("hadoop", Map("warehouse" -> wh))
      .isInstanceOf[HadoopCatalog])
    assert(CatalogLoader.load("memory", Map("warehouse" -> wh))
      .isInstanceOf[MemoryCatalog])
    assert(CatalogLoader.load("sql", Map(
      "uri" -> s"jdbc:derby:$wh/cat;create=true", "warehouse" -> wh))
      .isInstanceOf[JdbcCatalog])
    val missing = intercept[IllegalArgumentException](
      CatalogLoader.load("jdbc", Map("warehouse" -> wh)))
    assert(missing.getMessage.contains("uri"))
    // glue/s3tables are dispatched (endpoint required); unknown types name
    // the supported list
    val glueMissing = intercept[IllegalArgumentException](
      CatalogLoader.load("glue", Map.empty))
    assert(glueMissing.getMessage.contains("uri"))
    val s3tMissing = intercept[IllegalArgumentException](
      CatalogLoader.load("s3tables", Map.empty))
    assert(s3tMissing.getMessage.contains("uri"))
    val glueStub = new GlueStubServer()
    val gluePort = glueStub.start()
    try assert(CatalogLoader.load("glue", Map(
        "uri" -> s"http://127.0.0.1:$gluePort", "warehouse" -> wh))
      .isInstanceOf[GlueCatalog])
    finally glueStub.stop()
    val unknown = intercept[IllegalArgumentException](
      CatalogLoader.load("nessie", Map.empty))
    assert(unknown.getMessage.contains("supported"))
  }

  test("spark.sql.catalog.<n>.type=jdbc: SQL DDL + DML on a JDBC catalog") {
    val wh = Files.createTempDirectory("cl-jdbc").toString
    spark.conf.set("spark.sql.catalog.cljdbc", "graft.sources.GraftCatalogPlugin")
    spark.conf.set("spark.sql.catalog.cljdbc.type", "jdbc")
    spark.conf.set("spark.sql.catalog.cljdbc.uri", s"jdbc:derby:$wh/cat;create=true")
    spark.conf.set("spark.sql.catalog.cljdbc.warehouse", wh)

    spark.sql("CREATE TABLE cljdbc.jt (id BIGINT, v STRING)")
    spark.sql("INSERT INTO cljdbc.jt VALUES (1,'a'),(2,'b'),(3,'c')")
    spark.sql("DELETE FROM cljdbc.jt WHERE id = 2")
    spark.sql("UPDATE cljdbc.jt SET v = upper(v) WHERE id = 3")
    assert(spark.sql("SELECT id, v FROM cljdbc.jt ORDER BY id")
      .collect().map(_.toString).toSeq == Seq("[1,a]", "[3,C]"))
    // the catalog rows really live in the JDBC store
    val cat = CatalogLoader.load("jdbc", Map(
      "uri" -> s"jdbc:derby:$wh/cat", "warehouse" -> wh, "name" -> "cljdbc"))
    assert(cat.listTables().contains("jt"))

    // SQL rename: pointer move in the JDBC row, data and history intact
    spark.sql("ALTER TABLE cljdbc.jt RENAME TO cljdbc.jt_renamed")
    assert(spark.sql("SELECT id, v FROM cljdbc.jt_renamed ORDER BY id")
      .collect().map(_.toString).toSeq == Seq("[1,a]", "[3,C]"))
    assert(!cat.tableExists("jt") && cat.tableExists("jt_renamed"))
    intercept[Exception] { spark.sql("SELECT * FROM cljdbc.jt").collect() }
  }

  test("namespace safety: marker never shadows a table dir, drops never destroy data") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val wh = Files.createTempDirectory("ns-safety-").toString
    val cat = new HadoopCatalog(wh, graft.io.FileIO.fromSpark(spark))
    val schema = graft.spec.IcebergSchema.fromSpark(
      Seq((1L, "a")).toDF("id", "v").schema)
    // a table named 'foo' owns warehouse/foo — creating namespace 'foo'
    // must refuse (its marker would live INSIDE the table directory, and
    // dropNamespace would then delete table data)
    var t = graft.table.GraftTable.create("foo", cat, schema)
    t = t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    intercept[IllegalArgumentException] { cat.createNamespace("foo") }

    // dropping a parent of an explicit child namespace refuses
    cat.createNamespace("a.b", Map("k" -> "v"))
    intercept[IllegalArgumentException] { cat.dropNamespace("a") }
    assert(cat.namespaceExists("a.b") && cat.namespaceProperties("a.b") == Map("k" -> "v"))

    // implicit namespaces derive EVERY prefix (root listing discovers them)
    graft.table.GraftTable.create("x.y.t", cat, schema)
    assert(cat.listNamespaces().contains("x"))
    assert(cat.listNamespaces().contains("x.y"))

    // a normal namespace drop removes only the marker
    assert(cat.dropNamespace("a.b"))
    assert(!cat.namespaceExists("a.b"))
    // and the table named like a refused namespace still reads intact
    assert(graft.table.GraftTable.load("foo", cat).newScan().toDF(spark)
      .count() === 2)
  }

  test("loaderProps: self-describing catalogs round-trip, credentialed/stateful ones refuse") {
    val wh = java.nio.file.Files.createTempDirectory("graft-lp").toString
    val io = new graft.io.FileIO(new org.apache.hadoop.conf.Configuration())
    assert(new HadoopCatalog(wh, io).loaderProps ===
      Some(Map("type" -> "hadoop", "warehouse" -> wh)))
    // an embedded Derby url carries no credentials: self-describing
    val jdbc = new JdbcCatalog(s"jdbc:derby:$wh/cat;create=true", wh, io)
    assert(jdbc.loaderProps.exists(_("type") == "jdbc"))
    // credential-bearing urls must NOT ride into plan-visible options
    // (regex-level check: constructing a catalog needs a live driver)
    for (url <- Seq("jdbc:postgresql://h/db?user=u&password=s",
        "jdbc:mysql://h/db?PASSWORD=s", "jdbc:x:thing;token=abc"))
      assert(JdbcCatalog.CredentialParam.findFirstIn(url).isDefined, url)
    assert(JdbcCatalog.CredentialParam
      .findFirstIn(s"jdbc:derby:$wh/cat;create=true").isEmpty)
    // in-process state cannot be reconstructed from properties
    assert(new MemoryCatalog(wh, io).loaderProps.isEmpty)
  }
}
